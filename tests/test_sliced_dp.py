"""Sliced DP pipeline: overlapped corpus slices must be invisible.

The fuzzy DP lane cuts large corpora into overlapping slices dispatched as
independent kernel calls, keeping each match exactly once by its *start*
(ownership rule per reference src/stream.rs:262-297). These tests force tiny
slices via FAC_SLICE_SYMS and check the sliced result is identical — list
order included — to the unsliced device result and the host oracle, with
needles planted straddling every slice boundary (the halo logic's only
interesting case).
"""

import os

import numpy as np
import pytest

from fuzzy_aho_corasick_tpu import FuzzyAhoCorasickBuilder, FuzzyLimits, oracle
from fuzzy_aho_corasick_tpu.ops.verify_dp import fuzzy_search_dp, typed_spec_of
from fuzzy_aho_corasick_tpu.utils import device_corpus
from fuzzy_aho_corasick_tpu.utils.graphemes import view_of

SLICE = 3000


def _key(m):
    return (m.pattern_index, m.start, m.end, float(m.similarity))


def _corpus_with_boundary_needles(n_slices: int, needle: str) -> str:
    """Filler text with a (fuzzed) needle laid across every k*SLICE index."""
    rng = np.random.default_rng(17)
    filler = "abcdef ghijk lmnop qrstu vwxyz "
    buf = list((filler * (n_slices * SLICE // len(filler) + 2))[: n_slices * SLICE])
    for s in range(1, n_slices):
        at = s * SLICE - len(needle) // 2  # straddles the boundary
        fuzzed = list(needle)
        # one substitution somewhere (keeps it a 1-edit match)
        pos = int(rng.integers(1, len(needle) - 1))
        fuzzed[pos] = "q" if fuzzed[pos] != "q" else "z"
        buf[at : at + len(needle)] = fuzzed
        # and an exact copy wholly inside the slice for contrast
        at2 = s * SLICE - SLICE // 2
        buf[at2 : at2 + len(needle)] = list(needle)
    return "".join(buf)


def _run_both(engine, hay, thr, **dp_kwargs):
    view = view_of(hay, engine.case_insensitive)
    n = len(view)
    os.environ["FAC_SLICE_SYMS"] = str(SLICE)
    try:
        device_corpus.clear()
        sliced = fuzzy_search_dp(engine, hay, thr, view, n, **dp_kwargs)
        assert sliced is not None, "dp lane declined under slicing"
        assert engine.last_stats["slices"] > 1, "slicing did not engage"
    finally:
        os.environ.pop("FAC_SLICE_SYMS", None)
    device_corpus.clear()
    whole = fuzzy_search_dp(engine, hay, thr, view, n, **dp_kwargs)
    assert whole is not None
    assert engine.last_stats["slices"] == 1
    return sliced, whole


def test_sliced_equals_unsliced_and_oracle_fuzzy1():
    hay = _corpus_with_boundary_needles(4, "tincidunt")
    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(["tincidunt", "qrstu"])
    )
    sliced, whole = _run_both(engine, hay, 0.8)
    assert [_key(m) for m in sliced] == [_key(m) for m in whole]
    orc = sorted(map(_key, oracle.search_raw(engine, hay, 0.8)))
    assert sorted(map(_key, sliced)) == orc
    # boundary needles actually matched (one fuzzed + one exact per boundary)
    tinc = [k for k in orc if k[0] == 0]
    assert len(tinc) >= 6


@pytest.mark.slow
def test_sliced_typed_lane():
    hay = _corpus_with_boundary_needles(3, "sollicitudin")
    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(2).swaps(0))
        .case_insensitive(True)
        .build(["sollicitudin", "lmnop"])
    )
    spec = typed_spec_of(engine)
    assert spec is not None
    sliced, whole = _run_both(engine, hay, 0.62, typed=spec)
    assert [_key(m) for m in sliced] == [_key(m) for m in whole]
    orc = sorted(map(_key, oracle.search_raw(engine, hay, 0.62)))
    assert sorted(map(_key, sliced)) == orc


def test_sliced_last_slice_short():
    """n not divisible by the slice size: the short tail slice still owns
    its starts and the final in-corpus match survives."""
    hay = _corpus_with_boundary_needles(2, "tincidunt")
    hay = hay[: 2 * SLICE - SLICE // 3] + " tincidunt"
    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(["tincidunt"])
    )
    sliced, whole = _run_both(engine, hay, 0.8)
    assert sorted(map(_key, sliced)) == sorted(map(_key, whole))
    orc = sorted(map(_key, oracle.search_raw(engine, hay, 0.8)))
    assert sorted(map(_key, sliced)) == orc
    assert any(k[2] == len(hay) for k in orc)  # the final needle matched
