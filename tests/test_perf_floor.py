"""Device-path throughput floor as a TEST (VERDICT r3 item 9).

The reference encodes a performance property as CI (a pathological search
must finish < 2 s, src/tests.rs:815-864); this is the TPU analog: on a real
chip, warm exact scan must sustain >= 1 GB/s and warm fuzzy-E1 >= 500 MB/s
on a 24 MiB corpus. Regressions fail here instead of surfacing in a driver
bench rounds later. Skipped off-TPU and outside FAC_FULL_TESTS (slow mark).

Run on hardware with::

    FAC_REAL_DEVICE=1 FAC_FULL_TESTS=1 python -m pytest tests/test_perf_floor.py -q

(conftest keeps the real accelerator visible under FAC_REAL_DEVICE=1; set
FAC_JAX_CACHE to reuse the repo's persistent compile cache.)
"""

import time

import numpy as np
import pytest

from fuzzy_aho_corasick_tpu import FuzzyAhoCorasickBuilder, FuzzyLimits


def _on_tpu() -> bool:
    import jax

    try:
        return "TPU" in str(jax.devices()[0])
    except Exception:
        return False


pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not _on_tpu(), reason="throughput floor needs a real TPU"),
]

DICT = [
    "tincidunt", "phaetra", "sollicitudin", "venenatis", "fringilla",
    "ullamcorper", "pellentesque", "sagittis", "condimentum", "habitasse",
]


def _corpus(nbytes: int) -> str:
    rng = np.random.default_rng(42)
    words = ["lorem", "ipsum", "dolor", "sit", "amet", "porta", "orci"]
    parts, size = [], 0
    while size < nbytes:
        w = words[int(rng.integers(len(words)))]
        if rng.integers(997) == 0:
            w = DICT[int(rng.integers(len(DICT)))]
        parts.append(w)
        size += len(w) + 1
    return " ".join(parts)


def _best_bps(engine, hay: str, thr: float, reps: int = 3) -> float:
    engine.search_raw(hay, thr)
    engine.search_raw(hay, thr)  # capacity ratchet-down recompile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        engine.search_raw(hay, thr)
        best = min(best, time.perf_counter() - t0)
    return len(hay) / best


def test_device_throughput_floor():
    hay = _corpus(24 << 20)
    exact = FuzzyAhoCorasickBuilder.new().case_insensitive(True).build(DICT)
    exact.backend = "device"
    exact_bps = _best_bps(exact, hay, 0.5)

    fuzzy = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(DICT)
    )
    fuzzy.backend = "device"
    fuzzy_bps = _best_bps(fuzzy, hay, 0.8)

    # Floors are ~2x under current measured numbers (exact ~1.6-2.1 GB/s,
    # fuzzy-E1 ~0.9-1.1 GB/s at 96 MiB; 24 MiB pays relatively more fixed
    # dispatch latency) so link variance doesn't flake the test, while real
    # kernel/pipeline regressions still trip it.
    assert exact_bps >= 1.0e9, f"exact scan regressed: {exact_bps/1e6:.0f} MB/s"
    assert fuzzy_bps >= 0.5e9, f"fuzzy-E1 scan regressed: {fuzzy_bps/1e6:.0f} MB/s"
