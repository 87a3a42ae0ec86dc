"""Persistent capacity cache (ops/packed_bitap._PersistentCaps).

Converged device-buffer capacities survive the process so a fresh process
(the driver's bench run, a production warm-start) compiles each kernel once
at the converged size instead of once at the guess plus once after the
ratchet. The cache is purely a performance hint: a wrong or missing entry
only re-enters the existing overflow/ratchet retry loop.
"""

import os

import pytest

from fuzzy_aho_corasick_tpu import FuzzyAhoCorasickBuilder, FuzzyLimits
from fuzzy_aho_corasick_tpu.ops.packed_bitap import (
    _cap_cache,
    _engine_fingerprint,
)


def _engine(words=("hello", "world"), edits=1):
    return (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(edits))
        .case_insensitive(True)
        .build(list(words))
    )


def test_caps_roundtrip_across_engine_instances(tmp_path, monkeypatch):
    monkeypatch.setenv("FAC_CAP_CACHE", str(tmp_path))
    eng = _engine()
    caps = _cap_cache(eng)
    caps[("many-KH", 12345, True)] = 5632
    caps[("dp-KH", 99, False)] = 1 << 14

    # A separately-built identical engine (fresh process analog) sees the
    # converged values.
    eng2 = _engine()
    caps2 = _cap_cache(eng2)
    assert caps2.get(("many-KH", 12345, True)) == 5632
    assert caps2.get(("dp-KH", 99, False)) == 1 << 14


def test_fingerprint_separates_configs(tmp_path, monkeypatch):
    monkeypatch.setenv("FAC_CAP_CACHE", str(tmp_path))
    fp1 = _engine_fingerprint(_engine())
    assert fp1 == _engine_fingerprint(_engine())  # deterministic
    assert fp1 != _engine_fingerprint(_engine(edits=2))
    assert fp1 != _engine_fingerprint(_engine(words=("hello", "worlds")))

    caps = _cap_cache(_engine(edits=2))
    caps[("many-KH", 1, True)] = 7
    assert _cap_cache(_engine()).get(("many-KH", 1, True)) is None


def test_caps_disabled_and_io_failure_degrade_gracefully(tmp_path, monkeypatch):
    monkeypatch.setenv("FAC_NO_CAP_CACHE", "1")
    eng = _engine()
    caps = _cap_cache(eng)
    caps[("k", 1)] = 2  # no path -> stays in-memory, no error
    assert _cap_cache(_engine()).get(("k", 1)) is None

    monkeypatch.delenv("FAC_NO_CAP_CACHE")
    # Unwritable dir: cache degrades to in-memory without raising.
    blocked = tmp_path / "file_not_dir"
    blocked.write_text("x")
    monkeypatch.setenv("FAC_CAP_CACHE", str(blocked / "sub"))
    eng3 = _engine(words=("abc", "def"))
    caps3 = _cap_cache(eng3)
    caps3[("k", 2)] = 3
    assert caps3[("k", 2)] == 3


def test_corrupt_cache_file_ignored(tmp_path, monkeypatch):
    monkeypatch.setenv("FAC_CAP_CACHE", str(tmp_path))
    eng = _engine(words=("corrupt", "case"))
    path = os.path.join(str(tmp_path), f"{_engine_fingerprint(eng)}.json")
    with open(path, "w") as f:
        f.write("{not json")
    caps = _cap_cache(eng)
    assert len(caps) == 0
    caps[("fresh", 1)] = 4
    assert _cap_cache(_engine(words=("corrupt", "case"))).get(("fresh", 1)) == 4
