"""Standalone bitap prototype + brute-force Levenshtein verifier + fuzz.

Counterpart of the reference's examples/bitap_prototype.rs: the shift-AND
recurrence is fuzzed against a brute-force Levenshtein DP to validate the
candidate-window guarantee, then raw scan throughput is printed for the
scalar (native C), chunked-NumPy, and pure-Python forms.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from fuzzy_aho_corasick_tpu.ops.bitap import bitap_windows, bitap_windows_chunked
from fuzzy_aho_corasick_tpu.utils import native


def levenshtein(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


def fuzz(trials=2000, seed=123):
    """Every substring within Levenshtein k of the pattern must fall inside a
    reported window (the filter's soundness contract)."""
    rng = np.random.default_rng(seed)
    for trial in range(trials):
        m = int(rng.integers(2, 9))
        k = int(rng.integers(0, 3))
        alpha = int(rng.integers(2, 5))
        pattern = rng.integers(1, alpha + 1, m)
        n = int(rng.integers(m, 40))
        text = rng.integers(0, alpha + 1, n)

        mask = np.zeros(alpha + 1, dtype=np.uint64)
        for i, s in enumerate(pattern):
            mask[s] |= np.uint64(1) << np.uint64(i)
        wins: list = []
        bitap_windows(mask, m, k, text.astype(np.uint8), wins)

        pat_s = "".join(chr(65 + x) for x in pattern)
        for end in range(1, n + 1):
            best = min(
                levenshtein(pat_s, "".join(chr(65 + x) for x in text[s:end]))
                for s in range(max(0, end - m - k), end + 1)
            )
            hit = any(s <= end <= e for s, e in wins)
            if best <= k:
                assert hit, f"trial {trial}: miss at end={end} (dist {best} <= k={k})"
    print(f"fuzz OK: {trials} trials, no missed candidate")


def throughput():
    rng = np.random.default_rng(7)
    n = 4 << 20
    ids = rng.integers(0, 30, n, dtype=np.uint8)
    mask = np.zeros(31, dtype=np.uint64)
    for i, s in enumerate([3, 7, 11, 5, 9, 2, 8]):
        mask[s] |= np.uint64(1) << np.uint64(i)
    m, k = 7, 1

    hits = native.bitap_scan_hits(mask, m, k, ids)
    if hits is not None:
        t0 = time.time()
        native.bitap_scan_hits(mask, m, k, ids)
        print(f"native C scalar: {n/(time.time()-t0)/1e6:.0f} MB/s")
    wins: list = []
    t0 = time.time()
    bitap_windows_chunked(mask, m, k, ids, wins)
    print(f"numpy chunked:   {n/(time.time()-t0)/1e6:.0f} MB/s")
    small = ids[: 1 << 18]
    wins = []
    t0 = time.time()
    bitap_windows(mask, m, k, small, wins)
    print(f"pure python:     {len(small)/(time.time()-t0)/1e6:.2f} MB/s")


if __name__ == "__main__":
    fuzz(int(os.environ.get("FUZZ_TRIALS", "400")))
    throughput()
