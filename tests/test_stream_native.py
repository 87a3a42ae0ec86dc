"""Native streaming-replace helpers vs their pure-Python fallbacks.

The parallel replace pipeline's byte-identity tests (test_streaming.py) cover
whichever implementation is active; these pin the native C helpers
(native/fastpath.c greedy_nonoverlap / replace_emit_table) against the
fallback logic directly, including the edge cases the end-to-end corpus may
not hit every run (None table entries, a match extending past commit,
touching intervals).
"""

import bisect
import io

import numpy as np
import pytest

from fuzzy_aho_corasick_tpu.stream import _ReplaceCursor
from fuzzy_aho_corasick_tpu.utils import native


def _greedy_ref(s, e):
    """The bisect-loop fallback from stream._post_replace_batch (single
    window: global coords ARE window coords)."""
    keep = np.zeros(len(s), dtype=bool)
    starts, ends = [], []
    for r in range(len(s)):
        ss, ee = int(s[r]), int(e[r])
        p = bisect.bisect_left(starts, ss)
        if (p == 0 or ends[p - 1] <= ss) and (p == len(starts) or starts[p] >= ee):
            starts.insert(p, ss)
            ends.insert(p, ee)
            keep[r] = True
    return keep


@pytest.mark.skipif(native.lib() is None, reason="native library unavailable")
def test_greedy_nonoverlap_matches_bisect_fallback():
    rng = np.random.default_rng(3)
    for trial in range(50):
        n = int(rng.integers(1, 200))
        span = int(rng.integers(50, 2000))
        s = rng.integers(0, span - 1, size=n).astype(np.int64)
        ln = rng.integers(1, 30, size=n).astype(np.int64)
        e = np.minimum(s + ln, span)
        keep_c = native.greedy_nonoverlap(s, e, span)
        assert keep_c is not None
        np.testing.assert_array_equal(keep_c, _greedy_ref(s, e))


@pytest.mark.skipif(native.lib() is None, reason="native library unavailable")
def test_greedy_touching_intervals_do_not_clash():
    # Half-open spans: e1 == s2 is NOT an overlap (reference
    # src/matches.rs:97-103).
    s = np.array([0, 5, 10], dtype=np.int64)
    e = np.array([5, 10, 15], dtype=np.int64)
    keep = native.greedy_nonoverlap(s, e, 20)
    assert keep.all()


@pytest.mark.skipif(native.lib() is None, reason="native library unavailable")
def test_replace_emit_table_matches_python_cursor():
    rng = np.random.default_rng(11)
    table = [b"<x>", None, b"", b"LONGREPLACEMENT"]
    rt = native.ReplacementTable(table)
    for trial in range(40):
        nb = int(rng.integers(40, 400))
        data = bytes(rng.integers(97, 123, size=nb, dtype=np.uint8))
        commit = int(rng.integers(nb // 2, nb + 1))
        # Sorted non-overlapping spans with random pattern ids (some past
        # the table length -> keep-original).
        cuts = np.sort(rng.choice(nb, size=min(nb, 12), replace=False))
        spans = [
            (int(cuts[i]), int(cuts[i + 1]))
            for i in range(0, len(cuts) - 1, 2)
            if cuts[i + 1] <= commit + 5
        ]
        if not spans:
            continue
        sb = np.array([a for a, _ in spans], dtype=np.int64)
        eb = np.array([b for _, b in spans], dtype=np.int64)
        pat = rng.integers(0, 6, size=len(spans)).astype(np.int32)
        start_cur = int(rng.integers(0, 3))  # an earlier window got here

        out_py = io.BytesIO()
        c_py = _ReplaceCursor()
        c_py.emitted = start_cur  # base = 0
        c_py.emit_window_table(out_py, table, 0, data, commit, sb, eb, pat)

        out_c = io.BytesIO()
        c_c = _ReplaceCursor()
        c_c.emitted = start_cur
        c_c.emit_window_table(out_c, table, 0, data, commit, sb, eb, pat, rt=rt)

        assert out_c.getvalue() == out_py.getvalue(), (trial, spans, pat)
        assert c_c.emitted == c_py.emitted
        assert c_c.written == c_py.written


@pytest.mark.skipif(native.lib() is None, reason="native library unavailable")
def test_replace_emit_table_overhang_past_commit_capacity():
    # Regression: a keep-original match (all-None table -> max_len == 0) may
    # END far past commit (ownership only requires start < commit). The
    # output then exceeds (commit - cur) + n*max_len + 1 — the old capacity
    # formula — by up to (end - commit) bytes, overrunning the numpy buffer.
    table = [None, None]
    rt = native.ReplacementTable(table)
    assert rt.max_len == 0
    data = bytes(range(48, 48 + 64)) * 4  # 256 bytes
    commit = 100
    # One match overhanging commit by 120 bytes (>> max_len + 1).
    sb = np.array([90], dtype=np.int64)
    eb = np.array([220], dtype=np.int64)
    pat = np.array([0], dtype=np.int32)

    res = native.replace_emit_table(data, 0, commit, sb, eb, pat, rt)
    assert res is not None
    out, new_cur = res
    assert bytes(out) == data[:220]
    assert new_cur == 220

    out_py = io.BytesIO()
    c_py = _ReplaceCursor()
    c_py.emit_window_table(out_py, table, 0, data, commit, sb, eb, pat)
    out_c = io.BytesIO()
    c_c = _ReplaceCursor()
    c_c.emit_window_table(out_c, table, 0, data, commit, sb, eb, pat, rt=rt)
    assert out_c.getvalue() == out_py.getvalue() == data[:220]
    assert c_c.emitted == c_py.emitted == 220


@pytest.mark.skipif(native.lib() is None, reason="native library unavailable")
def test_replace_emit_batch_matches_per_window_emit():
    """The whole-batch C emit must be byte-identical to the sequential
    per-window emits, including a keep-original match overhanging its
    window's commit into the next window (the cross-window cursor rule)."""
    rng = np.random.default_rng(29)
    table = [b"<x>", None, b"", b"LONGREPLACEMENT"]
    rt = native.ReplacementTable(table)
    for trial in range(30):
        nwin = int(rng.integers(1, 6))
        doff, base, commit, datas = [], [], [], []
        pos_abs = 0
        off = 0
        win_rows = []
        for w in range(nwin):
            nb = int(rng.integers(60, 300))
            cm = int(rng.integers(nb // 2, nb + 1))
            d = bytes(rng.integers(97, 123, size=nb, dtype=np.uint8))
            doff.append(off)
            base.append(pos_abs)
            commit.append(cm)
            datas.append(d)
            # sorted non-overlapping window-local spans; allow ends past
            # commit (the search window read beyond its commit)
            cuts = np.sort(rng.choice(nb, size=min(nb, 10), replace=False))
            spans = [
                (int(cuts[i]), int(cuts[i + 1]))
                for i in range(0, len(cuts) - 1, 2)
                if cuts[i] < cm
            ]
            pats = rng.integers(0, 6, size=len(spans)).astype(np.int32)
            win_rows.append((spans, pats))
            off += nb + 3  # separator gap
            pos_abs += cm
        data = b"\0\0\0".join(datas) + b""
        # pad data so doff windows line up with the separator gaps
        blob = bytearray()
        for w, d in enumerate(datas):
            assert len(blob) == doff[w]
            blob += d
            blob += b"\0\0\0"
        data = bytes(blob)

        # Sequential per-window reference.
        out_ref = io.BytesIO()
        c_ref = _ReplaceCursor()
        for w in range(nwin):
            spans, pats = win_rows[w]
            sb = np.array([a for a, _ in spans], dtype=np.int64)
            eb = np.array([b for _, b in spans], dtype=np.int64)
            c_ref.emit_window_table(
                out_ref, table, base[w], datas[w], commit[w], sb, eb, pats,
                rt=rt,
            )

        # One batch call.
        sbs, ebs, ps, ws = [], [], [], []
        for w in range(nwin):
            spans, pats = win_rows[w]
            for (a, b), p in zip(spans, pats):
                sbs.append(a)
                ebs.append(b)
                ps.append(p)
                ws.append(w)
        res = native.replace_emit_batch(
            data, 0, doff, base, commit,
            np.array(sbs, np.int64), np.array(ebs, np.int64),
            np.array(ps, np.int32), np.array(ws, np.int32), rt,
        )
        assert res is not None
        mv, emitted = res
        assert bytes(mv) == out_ref.getvalue(), f"trial {trial}"
        assert emitted == c_ref.emitted


def test_greedy_nonoverlap_declines_zero_length_rows():
    # Zero-length rows diverge between the C occupancy pass and the bisect
    # fallback; the wrapper must route them to the fallback (return None).
    if native.lib() is None:
        pytest.skip("native library unavailable")
    s = np.array([5, 0], dtype=np.int64)
    e = np.array([5, 10], dtype=np.int64)
    assert native.greedy_nonoverlap(s, e, 20) is None
