"""Multi-host skeleton: host-sharded corpus plan + per-host sharded search
must equal the whole-input search (SURVEY §5 distributed backend row;
the single-process form of one pod process's code path)."""

import os
import numpy as np
import pytest

from fuzzy_aho_corasick_tpu import FuzzyAhoCorasickBuilder, FuzzyLimits
from fuzzy_aho_corasick_tpu.parallel.multihost import (
    HostShardPlan,
    align_utf8,
    initialize,
    replace_multihost,
    search_multihost,
)
from fuzzy_aho_corasick_tpu.parallel.shard_search import default_mesh


def key(m):
    return (m.start, m.end, m.pattern_index, float(np.float32(m.similarity)))


def test_initialize_single_process_noop():
    assert initialize() == 0
    assert initialize(num_processes=1) == 0


def test_host_shard_plan_covers_exactly():
    plan = HostShardPlan(1000, 4, overlap_bytes=50)
    shards = plan.shards()
    assert [s.own_start for s in shards] == [0, 250, 500, 750]
    assert [s.own_end for s in shards] == [250, 500, 750, 1000]
    assert all(s.read_end == min(s.own_end + 50, 1000) for s in shards)


def test_align_utf8():
    data = "héllo".encode("utf-8")
    # position 2 is the continuation byte of 'é'
    assert align_utf8(data, 2) == 3
    assert align_utf8(data, 0) == 0


@pytest.mark.slow
def test_multihost_fuzzy_equals_whole_input():
    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(["needle", "boundary"])
    )
    filler = "assorted filler words "
    hay = ""
    for i in range(300):
        hay += filler[: 5 + (i * 7) % 20] + ("nedle" if i % 2 else "boundary")
    corpus = hay.encode("utf-8")
    engine.backend = "oracle"
    truth = sorted(key(m) for m in engine.search_raw(hay, 0.72))
    for n_hosts in (1, 2, 3):
        got = search_multihost(engine, corpus, 0.72, n_hosts, default_mesh())
        assert sorted(map(key, got)) == truth, f"n_hosts={n_hosts}"
    assert len(truth) > 200


@pytest.mark.slow
def test_multihost_unicode_boundary_alignment():
    """A host boundary landing inside a multi-byte code point must not break
    decode or ownership."""
    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(["héllo"])
    )
    hay = ("àé " * 40 + "héllo ") * 40
    corpus = hay.encode("utf-8")
    engine.backend = "oracle"
    truth = sorted(key(m) for m in engine.search_raw(hay, 0.8))
    got = search_multihost(engine, corpus, 0.8, 3, default_mesh())
    assert sorted(map(key, got)) == truth
    assert len(truth) >= 40


def _replace_corpus(n: int = 240) -> bytes:
    filler = "assorted filler words "
    hay = ""
    for i in range(n):
        hay += filler[: 5 + (i * 7) % 20] + ("nedle" if i % 2 else "boundary")
    return hay.encode("utf-8")


def test_multihost_replace_equals_single_host_stream():
    """replace_multihost output must be byte-identical to the single-host
    streaming replace (BASELINE config 5; reference src/stream.rs:533-638's
    seq-tagged reassembly at host granularity) for 1/2/3 logical hosts."""
    import io

    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(["needle", "boundary"])
    )
    corpus = _replace_corpus()
    table = ["<N>", "<B>"]
    cb = lambda m: table[m.pattern_index] if m.pattern_index < len(table) else None
    w = io.BytesIO()
    engine.replace_stream(io.BytesIO(corpus), w, 0.72, cb)
    single = w.getvalue()
    assert single.count(b"<N>") > 50 and single.count(b"<B>") > 50

    from fuzzy_aho_corasick_tpu.parallel.shard_search import default_mesh

    for n_hosts in (1, 2, 3):
        got = replace_multihost(engine, corpus, 0.72, table, n_hosts, default_mesh())
        assert got == single, f"n_hosts={n_hosts}"


def test_multihost_replace_boundary_overrun():
    """A match straddling a host boundary is emitted exactly once (by the
    owner of its START), and the next host resumes after its end — the
    cross-host ReplaceCursor hand-off."""
    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(["boundarymarker"])
    )
    # 3 hosts over ~300 bytes -> boundaries at ~100/200; plant the needle
    # across each.
    base = bytearray(b"." * 300)
    for b in (100, 200):
        w = b"boundarymarker"
        base[b - len(w) // 2 : b - len(w) // 2 + len(w)] = w
    corpus = bytes(base)
    full = engine.replace(
        corpus.decode(),
        __import__("fuzzy_aho_corasick_tpu").SearchOptions.new().with_threshold(0.8),
        lambda m: "<X>",
    ).encode()
    got = replace_multihost(engine, corpus, 0.8, lambda m: "<X>", 3)
    assert got == full
    assert got.count(b"<X>") == 2


# ---------------------------------------------------------------------------
# Real 2-process distributed run (VERDICT r2 item 5): jax.distributed on CPU
# ---------------------------------------------------------------------------

_WORKER = r"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, sys.argv[4])
import jax
jax.config.update("jax_platforms", "cpu")

from fuzzy_aho_corasick_tpu import FuzzyAhoCorasickBuilder, FuzzyLimits
from fuzzy_aho_corasick_tpu.parallel import multihost

port, nproc, pid, repo = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
got_pid = multihost.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)
assert got_pid == pid == jax.process_index(), (got_pid, pid, jax.process_index())
assert jax.process_count() == nproc

engine = (
    FuzzyAhoCorasickBuilder.new()
    .fuzzy(FuzzyLimits.new().edits(1))
    .case_insensitive(True)
    .build(["needle", "pattern"])
)
corpus = (("filler " * 97) + "needle " + ("words " * 83) + "pattren ").encode() * 40
ms = multihost.search_multihost(engine, corpus, 0.8)
rows = [
    (m.start, m.end, m.pattern_index, float(m.similarity), m.edits, m.text)
    for m in ms
]
print("RESULT " + json.dumps(rows))

# Multi-host streaming replace: this process emits ONLY its owned segment;
# the test harness concatenates segments in process order.
import base64
seg = multihost.replace_multihost(engine, corpus, 0.8, ["<N>", "<P>"])
print("SEGMENT " + base64.b64encode(seg).decode())
"""


def test_two_process_distributed_allgather(tmp_path):
    """Launch 2 OS processes under jax.distributed (local coordinator);
    each searches only its host shard; the in-driver all-gather must hand
    BOTH processes the identical, complete match list, equal to the
    single-process oracle on the whole corpus."""
    import json
    import socket
    import subprocess
    import sys as _sys

    # Free port for the coordinator.
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [_sys.executable, str(script), str(port), "2", str(pid), repo],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    segs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out
        outs.append(json.loads(lines[-1][len("RESULT "):]))
        import base64

        seg_lines = [l for l in out.splitlines() if l.startswith("SEGMENT ")]
        assert seg_lines, out
        segs.append(base64.b64decode(seg_lines[-1][len("SEGMENT "):]))

    # Both processes returned the identical gathered list.
    assert outs[0] == outs[1]

    # And it equals the single-process whole-corpus search.
    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(["needle", "pattern"])
    )
    corpus = (("filler " * 97) + "needle " + ("words " * 83) + "pattren ").encode() * 40
    expect = sorted(
        (m.start, m.end, m.pattern_index, float(m.similarity), m.edits, m.text)
        for m in engine.search_raw(corpus.decode(), 0.8)
    )
    got = sorted(tuple(r) for r in outs[0])
    assert got == [tuple(e) for e in expect]

    # The two processes' replace segments concatenate (process order) to the
    # single-host streaming replace output, byte for byte.
    import io

    w = io.BytesIO()
    engine.replace_stream(
        io.BytesIO(corpus), w, 0.8,
        lambda m: ["<N>", "<P>"][m.pattern_index] if m.pattern_index < 2 else None,
    )
    assert segs[0] + segs[1] == w.getvalue()
    assert w.getvalue().count(b"<N>") == 40 and w.getvalue().count(b"<P>") == 40


def test_replace_multihost_single_device_mesh():
    """A host with ONE local device routes shard searches through the
    regular pipeline (the mesh lane's fixed-capacity readback buys nothing
    with no devices to shard over) — output must stay byte-identical to the
    multi-device mesh form."""
    import io

    import jax
    import numpy as np
    from jax.sharding import Mesh

    from fuzzy_aho_corasick_tpu import FuzzyAhoCorasickBuilder, FuzzyLimits
    from fuzzy_aho_corasick_tpu.parallel.multihost import replace_multihost

    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(["needle", "pattern"])
    )
    corpus = ("find the needle in this patern haystack " * 4000).encode()
    table = ["<N>", "<P>"]
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    got1 = replace_multihost(engine, corpus, 0.72, table, 3, mesh1)
    got8 = replace_multihost(engine, corpus, 0.72, table, 3)
    assert got1 == got8
    assert b"<N>" in got1 and b"<P>" in got1
