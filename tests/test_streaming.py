"""Streaming equivalence: streaming APIs must equal whole-input search/replace
on multi-window inputs (reference src/tests.rs:1059-1259)."""

import pytest
import io

from fuzzy_aho_corasick_tpu import FuzzyAhoCorasickBuilder, FuzzyLimits, SearchOptions


def _engine():
    return (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(["needle"])
    )


def _multi_window_input():
    filler = "the quick brown fox " * 50
    parts = []
    size = 0
    while size < 600_000:
        parts.append(filler)
        parts.append("needle ")
        size += len(filler) + 7
    return "".join(parts)


def test_streaming_apis_match_whole_input():
    engine = _engine()
    input_ = _multi_window_input()
    opts = SearchOptions.new().with_threshold(0.8).sorted().non_overlapping()
    truth = sorted(
        (m.start, m.end, m.pattern_index) for m in engine.search(input_, opts)
    )
    assert len(truth) > 300

    cb = []
    engine.search_stream(input_.encode(), 0.8, lambda m: cb.append((m.start, m.end, m.pattern_index)))
    assert sorted(cb) == truth

    it = [(m.start, m.end, m.pattern_index) for m in engine.stream_matches(input_.encode(), 0.8)]
    assert sorted(it) == truth

    par = []
    engine.search_stream_parallel(
        input_.encode(), 0.8, 4, lambda m: par.append((m.start, m.end, m.pattern_index))
    )
    assert sorted(par) == truth

    # Offsets/text consistent with the source.
    data = input_.encode()
    engine.search_stream(
        data, 0.8, lambda m: None if data[m.start:m.end].decode() == m.text else (_ for _ in ()).throw(AssertionError())
    )


def test_streaming_empty_input():
    engine = FuzzyAhoCorasickBuilder.new().build(["x"])
    hits = []
    n = engine.search_stream(b"", 0.8, lambda m: hits.append(m))
    assert (len(hits), n) == (0, 0)


def test_replace_stream_small_cases():
    engine = _engine()

    def run(inp):
        out = io.BytesIO()
        n = engine.replace_stream(inp.encode(), out, 0.8, lambda m: "X")
        s = out.getvalue().decode()
        assert n == len(out.getvalue())
        return s

    assert run("a needle b") == "a X b"
    assert run("needle b") == "X b"
    assert run("a needle") == "a X"
    assert run("needle needle") == "X X"
    assert run("a neeedle b") == "a X b"
    assert run("nothing here") == "nothing here"

    out = io.BytesIO()
    engine.replace_stream(b"a needle b", out, 0.8, lambda m: None)
    assert out.getvalue().decode() == "a needle b"


def test_replace_stream_matches_whole_input():
    engine = _engine()
    input_ = _multi_window_input()
    truth = engine.replace(
        input_, SearchOptions.new().with_threshold(0.8), lambda m: f"<{m.pattern_index}>"
    )
    out = io.BytesIO()
    n = engine.replace_stream(input_.encode(), out, 0.8, lambda m: f"<{m.pattern_index}>")
    streamed = out.getvalue().decode()
    assert n == len(out.getvalue())
    assert streamed == truth
    assert "<0>" in streamed

    par_out = io.BytesIO()
    np_ = engine.replace_stream_parallel(
        input_.encode(), par_out, 4, 0.8, lambda m: f"<{m.pattern_index}>"
    )
    par = par_out.getvalue().decode()
    assert np_ == len(par_out.getvalue())
    assert par == truth


def test_replace_stream_parallel_small_cases():
    engine = _engine()

    def run(inp, shards):
        out = io.BytesIO()
        engine.replace_stream_parallel(inp.encode(), out, shards, 0.8, lambda m: "X")
        return out.getvalue().decode()

    assert run("a needle b", 8) == "a X b"
    assert run("needle needle", 4) == "X X"
    assert run("a neeedle b", 2) == "a X b"
    assert run("nothing here", 4) == "nothing here"
    assert run("", 4) == ""


def test_fuzzy_replacer_replace_stream():
    replacer = (
        FuzzyAhoCorasickBuilder.new()
        .case_insensitive(True)
        .fuzzy(FuzzyLimits.new().edits(1))
        .build_replacer([("hello", "hi"), ("world", "earth")])
    )
    out = io.BytesIO()
    replacer.replace_stream(b"hell0 w0rld!", out, 0.8)
    assert out.getvalue().decode() == "hi earth!"


def test_stream_unicode_boundary():
    """Multi-byte codepoints split across read chunks must not break windows."""
    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(["café"])
    )
    text = ("x" * 100 + "café ") * 50
    got = [(m.start, m.end) for m in engine.stream_matches(text.encode(), 0.9)]
    opts = SearchOptions.new().with_threshold(0.9).sorted().non_overlapping()
    truth = [(m.start, m.end) for m in engine.search(text, opts)]
    assert sorted(got) == sorted(truth)


def test_stream_io_error_propagates_once():
    """Reader IO errors propagate once from the lazy iterator, then
    iteration ends (reference src/stream.rs:165-204)."""
    engine = _engine()

    class FlakyReader:
        def __init__(self):
            self.calls = 0

        def read(self, n):
            self.calls += 1
            if self.calls > 2:
                raise OSError("disk on fire")
            return b"pad needle pad " * 200

    it = engine.stream_matches(FlakyReader(), 0.8)
    got = []
    raised = False
    try:
        for m in it:
            got.append(m)
    except OSError:
        raised = True
    assert raised
    assert it.errored
    # After the error propagated once, iteration ends cleanly.
    assert list(it) == []


@pytest.mark.slow
def test_parallel_stream_identity_multibatch():
    """Parallel streaming must be byte/result-identical to sequential across
    multiple batches, including matches straddling window commits
    (reference src/tests.rs:1186-1237)."""
    import io

    engine = _engine()
    input_ = _multi_window_input() * 3
    seq = []
    engine.search_stream(input_.encode(), 0.8, lambda m: seq.append(
        (m.start, m.end, m.pattern_index, float(m.similarity))))
    for shards in (1, 2, 8):
        par = []
        engine.search_stream_parallel(input_.encode(), 0.8, shards, lambda m: par.append(
            (m.start, m.end, m.pattern_index, float(m.similarity))))
        assert par == seq, f"shards={shards}: parallel differs from sequential"

    out_seq = io.BytesIO()
    engine.replace_stream(input_.encode(), out_seq, 0.8, lambda m: "<X>")
    for shards in (2, 8):
        out_par = io.BytesIO()
        n = engine.replace_stream_parallel(input_.encode(), out_par, shards, 0.8, lambda m: "<X>")
        assert out_par.getvalue() == out_seq.getvalue()
        assert n == len(out_par.getvalue())


def test_parallel_stream_separator_isolation():
    """Patterns containing control chars must not break the batched-window
    separator (a different dead char is chosen automatically)."""
    from fuzzy_aho_corasick_tpu import FuzzyAhoCorasickBuilder, FuzzyLimits

    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .build(["a\x00b", "needle"])
    )
    input_ = ("pad " * 50 + "a\x00b " + "pad " * 50 + "nedle ") * 40
    seq = []
    engine.search_stream(input_.encode(), 0.7, lambda m: seq.append((m.start, m.end, m.pattern_index)))
    par = []
    engine.search_stream_parallel(input_.encode(), 0.7, 4, lambda m: par.append((m.start, m.end, m.pattern_index)))
    assert par == seq
    assert len(seq) >= 80
