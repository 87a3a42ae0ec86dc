"""Docs-as-spec harness: every ```python block in docs/*.md must execute.

The repo analog of the reference's mdBook-doctest harness (reference
src/lib.rs:70-94: every book chapter compiles as a doctest via the
``chapter!`` macro) — code in the guide rots unless something runs it.

Blocks in one chapter share a namespace top-to-bottom (like a doctest file),
so later blocks may use names defined earlier. A block may end with
``# expect: <repr>`` comments asserting the value of the preceding
expression is printed (we simply require the block raises nothing; explicit
assertions belong in the block itself).
"""

import pathlib
import re

import pytest

DOCS = sorted(
    (pathlib.Path(__file__).resolve().parent.parent / "docs").glob("*.md")
)
_BLOCK_RE = re.compile(r"```python\n(.*?)```", re.S)


def _blocks(path):
    return _BLOCK_RE.findall(path.read_text())


WITH_CODE = [p for p in DOCS if _blocks(p)]


def test_every_doc_scanned():
    assert len(DOCS) >= 10, "docs/ chapters missing?"


def _preamble_ns():
    """The hidden setup every chapter runs under — the analog of the
    reference ``chapter!`` macro's hidden lines (src/lib.rs:70-94): the full
    public API plus the guide's running example fixtures (``engine``,
    ``reader``, ``cb``)."""
    import io

    import fuzzy_aho_corasick_tpu as fac
    from fuzzy_aho_corasick_tpu import (
        FuzzyAhoCorasickBuilder,
        FuzzyLimits,
        SearchOptions,
    )

    ns = {name: getattr(fac, name) for name in fac.__all__}
    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(["needle", "pattern"])
    )
    ns.update(
        engine=engine,
        reader=io.BytesIO(b"pad needle pad " * 100),
        writer=io.BytesIO(),
        cb=lambda m: None,
        on_match=lambda m: None,
        opts=SearchOptions.new().with_threshold(0.8),
        io=io,
        haystack="one needle in a pattren haystack",
        corpus="pad needle pad " * 200,
    )
    return ns


@pytest.mark.parametrize("path", WITH_CODE, ids=lambda p: p.name)
def test_doc_blocks_execute(path):
    ns = _preamble_ns()
    for i, block in enumerate(_blocks(path)):
        try:
            exec(compile(block, f"{path.name}[block {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure formatting
            pytest.fail(f"{path.name} block {i} raised {type(e).__name__}: {e}\n{block}")
