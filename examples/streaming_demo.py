"""Streaming demo: scan a synthetic multi-hundred-MB stream in constant
memory, proving absolute offsets past the 32-bit range.

Counterpart of the reference's examples/streaming.rs (synthetic >4 GiB
stream, offset proof, throughput print). Size via STREAM_MB (default 64;
set 5000+ to cross u32::MAX like the reference example does).
"""

import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fuzzy_aho_corasick_tpu import FuzzyAhoCorasickBuilder, FuzzyLimits


class SyntheticStream(io.RawIOBase):
    """Deterministic filler with a needle every ~1 MiB (reference
    examples/streaming.rs:43-82)."""

    FILLER = (b"the quick brown fox jumps over the lazy dog " * 64)
    NEEDLE = b" needle "

    def __init__(self, total: int):
        self.total = total
        self.pos = 0

    def readable(self):
        return True

    def read(self, n=-1):
        if self.pos >= self.total:
            return b""
        n = min(n if n > 0 else 65536, self.total - self.pos)
        out = bytearray()
        while len(out) < n:
            block_off = self.pos + len(out)
            if block_off % (1 << 20) < len(self.NEEDLE):
                out.extend(self.NEEDLE)
            else:
                f = self.FILLER
                out.extend(f[block_off % len(f) :][: n - len(out)])
        self.pos += len(out)
        return bytes(out[:n])


def main():
    total = int(os.environ.get("STREAM_MB", "64")) << 20
    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(["needle"])
    )
    hits = []
    t0 = time.time()
    nread = engine.search_stream(SyntheticStream(total), 0.85, hits.append)
    dt = time.time() - t0
    print(f"read {nread} bytes in {dt:.1f}s = {nread/dt/1e6:.1f} MB/s; {len(hits)} matches")
    assert nread == total
    # Offsets are absolute and strictly increasing across windows.
    assert all(a.start < b.start for a, b in zip(hits, hits[1:]))
    if total > 0xFFFFFFFF:
        assert hits[-1].start > 0xFFFFFFFF, "expected offsets past u32::MAX"
        print("offsets past u32::MAX verified")


if __name__ == "__main__":
    main()
