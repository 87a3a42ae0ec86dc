"""Streaming-replace scaling demo with byte-identity assertions.

Counterpart of the reference's examples/replace_bench.rs (scaling across
thread counts with byte-identical output): here the shard count scales the
windows batched per device dispatch, and every configuration must produce
byte-identical output to the single-shard form.
"""

import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fuzzy_aho_corasick_tpu import FuzzyAhoCorasickBuilder, FuzzyLimits


def main():
    size = int(os.environ.get("REPLACE_MB", "8")) << 20
    filler = "the quick brown fox jumps over the lazy dog "
    parts, n = [], 0
    while n < size:
        parts.append(filler)
        parts.append("needle ")
        n += len(filler) + 7
    data = "".join(parts).encode()

    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(["needle"])
    )

    baseline = None
    for shards in [1, 2, 4, 8]:
        out = io.BytesIO()
        t0 = time.time()
        engine.replace_stream_parallel(io.BytesIO(data), out, shards, 0.85, lambda m: "X")
        dt = time.time() - t0
        blob = out.getvalue()
        print(f"shards={shards}: {len(data)/dt/1e6:6.1f} MB/s  out={len(blob)} bytes")
        if baseline is None:
            baseline = blob
        else:
            assert blob == baseline, "parallel output must be byte-identical"
    print("byte-identity across shard counts verified")


if __name__ == "__main__":
    main()
