"""Dense device tables compiled from the host automaton.

The reference's pointer-rich ``Node`` graph (src/structs.rs:249-281) becomes
flat arrays the TPU kernels gather from (SURVEY §7 "architectural
translation"):

* a **char-class** alphabet: folded first-chars of pattern graphemes plus
  every char with a similarity entry; class 0 = "other" (no transitions,
  similarity 0 against everything — the same conservative bucket as the
  prefilter's symbol id 0, reference src/prefilter.rs:70-76);
* ``goto[num_nodes, num_classes]`` int32 (-1 = no edge) reproducing the
  no-mappings first-char transition scan (reference src/structs.rs:511-519,
  first matching edge in edge order wins);
* padded per-node edge lists for the substitution/deletion scans
  (reference src/search.rs:813-874, 1035-1089);
* CSR outputs, per-node prune coefficients, per-pattern length/weight, and
  the dense class-pair similarity matrix.

Transcoding a haystack to class ids is a single vectorized table lookup for
ASCII (every byte its own grapheme — reference src/grapheme.rs:76-125).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class DenseAutomaton:
    """Flat array form of a compiled engine, shared by all device kernels."""

    __slots__ = (
        "num_nodes",
        "num_classes",
        "char_class",
        "ascii_class",
        "goto",
        "edge_target",
        "edge_class",
        "max_degree",
        "out_start",
        "out_count",
        "out_patterns",
        "out_list",
        "max_out",
        "prune_len",
        "prune_len_over_weight",
        "pat_len",
        "pat_weight",
        "sim",
        "max_depth",
        "max_pattern_len",
        "case_insensitive",
        "ascii_class_u8",
    )

    @classmethod
    def from_engine(cls, engine) -> "DenseAutomaton":
        self = cls()
        nodes = engine.nodes
        patterns = engine._patterns
        n = len(nodes)
        self.num_nodes = n
        self.case_insensitive = engine.case_insensitive

        # --- char classes: 1..128 = ASCII bytes (folded at transcode time),
        # higher = non-ASCII chars seen in patterns or the similarity map.
        char_class: dict[str, int] = {chr(b): b + 1 for b in range(128)}

        def class_of(ch: str) -> int:
            cid = char_class.get(ch)
            if cid is None:
                cid = len(char_class) + 1
                char_class[ch] = cid
            return cid

        for node in nodes:
            for first_char, _t, _s in node.edges:
                class_of(first_char)
        for (a, b) in engine.similarity.map.keys():
            class_of(a)
            class_of(b)
        self.char_class = char_class
        C = len(char_class) + 1
        self.num_classes = C

        # ASCII transcode table: byte -> class, with case folding baked in.
        ascii_class = np.zeros(256, dtype=np.int32)
        for byte in range(128):
            ch = chr(byte)
            folded = ch.lower() if engine.case_insensitive else ch
            ascii_class[byte] = char_class[folded]
        self.ascii_class = ascii_class
        self.ascii_class_u8 = ascii_class.astype(np.uint8) if C <= 256 else None

        # --- similarity matrix over classes (diagonal 1.0, reference
        # src/structs.rs:82-92 via src/search.rs:76-82).
        inv = [""] * C
        for ch, cid in char_class.items():
            inv[cid] = ch
        sim = np.zeros((C, C), dtype=np.float32)
        for i in range(1, C):
            for j in range(1, C):
                if i == j:
                    sim[i, j] = 1.0
                else:
                    sim[i, j] = engine.similarity.get(inv[i], inv[j])
        sim[0, 0] = 1.0
        self.sim = sim

        # --- goto + edge arrays.
        max_deg = max((len(node.edges) for node in nodes), default=0)
        self.max_degree = max_deg
        goto = np.full((n, C), -1, dtype=np.int32)
        edge_target = np.full((n, max_deg), -1, dtype=np.int32)
        edge_class = np.zeros((n, max_deg), dtype=np.int32)
        for i, node in enumerate(nodes):
            for d, (first_char, target, _single) in enumerate(node.edges):
                cid = char_class[first_char]
                if goto[i, cid] == -1:
                    goto[i, cid] = target  # first edge in order wins
                edge_target[i, d] = target
                edge_class[i, d] = cid
        self.goto = goto
        self.edge_target = edge_target
        self.edge_class = edge_class

        # --- outputs (CSR + fixed-width padded list).
        out_start = np.zeros(n + 1, dtype=np.int32)
        flat: list[int] = []
        for i, node in enumerate(nodes):
            out_start[i] = len(flat)
            flat.extend(node.output)
        out_start[n] = len(flat)
        self.out_start = out_start
        self.out_patterns = np.asarray(flat, dtype=np.int32) if flat else np.zeros(0, np.int32)
        self.out_count = (out_start[1:] - out_start[:-1]).astype(np.int32)
        max_out = int(self.out_count.max()) if n else 0
        self.max_out = max(max_out, 1)
        out_list = np.full((n, self.max_out), -1, dtype=np.int32)
        for i, node in enumerate(nodes):
            for k, p in enumerate(node.output):
                out_list[i, k] = p
        self.out_list = out_list

        # --- prune coefficients + pattern scalars.
        self.prune_len = engine.prune_len_arr
        self.prune_len_over_weight = engine.prune_len_over_weight_arr
        self.pat_len = np.asarray([p.grapheme_len for p in patterns], dtype=np.float32)
        self.pat_weight = np.asarray([p.weight for p in patterns], dtype=np.float32)

        self.max_depth = max((node.depth for node in nodes), default=0)
        self.max_pattern_len = max((p.grapheme_len for p in patterns), default=0)
        return self

    # ------------------------------------------------------------------
    def transcode_ascii(self, haystack: str) -> np.ndarray:
        """All-ASCII haystack -> class-id stream (native C loop when built,
        NumPy otherwise); uint8 when the alphabet fits, else int32."""
        from ..utils import native

        data = haystack.encode("ascii")
        if self.ascii_class_u8 is not None:
            return native.transcode_bytes_u8(data, self.ascii_class_u8)
        return native.transcode_bytes_i32(data, self.ascii_class)

    def transcode(self, haystack: str, view=None) -> Optional[np.ndarray]:
        """Haystack -> class-id stream, or None if not transcodable (device
        paths currently require per-grapheme first-char classes).

        For non-ASCII haystacks the folded first char of each grapheme maps to
        its class (class 0 = unknown), mirroring the oracle's ``text_chars``
        cache (reference src/search.rs:203).
        """
        if haystack.isascii():
            return self.transcode_ascii(haystack)
        from ..utils.graphemes import HaystackView

        if view is None:
            view = HaystackView(haystack, self.case_insensitive)
        get = self.char_class.get
        return np.asarray([get(c, 0) for c in view.chars()], dtype=np.int32)
