"""Device (TPU) search engine: dispatch layer over the JAX kernels.

Routes ``search_raw`` calls onto the TPU when the configuration and haystack
are kernel-eligible; the host oracle handles everything else. Eligibility will
widen stage by stage (SURVEY §7 build order): exact scan first, then the fuzzy
frontier kernel, then prefiltered and sharded paths.
"""

from __future__ import annotations

from typing import List

from ..structs import FuzzyMatch


class DeviceEngine:
    """Per-engine device dispatcher (lazily constructed by
    :class:`fuzzy_aho_corasick_tpu.automaton.FuzzyAhoCorasick`)."""

    def __init__(self, engine):
        self.engine = engine
        self._exact = None
        self._fuzzy = None

    def supports(self, haystack: str) -> bool:
        """Whether the device path can serve this (engine, haystack) pair with
        results identical to the oracle."""
        return False

    def search_raw(self, haystack: str, threshold: float) -> List[FuzzyMatch]:
        raise NotImplementedError
