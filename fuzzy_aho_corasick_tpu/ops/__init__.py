"""Compute kernels: dense automaton tables, exact/fuzzy anchored scans, and
the bit-parallel Bitap prefilter, with JAX/Pallas device paths and NumPy host
fallbacks."""
