"""Multi-chip / multi-host parallelism: device meshes, halo-overlap corpus
sharding, collective reductions of match tuples."""
