"""Device-mesh partitioning and halo exchange (SURVEY.md §2.5/§5.8).

No reference equivalent — HOT is shared-memory-only; this package is the
capability the rebuild adds. Populated in build stages 4-5: mesh
construction, grid-tile ownership shardings, shard_map'd step, halo
collectives, coarse-level agglomeration.
"""
