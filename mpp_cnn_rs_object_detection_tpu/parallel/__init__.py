"""TPU parallelism layer: meshes, halo exchange, sharded scene inference.

The reference's entire parallelism surface is fork-based multiprocessing
(SURVEY.md §2.9). Here the equivalents are first-class XLA constructs:
data-parallel training (``models/train_utils.py``), vmapped chain batches
(``mpp/rjmcmc.py``), and shard_map scene sharding with ppermute halo
exchange (this package) so cross-shard results are exact, not stitched.
"""
