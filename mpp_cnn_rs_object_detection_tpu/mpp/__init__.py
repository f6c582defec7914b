"""TPU-native Marked Point Process core.

The reference represents a configuration as a Python set of Rectangle objects
with a spatial-hash + incremental energy graph (``models/mpp/point_set/``);
here a configuration is a fixed-capacity struct-of-arrays pytree and all
energies are dense, masked, vmappable jnp computations (SURVEY.md §7.1).
"""
