"""Pure-JAX compute kernels: Lie groups, cameras, triangulation, meshing, ARAP, LM."""
