"""Precision policy for the TPU build.

The reference optimizer runs in f64 throughout (g2o's ``number_t`` is
``double``; ``Modules/Optimization/g2oBundleAdjustment.cc:618-630``). TPUs
have no f64 hardware -- XLA emulates it in software at a >20x slowdown -- so
the TPU-native design keeps the entire device compute path in f32 and makes
the two places that genuinely need more headroom robust by construction:

- the damped normal-equation solve is Jacobi-equilibrated (unit diagonal)
  before the f32 Cholesky and polished with one iterative-refinement step
  (``ops/lm.py``), which recovers the accuracy an unscaled f64 factorization
  would give for the condition numbers seen in these problems;
- LM accept/reject compares robust costs whose per-edge terms are f32 but
  whose reduction is performed in a numerically stable order (masked sums of
  same-magnitude nonnegative terms).

Host-side preparation (Delaunay meshing, cotangent weights, metrics,
journaling) stays in numpy f64 -- it is free on the host and keeps the
experiment-journal numbers deterministic.

``TIDS_X64=1`` re-enables global f64 for debugging numerical regressions on
CPU (see ``__init__``).
"""

import jax.numpy as jnp

# Device floating-point dtype for the solver/compute path.
FP = jnp.float32

# Smallest safe additive guard: representable (normal) in f32, negligible
# against any quantity it guards in either precision.
TINY = 1e-30
