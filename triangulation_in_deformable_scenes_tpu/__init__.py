"""TPU-native framework for 3D reconstruction of non-rigid (deforming) scenes.

Capability-parity rebuild of ``luicalrob/Triangulation-in-Deformable-Scenes``
(a C++17/g2o research system), re-designed from scratch for TPU:

- dense, fixed-shape, batched geometry kernels under ``jax.jit`` (ops/)
- a batched Levenberg-Marquardt deformable refinement replacing g2o's sparse
  solver (models/), with ARAP smoothness over a Delaunay mesh, optimizable
  per-keyframe depth scales and a global SE3 alignment
- landmark-sharded multi-chip execution via ``jax.sharding`` (parallel/)
- host-side orchestration, dataset loaders, metrics and experiment journals
  with the reference's file formats (pipeline/, datasets/, utils/)

The reference implementation is cited throughout as ``file:line`` under the
upstream repo (e.g. ``Modules/Utils/Geometry.cc:103``); no code is ported --
the citations document behavioral parity only.

Double precision: the reference optimizer runs in f64 (g2o). We enable x64 so
the refinement can match its numerics; hot image-front-end kernels explicitly
request f32/bf16. Set ``TIDS_NO_X64=1`` before import to opt out.
"""

import os as _os

if not _os.environ.get("TIDS_NO_X64"):
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
