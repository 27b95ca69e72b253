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

Precision: the device compute path is f32 (TPUs have no f64 hardware; see
``precision.py`` for the policy and the equilibrated/refined linear solves
that make f32 sufficient). Host-side prep and metrics stay numpy f64.
Set ``TIDS_X64=1`` before import to re-enable global f64 for debugging.
"""

import os as _os

import jax as _jax

if _os.environ.get("TIDS_X64"):
    _jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the deformable solver's jits take tens of
# seconds to compile on a tunneled TPU; caching amortizes that across
# processes (sweeps, benches, repeated CLI runs). Override the location with
# TIDS_JAX_CACHE, or set it empty to disable.
_cache_dir = _os.environ.get(
    "TIDS_JAX_CACHE", _os.path.join(_os.path.expanduser("~"), ".cache", "tids_jax_cache")
)
if _cache_dir:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

__version__ = "0.1.0"
