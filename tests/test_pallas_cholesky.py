"""Parity of the fused damped-Cholesky Pallas kernel (interpret mode on CPU).

The kernel is a committed negative result for speed (see the module
docstring: XLA's factorization chain wins by ~20% at the framework's dense
sizes), but its numerics are pinned here so the benchmark comparison stays
honest and the kernel stays runnable.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from triangulation_in_deformable_scenes_tpu.ops.lm import solve_damped_cholesky
from triangulation_in_deformable_scenes_tpu.ops.pallas_cholesky import (
    damped_solve_pallas,
)


@pytest.mark.parametrize("dim", [300, 728])
def test_damped_solve_matches_xla(dim):
    rng = np.random.default_rng(0)
    A = rng.normal(size=(dim, dim)).astype(np.float32)
    H = A @ A.T + dim * np.eye(dim, dtype=np.float32)
    # Wildly varying diagonal scales: the equilibration path must engage.
    d = 10.0 ** rng.uniform(-3, 5, size=dim).astype(np.float32)
    H = H * d[:, None] * d[None, :]
    g = (rng.normal(size=dim) * d).astype(np.float32)
    lam = float(H.diagonal().max()) * 1e-6

    ref = solve_damped_cholesky(jnp.asarray(H), jnp.asarray(g), lam)
    out = damped_solve_pallas(jnp.asarray(H), jnp.asarray(g), lam, interpret=True)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(out - ref))) / scale < 1e-5
