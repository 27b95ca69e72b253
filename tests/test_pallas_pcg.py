"""Parity of the fused block-PCG Pallas kernel against pcg_flex.

Runs in interpret mode on the CPU test mesh; the real-chip speed claim
lives in bench.py (bigN phase)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_deformable import make_problem
from triangulation_in_deformable_scenes_tpu.models import block_system as bs
from triangulation_in_deformable_scenes_tpu.models import deformable
from triangulation_in_deformable_scenes_tpu.ops import pallas_pcg


def test_fused_pcg_matches_pcg_flex():
    data, state0, hyper, _ = make_problem(n_side=6)
    sys_ = bs.build_block_system("KB8", data, hyper, state0)
    g = bs.flat_gradient(sys_)
    lam = 1e-4 * float(jnp.max(bs.diag_of(sys_)))

    mv = lambda v: bs.block_matvec(sys_, data.nbr, v, lam)
    x_ref = bs.pcg_flex(mv, -g, bs.block_jacobi_apply(sys_, lam), iters=64, rtol=1e-6)
    x_out = pallas_pcg.pcg_block_system(
        sys_, data.nbr, -g, lam, iters=64, rtol=1e-6, interpret=True
    )
    # Both solve to rtol 1e-6; compare against each other at solver scale.
    scale = float(jnp.max(jnp.abs(x_ref))) or 1.0
    assert float(jnp.max(jnp.abs(x_out - x_ref))) / scale < 1e-3
    # And both actually solve the system.
    r = mv(x_out) + g
    assert float(jnp.linalg.norm(r)) <= 1e-4 * float(jnp.linalg.norm(g))


def test_fused_pcg_respects_iteration_cap():
    data, state0, hyper, _ = make_problem(n_side=5)
    sys_ = bs.build_block_system("KB8", data, hyper, state0)
    g = bs.flat_gradient(sys_)
    lam = 1e-4 * float(jnp.max(bs.diag_of(sys_)))
    # With a loose tolerance the early exit must engage: the solve from a
    # tight tolerance differs measurably.
    x_loose = pallas_pcg.pcg_block_system(
        sys_, data.nbr, -g, lam, iters=64, rtol=0.5, interpret=True
    )
    x_tight = pallas_pcg.pcg_block_system(
        sys_, data.nbr, -g, lam, iters=64, rtol=1e-6, interpret=True
    )
    assert float(jnp.max(jnp.abs(x_loose - x_tight))) > 0.0
