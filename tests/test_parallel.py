"""Distributed solve path: dense-vs-CG equivalence and 8-device sharding.

The conftest forces an 8-device virtual CPU platform, so these tests exercise
real XLA partitioning (all-gathers for the ARAP neighbor reads, psums for the
tangent reductions) without TPU hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_deformable import make_problem
from triangulation_in_deformable_scenes_tpu.models import deformable
from triangulation_in_deformable_scenes_tpu.parallel import dist


def test_matrix_free_matches_dense_solver():
    """CG path and dense Cholesky path must land on equivalent states."""
    data, state0, hyper, (p1_gt, *_rest) = make_problem(n_side=4)
    res_dense = deformable.solve_pair("KB8", data, hyper, state0, n_iterations=10)
    res_cg = dist.solve_pair_distributed(
        "KB8", data, hyper, state0, n_iterations=10, cg_iters=120
    )
    assert float(res_cg.cost) <= float(res_cg.initial_cost) * 0.5
    # Both reach comparable cost (CG is inexact; allow slack).
    assert float(res_cg.cost) < float(res_dense.cost) * 3.0 + 1e-9
    # And comparable point positions.
    d = np.linalg.norm(np.asarray(res_cg.state.p1) - np.asarray(res_dense.state.p1), axis=-1)
    scene = np.linalg.norm(np.asarray(state0.p1), axis=-1).mean()
    assert d.mean() < 0.05 * scene


@pytest.mark.slow
def test_hessian_diag_matches_dense():
    data, state0, hyper, _ = make_problem(n_side=4)
    H, _ = deformable.build_system("KB8", data, hyper, state0)
    diag = deformable.assemble_diag("KB8", data, hyper, state0)
    np.testing.assert_allclose(np.asarray(diag), np.asarray(jnp.diag(H)), rtol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_sharded_solve_runs_and_matches_replicated():
    data, state0, hyper, _ = make_problem(n_side=4)  # N=16, divisible by 8
    mesh = dist.make_mesh(jax.devices()[:8])
    sdata, sstate = dist.shard_pair(mesh, data, state0)
    # Per-point leaves really are sharded across the mesh.
    assert len(sdata.kp1.sharding.device_set) == 8
    res_sharded = dist.solve_pair_distributed(
        "KB8", sdata, hyper, sstate, n_iterations=5, cg_iters=60
    )
    res_local = dist.solve_pair_distributed(
        "KB8", data, hyper, state0, n_iterations=5, cg_iters=60
    )
    assert np.isfinite(float(res_sharded.cost))
    # Partitioned reductions change floating-point summation order; the
    # damping accept/reject branches amplify that over iterations, so the
    # comparison is approximate (single-step agreement is checked below).
    np.testing.assert_allclose(
        np.asarray(res_sharded.state.p1), np.asarray(res_local.state.p1), rtol=5e-2, atol=1e-5
    )
    np.testing.assert_allclose(float(res_sharded.cost), float(res_local.cost), rtol=0.2)

    # One LM step (before branch divergence can compound) agrees tightly.
    one_sharded = dist.solve_pair_distributed(
        "KB8", sdata, hyper, sstate, n_iterations=1, cg_iters=60
    )
    one_local = dist.solve_pair_distributed(
        "KB8", data, hyper, state0, n_iterations=1, cg_iters=60
    )
    np.testing.assert_allclose(
        np.asarray(one_sharded.state.p1), np.asarray(one_local.state.p1), rtol=5e-3, atol=1e-4
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_pair_sharded_serving_matches_unsharded():
    """Data-parallel serving: a batch of 8 pairs sharded one-per-device must
    reproduce the unsharded batched solve up to partition-dependent fusion
    rounding (no cross-pair math)."""
    problems = [make_problem(n_side=4, seed=s) for s in range(8)]
    datas = [p[0] for p in problems]
    states = [p[1] for p in problems]
    hyper = problems[0][2]
    bd = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *datas)
    bs = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)

    mesh = dist.make_serving_mesh(jax.devices()[:8])
    sd, ss = dist.shard_pairs(mesh, bd, bs)
    assert len(sd.kp1.sharding.device_set) == 8

    # One LM iteration (before accept/reject branches can diverge on
    # partition-dependent fusion rounding) agrees tightly.
    one_sharded = deformable.solve_pairs("KB8", sd, hyper, ss, n_iterations=1)
    one_local = deformable.solve_pairs("KB8", bd, hyper, bs, n_iterations=1)
    np.testing.assert_allclose(
        np.asarray(one_sharded.state.p1), np.asarray(one_local.state.p1), rtol=1e-3, atol=1e-6
    )

    # Multi-iteration comparison is loose: a single flipped LM trial
    # amplifies rounding differences well past any tight tolerance (same
    # pattern as test_sharded_solve_runs_and_matches_replicated above).
    res_sharded = deformable.solve_pairs("KB8", sd, hyper, ss, n_iterations=5)
    res_local = deformable.solve_pairs("KB8", bd, hyper, bs, n_iterations=5)
    np.testing.assert_allclose(
        np.asarray(res_sharded.state.p1), np.asarray(res_local.state.p1), rtol=5e-2, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(res_sharded.cost), np.asarray(res_local.cost), rtol=0.2
    )
