"""Deformation-model family tests (the reference's experiment sweep models)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_deformable import make_problem, _rep_rmse
from triangulation_in_deformable_scenes_tpu.models import deformable


def solve(model_name, n_iterations=15, **mp_kwargs):
    data, state0, hyper, gt = make_problem(**mp_kwargs)
    spec = deformable.MODELS[model_name]
    res = deformable.solve_pair("KB8", data, hyper, state0, n_iterations, spec)
    return data, state0, hyper, gt, res


@pytest.mark.parametrize(
    "model",
    ["ARAP", "ARAP_NoGlobal", "ARAP_OneSet", "ARAP_not_scaled_depth",
     "ARAP_depth_onlyTriang", "Elastic", "HyperElasticOdgen"],
)
def test_all_models_descend(model):
    data, state0, hyper, gt, res = solve(model)
    assert np.isfinite(float(res.cost))
    assert float(res.cost) <= float(res.initial_cost)
    assert int(res.n_accepted) >= 1


def test_one_set_freezes_first_set():
    """ARAP_OneSet semantics (re-derived r5 from the committed traces, see
    ModelSpec): the FIRST point set never moves -- the committed OneSet
    journals hold C1's reprojection std byte-for-byte constant across every
    optimization iteration -- while the second set optimizes normally."""
    data, state0, hyper, gt, res = solve("ARAP_OneSet")
    np.testing.assert_array_equal(np.asarray(res.state.p1), np.asarray(state0.p1))
    assert float(np.abs(np.asarray(res.state.p2) - np.asarray(state0.p2)).max()) > 1e-6
    assert float(res.cost) < float(res.initial_cost)


def test_no_global_ignores_alignment():
    """Without the global term the ARAP energy is invariant to the global
    SE3 estimate, so the alignment vertex receives no update."""
    data, state0, hyper, gt, res = solve("ARAP_NoGlobal")
    np.testing.assert_allclose(np.asarray(res.state.Rg), np.eye(3), atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.state.tg), 0.0, atol=1e-9)


def test_fixed_depth_scale_does_not_move():
    data, state0, hyper, gt, res = solve("ARAP_not_scaled_depth")
    assert float(res.state.s1) == pytest.approx(float(state0.s1))
    assert float(res.state.s2) == pytest.approx(float(state0.s2))


def test_depth_only_triang_ignores_depth_residuals():
    """With depth edges off, corrupting the measured depths changes nothing."""
    data, state0, hyper, gt = make_problem()
    spec = deformable.MODELS["ARAP_depth_onlyTriang"]
    res_a = deformable.solve_pair("KB8", data, hyper, state0, 10, spec)
    data_bad = data._replace(depth1=data.depth1 * 50.0)
    res_b = deformable.solve_pair("KB8", data_bad, hyper, state0, 10, spec)
    np.testing.assert_allclose(
        np.asarray(res_a.state.p1), np.asarray(res_b.state.p1), atol=1e-12
    )


def test_depth_sigma_model_names():
    assert deformable.model_depth_sigma("ARAP_depth_1mm") == pytest.approx(0.001)
    assert deformable.model_depth_sigma("ARAP_depth_8mm") == pytest.approx(0.008)
    assert deformable.model_depth_sigma("ARAP") is None


def test_elastic_zero_for_isometry():
    """The elastic energy vanishes for deformations preserving edge lengths
    (any rigid motion); the Ogden energy likewise at stretch 1."""
    data, state0, hyper, (p1_gt, p2_gt, *_r) = make_problem(point_noise=0.0)
    st = deformable.PairState(
        p1=jnp.asarray(p1_gt),
        p2=jnp.asarray(p1_gt + np.array([0.01, 0.0, 0.0])),  # translation
        s1=state0.s1,
        s2=state0.s2,
        Rg=jnp.eye(3),
        tg=jnp.zeros(3),
    )
    for name in ("Elastic", "HyperElasticOdgen"):
        spec = deformable.MODELS[name]._replace(use_global=False)
        E = deformable._arap_energies(data, st, spec, None)
        np.testing.assert_allclose(np.asarray(E), 0.0, atol=1e-12)
