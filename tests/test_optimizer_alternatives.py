"""Alternative optimizer selections: open3DArap deformation + eigen weights."""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_arap import make_surface
from triangulation_in_deformable_scenes_tpu.config import load_config
from triangulation_in_deformable_scenes_tpu.ops import arap, mesh
from triangulation_in_deformable_scenes_tpu.pipeline.simulation import SimulationPipeline

REF = "/root/reference/Data"
FIXTURE = os.path.join(REF, "SinteticDataBase/20cm Depth/Planar/2_5 mm rigid/2")


def test_arap_deform_satisfies_constraints_and_stays_rigid():
    p = make_surface(n_side=6, seed=2)
    ctx = mesh.build_mesh_context(p)
    # Pin two corners, drag one of them slightly.
    cidx = jnp.asarray([0, 5])
    cpos = jnp.asarray(np.stack([p[0] + np.array([0.004, 0, 0]), p[5]]))
    out = arap.arap_deform(
        jnp.asarray(p), jnp.asarray(ctx.nbr), jnp.asarray(ctx.nbr_mask), jnp.asarray(ctx.weights),
        cidx, cpos, iters=30,
    )
    out = np.asarray(out)
    np.testing.assert_allclose(out[0], np.asarray(cpos[0]), atol=2e-5)
    np.testing.assert_allclose(out[5], np.asarray(cpos[5]), atol=2e-5)
    # Edge lengths approximately preserved (as-rigid-as-possible).
    j = np.maximum(ctx.nbr, 0)
    l_rest = np.linalg.norm(p[:, None, :] - p[j], axis=-1)
    l_def = np.linalg.norm(out[:, None, :] - out[j], axis=-1)
    rel = np.abs(l_def - l_rest)[ctx.nbr_mask] / l_rest[ctx.nbr_mask]
    assert rel.mean() < 0.05


def test_arap_deform_identity_without_drag():
    p = make_surface(n_side=5, seed=3)
    ctx = mesh.build_mesh_context(p)
    out = arap.arap_deform(
        jnp.asarray(p), jnp.asarray(ctx.nbr), jnp.asarray(ctx.nbr_mask), jnp.asarray(ctx.weights),
        jnp.asarray([0]), jnp.asarray(p[:1]), iters=10,
    )
    np.testing.assert_allclose(np.asarray(out), p, atol=2e-5)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data not mounted")
@pytest.mark.parametrize("selection,wsel", [("open3DArap", "nlopt"), ("twoOptimizations", "eigen")])
@pytest.mark.slow
def test_pipeline_alternative_selections(selection, wsel, tmp_path):
    cfg = load_config(os.path.join(REF, "Simulation.yaml"))
    cfg = dataclasses.replace(
        cfg,
        c1_pose=(0.0, 0.0, 0.0),
        c2_pose=(0.14, 0.01, 0.06),
        triangulation_location="inRays",
        sim_depth_weight=3.0,
        opt_selection=selection,
        opt_weights_selection=wsel,
        n_optimizations=1,
        n_opt_iterations=8,
        nlopt_n_optimizations=4,
    )
    res = SimulationPipeline(cfg, seed=0).run(
        os.path.join(FIXTURE, "original_points.csv"),
        os.path.join(FIXTURE, "moved_points.csv"),
        journal_path=str(tmp_path / "exp.txt"),
    )
    assert np.isfinite(res.final.rmse)
    assert res.final.rmse < 1.0  # stays in a sane range (meters)
