"""Experiment-harness tests: data generation, sweep layout, aggregation."""

import dataclasses
import os

import numpy as np
import pytest

from triangulation_in_deformable_scenes_tpu.config import load_config
from triangulation_in_deformable_scenes_tpu.harness import (
    SweepCondition,
    generate_points,
    run_sweep,
    write_condition_csv,
)
from triangulation_in_deformable_scenes_tpu.harness.sweep import movement_dirname

REF = "/root/reference/Data"


def test_generate_points_planar_rigid():
    rng = np.random.default_rng(0)
    orig, moved = generate_points(
        num_points=200, rigid_movement=0.0025, gaussian_movement=0.0, movement_type="Planar", rng=rng
    )
    mv = np.linalg.norm(orig - moved, axis=-1)
    np.testing.assert_allclose(mv, 0.0025, rtol=1e-9)  # pure rigid: constant offset
    # Scene sits around the configured depth.
    assert abs(orig[:, 2].mean() - 0.2) < 0.02


def test_generate_points_gradual_varies_with_x():
    rng = np.random.default_rng(1)
    orig, moved = generate_points(
        num_points=500, rigid_movement=0.0025, gaussian_movement=0.0,
        movement_type="Gradual", angle_x=0, angle_z=0, rng=rng,
    )
    mv = np.linalg.norm(orig - moved, axis=-1)
    assert mv.std() > 0.0005  # movement magnitude varies across the cloud


def test_movement_dirnames():
    assert movement_dirname(0.0, 2.5) == "2_5 mm rigid"
    assert movement_dirname(10.0, 0.0) == "10 mm gaussian"
    assert movement_dirname(10.0, 10.0) == "10 mm gaussian + rigid"


def test_result_dir_layout():
    cond = SweepCondition("ARAP", "TwoPoints", 80, "Planar", 4, 1)
    assert cond.result_dir == os.path.join(
        "ARAP", "TwoPoints", "80cm Depth", "Planar", "10 mm gaussian", "1"
    )


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data not mounted")
@pytest.mark.slow
def test_sweep_runs_and_aggregates(tmp_path):
    base = load_config(os.path.join(REF, "Simulation.yaml"))
    base = dataclasses.replace(
        base, n_optimizations=1, n_opt_iterations=8, nlopt_n_optimizations=2
    )
    conds = [SweepCondition("ARAP", "InRays", 20, "Planar", 2, 2)]
    results = run_sweep(
        base, conds, out_root=str(tmp_path), database_root=os.path.join(REF, "SinteticDataBase")
    )
    assert len(results) == 1
    jp = tmp_path / conds[0].result_dir / "Experiment.txt"
    assert jp.exists()
    csv_path = write_condition_csv(
        str(tmp_path / "errors.csv"), str(tmp_path), ["ARAP"], ["InRays"], shapes=["Planar"],
        depth_cm=20, experiment=2,
    )
    text = open(csv_path).read()
    assert "ARAP-InRays Initial (mm)" in text
    assert '"2,50"' in text  # movement column, es_ES commas
