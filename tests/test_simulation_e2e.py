"""End-to-end simulation pipeline tests against the reference's fixtures.

Regression anchors come from the reference's committed sweep results
(``Data/Excels/Synthetic/Depth uncertainty/Errors 3.csv``): on the 20cm-depth
small-rigid fixtures the refinement improves (or at least does not degrade)
the 3D error; large gaussian deformations are the reference's own failure
mode (its committed finals reach 50-100mm there) and are not asserted tight.
"""

import dataclasses
import os

import numpy as np
import pytest

from triangulation_in_deformable_scenes_tpu.config import load_config
from triangulation_in_deformable_scenes_tpu.pipeline.simulation import SimulationPipeline
from triangulation_in_deformable_scenes_tpu.utils.journal import parse_journal

REF = "/root/reference/Data"
FIXTURE = os.path.join(REF, "SinteticDataBase/20cm Depth/Planar/2_5 mm rigid/2")

pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference data not mounted")


def fast_cfg(**overrides):
    cfg = load_config(os.path.join(REF, "Simulation.yaml"))
    # Sweep-era conditions (run_synthetic_experiments.py:88-93 camera poses;
    # ARAP_depth_1mm model; shortened loops for test speed).
    defaults = dict(
        c1_pose=(0.0, 0.0, 0.0),
        c2_pose=(0.14, 0.01, 0.06),
        triangulation_location="inRays",
        sim_depth_weight=1.0,
        n_optimizations=2,
        n_opt_iterations=15,
        nlopt_n_optimizations=5,
        nlopt_rel_tolerance=1.5e-2,
        nlopt_abs_tolerance=1.5e-2,
    )
    defaults.update(overrides)
    return dataclasses.replace(cfg, **defaults)


@pytest.mark.slow
def test_small_rigid_fixture_improves(tmp_path):
    cfg = fast_cfg()
    pipe = SimulationPipeline(cfg, seed=0)
    res = pipe.run(
        os.path.join(FIXTURE, "original_points.csv"),
        os.path.join(FIXTURE, "moved_points.csv"),
        journal_path=str(tmp_path / "exp.txt"),
    )
    assert res.n_matches == 120
    assert int(res.valid.sum()) == 120  # all matches pass gates on this fixture
    # Initial triangulation parity with the committed sweep (~1.2-1.5mm).
    assert res.initial.av_error * 1000 < 2.0
    # Av. movement is the fixture's nominal 2.5mm.
    np.testing.assert_allclose(res.initial.av_movement * 1000, 2.5, rtol=0.02)
    # Refinement must not degrade the 3D error on the small-rigid regime.
    assert res.final.av_error <= res.initial.av_error * 1.15


@pytest.mark.slow
def test_journal_format_and_blocks(tmp_path):
    cfg = fast_cfg(n_optimizations=2)
    path = str(tmp_path / "exp.txt")
    SimulationPipeline(cfg, seed=0).run(
        os.path.join(FIXTURE, "original_points.csv"),
        os.path.join(FIXTURE, "moved_points.csv"),
        journal_path=path,
    )
    text = open(path).read()
    # es_ES decimal commas, reference field names, block structure.
    assert "INITIAL MEASUREMENTS: \n" in text
    assert "FINAL MEASUREMENTS: \n" in text
    assert "C1 standard desv: " in text
    assert "gloablTError: " in text  # reference's typo, kept for parser parity
    assert "Av. movement: 2,5" in text
    blocks = parse_journal(path)
    assert "INITIAL" in blocks and "FINAL" in blocks
    assert blocks["HEADER"]["nMatches"] == 120
    assert blocks["INITIAL"]["RMSE"] > 0
    # The parser round-trips the reference's own committed journals too.
    ref_blocks = parse_journal(os.path.join(REF, "Experiment.txt"))
    assert abs(ref_blocks["INITIAL"]["RMSE"] - 4.00558) < 1e-4
    assert abs(ref_blocks["FINAL"]["Av. error"] - 1.11002) < 1e-4


@pytest.mark.slow
def test_discrepancy_principle_drives_sigma_toward_noise(tmp_path):
    """The outer weight search scores by log^2(sigma_px): the residual pixel
    deviation should end in the vicinity of the injected 1px noise rather
    than collapse to overfit-zero (nloptOptimization.cc:26-31)."""
    cfg = fast_cfg(n_optimizations=3, nlopt_n_optimizations=8)
    res = SimulationPipeline(cfg, seed=0).run(
        os.path.join(FIXTURE, "original_points.csv"),
        os.path.join(FIXTURE, "moved_points.csv"),
        journal_path=str(tmp_path / "exp.txt"),
    )
    assert 0.05 < res.final_pix.desvc1 < 3.0
    assert 0.05 < res.final_pix.desvc2 < 3.0
