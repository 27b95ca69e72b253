#!/usr/bin/env python3
"""Benchmark: full simulation-pipeline accuracy + inner-solver throughput.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Primary metric: final average 3D error (mm) on the reference's shipped
120-point fixture (``Data/{original,moved}_points.csv`` -- the 20cm-depth
"Gradual 10mm gaussian + 10mm rigid" condition, avg movement 20.9mm) with the
shipped ``Simulation.yaml`` (NRSLAM + FarPoints, DepthError 3mm).

Baseline: the reference's committed sweep result for the matching condition
and model, ``Data/Excels/Synthetic/Depth uncertainty/Errors 3.csv`` row
"20,90 Gradual 10 10", column ARAP_depth_3mm-FarPoints Final = 28.85 mm.
``vs_baseline`` = baseline_error / our_error (>1 means more accurate than the
reference). The outer-loop budget matches the sweep that produced those
numbers (5 rounds, 8 weight-search evaluations -- the reference sweeps'
``Test.yaml``) rather than the shipped Simulation.yaml's 20x30, keeping the
comparison like-for-like and the bench wall time bounded. Extra keys report
wall time and LM-iteration throughput.
"""

import dataclasses
import json
import os
import time

REF_DATA = "/root/reference/Data"
BASELINE_FINAL_MM = 28.85  # ARAP_depth_3mm-FarPoints, 20.90mm Gradual row


def main():
    import numpy as np

    from triangulation_in_deformable_scenes_tpu.config import load_config
    from triangulation_in_deformable_scenes_tpu.pipeline.simulation import SimulationPipeline

    cfg = load_config(os.path.join(REF_DATA, "Simulation.yaml"))
    cfg = dataclasses.replace(cfg, n_optimizations=5, nlopt_n_optimizations=8)
    pipe = SimulationPipeline(cfg, seed=0)

    t0 = time.time()
    res = pipe.run(
        os.path.join(REF_DATA, "original_points.csv"),
        os.path.join(REF_DATA, "moved_points.csv"),
        journal_path="/tmp/bench_experiment.txt",
    )
    wall = time.time() - t0

    # Inner-solver throughput: steady-state LM iterations/sec on this problem.
    from triangulation_in_deformable_scenes_tpu.models import deformable
    import jax.numpy as jnp

    data = deformable.make_pair_data(
        kp1=np.zeros((res.n_matches, 2)),
        kp2=np.zeros((res.n_matches, 2)),
        depth1=np.ones(res.n_matches),
        depth2=np.ones(res.n_matches),
        valid=res.valid,
        cam_params=cfg.kb8_params,
        T1w=(np.eye(3), np.zeros(3)),
        T2w=(np.eye(3), np.zeros(3)),
        p1=np.asarray(res.state.p1),
        p2=np.asarray(res.state.p2),
    )
    hyper = deformable.Hyper(
        rep_w=jnp.asarray(1.0),
        arap_w=jnp.asarray(float(res.weights[2])),
        depth_sigma=jnp.asarray(0.003),
        global_w=jnp.asarray(50.0),
    )
    n_iters = 25
    solve = lambda: deformable.solve_pair("KB8", data, hyper, res.state, n_iters)
    solve().cost.block_until_ready()  # compile
    t1 = time.time()
    reps = 3
    for _ in range(reps):
        solve().cost.block_until_ready()
    iters_per_sec = n_iters * reps / (time.time() - t1)

    value = res.final.av_error * 1000.0
    print(
        json.dumps(
            {
                "metric": "sim_final_avg_3d_error",
                "value": round(value, 4),
                "unit": "mm",
                "vs_baseline": round(BASELINE_FINAL_MM / value, 4),
                "initial_avg_3d_error_mm": round(res.initial.av_error * 1000.0, 4),
                "final_rmse_mm": round(res.final.rmse * 1000.0, 4),
                "pixel_sigma_final": [round(res.final_pix.desvc1, 4), round(res.final_pix.desvc2, 4)],
                "pipeline_wall_s": round(wall, 2),
                "lm_iters_per_sec": round(iters_per_sec, 2),
                "n_map_points": res.n_map_points,
            }
        )
    )


if __name__ == "__main__":
    main()
