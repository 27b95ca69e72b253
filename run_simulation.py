#!/usr/bin/env python3
"""Simulation CLI: synthetic two-camera deformable triangulation + refinement.

Equivalent of the reference's ``Execution/simulation.cc`` binary: loads a
config YAML (reference format) and the ground-truth point-pair csvs, runs the
full pipeline, writes the Experiment.txt metric journal, and prints timing.

Usage:
  python run_simulation.py [--config PATH] [--original PATH] [--moved PATH]
                           [--journal PATH] [--seed N] [--echo]
"""

import argparse
import time


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="/root/reference/Data/Simulation.yaml")
    ap.add_argument("--original", default="/root/reference/Data/original_points.csv")
    ap.add_argument("--moved", default="/root/reference/Data/moved_points.csv")
    ap.add_argument("--journal", default=None, help="Experiment.txt output path")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--echo", action="store_true", help="echo journal blocks to stdout")
    ap.add_argument("--mesh-backend", default="auto", choices=["auto", "native", "scipy"])
    args = ap.parse_args()

    from triangulation_in_deformable_scenes_tpu.config import load_config
    from triangulation_in_deformable_scenes_tpu.pipeline.simulation import SimulationPipeline

    cfg = load_config(args.config)
    pipe = SimulationPipeline(cfg, seed=args.seed, mesh_backend=args.mesh_backend)

    t0 = time.time()
    res = pipe.run(args.original, args.moved, journal_path=args.journal, echo=args.echo)
    dt = time.time() - t0

    print(f"nMatches: {res.n_matches}  nMapPoints: {res.n_map_points}  parallax: {res.parallax_deg:.3f} deg")
    print(
        f"avg 3D error (mm): {res.initial.av_error*1000:.4f} -> {res.final.av_error*1000:.4f}"
        f"   RMSE (mm): {res.initial.rmse*1000:.4f} -> {res.final.rmse*1000:.4f}"
    )
    print(
        f"pixel sigma C1/C2: {res.initial_pix.desvc1:.4f}/{res.initial_pix.desvc2:.4f}"
        f" -> {res.final_pix.desvc1:.4f}/{res.final_pix.desvc2:.4f}"
    )
    print(f"weights: rep={res.weights[0]:g} global={res.weights[1]:g} arap={res.weights[2]:g}")
    print(f"[END] Seconds: {dt:.4f}")
    print(f"[END] Number of MapPoints: {res.n_map_points}")


if __name__ == "__main__":
    main()
