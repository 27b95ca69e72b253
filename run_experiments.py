#!/usr/bin/env python3
"""Synthetic experiment sweep CLI.

Equivalent of ``Data/Scripts/synthetic/run_synthetic_experiments.py`` +
``automated_loop_to_csv.py``: runs the model/triangulation/condition matrix
against the reference's committed fixtures (or generated ones) and writes
both the per-condition Experiment.txt journals and the consolidated CSV
comparison table.

Example:
  python run_experiments.py --model ARAP_depth_3mm --triangulation InRays \
      --depth 20 --shape Planar --types 2 5 --experiment 2 --out /tmp/exps
"""

import argparse
import dataclasses
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="synthetic", choices=["synthetic", "drunkard"],
                    help="synthetic condition matrix or the Drunkard real-image sweep")
    ap.add_argument("--pair", nargs="+", default=None,
                    help="drunkard: curated frame pairs (default: all four)")
    ap.add_argument("--level", nargs="+", default=None,
                    help="drunkard: deformation levels (level0..level3)")
    ap.add_argument("--data-root", default=None,
                    help="drunkard: dataset root with <res>/<scene>/<level>/ dirs")
    ap.add_argument("--model", nargs="+", default=["ARAP"],
                    help="model families (see deformable.MODELS)")
    ap.add_argument("--triangulation", nargs="+", default=["InRays"],
                    choices=["InRays", "TwoPoints", "FarPoints"])
    ap.add_argument("--depth", nargs="+", type=int, default=[20], choices=[20, 80, 150])
    ap.add_argument("--shape", nargs="+", default=["Planar"], choices=["Planar", "Gradual"])
    ap.add_argument("--types", nargs="+", type=int, default=None, help="experiment types 1-6")
    ap.add_argument("--experiment", nargs="+", type=int, default=[2], help="repetition index")
    ap.add_argument("--config", default="/root/reference/Data/Simulation.yaml")
    ap.add_argument("--database", default="/root/reference/Data/SinteticDataBase",
                    help="fixture database root ('' to generate fixtures)")
    ap.add_argument("--out", default="./Experiments")
    ap.add_argument("--csv", default=None, help="write consolidated CSV here")
    ap.add_argument("--compare", default=None,
                    help="write a cell-by-cell comparison CSV vs the reference's committed traces here")
    ap.add_argument("--compare-root", default="/root/reference/Data/Experiments",
                    help="root of the reference's committed Experiments tree")
    ap.add_argument("--rounds", type=int, default=5, help="outer optimization rounds")
    ap.add_argument("--nlopt-evals", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from triangulation_in_deformable_scenes_tpu.config import load_config
    from triangulation_in_deformable_scenes_tpu.harness import (
        SweepCondition,
        run_sweep,
        write_condition_csv,
    )
    from triangulation_in_deformable_scenes_tpu.harness.sweep import SHAPE_EXPERIMENT_TYPES

    if args.dataset == "drunkard":
        from triangulation_in_deformable_scenes_tpu.harness import real_sweep

        cfg_path = args.config
        if cfg_path == ap.get_default("config"):
            cfg_path = "/root/reference/Data/Drunkard.yaml"
        base = load_config(cfg_path)
        base = dataclasses.replace(
            base,
            n_optimizations=args.rounds,
            nlopt_n_optimizations=args.nlopt_evals,
        )
        if not args.data_root:
            ap.error("--dataset drunkard requires --data-root")
        for pair in args.pair or real_sweep.PAIRS:
            real_sweep.run_real_sweep(
                base,
                args.data_root,
                pair,
                out_root=args.out,
                levels=args.level or real_sweep.LEVELS,
                experiments=args.experiment,
                on_result=lambda d, out: print(
                    f"[{d}] {'ok' if out is not None else 'no pair triangulated'}"
                ),
            )
        return

    base = load_config(args.config)
    base = dataclasses.replace(
        base,
        n_optimizations=args.rounds,
        nlopt_n_optimizations=args.nlopt_evals,
    )

    conditions = []
    for model in args.model:
        for tri in args.triangulation:
            for depth in args.depth:
                for shape in args.shape:
                    types = args.types or SHAPE_EXPERIMENT_TYPES[shape]
                    for etype in types:
                        for rep in args.experiment:
                            conditions.append(
                                SweepCondition(model, tri, depth, shape, etype, rep)
                            )

    def progress(cond, res):
        print(
            f"[{cond.model}/{cond.triangulation}/{cond.depth_cm}cm/{cond.shape}"
            f"/type{cond.experiment_type}/{cond.experiment}] "
            f"err {res.initial.av_error*1000:.2f} -> {res.final.av_error*1000:.2f} mm"
        )

    run_sweep(
        base,
        conditions,
        out_root=args.out,
        database_root=args.database or None,
        seed=args.seed,
        progress=progress,
    )

    if args.csv:
        path = write_condition_csv(
            args.csv,
            args.out,
            models=args.model,
            triangulations=args.triangulation,
            shapes=args.shape,
            depth_cm=args.depth[0],
            experiment=args.experiment[0],
        )
        print(f"wrote {path}")

    if args.compare:
        from triangulation_in_deformable_scenes_tpu.harness import write_comparison_csv

        path, n_cells, n_wins = write_comparison_csv(
            args.compare,
            args.out,
            args.compare_root,
            models=args.model,
            triangulations=args.triangulation,
            shapes=args.shape,
            depth_cms=args.depth,
            experiment_types=args.types or [1, 2, 3, 4, 5, 6],
            experiments=args.experiment,
        )
        print(f"wrote {path}: {n_wins}/{n_cells} cells beat the committed reference finals")


if __name__ == "__main__":
    main()
