#!/usr/bin/env python3
"""Full-committed-budget spot check (round 5, VERDICT item 8).

The 90-cell headline grid runs a 15x smaller outer budget than the
reference's committed sweeps (5 outer rounds x 8 NM evals vs 20 x 30).
This script re-runs 6 representative cells -- 2 rigid wins, 2 non-rigid
wins, 2 losses -- at the FULL committed 20 x 30 budget and records the
finals next to the 5x8 finals and the committed reference values, so the
win/loss pattern can be checked for budget artifacts (the monotone
acceptance rule in ``models/outer.py`` could in principle interact with
early stopping).
"""

import csv
import dataclasses
import os
import sys

CELLS = [
    # (tri, shape, etype, rep, label)
    ("InRays", "Planar", 2, 1, "rigid-win"),
    ("FarPoints", "Planar", 2, 1, "rigid-win"),
    ("InRays", "Gradual", 6, 1, "nonrigid-win"),
    ("TwoPoints", "Planar", 4, 2, "nonrigid-win"),
    ("InRays", "Planar", 5, 1, "loss"),
    ("TwoPoints", "Planar", 2, 1, "loss"),
]
MODEL = "ARAP_depth_3mm"


def main():
    from triangulation_in_deformable_scenes_tpu.config import load_config
    from triangulation_in_deformable_scenes_tpu.harness import SweepCondition, run_sweep
    from triangulation_in_deformable_scenes_tpu.utils.journal import parse_journal

    base = load_config("/root/reference/Data/Simulation.yaml")
    full = dataclasses.replace(base, n_optimizations=20, nlopt_n_optimizations=30)

    grid = {
        (r["Triangulation"], r["Shape"], str(r["Gaussian Mov"]), str(r["Rigid Mov"]), r["Experiment"]): r
        for r in csv.DictReader(open("results/grid_compare.csv"))
    }
    from triangulation_in_deformable_scenes_tpu.harness.sweep import EXPERIMENT_TYPES

    rows = []
    for tri, shape, etype, rep, label in CELLS:
        cond = SweepCondition(MODEL, tri, 20, shape, etype, rep)
        p = EXPERIMENT_TYPES[etype]
        key = (tri, shape, str(p["gaussian"]), str(p["rigid"]), str(rep))
        small = grid.get(key)
        ref_final = float(small["Ref Final (mm)"]) if small else float("nan")
        small_final = float(small["Ours Final (mm)"]) if small else float("nan")
        res = run_sweep(
            full, [cond], "/tmp/full_budget",
            database_root="/root/reference/Data/SinteticDataBase", seed=0,
        )
        f_mm = res[0][1].final.av_error * 1000.0
        win_small = int(small_final < ref_final)
        win_full = int(f_mm < ref_final)
        rows.append([
            MODEL, tri, shape, etype, rep, label, f"{ref_final:.3f}",
            f"{small_final:.3f}", f"{f_mm:.3f}", win_small, win_full,
            int(win_small == win_full),
        ])
        print(f"{cond.result_dir} [{label}]: 5x8 {small_final:.3f} -> 20x30 "
              f"{f_mm:.3f} (ref {ref_final:.3f})", flush=True)

    with open("results/full_budget_check.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([
            "Model", "Triangulation", "Shape", "Type", "Rep", "Label",
            "Ref Final (mm)", "Ours 5x8 (mm)", "Ours 20x30 (mm)",
            "Win 5x8", "Win 20x30", "Stable",
        ])
        w.writerows(rows)
    print("wrote results/full_budget_check.csv", flush=True)


if __name__ == "__main__":
    sys.exit(main())
