#!/usr/bin/env python3
"""Rigid-cell scatter study (round 5, VERDICT item 5).

The 6 grid cells the framework cedes to the reference are all pure-rigid
draws where both pipelines converge to ~1 mm finals; the r4 README claimed
(without evidence) the losses sit "within the per-draw scatter of the two
pipelines' independently simulated observation noise". This script
substantiates or refutes that: every ceded cell -- plus 3 winning rigid
cells as controls -- is re-run at 5 fresh observation-noise seeds, and the
per-seed final errors are written to ``results/rigid_scatter.csv`` next to
the committed reference final for that cell.

The reference's committed trace is ONE draw of its own noise generator
(``SLAM.cc:281-338``, default-seeded); if our per-seed scatter spans the
committed value, the cell outcome is draw luck, not a solver gap.
"""

import csv
import dataclasses
import os
import statistics
import sys

CELLS = [
    # (triangulation, shape, etype, rep, role)
    ("InRays", "Planar", 5, 1, "ceded"),
    ("InRays", "Planar", 5, 2, "ceded"),
    ("InRays", "Planar", 5, 3, "ceded"),
    ("TwoPoints", "Planar", 2, 1, "ceded"),
    ("TwoPoints", "Planar", 2, 2, "ceded"),
    ("TwoPoints", "Gradual", 2, 1, "ceded"),
    ("InRays", "Planar", 2, 1, "control-win"),
    ("TwoPoints", "Planar", 5, 1, "control-win"),
    ("FarPoints", "Planar", 2, 1, "control-win"),
]
MODEL = "ARAP_depth_3mm"
SEEDS = [1, 2, 3, 4, 5]


def main():
    from triangulation_in_deformable_scenes_tpu.config import load_config
    from triangulation_in_deformable_scenes_tpu.harness import SweepCondition, run_sweep
    from triangulation_in_deformable_scenes_tpu.utils.journal import parse_journal

    base = load_config("/root/reference/Data/Simulation.yaml")
    base = dataclasses.replace(base, n_optimizations=5, nlopt_n_optimizations=8)

    out_rows = []
    for tri, shape, etype, rep, role in CELLS:
        cond = SweepCondition(MODEL, tri, 20, shape, etype, rep)
        ref_journal = os.path.join(
            "/root/reference/Data/Experiments", cond.result_dir, "Experiment.txt"
        )
        blocks = parse_journal(ref_journal)
        ref_final = blocks["FINAL"]["Av. error"]
        finals = []
        for seed in SEEDS:
            res = run_sweep(
                base, [cond], f"/tmp/rigid_scatter/{seed}",
                database_root="/root/reference/Data/SinteticDataBase", seed=seed,
            )
            f_mm = res[0][1].final.av_error * 1000.0
            finals.append(f_mm)
            print(f"{cond.result_dir} seed={seed}: {f_mm:.3f} mm "
                  f"(ref committed {ref_final:.3f})", flush=True)
        mean = statistics.mean(finals)
        sd = statistics.stdev(finals)
        out_rows.append([
            MODEL, tri, shape, etype, rep, role, f"{ref_final:.3f}",
            *[f"{f:.3f}" for f in finals], f"{mean:.3f}", f"{sd:.3f}",
            f"{min(finals):.3f}", f"{max(finals):.3f}",
            int(min(finals) <= ref_final <= max(finals)),
        ])

    os.makedirs("results", exist_ok=True)
    with open("results/rigid_scatter.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([
            "Model", "Triangulation", "Shape", "Type", "Rep", "Role",
            "Ref Final (mm)", *[f"Seed{s} (mm)" for s in SEEDS],
            "Mean (mm)", "SD (mm)", "Min (mm)", "Max (mm)", "RefWithinRange",
        ])
        w.writerows(out_rows)
    print("wrote results/rigid_scatter.csv", flush=True)


if __name__ == "__main__":
    sys.exit(main())
