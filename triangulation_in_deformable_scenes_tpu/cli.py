"""Shared CLI driver for the image-sequence pipelines.

Mirrors the reference Execution mains' argument convention
(``Execution/drunkard.cc:11-53``): positional ``dataset_path`` plus optional
``start step end`` frame controls, with the per-dataset YAML config.
"""

from __future__ import annotations

import argparse
import os
import time

_DEFAULT_CONFIG = {
    "drunkard": "/root/reference/Data/Drunkard.yaml",
    "realcolon": "/root/reference/Data/Realcolon.yaml",
    "syncolon": "/root/reference/Data/Realcolon.yaml",
}

_TRAJECTORY_FILE = {
    "drunkard": "pose.txt",
    "realcolon": "trajectory.txt",
    "syncolon": "trajectory.txt",
}


def sequence_main(kind: str):
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", help="dataset directory")
    ap.add_argument("start", nargs="?", type=int, default=0)
    ap.add_argument("step", nargs="?", type=int, default=1)
    ap.add_argument("end", nargs="?", type=int, default=None)
    ap.add_argument("--config", default=_DEFAULT_CONFIG[kind])
    ap.add_argument("--trajectory", default=None, help="trajectory/pose file path")
    ap.add_argument("--journal", default=None)
    ap.add_argument("--mesh-backend", default="auto")
    args = ap.parse_args()

    import numpy as np

    from .config import load_config
    from .datasets import DrunkardLoader, RealcolonLoader, SyncolonLoader
    from .pipeline.sequence import SequencePipeline

    cfg = load_config(args.config)

    traj = args.trajectory or os.path.join(args.dataset, _TRAJECTORY_FILE[kind])
    loader_cls = {
        "drunkard": DrunkardLoader,
        "realcolon": RealcolonLoader,
        "syncolon": SyncolonLoader,
    }[kind]
    loader = loader_cls(args.dataset, traj)
    print(f"[{kind}] {len(loader)} frames")

    border = None
    if cfg.border_mask:
        import cv2

        mask_path = cfg.border_mask
        if not os.path.isabs(mask_path):
            for base in (os.path.dirname(args.config), "/root/reference"):
                cand = os.path.join(base, mask_path)
                if os.path.exists(cand):
                    mask_path = cand
                    break
        border = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)

    pipe = SequencePipeline(cfg, border_mask=border)
    t0 = time.time()
    out = pipe.run(
        loader,
        start=args.start,
        end=args.end,
        step=args.step,
        journal_path=args.journal,
        mesh_backend=args.mesh_backend,
    )
    dt = time.time() - t0
    if out is None:
        print("No pair triangulated.")
    else:
        init = out["init"]
        print(
            f"nMatches: {init.n_matches}  nMapPoints: {init.n_triangulated}"
            f"  parallax: {init.parallax_deg:.3f} deg"
        )
        print(
            f"RMSE (mm): {out['initial'].rmse*1000:.2f} -> {out['final'].rmse*1000:.2f}"
            f"   pixel sigma C1/C2: {out['initial_pix'].desvc1:.3f}/{out['initial_pix'].desvc2:.3f}"
            f" -> {out['final_pix'].desvc1:.3f}/{out['final_pix'].desvc2:.3f}"
        )
    print(f"[END] Seconds: {dt:.4f}")
