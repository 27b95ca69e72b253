"""Point-pair fixture IO.

Reads the reference's whitespace-separated ground-truth point files
(``Data/original_points.csv`` / ``Data/moved_points.csv``), the format parsed
by ``SLAM::loadPoints`` (``Modules/System/SLAM.cc:172-221``).
"""

from __future__ import annotations

import numpy as np


def load_point_pairs(original_file: str, moved_file: str):
    orig = np.loadtxt(original_file, dtype=np.float64)
    moved = np.loadtxt(moved_file, dtype=np.float64)
    orig = np.atleast_2d(orig)
    moved = np.atleast_2d(moved)
    n = min(len(orig), len(moved))
    return orig[:n, :3], moved[:n, :3]
