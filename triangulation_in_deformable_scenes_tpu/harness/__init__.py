"""Experiment harness: synthetic fixtures, sweeps, aggregation (L7).

Rebuilds the reference's offline Python harness (``Data/Scripts/**``) as an
importable module driving the pipelines in-process instead of shelling out to
a compiled binary per condition.
"""

from .create_data import generate_points, save_points  # noqa: F401
from .sweep import SweepCondition, run_sweep  # noqa: F401
from .aggregate import journal_to_row, write_comparison_csv, write_condition_csv  # noqa: F401
