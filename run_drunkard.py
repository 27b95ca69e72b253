#!/usr/bin/env python3
"""Drunkard's Dataset CLI: two-view deformable mapping on a deforming scene.

Equivalent of ``Execution/drunkard.cc``: iterates frames from ``start`` to
``end`` with ``step``, feeds RGB+depth+pose into the pipeline, and stops at
the first successfully triangulated pair, then refines and writes the
Experiment.txt journal.

Usage:
  python run_drunkard.py DATASET_DIR [start step end] [--config PATH] ...
"""

from triangulation_in_deformable_scenes_tpu.cli import sequence_main

if __name__ == "__main__":
    sequence_main("drunkard")
