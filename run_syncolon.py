#!/usr/bin/env python3
"""Syncolon synthetic-colon CLI (equivalent of ``Execution/syncolon.cc``;
note the reference ships that main but never wires it into its build --
here it is a first-class pipeline).

Usage:
  python run_syncolon.py DATASET_DIR [start step end] [--config PATH] ...
"""

from triangulation_in_deformable_scenes_tpu.cli import sequence_main

if __name__ == "__main__":
    sequence_main("syncolon")
