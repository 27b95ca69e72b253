#!/usr/bin/env python3
"""RealColon endoscopy CLI (equivalent of ``Execution/realcolon.cc``).

Usage:
  python run_realcolon.py DATASET_DIR [start step end] [--config PATH] ...
"""

from triangulation_in_deformable_scenes_tpu.cli import sequence_main

if __name__ == "__main__":
    sequence_main("realcolon")
