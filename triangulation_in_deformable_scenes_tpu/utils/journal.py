"""Experiment journal writer matching the reference's ``Experiment.txt`` format.

The reference appends metric blocks to ``Experiment.Filepath`` with the es_ES
locale (decimal commas, ``Measurements.cc:12``); the offline sweep harness and
stored Excel aggregations parse that format, so we reproduce it verbatim:
6-significant-digit values, comma decimal separator, the same field names and
block headers (INITIAL / "i / n" / FINAL MEASUREMENTS).
"""

from __future__ import annotations

import os

import numpy as np

from .metrics import AbsoluteErrors, PixelsError, RelativeErrors


def fmt(x: float) -> str:
    """C++ default ostream formatting (6 significant digits), es_ES comma."""
    return f"{float(x):.6g}".replace(".", ",")


def _fmt_matrix(M: np.ndarray) -> str:
    rows = [" ".join(fmt(v) for v in row) for row in np.asarray(M)]
    return "\n".join(rows)


def _fmt_vector(v: np.ndarray) -> str:
    return "\n".join(fmt(x) for x in np.asarray(v))


class ExperimentJournal:
    def __init__(self, path: str, echo: bool = False):
        self.path = path
        self.echo = echo
        # The shipped YAMLs point at ./Data/Experiment.txt relative to the
        # CWD; create the directory so the default invocation works from
        # anywhere (the reference binary silently writes nothing here).
        parent = os.path.dirname(self.path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        # Truncate, like the reference's header write (Mapping.cc:263 opens
        # without ios::app; everything later appends).
        open(self.path, "w").close()

    def _append(self, text: str):
        with open(self.path, "a") as f:
            f.write(text)
        if self.echo:
            print(text, end="")

    def header(self, translation_norm_m: float, parallax_deg: float, n_matches: int, n_map_points: int):
        """Parity with ``Mapping.cc:263-269`` (values in mm/degrees)."""
        self._append(
            f"Translation norm between cameras (mm): {fmt(translation_norm_m * 1000)}\n"
            f"Parallax: {fmt(parallax_deg)}\n"
            f"nMatches: {n_matches}\n"
            f"nMapPoints: {n_map_points}\n"
        )

    def block_header(self, title: str):
        """INITIAL / "i / n" / FINAL MEASUREMENTS headers (note the reference
        writes a trailing space before the newline)."""
        self._append(f"{title} \n")

    def relative(self, pix: PixelsError, rel: RelativeErrors):
        """Parity with ``Measurements.cc:497-506``."""
        self._append(
            f"C1 standard desv: {fmt(pix.desvc1)}\n"
            f"C2 standard desv: {fmt(pix.desvc2)}\n"
            f"Rel. error: {fmt(rel.rel_error)}\n"
            f"depthError: {fmt(rel.depth_error)}\n"
            f"gloablTError: {fmt(rel.global_t_error)}\n"
            f"Global rotation: {_fmt_matrix(rel.Rg)}\n"
            f"Global translation: {_fmt_vector(rel.tg)}\n"
        )

    def sim_absolute(self, abs_err: AbsoluteErrors):
        """Parity with ``Measurements.cc:84-94`` (mm)."""
        self._append(
            f"Av. movement: {fmt(abs_err.av_movement * 1000)}\n"
            f"Av. error: {fmt(abs_err.av_error * 1000)}\n"
            f"RMSE: {fmt(abs_err.rmse * 1000)}\n\n"
        )

    def real_absolute(self, abs_err: AbsoluteErrors):
        """Parity with ``Measurements.cc:333-341`` (mm, with up-to-scale)."""
        self._append(
            f"Av. movement: {fmt(abs_err.av_movement * 1000)}\n"
            f"Av. error: {fmt(abs_err.av_error * 1000)}\n"
            f"RMSE: {fmt(abs_err.rmse * 1000)}\n"
            f"Av. up-to-scale error in 3D: {fmt((abs_err.av_up_to_scale or 0.0) * 1000)}\n\n"
        )


def parse_journal(path: str) -> dict:
    """Parse an Experiment.txt (ours or the reference's) into blocks of floats.

    Returns {block_title: {field: value}} with '.'-decimal floats; used by the
    sweep aggregator and by regression tests against committed reference runs.
    """
    blocks: dict = {}
    current = "HEADER"
    blocks[current] = {}
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        for line in f:
            line = line.rstrip("\n")
            if line.endswith("MEASUREMENTS: ") or line.endswith("MEASUREMENTS:"):
                current = line.split(" MEASUREMENTS")[0].strip() or "INITIAL"
                blocks.setdefault(current, {})
                continue
            if ":" not in line:
                continue
            key, _, val = line.partition(":")
            val = val.strip().split(" ")[0].replace(",", ".")
            try:
                blocks[current][key.strip()] = float(val)
            except ValueError:
                pass
    return blocks
