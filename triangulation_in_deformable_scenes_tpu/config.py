"""Typed run configuration with reference-YAML compatibility.

The reference parses a single OpenCV-FileStorage YAML per pipeline into a
``Settings`` object (``Modules/System/Settings.cc:27-190``). We keep the exact
key names so the reference's config files (``Data/Simulation.yaml`` etc.) and
the sweep harness's rewritten configs load unchanged. Missing keys default to
0 / empty exactly like ``cv::FileStorage`` (``Settings.cc:43-46`` relies on
this for the absent ``Camera.d0..d3``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


def _load_opencv_yaml(path: str) -> dict:
    """Parse an OpenCV-FileStorage YAML into a flat dict.

    cv::FileStorage files start with a ``%YAML:1.0`` directive that PyYAML
    rejects; strip it (and any leading document markers) before parsing.
    """
    import yaml

    with open(path, "r") as f:
        lines = f.readlines()
    lines = [ln for ln in lines if not ln.startswith("%YAML")]
    return yaml.safe_load("".join(lines)) or {}


@dataclasses.dataclass
class Config:
    """Flat config mirroring the reference ``Settings`` getters."""

    # Camera (Settings.cc:38-51). KB8 primary model from d0..d3 (default 0);
    # pinhole secondary from fx..cy; optional radial-tangential k1..k3,p1,p2.
    fx: float = 0.0
    fy: float = 0.0
    cx: float = 0.0
    cy: float = 0.0
    d: tuple = (0.0, 0.0, 0.0, 0.0)
    distortion: tuple = ()
    im_cols: int = 0
    im_rows: int = 0

    # Feature extractor (Settings.cc:75-78)
    border_mask: str = ""
    n_features: int = 0
    n_scales: int = 8
    scale_factor: float = 1.2

    # Feature grid (Settings.cc:81-82)
    grid_cols: int = 64
    grid_rows: int = 48

    # Epipolar / matching thresholds (Settings.cc:85-94)
    epipolar_th: float = 0.0
    matching_init_th: int = 0
    matching_guided_th: int = 0
    matching_projection_th: int = 0
    matching_triangulation_th: int = 0
    matching_fuse_th: int = 0
    matching_init_radius: float = 0.0

    min_common_obs: int = 0
    min_cos: float = 0.0
    min_matches: float = 0.0
    checks: bool = False
    depth_limit: float = 0.0

    # Simulation cameras + noise (Settings.cc:112-127)
    c1_pose: tuple = (0.0, 0.0, 0.0)
    c2_pose: tuple = (0.0, 0.0, 0.0)
    sim_rep_error: float = 0.0
    decimals_rep_error: int = 0
    sim_depth_error: float = 0.0
    sim_depth_weight: float = 0.0
    sim_depth_scale_c1: float = 1.0
    sim_depth_scale_c2: float = 1.0
    depth_measurements_scale: float = 0.0

    # Optimization weights / loops (Settings.cc:129-151)
    opt_rep_weight: float = 1.0
    opt_arap_weight: float = 0.0
    opt_global_weight: float = 0.0
    opt_alpha_weight: float = 1.0
    opt_beta_weight: float = 1.0
    opt_selection: str = ""
    opt_model: str = "ARAP"
    opt_weights_selection: str = ""
    triangulation_method: str = "NRSLAM"
    triangulation_location: str = "inRays"
    n_optimizations: int = 1
    n_opt_iterations: int = 25
    nlopt_n_optimizations: int = 30
    nlopt_rel_tolerance: float = 0.0
    nlopt_abs_tolerance: float = 0.0
    nlopt_rep_lower: float = 0.0
    nlopt_rep_upper: float = 0.0
    nlopt_global_lower: float = 0.0
    nlopt_global_upper: float = 0.0
    nlopt_arap_lower: float = 0.0
    nlopt_arap_upper: float = 0.0

    exp_file_path: str = "./Experiment.txt"
    show_scene: bool = False
    draw_rays: bool = False
    show_solution: bool = False
    stop: bool = False

    @property
    def kb8_params(self) -> np.ndarray:
        """[fx, fy, cx, cy, d0..d3] -- primary model (Settings.cc:47-50)."""
        return np.array([self.fx, self.fy, self.cx, self.cy, *self.d], dtype=np.float64)

    @property
    def pinhole_params(self) -> np.ndarray:
        return np.array([self.fx, self.fy, self.cx, self.cy], dtype=np.float64)


def _b(raw, key) -> bool:
    return str(raw.get(key, "false")) == "true"


def load_config(path: str) -> Config:
    raw = _load_opencv_yaml(path)

    def g(key, default=0.0, cast=float):
        v = raw.get(key, default)
        if v is None:
            return default
        return cast(v)

    distortion: tuple = ()
    if "Camera.k1" in raw:
        distortion = (
            g("Camera.k1"),
            g("Camera.k2"),
            g("Camera.p1"),
            g("Camera.p2"),
        )
        if "Camera.k3" in raw:
            distortion = distortion + (g("Camera.k3"),)

    return Config(
        fx=g("Camera.fx"),
        fy=g("Camera.fy"),
        cx=g("Camera.cx"),
        cy=g("Camera.cy"),
        d=(g("Camera.d0"), g("Camera.d1"), g("Camera.d2"), g("Camera.d3")),
        distortion=distortion,
        im_cols=g("Camera.cols", 0, int),
        im_rows=g("Camera.rows", 0, int),
        border_mask=g("FeatureExtractor.imageBoderMask", "", str),
        n_features=g("FeatureExtractor.nFeatures", 0, int),
        n_scales=g("FeatureExtractor.nScales", 8, int),
        scale_factor=g("FeatureExtractor.fScaleFactor", 1.2),
        grid_cols=g("FeatureGrid.nGridCols", 64, int),
        grid_rows=g("FeatureGrid.nGridRows", 48, int),
        epipolar_th=g("Epipolar.th"),
        matching_init_th=g("Matching.initialization", 0, int),
        matching_guided_th=g("Matching.guidedMatching", 0, int),
        matching_projection_th=g("Matching.searchByProjection", 0, int),
        matching_triangulation_th=g("Matching.searchForTriangulation", 0, int),
        matching_fuse_th=g("Matching.fuse", 0, int),
        matching_init_radius=g("Matching.initialization.radius"),
        min_common_obs=g("Map.minObs", 0, int),
        min_cos=g("Triangulation.minCos"),
        min_matches=g("Triangulation.minMatches"),
        checks=_b(raw, "Triangulation.checks"),
        depth_limit=g("Triangulation.depthLimit"),
        c1_pose=(g("Camera.FirstPose.x"), g("Camera.FirstPose.y"), g("Camera.FirstPose.z")),
        c2_pose=(g("Camera.SecondPose.x"), g("Camera.SecondPose.y"), g("Camera.SecondPose.z")),
        sim_rep_error=g("Keypoints.RepError"),
        decimals_rep_error=g("Keypoints.decimalsApproximation", 0, int),
        sim_depth_error=g("Measurements.DepthError"),
        sim_depth_weight=g("Measurements.DepthWeight"),
        sim_depth_scale_c1=g("Measurements.DepthScale.C1", 1.0),
        sim_depth_scale_c2=g("Measurements.DepthScale.C2", 1.0),
        depth_measurements_scale=g("Measurements.Depth.Scale"),
        opt_rep_weight=g("Optimization.rep", 1.0),
        opt_arap_weight=g("Optimization.arap"),
        opt_global_weight=g("Optimization.global"),
        opt_alpha_weight=g("Optimization.alpha", 1.0),
        opt_beta_weight=g("Optimization.beta", 1.0),
        opt_selection=g("Optimization.selection", "", str),
        opt_model=g("Optimization.model", "ARAP", str),
        opt_weights_selection=g("Optimization.weightsSelection", "", str),
        triangulation_method=g("Triangulation.method", "NRSLAM", str),
        triangulation_location=g("Triangulation.seed.location", "inRays", str),
        n_optimizations=g("Optimization.numberOfOptimizations", 1, int),
        n_opt_iterations=g("Optimization.numberOfIterations", 25, int),
        nlopt_n_optimizations=g("Optimization.nlopt.numberOfIterations", 30, int),
        nlopt_rel_tolerance=g("Optimization.nlopt.relTolerance"),
        nlopt_abs_tolerance=g("Optimization.nlopt.absTolerance"),
        nlopt_rep_lower=g("Optimization.nlopt.rep.lowerBound"),
        nlopt_rep_upper=g("Optimization.nlopt.rep.upperBound"),
        nlopt_global_lower=g("Optimization.nlopt.global.lowerBound"),
        nlopt_global_upper=g("Optimization.nlopt.global.upperBound"),
        nlopt_arap_lower=g("Optimization.nlopt.arap.lowerBound"),
        nlopt_arap_upper=g("Optimization.nlopt.arap.upperBound"),
        exp_file_path=g("Experiment.Filepath", "./Experiment.txt", str),
        show_scene=_b(raw, "MapVisualizer.showScene"),
        draw_rays=_b(raw, "MapVisualizer.drawRays"),
        show_solution=_b(raw, "Visualizer.showSolution"),
        stop=_b(raw, "Execution.stop"),
    )
