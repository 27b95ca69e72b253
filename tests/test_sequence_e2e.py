"""End-to-end image-sequence pipeline test on a synthetic Drunkard-format dataset.

Renders a textured plane from two KB8 cameras (drunkard intrinsics), writes
pose.txt + color/ + depth/ files in the reference's Drunkard layout, then runs
the FULL pipeline: load -> grayscale -> FAST/ORB -> matching -> triangulation
gates -> depth scales -> ARAP refinement -> journal.
"""

import dataclasses
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from triangulation_in_deformable_scenes_tpu.config import Config
from triangulation_in_deformable_scenes_tpu.datasets import DrunkardLoader
from triangulation_in_deformable_scenes_tpu.pipeline.sequence import SequencePipeline, to_grayscale

FX = 190.68059285
W = H = 320


def render_plane(R_wc, t_wc, texture, tex_scale=200.0, plane_z=1.0):
    """Render the textured z=plane_z plane through the KB8(d=0) camera at
    (R_wc, t_wc); returns (rgb uint8 [H,W,3], depth float [H,W] meters)."""
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    mx = (xs - W / 2) / FX
    my = (ys - H / 2) / FX
    theta = np.sqrt(mx**2 + my**2)
    # equidistant inverse: r = tan(theta), direction in camera frame
    r = np.tan(theta)
    safe = np.where(theta > 1e-9, theta, 1.0)
    dx = np.where(theta > 1e-9, mx / safe * r, 0.0)
    dy = np.where(theta > 1e-9, my / safe * r, 0.0)
    dirs_c = np.stack([dx, dy, np.ones_like(dx)], -1)
    dirs_w = dirs_c @ np.asarray(R_wc).T
    origin = np.asarray(t_wc)
    tz = (plane_z - origin[2]) / dirs_w[..., 2]
    pts = origin + tz[..., None] * dirs_w
    u = (pts[..., 0] * tex_scale) % texture.shape[1]
    v = (pts[..., 1] * tex_scale) % texture.shape[0]
    im = texture[v.astype(int) % texture.shape[0], u.astype(int) % texture.shape[1]]
    depth = tz * np.linalg.norm(dirs_c, axis=-1) * dirs_c[..., 2] / np.linalg.norm(dirs_c, axis=-1)
    depth = tz * dirs_c[..., 2]  # z-depth in camera frame (dirs_c z == 1)
    rgb = np.stack([im, im, im], -1).astype(np.uint8)
    return rgb, depth.astype(np.float32)


@pytest.fixture(scope="module")
def synthetic_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("drunkard")
    (root / "color").mkdir()
    (root / "depth").mkdir()
    rng = np.random.default_rng(0)
    # Blobby texture: random rectangles (smooth regions with sharp corners)
    # survive resampling between views, unlike per-pixel noise.
    texture = np.full((256, 256), 128, dtype=np.uint8)
    for _ in range(120):
        y, x = rng.integers(0, 236, size=2)
        hh, ww = rng.integers(6, 28, size=2)
        texture[y : y + hh, x : x + ww] = rng.integers(30, 230)
    texture = cv2.GaussianBlur(texture, (3, 3), 0.8)

    poses = [
        (np.eye(3), np.array([0.0, 0.0, 0.0])),
        (np.eye(3), np.array([0.12, 0.02, 0.0])),
    ]
    lines = []
    for i, (R, t) in enumerate(poses):
        rgb, depth = render_plane(R, t, texture)
        name = f"{i}"
        cv2.imwrite(str(root / "color" / f"{name}.png"), rgb)
        d16 = np.clip(depth * 100.0, 0, 65535).astype(np.uint16)  # /100 in pipeline
        cv2.imwrite(str(root / "depth" / f"{name}.png"), d16)
        lines.append(f"{name} {t[0]} {t[1]} {t[2]} 0 0 0 1\n")
    (root / "pose.txt").write_text("".join(lines))
    return root


def seq_config():
    return Config(
        fx=FX,
        fy=FX,
        cx=W / 2,
        cy=H / 2,
        im_cols=W,
        im_rows=H,
        n_features=600,
        n_scales=4,
        scale_factor=1.2,
        matching_init_th=40,
        matching_init_radius=60.0,
        min_cos=0.6,  # degrees gate for sequences
        min_matches=20,
        depth_limit=3.5,
        checks=False,
        triangulation_method="NRSLAM",
        triangulation_location="inRays",
        opt_rep_weight=1.0,
        opt_global_weight=1.0,
        opt_arap_weight=1e4,
        sim_depth_weight=300.0,
        n_optimizations=2,
        n_opt_iterations=10,
        nlopt_n_optimizations=4,
        nlopt_rel_tolerance=1e-2,
        nlopt_abs_tolerance=1e-2,
        nlopt_rep_lower=1.0,
        nlopt_rep_upper=1.0,
        nlopt_global_lower=1.0,
        nlopt_global_upper=1.0,
        nlopt_arap_lower=1e-5,
        nlopt_arap_upper=1e7,
        opt_selection="twoOptimizations",
        opt_weights_selection="nlopt",
    )


def test_loader_reads_dataset(synthetic_dataset):
    loader = DrunkardLoader(str(synthetic_dataset), str(synthetic_dataset / "pose.txt"))
    assert len(loader) == 2
    rgb = loader.get_rgb(0)
    depth = loader.get_depth(0)
    assert rgb.shape[:2] == (H, W)
    assert depth.dtype == np.float32
    # center-pixel depth ~ 1m plane -> ~100 stored
    assert abs(depth[H // 2, W // 2] - 100.0) < 2.0
    (R, t) = loader.get_pose(1)
    np.testing.assert_allclose(t, [0.12, 0.02, 0.0])


@pytest.mark.slow
def test_sequence_pipeline_end_to_end(synthetic_dataset, tmp_path):
    loader = DrunkardLoader(str(synthetic_dataset), str(synthetic_dataset / "pose.txt"))
    pipe = SequencePipeline(seq_config())
    journal = str(tmp_path / "exp.txt")
    out = pipe.run(loader, journal_path=journal)
    assert out is not None, "pipeline did not triangulate the pair"
    init = out["init"]
    assert init.n_matches > 30
    assert init.n_triangulated >= 25
    # The journal's absolute metric inherits a reference quirk: ground truth
    # is backprojected through the PINHOLE model while the images are
    # KB8-equidistant (Measurements.cc:193-199), so it carries a systematic
    # offset away from the image center (the reference's committed Drunkard
    # RMSEs are ~1.1m for the same reason). Sanity-bound it loosely...
    assert out["final"].av_error < 0.3
    # ...and check the actual reconstruction against the analytic scene:
    # all points lie on the z=1 plane.
    p1 = np.asarray(out["state"].p1)[np.asarray(out["init"].valid)]
    assert np.abs(p1[:, 2] - 1.0).mean() < 0.04
    text = open(journal).read()
    assert "INITIAL MEASUREMENTS: \n" in text
    assert "FINAL MEASUREMENTS: \n" in text
    assert "Av. up-to-scale error in 3D: " in text


def test_grayscale_conversion_channels():
    im4 = np.zeros((4, 4, 4), dtype=np.uint8)
    im4[..., 1] = 77
    g = to_grayscale(im4)
    np.testing.assert_allclose(g, 77.0)
    im3 = np.dstack([np.full((4, 4), 10), np.full((4, 4), 20), np.full((4, 4), 30)]).astype(np.uint8)
    g3 = to_grayscale(im3)
    np.testing.assert_allclose(g3, 0.299 * 10 + 0.587 * 20 + 0.114 * 30, atol=0.01)


class _PoseFreeLoader:
    """Wraps a loader, withholding the trajectory (pose-unknown mode)."""

    def __init__(self, inner):
        self._inner = inner

    def frames(self, start=0, end=None, step=1):
        for idx, rgb, depth, pose, ts in self._inner.frames(start, end, step):
            yield idx, rgb, depth, None, ts


@pytest.fixture(scope="module")
def synthetic_step_dataset(tmp_path_factory):
    """Two-depth 'step' scene: left half plane z=0.9, right half z=1.3.

    The single-plane fixture is DEGENERATE for the 8-point algorithm (any E
    in a 2-parameter family fits coplanar correspondences exactly -- the
    reference's computeE path would fail identically); pose-free recovery
    needs non-planar structure."""
    root = tmp_path_factory.mktemp("drunkard_step")
    (root / "color").mkdir()
    (root / "depth").mkdir()
    rng = np.random.default_rng(1)
    texture = np.full((256, 256), 128, dtype=np.uint8)
    for _ in range(160):
        y, x = rng.integers(0, 236, size=2)
        hh, ww = rng.integers(6, 28, size=2)
        texture[y : y + hh, x : x + ww] = rng.integers(30, 230)
    texture = cv2.GaussianBlur(texture, (3, 3), 0.8)

    poses = [
        (np.eye(3), np.array([0.0, 0.0, 0.0])),
        (np.eye(3), np.array([0.12, 0.02, 0.0])),
    ]
    lines = []
    for i, (R, t) in enumerate(poses):
        rgb_a, depth_a = render_plane(R, t, texture, plane_z=0.9)
        rgb_b, depth_b = render_plane(R, t, texture, plane_z=1.3, tex_scale=140.0)
        rgb = np.concatenate([rgb_a[:, : W // 2], rgb_b[:, W // 2 :]], axis=1)
        depth = np.concatenate([depth_a[:, : W // 2], depth_b[:, W // 2 :]], axis=1)
        cv2.imwrite(str(root / "color" / f"{i}.png"), rgb)
        d16 = np.clip(depth * 100.0, 0, 65535).astype(np.uint16)
        cv2.imwrite(str(root / "depth" / f"{i}.png"), d16)
        lines.append(f"{i} {t[0]} {t[1]} {t[2]} 0 0 0 1\n")
    (root / "pose.txt").write_text("".join(lines))
    return root


@pytest.mark.slow
def test_sequence_pipeline_pose_free(synthetic_step_dataset, tmp_path):
    """Pose-unknown initialization end-to-end: the pipeline recovers the
    relative pose via RANSAC-8-point (MonocularMapInitializer.cc:119-279)
    and still triangulates/refines. The recovered rotation must match the
    GT (identity here) and the translation direction the GT baseline."""
    inner = DrunkardLoader(
        str(synthetic_step_dataset), str(synthetic_step_dataset / "pose.txt")
    )
    pipe = SequencePipeline(seq_config())
    out = pipe.run(_PoseFreeLoader(inner), journal_path=str(tmp_path / "exp.txt"))
    assert out is not None, "pose-free pipeline did not triangulate"
    init = out["init"]
    assert init.T2w_est is not None
    R21 = np.asarray(init.T2w_est[0])  # T1w identity -> T2w == T21
    t21 = np.asarray(init.T2w_est[1])
    # GT: pure translation (0.12, 0.02, 0) of the camera -> T21 rotation I,
    # t21 direction = -baseline direction; |t21| rescaled from depth sensor.
    cos = (np.trace(R21) - 1) / 2
    assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 3.0
    gt = -np.array([0.12, 0.02, 0.0])
    t_dir = t21 / np.linalg.norm(t21)
    assert float(t_dir @ (gt / np.linalg.norm(gt))) > 0.97
    # Monocular scale resolved from the depth measurements to ~GT baseline.
    assert abs(np.linalg.norm(t21) - np.linalg.norm(gt)) < 0.35 * np.linalg.norm(gt)
