"""Real-data sweep harness + dataset prep tools."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from triangulation_in_deformable_scenes_tpu.config import Config
from triangulation_in_deformable_scenes_tpu.harness import prep, real_sweep


def test_pair_parsing_and_presets():
    res, scene, start, end, step = real_sweep.parse_pair("320_00000_1975-1983")
    assert (res, scene, start, end, step) == ("320", "00000", 1975, 1983, 8)
    for pair in real_sweep.PAIRS:
        assert pair in real_sweep.PAIR_PRESETS


def test_pair_config_applies_presets():
    base = Config(fx=1, fy=1, cx=0, cy=0)
    cfg = real_sweep.pair_config(base, "1024_00001_110-120", "InRays", "no_checks")
    assert cfg.fx == pytest.approx(610.17789714)
    assert cfg.im_cols == 1024
    assert cfg.matching_init_th == 30
    assert cfg.matching_init_radius == 120
    assert cfg.depth_limit == 6.0
    assert cfg.min_cos == 0.6
    assert cfg.checks is False
    assert cfg.triangulation_location == "inRays"


def _write_drunkard_level(level_dir, rng):
    """Two-frame textured-plane sequence in the Drunkard layout."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_sequence_e2e import render_plane

    os.makedirs(os.path.join(level_dir, "color"), exist_ok=True)
    os.makedirs(os.path.join(level_dir, "depth"), exist_ok=True)
    texture = np.full((256, 256), 128, dtype=np.uint8)
    for _ in range(120):
        y, x = rng.integers(0, 236, size=2)
        hh, ww = rng.integers(6, 28, size=2)
        texture[y : y + hh, x : x + ww] = rng.integers(30, 230)
    texture = cv2.GaussianBlur(texture, (3, 3), 0.8)
    poses = [(np.eye(3), np.zeros(3)), (np.eye(3), np.array([0.12, 0.02, 0.0]))]
    lines = []
    for i, (R, t) in enumerate(poses):
        rgb, depth = render_plane(R, t, texture)
        cv2.imwrite(os.path.join(level_dir, "color", f"{i}.png"), rgb)
        d16 = np.clip(depth * 100.0, 0, 65535).astype(np.uint16)
        cv2.imwrite(os.path.join(level_dir, "depth", f"{i}.png"), d16)
        lines.append(f"{i} {t[0]} {t[1]} {t[2]} 0 0 0 1\n")
    with open(os.path.join(level_dir, "pose.txt"), "w") as f:
        f.write("".join(lines))


@pytest.mark.slow
def test_real_sweep_produces_committed_layout(tmp_path):
    """run_real_sweep writes the committed result-directory shape
    Experiments/Drunkard/<pair>/<tri>/<level>/<checks>/<n>/Experiment.txt."""
    rng = np.random.default_rng(0)
    root = tmp_path / "drunkard"
    _write_drunkard_level(str(root / "320" / "00000" / "level3"), rng)

    base = Config(
        fx=190.68059285, fy=190.68059285, cx=160.0, cy=160.0,
        im_cols=320, im_rows=320,
        n_features=600, n_scales=4, scale_factor=1.2,
        min_matches=20, triangulation_method="NRSLAM",
        opt_rep_weight=1.0, opt_global_weight=1.0, opt_arap_weight=1e4,
        sim_depth_weight=300.0, n_optimizations=1, n_opt_iterations=5,
        nlopt_n_optimizations=3, nlopt_rel_tolerance=1e-2, nlopt_abs_tolerance=1e-2,
        nlopt_rep_lower=1.0, nlopt_rep_upper=1.0,
        nlopt_global_lower=1.0, nlopt_global_upper=1.0,
        nlopt_arap_lower=1e-5, nlopt_arap_upper=1e7,
        opt_selection="twoOptimizations", opt_weights_selection="nlopt",
    )
    out_root = str(tmp_path / "Experiments")
    results = real_sweep.run_real_sweep(
        base,
        str(root),
        "320_00000_1975-1983",
        out_root=out_root,
        triangulations=("TwoPoints",),
        levels=("level3",),
        experiments=(3,),
        frame_range=(0, 2, 1),
    )
    assert len(results) == 1
    result_dir, out = results[0]
    expected = os.path.join(
        out_root, "Drunkard", "320_00000_1975-1983", "TwoPoints", "level3", "no_checks", "3"
    )
    assert os.path.normpath(result_dir) == os.path.normpath(expected)
    assert out is not None
    assert os.path.isfile(os.path.join(result_dir, "Experiment.txt"))


def test_resize_images_nearest(tmp_path):
    src = tmp_path / "in"
    dst = tmp_path / "out"
    src.mkdir()
    im = (np.arange(64 * 64).reshape(64, 64) % 4000).astype(np.uint16)
    cv2.imwrite(str(src / "d.png"), im)
    written = prep.resize_images(str(src), str(dst), 32, 32)
    assert len(written) == 1
    out = cv2.imread(written[0], cv2.IMREAD_UNCHANGED)
    assert out.shape == (32, 32)
    # nearest-neighbor: every output value exists in the input
    assert np.isin(out, im).all()


def test_realcolon_crop_center(tmp_path):
    src = tmp_path / "in"
    dst = tmp_path / "out"
    src.mkdir()
    im = np.zeros((1080, 1440, 3), dtype=np.uint8)
    im[:, 70:1420] = 50  # the region the first crop keeps
    cv2.imwrite(str(src / "f.png"), im)
    written = prep.realcolon_crop_center(str(src), str(dst))
    out = cv2.imread(written[0])
    assert out.shape == (992, 1344, 3)
    assert (out == 50).all()


def test_realcolon_resize_depths_exr(tmp_path):
    src = tmp_path / "npy"
    dst = tmp_path / "exr"
    src.mkdir()
    depth = np.full((992, 1344), 2.5, dtype=np.float32)
    np.save(str(src / "0001.npy"), depth)
    mask = np.full((1080, 1440), 255, dtype=np.uint8)
    mask[:, :100] = 0  # border region -> valid per (mask == 0) convention
    mask_path = str(tmp_path / "mask.jpg")
    cv2.imwrite(mask_path, mask)
    os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
    try:
        written = prep.realcolon_resize_depths_exr(str(src), str(dst), mask_path)
    except cv2.error:
        pytest.skip("OpenCV built without EXR write support")
    out = cv2.imread(written[0], cv2.IMREAD_ANYDEPTH | cv2.IMREAD_UNCHANGED)
    if out is None:
        pytest.skip("OpenCV built without EXR read support")
    assert out.shape == (1080, 1440)
    # masked (mask nonzero) regions zeroed; embedded region where mask==0 kept
    assert out[500, 80] == pytest.approx(2.5)
    assert out[500, 700] == 0.0


def test_syncolon_exr_to_png_scale(tmp_path):
    exr_dir = tmp_path / "exr"
    png_dir = tmp_path / "png"
    exr_dir.mkdir()
    os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
    depth = np.full((8, 8), 1.5, dtype=np.float32)
    try:
        ok = cv2.imwrite(str(exr_dir / "0050.exr"), depth,
                         [cv2.IMWRITE_EXR_TYPE, cv2.IMWRITE_EXR_TYPE_FLOAT])
    except cv2.error:
        pytest.skip("OpenCV built without EXR support")
    if not ok:
        pytest.skip("OpenCV built without EXR support")
    written = prep.syncolon_exr_to_png(str(exr_dir), str(png_dir))
    out = cv2.imread(written[0], cv2.IMREAD_UNCHANGED)
    expected = np.clip(1.5 / prep.SYNCOLON_DEPTH_SCALE, 0, 65535)
    assert out.dtype == np.uint16
    np.testing.assert_allclose(out, round(expected), atol=1)
