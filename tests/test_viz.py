"""Visualization subsystem: PNG round-trip, overlays, PLY export.

Covers the headless rebuild of FrameVisualizer/MapVisualizer
(``Modules/Visualization/*``, SURVEY.md section 2 components 32-33).
"""

import numpy as np

from triangulation_in_deformable_scenes_tpu.viz import FrameVisualizer, MapVisualizer
from triangulation_in_deformable_scenes_tpu.viz import draw


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    im = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    draw.write_png(p, im)
    back = draw.read_png(p)
    np.testing.assert_array_equal(back, im)


def test_png_roundtrip_gray(tmp_path):
    im = np.arange(0, 100, dtype=np.uint8).reshape(10, 10)
    p = str(tmp_path / "g.png")
    draw.write_png(p, im)
    np.testing.assert_array_equal(draw.read_png(p), im)


def test_draw_primitives_touch_pixels():
    im = np.zeros((50, 50, 3), dtype=np.uint8)
    draw.draw_circle(im, 25, 25, 5, draw.GREEN)
    draw.draw_line(im, 0, 0, 49, 49, draw.RED)
    assert (im[:, :, 1] > 0).any()  # circle drew green
    assert im[0, 0, 0] == 255 and im[49, 49, 0] == 255  # line endpoints red
    # Out-of-bounds requests must not raise.
    draw.draw_circle(im, -10, -10, 3, draw.BLUE)
    draw.draw_line(im, -5, -5, 60, 60, draw.BLUE)


def test_frame_visualizer_outputs(tmp_path):
    fv = FrameVisualizer(enabled=True, out_dir=str(tmp_path))
    im1 = np.full((60, 80), 100, dtype=np.uint8)
    im2 = np.full((60, 80), 50, dtype=np.uint8)
    kp1 = np.array([[10.0, 10.0], [30.0, 20.0], [70.0, 50.0]])
    kp2 = kp1 + 2.0

    p_feat = fv.draw_features(kp1, im1)
    fv.set_reference_frame(kp1, im1)
    p_match = fv.draw_frame_matches(kp2, im2, np.array([0, 1, -1]))
    p_tri = fv.draw_triangulated_matches(
        kp2, im2, np.array([0, 1, 2]), np.array([True, False, True])
    )
    p_depth = fv.draw_depth_image(np.linspace(0, 1, 60 * 80).reshape(60, 80))
    for p in (p_feat, p_match, p_tri, p_depth):
        assert p is not None
        a = draw.read_png(p)
        assert a.ndim == 3 and a.shape[2] == 3

    # Matches canvas is side-by-side.
    assert draw.read_png(p_match).shape[1] == 160


def test_frame_visualizer_disabled_is_noop(tmp_path):
    fv = FrameVisualizer(enabled=False, out_dir=str(tmp_path / "nope"))
    assert fv.draw_features(np.zeros((2, 2)), np.zeros((10, 10))) is None
    assert not (tmp_path / "nope").exists()


def test_map_visualizer_snapshot_and_ply(tmp_path):
    mv = MapVisualizer(enabled=True, out_dir=str(tmp_path), draw_rays=True)
    rng = np.random.default_rng(1)
    p1 = rng.normal(size=(30, 3)) * 0.1 + [0, 0, 1.0]
    p2 = p1 + 0.01
    poses = [(np.eye(3), np.zeros(3)), (np.eye(3), np.array([0.1, 0, 0]))]
    mv.update(p1, p2, poses)

    png = mv.snapshot(size=200)
    a = draw.read_png(png)
    assert a.shape == (200, 200, 3)
    # Red (KF1) and near-black (KF2) points must appear on the white canvas.
    red = (a[:, :, 0] == 255) & (a[:, :, 1] == 0)
    black = (a == 0).all(axis=-1)
    assert red.any() and black.any()

    ply = mv.export_ply()
    txt = open(ply).read()
    assert txt.startswith("ply")
    assert f"element vertex {len(p1) + len(p2) + 2}" in txt


def test_map_visualizer_disabled_is_noop(tmp_path):
    mv = MapVisualizer(enabled=False, out_dir=str(tmp_path / "off"))
    mv.update(np.zeros((1, 3)), np.zeros((1, 3)))
    assert mv.snapshot() is None and mv.export_ply() is None
    assert not (tmp_path / "off").exists()
