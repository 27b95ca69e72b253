"""Feature front-end tests, cross-checked against OpenCV where oracles exist."""

import numpy as np
import pytest

import jax.numpy as jnp

from triangulation_in_deformable_scenes_tpu.ops import features, matching

cv2 = pytest.importorskip("cv2")


def synthetic_image(seed=0, h=240, w=320):
    """Blobby texture with corners: random rectangles over a gradient."""
    rng = np.random.default_rng(seed)
    im = np.tile(np.linspace(60, 120, w, dtype=np.float32), (h, 1))
    for _ in range(60):
        y, x = rng.integers(10, h - 30), rng.integers(10, w - 30)
        hh, ww = rng.integers(5, 25, size=2)
        im[y : y + hh, x : x + ww] = rng.uniform(0, 255)
    return im.astype(np.float32)


def test_fast_score_agrees_with_opencv():
    im = synthetic_image()
    th = 20
    score = np.asarray(features.fast_score(jnp.asarray(im)))
    mine = score > th

    det = cv2.FastFeatureDetector_create(threshold=th, nonmaxSuppression=False)
    kps = det.detect(im.astype(np.uint8))
    cvmask = np.zeros(im.shape, dtype=bool)
    for kp in kps:
        cvmask[int(round(kp.pt[1])), int(round(kp.pt[0]))] = True

    inner = np.zeros_like(mine)
    inner[4:-4, 4:-4] = True
    both = mine & cvmask & inner
    cv_only = cvmask & ~mine & inner
    my_only = mine & ~cvmask & inner
    # Near-complete agreement (float-vs-uint8 rounding causes a tiny fringe).
    assert both.sum() > 0.95 * (cvmask & inner).sum()
    assert my_only.sum() < 0.05 * max(both.sum(), 1)
    assert cv_only.sum() < 0.05 * max(both.sum(), 1)


@pytest.mark.slow
def test_extract_returns_valid_padded_keypoints():
    im = synthetic_image(seed=1)
    kps = features.extract(im, n_features=300, n_scales=4, scale_factor=1.2)
    n_valid = int(np.asarray(kps.valid).sum())
    assert n_valid > 50
    assert kps.xy.shape[0] == kps.desc.shape[0] == kps.valid.shape[0]
    v = np.asarray(kps.valid)
    xy = np.asarray(kps.xy)[v]
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] < im.shape[1]).all()
    assert (xy[:, 1] >= 0).all() and (xy[:, 1] < im.shape[0]).all()
    # descriptors of valid keys are not all-zero
    assert np.asarray(kps.desc)[v].sum(axis=1).min() > 0


def test_masks_suppress_reflections():
    im = synthetic_image(seed=2)
    im[100:120, 150:180] = 255.0  # specular blob
    kps = features.extract(im, n_features=300, n_scales=2, scale_factor=1.2)
    v = np.asarray(kps.valid)
    xy = np.asarray(kps.xy)[v]
    # No keypoints on or near (dilated) the reflective blob.
    inside = (
        (xy[:, 0] > 150 - 8) & (xy[:, 0] < 180 + 8) & (xy[:, 1] > 100 - 8) & (xy[:, 1] < 120 + 8)
    )
    assert inside.sum() == 0


def test_hamming_matrix_matches_popcount():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 2, size=(40, 256)).astype(np.int8)
    b = rng.integers(0, 2, size=(50, 256)).astype(np.int8)
    D = np.asarray(matching.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    expect = (a[:, None, :] != b[None, :, :]).sum(-1)
    np.testing.assert_array_equal(D.astype(int), expect)


def test_matching_recovers_translation():
    """Extract on an image and a shifted copy; matches must recover the shift."""
    im = synthetic_image(seed=4)
    shift = 7
    im2 = np.roll(im, shift, axis=1)
    k1 = features.extract(im, n_features=400, n_scales=2, scale_factor=1.2)
    k2 = features.extract(im2, n_features=400, n_scales=2, scale_factor=1.2)
    sf = jnp.asarray([1.2**o for o in range(2)])
    m, n = matching.search_for_initialization(
        k1.xy, k1.desc, k1.octave, k1.valid, k2.xy, k2.desc, k2.octave, k2.valid,
        scale_factors=sf, th=50.0, window_factor=50.0,
    )
    m = np.asarray(m)
    n = int(n)
    assert n > 30
    xy1 = np.asarray(k1.xy)
    xy2 = np.asarray(k2.xy)
    idx = np.nonzero(m >= 0)[0]
    d = xy2[m[idx]] - xy1[idx]
    med = np.median(d, axis=0)
    np.testing.assert_allclose(med, [shift, 0.0], atol=1.0)
    # One-to-one: no current key matched twice.
    assert len(np.unique(m[idx])) == len(idx)


def test_orientation_rotates_with_image():
    im = synthetic_image(seed=5)
    k1 = features.extract(im, n_features=200, n_scales=1, scale_factor=1.2)
    im_rot = cv2.rotate(im, cv2.ROTATE_180)
    k2 = features.extract(im_rot, n_features=200, n_scales=1, scale_factor=1.2)
    # A 180deg image rotation shifts IC angles by ~180 for corresponding keys.
    v1 = np.asarray(k1.valid)
    xy1 = np.asarray(k1.xy)[v1]
    ang1 = np.asarray(k1.angle)[v1]
    h, w = im.shape
    xy1_rot = np.stack([w - 1 - xy1[:, 0], h - 1 - xy1[:, 1]], axis=-1)
    v2 = np.asarray(k2.valid)
    xy2 = np.asarray(k2.xy)[v2]
    ang2 = np.asarray(k2.angle)[v2]
    diffs = []
    for p, a in zip(xy1_rot, ang1):
        j = np.argmin(np.linalg.norm(xy2 - p, axis=1))
        if np.linalg.norm(xy2[j] - p) < 1.5:
            dd = (ang2[j] - a - 180.0) % 360.0
            diffs.append(min(dd, 360 - dd))
    assert len(diffs) > 20
    assert np.median(diffs) < 10.0


def test_epipolar_inliers_pure_translation():
    rng = np.random.default_rng(6)
    pts = rng.normal(size=(50, 3)) * [0.1, 0.1, 0.02] + [0, 0, 0.5]
    t = np.array([0.1, 0.0, 0.0])
    r1 = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    p2 = pts - t
    r2 = p2 / np.linalg.norm(p2, axis=-1, keepdims=True)
    E = matching.essential_from_pose(jnp.eye(3), jnp.asarray(-t))
    ok = np.asarray(matching.epipolar_inliers(E, jnp.asarray(r1), jnp.asarray(r2), 0.002))
    assert ok.mean() > 0.95
    # Corrupt half the rays -> they drop out.
    r2_bad = r2.copy()
    r2_bad[:25] = r2_bad[:25][:, [1, 0, 2]]
    ok2 = np.asarray(matching.epipolar_inliers(E, jnp.asarray(r1), jnp.asarray(r2_bad), 0.002))
    assert ok2[25:].mean() > 0.9
    assert ok2[:25].mean() < 0.3


def test_patch_descriptor_path_matches_global_gather():
    """The patch-local descriptor path (one 37x37 gather + valid blur +
    in-patch taps) must reproduce the full-image-blur + global-gather
    formulation: identical angles, and descriptor bits equal except where
    the two blur lowerings differ in the last float ulp at a t0==t1 tie
    (tolerated at <0.5% of bits)."""
    import jax.numpy as jnp
    import numpy as np
    from triangulation_in_deformable_scenes_tpu.ops import features as F

    rng = np.random.default_rng(7)
    im = rng.uniform(0, 255, size=(240, 320)).astype(np.float32)
    impad = jnp.pad(jnp.asarray(im), F.EDGE, mode="reflect")
    n = 64
    # Production keypoints carry a 16px detection margin (extract_level);
    # inside it the 43x43 patch gather never clamps against the EDGE pad.
    xy = np.stack([
        rng.integers(16, 320 - 16, size=n), rng.integers(16, 240 - 16, size=n)
    ], axis=-1).astype(np.int32)
    xp = jnp.asarray(xy) + F.EDGE
    ok = jnp.ones((n,), bool)

    ang_old = F.ic_angle(impad, xp, ok)
    P = F._extract_patches(impad, xp, F.DESC_R)
    c = F.DESC_R - F.HALF_PATCH
    ang_new = F.ic_angle_from_patches(P[:, c:-c, c:-c], ok)
    np.testing.assert_allclose(np.asarray(ang_old), np.asarray(ang_new), atol=1e-4)

    d_old = F.orb_descriptors(F.gaussian_blur(impad), xp, ang_old, ok)
    d_new = F.orb_descriptors_from_patches(F.blur_patches(P), ang_new, ok)
    diff = np.asarray(d_old != d_new).mean()
    assert diff < 0.005, f"bit mismatch rate {diff:.4f}"
