import jax.numpy as jnp
import pytest
import numpy as np

from triangulation_in_deformable_scenes_tpu.ops import camera

# Simulation.yaml intrinsics; KB8 distortion d0..d3 default to 0
# (Settings.cc:43-50 reads absent Camera.d0..d3 as zero).
KB8_ZERO = jnp.array([458.654, 457.296, 367.215, 248.375, 0.0, 0.0, 0.0, 0.0])
KB8_DIST = jnp.array([380.0, 379.5, 320.0, 240.0, -0.01, 0.005, -0.002, 0.0004])
PH = jnp.array([458.654, 457.296, 367.215, 248.375])


def rand_points(n=64, seed=0):
    rng = np.random.default_rng(seed)
    p = rng.normal(size=(n, 3)) * np.array([0.08, 0.06, 0.02]) + np.array([0, 0, 0.2])
    return jnp.asarray(p)


def test_kb8_project_unproject_roundtrip_zero_dist():
    p = rand_points()
    pix = camera.kb8_project(KB8_ZERO, p)
    ray = camera.kb8_unproject(KB8_ZERO, pix)
    # ray is parallel to p
    pn = np.asarray(p) / np.linalg.norm(np.asarray(p), axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(ray), pn, atol=2e-5)


def test_kb8_project_unproject_roundtrip_with_dist():
    p = rand_points(seed=3)
    pix = camera.kb8_project(KB8_DIST, p)
    ray = camera.kb8_unproject(KB8_DIST, pix)
    pn = np.asarray(p) / np.linalg.norm(np.asarray(p), axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(ray), pn, atol=2e-5)


def test_kb8_ray_is_unit_norm():
    p = rand_points(seed=5)
    pix = camera.kb8_project(KB8_ZERO, p)
    ray = camera.kb8_unproject(KB8_ZERO, pix)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(ray), axis=-1), 1.0, atol=2e-5)


def test_kb8_principal_ray():
    pix = jnp.array([[367.215, 248.375]])
    ray = camera.kb8_unproject(KB8_ZERO, pix)
    np.testing.assert_allclose(np.asarray(ray), [[0.0, 0.0, 1.0]], atol=2e-5)


def test_kb8_zero_dist_is_equidistant():
    """With k=0 the KB8 model is the equidistant fisheye: radius = f*theta."""
    p = jnp.array([[0.1, 0.0, 0.2]])
    pix = camera.kb8_project(KB8_ZERO, p)
    theta = np.arctan2(0.1, 0.2)
    np.testing.assert_allclose(float(pix[0, 0]), 458.654 * theta + 367.215, rtol=1e-5)
    np.testing.assert_allclose(float(pix[0, 1]), 248.375, atol=2e-5)


def test_pinhole_roundtrip():
    p = rand_points(seed=7)
    pix = camera.pinhole_project(PH, p)
    ray = camera.pinhole_unproject(PH, pix)
    # ray z == 1; scaled by z reproduces the point
    rec = np.asarray(ray) * np.asarray(p)[:, 2:3]
    np.testing.assert_allclose(rec, np.asarray(p), atol=2e-5)


def test_pinhole_vs_kb8_small_angle():
    """Near the optical axis the equidistant and pinhole models agree."""
    p = jnp.array([[0.0005, -0.0003, 0.5]])
    pix_kb = camera.kb8_project(KB8_ZERO, p)
    pix_ph = camera.pinhole_project(PH, p)
    np.testing.assert_allclose(np.asarray(pix_kb), np.asarray(pix_ph), atol=1e-3)


def test_dispatch():
    p = rand_points(seed=9)
    # jit vs eager: fusion reassociates f32 rounding
    np.testing.assert_allclose(
        np.asarray(camera.project(camera.KB8, KB8_ZERO, p)),
        np.asarray(camera.kb8_project(KB8_ZERO, p)),
        rtol=1e-5, atol=1e-4,
    )
    pix = camera.kb8_project(KB8_ZERO, p)
    np.testing.assert_allclose(
        np.asarray(camera.unproject(camera.KB8, KB8_ZERO, pix)),
        np.asarray(camera.kb8_unproject(KB8_ZERO, pix)),
        rtol=1e-5, atol=1e-6,
    )


def test_undistort_points_matches_opencv():
    """Parity with cv::undistortPoints (Frame::undistortKeys, Frame.cc:252-277)."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    fx, fy, cx, cy = 458.654, 457.296, 367.215, 248.375
    dist = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05], dtype=np.float64)
    pts = rng.uniform([50, 50], [680, 430], size=(200, 2)).astype(np.float32)

    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=np.float64)
    expected = cv2.undistortPoints(pts.reshape(-1, 1, 2), K, dist, P=K).reshape(-1, 2)

    got = np.asarray(
        camera.undistort_points(
            jnp.asarray([fx, fy, cx, cy]), tuple(dist), jnp.asarray(pts)
        )
    )
    np.testing.assert_allclose(got, expected, atol=5e-3)  # px, f32 + 5 iters


def test_project_jac_matches_jacfwd():
    """Analytic projection Jacobians == jax.jacfwd of the projections, for
    both camera models, over a wide spread of camera-frame points."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from triangulation_in_deformable_scenes_tpu.ops import camera

    rng = np.random.default_rng(0)
    params = jnp.asarray([458.654, 457.296, 367.215, 248.375, -0.28, 0.07, 0.0002, 1.8e-5])
    p = rng.normal(size=(200, 3)) * [0.3, 0.25, 0.1] + [0, 0, 0.5]
    p = jnp.asarray(p)
    for kind in ("KB8", "PinHole"):
        want = jax.vmap(jax.jacfwd(lambda q: camera.project(kind, params, q)))(p)
        got = camera.project_jac(kind, params, p)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-4)
