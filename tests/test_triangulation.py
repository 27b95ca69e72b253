import jax.numpy as jnp
import numpy as np
import pytest

from triangulation_in_deformable_scenes_tpu.ops import lie, triangulation as tri


def make_two_view(n=40, seed=0, baseline=0.24):
    """Ground-truth rig: points ~0.2m deep, two cameras with real parallax."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)) * np.array([0.05, 0.04, 0.01]) + np.array([0.0, 0.0, 0.2])
    c1 = np.array([-baseline / 2, 0.02, 0.0])
    c2 = np.array([baseline / 2, 0.01, 0.0])
    R1 = np.asarray(lie.look_at(jnp.asarray(c1), jnp.asarray(pts.mean(0))))
    R2 = np.asarray(lie.look_at(jnp.asarray(c2), jnp.asarray(pts.mean(0))))
    # Reference convention: Tcw = (R_lookat, camera_pos) (SLAM.cc:223-235).
    T1w = (jnp.asarray(R1), jnp.asarray(c1))
    T2w = (jnp.asarray(R2), jnp.asarray(c2))
    p_c1 = np.asarray(lie.apply(*T1w, jnp.asarray(pts)))
    p_c2 = np.asarray(lie.apply(*T2w, jnp.asarray(pts)))
    xn1 = p_c1 / np.linalg.norm(p_c1, axis=-1, keepdims=True)
    xn2 = p_c2 / np.linalg.norm(p_c2, axis=-1, keepdims=True)
    return jnp.asarray(pts), jnp.asarray(xn1), jnp.asarray(xn2), T1w, T2w


@pytest.mark.parametrize("method", [tri.CLASSIC, tri.NRSLAM, tri.ORBSLAM])
def test_rigid_scene_exact(method):
    """With a rigid scene and exact rays, all methods with the in-rays seed
    must recover the ground-truth points for BOTH outputs."""
    pts, xn1, xn2, T1w, T2w = make_two_view()
    x1, x2 = tri.triangulate(xn1, xn2, T1w, T2w, method=method, location=tri.IN_RAYS)
    # Classic's plane normal (middle singular vector) is ill-conditioned at
    # low parallax: direction error ~ eps * s1/(s1-s2), so f32 gives ~3e-4 m
    # worst case on this 5.8-degree rig -- far below the pixel-noise-induced
    # triangulation error (~2.3 mm) the pipeline operates at.
    atol = 5e-4 if method == tri.CLASSIC else 2e-5
    np.testing.assert_allclose(np.asarray(x1), np.asarray(pts), atol=atol)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(pts), atol=atol)


def test_depth_method_exact():
    pts, xn1, xn2, T1w, T2w = make_two_view()
    # DepthMeasurement expects metric camera-frame points (ray * true depth).
    p_c1 = lie.apply(*T1w, pts)
    p_c2 = lie.apply(*T2w, pts)
    x1, x2 = tri.triangulate(p_c1, p_c2, T1w, T2w, method=tri.DEPTH, location=tri.IN_RAYS)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(pts), atol=2e-5)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(pts), atol=2e-5)


def test_two_points_seed_collapses():
    """TwoPoints mode returns the same seed for both sets (Geometry.cc:138-140)."""
    pts, xn1, xn2, T1w, T2w = make_two_view()
    x1, x2 = tri.triangulate(xn1, xn2, T1w, T2w, method=tri.NRSLAM, location=tri.TWO_POINTS)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(pts), atol=2e-5)


def test_far_points_mirror():
    """FarPoints reflects each in-ray point through the midpoint seed
    (Geometry.cc:141-145): p_far = 2*p_inray - midpoint."""
    pts, xn1, xn2, T1w, T2w = make_two_view()
    mid1, mid2 = tri.triangulate(xn1, xn2, T1w, T2w, method=tri.NRSLAM, location=tri.TWO_POINTS)
    ray1, ray2 = tri.triangulate(xn1, xn2, T1w, T2w, method=tri.NRSLAM, location=tri.IN_RAYS)
    far1, far2 = tri.triangulate(xn1, xn2, T1w, T2w, method=tri.NRSLAM, location=tri.FAR_POINTS)
    np.testing.assert_allclose(np.asarray(far1), 2 * np.asarray(ray1) - np.asarray(mid1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(far2), 2 * np.asarray(ray2) - np.asarray(mid2), atol=2e-5)


def test_parallax_mask():
    pts, xn1, xn2, T1w, T2w = make_two_view()
    x1, x2 = tri.triangulate(xn1, xn2, T1w, T2w, method=tri.NRSLAM, location=tri.IN_RAYS)
    # Generous threshold (reference Simulation.yaml Triangulation.minCos 0.9998):
    mask = tri.valid_parallax_mask(xn1, xn2, T1w, T2w, x1, x2, min_cos=0.9998)
    assert bool(jnp.all(mask))
    # With an impossible threshold everything is culled.
    mask0 = tri.valid_parallax_mask(xn1, xn2, T1w, T2w, x1, x2, min_cos=-1.0)
    assert not bool(jnp.any(mask0))


def test_negative_depth_culled():
    pts, xn1, xn2, T1w, T2w = make_two_view()
    x1, x2 = tri.triangulate(xn1, xn2, T1w, T2w, method=tri.NRSLAM, location=tri.IN_RAYS)
    behind = -np.asarray(x1)  # points mirrored behind the cameras
    mask = tri.valid_parallax_mask(xn1, xn2, T1w, T2w, jnp.asarray(behind), x2, min_cos=0.9998)
    assert not bool(jnp.all(mask))


def test_jit_and_vmap_compatible():
    import jax

    pts, xn1, xn2, T1w, T2w = make_two_view()
    f = jax.jit(
        lambda a, b: tri.triangulate(a, b, T1w, T2w, method=tri.NRSLAM, location=tri.FAR_POINTS)
    )
    x1, x2 = f(xn1, xn2)
    assert x1.shape == pts.shape
