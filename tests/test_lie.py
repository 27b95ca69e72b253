import jax.numpy as jnp
import numpy as np
import pytest

from triangulation_in_deformable_scenes_tpu.ops import lie


def random_rotations(n, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(n, 3))
    return np.asarray(lie.so3_exp(jnp.asarray(w)))


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(32, 3)) * 1.5
    R = lie.so3_exp(jnp.asarray(w))
    w2 = lie.so3_log(R)
    R2 = lie.so3_exp(w2)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=2e-5)


def test_so3_exp_is_rotation():
    R = random_rotations(16)
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), np.broadcast_to(np.eye(3), R.shape), atol=2e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=2e-5)


def test_so3_exp_small_angle():
    w = jnp.array([[1e-10, 0.0, 0.0], [0.0, 0.0, 0.0]])
    R = lie.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R), np.broadcast_to(np.eye(3), (2, 3, 3)), atol=2e-5)


def test_se3_exp_zero_is_identity():
    R, t = lie.se3_exp(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=2e-5)
    np.testing.assert_allclose(np.asarray(t), np.zeros(3), atol=2e-5)


def test_se3_exp_pure_translation():
    R, t = lie.se3_exp(jnp.array([0.0, 0.0, 0.0, 1.0, 2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(t), [1.0, 2.0, 3.0], atol=2e-5)


def test_compose_inverse():
    rng = np.random.default_rng(2)
    xi = rng.normal(size=6)
    R, t = lie.se3_exp(jnp.asarray(xi))
    Ri, ti = lie.inverse(R, t)
    Rc, tc = lie.compose(R, t, Ri, ti)
    np.testing.assert_allclose(np.asarray(Rc), np.eye(3), atol=2e-5)
    np.testing.assert_allclose(np.asarray(tc), np.zeros(3), atol=2e-5)


def test_apply_matches_matrix():
    rng = np.random.default_rng(3)
    xi = rng.normal(size=6)
    R, t = lie.se3_exp(jnp.asarray(xi))
    p = rng.normal(size=(10, 3))
    out = lie.apply(R, t, jnp.asarray(p))
    expect = p @ np.asarray(R).T + np.asarray(t)
    np.testing.assert_allclose(np.asarray(out), expect, atol=2e-5)


def test_look_at_columns():
    """Columns are (right, up, forward); forward points at the target.

    Parity with SLAM::lookAt (SLAM.cc:340-351)."""
    cam = jnp.array([0.14, 0.01, 0.06])
    target = jnp.array([-0.0498734, -0.0313675, 0.1932972])
    R = lie.look_at(cam, target)
    forward = np.asarray(R)[:, 2]
    expect_f = np.array(target - cam)
    expect_f = expect_f / np.linalg.norm(expect_f)
    np.testing.assert_allclose(forward, expect_f, atol=2e-5)
    # Orthonormal
    np.testing.assert_allclose(np.asarray(R).T @ np.asarray(R), np.eye(3), atol=2e-5)


def test_kabsch_recovers_rotation():
    rng = np.random.default_rng(4)
    R_true = random_rotations(1, seed=7)[0]
    src = rng.normal(size=(50, 3))
    dst = src @ R_true.T  # dst = R . src
    # Reference convention (Geometry.cc:530-539): H = sum src dst^T, R = V U^T
    # recovers the rotation mapping src -> dst (same convention as the ARAP
    # per-vertex rotations, which compare R*(undeformed) against deformed).
    R_est, _ = lie.kabsch(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(R_est), R_true, atol=2e-5)


def test_fit_rotation_det_positive():
    rng = np.random.default_rng(5)
    H = rng.normal(size=(20, 3, 3))
    R = lie.fit_rotation(jnp.asarray(H))
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=2e-5)


def test_quat_to_matrix_identity():
    R = lie.quat_to_matrix(jnp.array([0.0, 0.0, 0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=2e-5)
