"""Rigid-hypothesis refinement + model selection (models/rigid.py).

Pins the capability VERDICT r3 demanded: on an exactly-rigid scene the
framework must denoise BELOW the depth-noise floor (the reference's
committed rigid cells go ~2.5 -> 0.84-1.7 mm,
``Data/Excels/Synthetic/Depth uncertainty/Errors 3.csv`` rigid rows), while
deforming scenes must veto the rigid candidate.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from triangulation_in_deformable_scenes_tpu.models import deformable, rigid
from triangulation_in_deformable_scenes_tpu.ops import camera, lie

CAM = np.array([458.654, 457.296, 367.215, 248.375, 0, 0, 0, 0], dtype=np.float64)
SIGMA_D = 0.003  # 3 mm depth noise, the ARAP_depth_3mm condition


def make_rigid_problem(n_side=7, seed=0, gaussian_mm=0.0, px_noise=0.5):
    """Two-view problem whose true deformation is one SE3 (plus optional
    per-point gaussian movement), with noisy depths and pixels -- the
    committed-sweep measurement model (sweep.py committed_parity)."""
    rng = np.random.default_rng(seed)
    xs, ys = np.meshgrid(np.linspace(-0.05, 0.05, n_side), np.linspace(-0.04, 0.04, n_side))
    p1_gt = np.stack([xs.ravel(), ys.ravel(), 0.2 + 0.01 * xs.ravel()], axis=-1)
    # True scene motion: a 10 mm translation + small rotation.
    Rr_true = np.asarray(lie.so3_exp(jnp.asarray([0.02, -0.03, 0.01])))
    tr_true = np.array([0.006, -0.005, 0.006])
    p2_gt = p1_gt @ Rr_true.T + tr_true
    if gaussian_mm > 0:
        p2_gt = p2_gt + rng.normal(scale=gaussian_mm / 1000.0, size=p2_gt.shape)
    n = len(p1_gt)

    c1 = np.array([0.0, 0.0, 0.0])
    c2 = np.array([0.14, 0.01, 0.06])
    T1w = (jnp.eye(3), jnp.asarray(c1))
    T2w = (lie.look_at(jnp.asarray(c2), jnp.asarray(p2_gt[0])), jnp.asarray(c2))

    kp1 = np.asarray(camera.kb8_project(jnp.asarray(CAM), lie.apply(*T1w, jnp.asarray(p1_gt))))
    kp2 = np.asarray(camera.kb8_project(jnp.asarray(CAM), lie.apply(*T2w, jnp.asarray(p2_gt))))
    kp1 = np.round(kp1 + rng.normal(scale=px_noise, size=kp1.shape), 1)
    kp2 = np.round(kp2 + rng.normal(scale=px_noise, size=kp2.shape), 1)

    d1 = np.asarray(lie.apply(*T1w, jnp.asarray(p1_gt)))[:, 2] + rng.normal(scale=SIGMA_D, size=n)
    d2 = np.asarray(lie.apply(*T2w, jnp.asarray(p2_gt)))[:, 2] + rng.normal(scale=SIGMA_D, size=n)

    # InRays-style initialization: GT + along-ray depth noise.
    p1_0 = p1_gt + rng.normal(scale=2e-3, size=p1_gt.shape)
    p2_0 = p2_gt + rng.normal(scale=2e-3, size=p2_gt.shape)

    data = deformable.make_pair_data(
        kp1=kp1, kp2=kp2, depth1=d1, depth2=d2, valid=np.ones(n, dtype=bool),
        cam_params=CAM, T1w=T1w, T2w=T2w, p1=p1_0, p2=p2_0,
        scale_priors=(1.0, 1e6, 1.0, 1e6),
    )
    state0 = deformable.PairState(
        p1=jnp.asarray(p1_0), p2=jnp.asarray(p2_0),
        s1=jnp.asarray(1.0), s2=jnp.asarray(1.0), Rg=jnp.eye(3), tg=jnp.zeros(3),
    )
    return data, state0, p1_gt, p2_gt


HYPER = deformable.Hyper(
    rep_w=jnp.asarray(1.0), arap_w=jnp.asarray(1.0),
    depth_sigma=jnp.asarray(SIGMA_D), global_w=jnp.asarray(1.0),
    alpha=jnp.asarray(1.0), beta=jnp.asarray(1.0),
)


def av_err(state, p1_gt, p2_gt):
    e1 = np.linalg.norm(np.asarray(state.p1) - p1_gt, axis=-1)
    e2 = np.linalg.norm(np.asarray(state.p2) - p2_gt, axis=-1)
    return float(np.concatenate([e1, e2]).mean())


def test_rigid_solve_denoises_below_depth_floor():
    data, state0, p1_gt, p2_gt = make_rigid_problem()
    spec = deformable.MODELS["ARAP_depth_3mm"]
    err0 = av_err(state0, p1_gt, p2_gt)
    cand, diag = rigid.solve_rigid(camera.KB8, data, HYPER, state0, 30, spec)
    err1 = av_err(cand, p1_gt, p2_gt)
    # The rigid MLE averages the depth noise across the cloud: the error
    # must drop well below the initial per-point noise level.
    assert err1 < 0.6 * err0
    assert err1 < 1.5e-3  # < 1.5 mm from ~2 mm initial at 3 mm depth noise
    # The candidate passes the acceptance tests the outer loop applies.
    assert float(diag.sigma1) < 1.0 and float(diag.sigma2) < 1.0
    assert max(float(diag.depth_rms1), float(diag.depth_rms2)) < 1.5 * SIGMA_D
    # p2 is exactly the rigid image of p1 under the returned global vertex
    # (Rg p2 - tg = p1 convention, g2oTypes.h:300-349).
    back = np.asarray(cand.p2) @ np.asarray(cand.Rg).T - np.asarray(cand.tg)
    np.testing.assert_allclose(back, np.asarray(cand.p1), atol=1e-6)


def test_rigid_hypothesis_vetoed_on_deforming_scene():
    data, state0, p1_gt, p2_gt = make_rigid_problem(gaussian_mm=10.0)
    spec = deformable.MODELS["ARAP_depth_3mm"]
    cand, diag = rigid.solve_rigid(camera.KB8, data, HYPER, state0, 30, spec)
    # Forcing rigidity on a 10 mm-gaussian scene must pay pixels: the
    # acceptance sigma test fails (this is the veto deformation_optimization
    # applies -- the general solution stays).
    assert max(float(diag.sigma1), float(diag.sigma2)) > 1.5


def test_midpoint_init_recovers_shape_from_bad_seed():
    data, state0, p1_gt, p2_gt = make_rigid_problem()
    # Corrupt the shape the way the FarPoints seed does
    # (``triangulate_depth``: each point reflected away from the pair
    # midpoint, i.e. +- half the apparent motion) -- the restarted
    # multi-start solve must still recover the scene. (A PURE similarity
    # scaling about both camera centers is deliberately not tested: that is
    # the model's exact gauge direction, identifiable only through the
    # scale anchors -- see residual_vector_rigid.)
    half = (state0.p1 - state0.p2) * 0.5
    bad = state0._replace(p1=state0.p1 + half, p2=state0.p2 - half)
    spec = deformable.MODELS["ARAP_depth_3mm"]
    cand, diag = rigid.solve_rigid(camera.KB8, data, HYPER, bad, 30, spec)
    err1 = av_err(cand, p1_gt, p2_gt)
    assert err1 < 1.5e-3
