"""World-map domain model + classic BA tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from triangulation_in_deformable_scenes_tpu.models import bundle_adjustment as ba
from triangulation_in_deformable_scenes_tpu.ops import camera, lie, matching
from triangulation_in_deformable_scenes_tpu.pipeline.worldmap import (
    KeyFrameData,
    WorldMap,
)

CAM = np.array([458.654, 457.296, 367.215, 248.375, 0, 0, 0, 0], dtype=np.float64)


def make_scene(n_pts=40, n_kf=3, seed=0, noise_px=0.0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n_pts, 3)) * [0.08, 0.06, 0.02] + [0, 0, 0.6]
    poses = []
    for k in range(n_kf):
        c = np.array([-0.1 + 0.1 * k, 0.02 * k, 0.0])
        R = np.asarray(lie.look_at(jnp.asarray(c), jnp.asarray(pts.mean(0))))
        poses.append((R, c))  # world-to-camera (reference convention)
    obs = []
    for k, (R, t) in enumerate(poses):
        pc = pts @ R.T + t
        uv = np.asarray(camera.kb8_project(jnp.asarray(CAM), jnp.asarray(pc)))
        uv = uv + rng.normal(scale=noise_px, size=uv.shape) if noise_px else uv
        obs.append(uv)
    return pts, poses, obs


def make_map(pts, poses, obs):
    rng = np.random.default_rng(7)
    wm = WorldMap(min_common_obs=5)
    descs = rng.integers(0, 2, size=(len(pts), 256)).astype(np.int8)
    mp_ids = [wm.insert_map_point(p) for p in pts]
    for k, ((R, t), uv) in enumerate(zip(poses, obs)):
        kf = KeyFrameData(
            kf_id=k, R_cw=R, t_cw=t, kp=uv, octave=np.zeros(len(pts), dtype=int),
            desc=descs + (rng.integers(0, 2, size=descs.shape) * (rng.random(descs.shape) < 0.02)).astype(np.int8) % 2,
        )
        wm.insert_keyframe(kf)
        for i, m in enumerate(mp_ids):
            wm.add_observation(k, m, i, update_stats=False)
    for m in mp_ids:
        wm.update_orientation_and_descriptor(m)
    return wm, mp_ids


def test_observation_and_covisibility_graphs():
    pts, poses, obs = make_scene()
    wm, mp_ids = make_map(pts, poses, obs)
    assert wm.common_observations(0, 1) == len(pts)
    assert wm.is_map_point_in_keyframe(mp_ids[3], 1) == 3
    wm.remove_observation(1, mp_ids[3])
    assert wm.is_map_point_in_keyframe(mp_ids[3], 1) == -1
    assert wm.common_observations(0, 1) == len(pts) - 1


def test_local_map_and_fixed_keyframes():
    pts, poses, obs = make_scene()
    wm, mp_ids = make_map(pts, poses, obs)
    local_mps, local_kfs, fixed = wm.local_map_of_keyframe(0)
    assert local_kfs == {0, 1, 2}  # fully covisible
    assert len(local_mps) == len(pts)
    assert fixed == set()


def test_fuse_map_points_merges_observations():
    pts, poses, obs = make_scene()
    wm, mp_ids = make_map(pts, poses, obs)
    a, b = mp_ids[0], mp_ids[1]
    # detach b from kf2 so a (3 obs) wins over b (2 obs)
    wm.remove_observation(2, b)
    keep = wm.fuse_map_points(a, b)
    assert keep == a
    assert b not in wm.map_points
    assert wm.n_observations(a) == 3


def test_normal_and_descriptor_update():
    pts, poses, obs = make_scene()
    wm, mp_ids = make_map(pts, poses, obs)
    mp = wm.map_points[mp_ids[0]]
    assert mp.descriptor is not None and mp.descriptor.shape == (256,)
    # Normal points from the cameras toward the point (z-ish direction).
    assert mp.normal @ np.array([0, 0, 1.0]) > 0.5
    assert mp.max_distance_invariance > mp.min_distance_invariance > 0


def test_clone_is_independent():
    pts, poses, obs = make_scene()
    wm, mp_ids = make_map(pts, poses, obs)
    c = wm.clone()
    c.remove_map_point(mp_ids[0])
    assert mp_ids[0] in wm.map_points
    assert wm.n_observations(mp_ids[0]) == 3


def test_bundle_adjustment_reduces_noise():
    pts, poses, obs = make_scene(noise_px=0.0)
    rng = np.random.default_rng(3)
    K, M = len(poses), len(pts)
    E = K * M
    data = ba.BAData(
        obs_kf=jnp.asarray(np.repeat(np.arange(K), M), dtype=jnp.int32),
        obs_mp=jnp.asarray(np.tile(np.arange(M), K), dtype=jnp.int32),
        obs_uv=jnp.asarray(np.concatenate(obs, axis=0)),
        obs_info=jnp.ones(E),
        obs_valid=jnp.ones(E, dtype=bool),
        cam_params=jnp.asarray(CAM),
        # Two fixed poses remove the monocular scale gauge so the points are
        # fully determined (with one fixed pose BA reaches zero cost on a
        # rescaled scene -- the expected gauge freedom).
        fixed_pose=jnp.asarray([True, True, False]),
    )
    # Perturb points and the non-fixed pose.
    state0 = ba.BAState(
        R=jnp.asarray(np.stack([R for R, _ in poses])),
        t=jnp.asarray(np.stack([t for _, t in poses]) + rng.normal(scale=2e-3, size=(K, 3)) * [0, 0, 1]),
        points=jnp.asarray(pts + rng.normal(scale=2e-3, size=pts.shape)),
    )
    res = ba.bundle_adjustment("KB8", data, state0, n_iterations=20)
    assert float(res.cost) < float(res.initial_cost) * 1e-3
    err = np.linalg.norm(np.asarray(res.state.points) - pts, axis=-1)
    err0 = np.linalg.norm(np.asarray(state0.points) - pts, axis=-1)
    assert err.mean() < err0.mean() * 0.2
    # Fixed pose untouched.
    np.testing.assert_allclose(np.asarray(res.state.R[0]), poses[0][0], atol=1e-12)


def test_pose_only_optimization_recovers_pose_and_culls_outliers():
    pts, poses, obs = make_scene(n_kf=1)
    R, t = poses[0]
    uv = obs[0].copy()
    uv[:5] += 80.0  # gross outliers
    rng = np.random.default_rng(4)
    xi = np.concatenate([rng.normal(scale=0.01, size=3), rng.normal(scale=0.005, size=3)])
    dR, dt = lie.se3_exp(jnp.asarray(xi))
    R0 = np.asarray(dR) @ R
    t0 = np.asarray(dR) @ t + np.asarray(dt)
    R1, t1, inliers = ba.pose_only_optimization(
        "KB8", CAM, pts, uv, np.ones(len(pts)), R0, t0
    )
    assert inliers[5:].all()
    assert not inliers[:5].any()
    np.testing.assert_allclose(R1, R, atol=1e-5)
    np.testing.assert_allclose(t1, t, atol=1e-5)


def test_local_bundle_adjustment_runs_and_culls():
    pts, poses, obs = make_scene(noise_px=0.2)
    wm, mp_ids = make_map(pts, poses, obs)
    # corrupt one observation so it gets culled
    wm.keyframes[1].kp[0] += 50.0
    n_edges, n_removed = ba.local_bundle_adjustment(wm, 1, "KB8", CAM, n_iterations=10)
    assert n_edges == 3 * len(pts)
    assert n_removed >= 1
    assert wm.is_map_point_in_keyframe(mp_ids[0], 1) == -1


def test_matchers_batched_variants():
    """guided/projection/triangulation/fuse matchers find identity matches on
    duplicated descriptor sets."""
    rng = np.random.default_rng(5)
    n = 60
    desc = rng.integers(0, 2, size=(n, 256)).astype(np.int8)
    kp = rng.uniform(50, 400, size=(n, 2))
    octv = np.zeros(n, dtype=int)
    valid = np.ones(n, dtype=bool)
    sf = jnp.asarray([1.2**o for o in range(8)])

    m, cnt = matching.guided_matching(
        jnp.asarray(kp), jnp.asarray(desc), jnp.asarray(octv), jnp.asarray(valid),
        jnp.asarray(kp), jnp.asarray(desc), jnp.asarray(octv), jnp.asarray(valid), sf,
    )
    assert int(cnt) > n * 0.9
    idx = np.nonzero(np.asarray(m) >= 0)[0]
    np.testing.assert_array_equal(np.asarray(m)[idx], idx)

    view_cos = np.ones(n)
    dist = np.full(n, 0.5)
    m2, cnt2 = matching.search_with_projection(
        jnp.asarray(kp), jnp.asarray(desc), jnp.asarray(valid), jnp.asarray(view_cos),
        jnp.asarray(dist), jnp.asarray(np.full(n, 0.1)), jnp.asarray(np.full(n, 0.55)),
        jnp.asarray(kp), jnp.asarray(desc), jnp.asarray(octv), jnp.asarray(valid), sf,
    )
    assert int(cnt2) > n * 0.9

    m4, cnt4 = matching.fuse_matching(
        jnp.asarray(kp), jnp.asarray(desc), jnp.asarray(octv), jnp.asarray(valid),
        jnp.asarray(kp), jnp.asarray(desc), jnp.asarray(octv), jnp.asarray(valid), sf,
    )
    assert int(cnt4) > n * 0.9


def test_search_for_triangulation_epipolar():
    """Epipolar-constrained matching on a rendered two-view geometry."""
    pts, poses0, obs = make_scene(n_pts=50, n_kf=2, seed=9)
    rng = np.random.default_rng(9)
    desc = rng.integers(0, 2, size=(50, 256)).astype(np.int8)
    (R1, t1), (R2, t2) = poses0
    r1 = np.asarray(camera.kb8_unproject(jnp.asarray(CAM), jnp.asarray(obs[0])))
    r2 = np.asarray(camera.kb8_unproject(jnp.asarray(CAM), jnp.asarray(obs[1])))
    R12 = R1 @ R2.T
    t12 = t1 - R12 @ t2
    E = matching.essential_from_pose(jnp.asarray(R12), jnp.asarray(t12))
    m, cnt = matching.search_for_triangulation(
        jnp.asarray(desc), jnp.asarray(desc), jnp.asarray(r1), jnp.asarray(r2), E,
        jnp.ones(50, dtype=bool), jnp.ones(50, dtype=bool), th=50.0, epipolar_th=0.01,
    )
    idx = np.nonzero(np.asarray(m) >= 0)[0]
    assert int(cnt) > 40
    np.testing.assert_array_equal(np.asarray(m)[idx], idx)


def test_scene_median_depth_and_invariants():
    """KeyFrame::computeSceneMedianDepth (KeyFrame.cc:231-244) + the debug
    invariants Map::checkKeyFrame / Frame::checkAllMapPointsAreGood."""
    from triangulation_in_deformable_scenes_tpu.pipeline.worldmap import (
        KeyFrameData,
        WorldMap,
    )

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(11, 3)) * 0.02 + [0, 0, 0.5]
    fx = fy = 100.0

    def project(p3d):
        return np.stack(
            [fx * p3d[:, 0] / p3d[:, 2] + 160, fy * p3d[:, 1] / p3d[:, 2] + 120], axis=1
        )

    kp = project(pts)
    kf = KeyFrameData(
        kf_id=0, R_cw=np.eye(3), t_cw=np.zeros(3), kp=kp,
        octave=np.zeros(len(pts), dtype=int), desc=np.zeros((len(pts), 256), dtype=np.int8),
    )
    # nth_element semantics: the size//2-th order statistic of camera depths
    z = pts[:, 2]
    assert kf.scene_median_depth(pts) == pytest.approx(np.sort(z)[len(z) // 2])

    wm = WorldMap()
    wm.insert_keyframe(kf)
    for i, p in enumerate(pts):
        mp = wm.insert_map_point(p)
        wm.add_observation(0, mp, i)
    wm.check_keyframe(0)
    wm.check_all_map_points_are_good(kf, project)

    # a corrupted point must trip the reprojection invariant
    first_mp = next(iter(wm.kf_obs[0]))
    wm.map_points[first_mp].position = wm.map_points[first_mp].position + 0.05
    with pytest.raises(AssertionError):
        wm.check_all_map_points_are_good(kf, project)


def test_build_pair_map_wires_dual_points_and_global_transform():
    """Live-pipeline map insertion (Mapping.cc:183-247): 2 keyframes, two map
    points per valid match, observation graph entries, refined global SE3 in
    the pairwise store, refined depth scales on the keyframes."""
    import jax.numpy as jnp

    from triangulation_in_deformable_scenes_tpu.models import deformable
    from triangulation_in_deformable_scenes_tpu.pipeline.worldmap import build_pair_map

    rng = np.random.default_rng(0)
    n = 10
    kp = rng.uniform(0, 100, size=(n, 2))
    p1 = rng.normal(size=(n, 3))
    p2 = p1 + 0.01
    valid = np.ones(n, bool)
    valid[3] = False
    Rg = np.eye(3)
    tg = np.array([0.0, 0.01, 0.0])
    state = deformable.PairState(
        p1=jnp.asarray(p1), p2=jnp.asarray(p2),
        s1=jnp.asarray(0.5), s2=jnp.asarray(1.5),
        Rg=jnp.asarray(Rg), tg=jnp.asarray(tg))
    m = build_pair_map(
        (np.eye(3), np.zeros(3)), (np.eye(3), np.ones(3)), kp, kp,
        None, None, None, None, p1[:, 2], p2[:, 2], state, valid)

    assert len(m.keyframes) == 2
    assert len(m.map_points) == 2 * (n - 1)
    kf1, kf2 = sorted(m.keyframes)
    assert len(m.kf_obs[kf1]) == n - 1 and len(m.kf_obs[kf2]) == n - 1
    m.check_keyframe(kf1)
    m.check_keyframe(kf2)
    assert m.keyframes[kf1].depth_scale == 0.5
    assert m.keyframes[kf2].depth_scale == 1.5
    R, t = m.get_global_transform(kf1, kf2)
    np.testing.assert_allclose(t, tg)
    # Dual points: one registry entry holds p1[i], its sibling p2[i].
    positions = np.stack([mp.position for mp in m.map_points.values()])
    for i in range(n):
        if not valid[i]:
            continue
        assert np.isclose(positions, p1[i]).all(-1).any()
        assert np.isclose(positions, p2[i]).all(-1).any()
