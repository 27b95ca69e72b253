#!/usr/bin/env python3
"""Benchmark: accuracy vs the reference's committed sweep + solver throughput.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., ...extras}

Accuracy condition (like-for-like with the committed sweep)
-----------------------------------------------------------
Fixture: ``Data/SinteticDataBase/20cm Depth/Gradual/10 mm gaussian + rigid/3``
(identical to ``Data/{original,moved}_points.csv``; avg movement 20.895 mm).
Configuration: the sweep-time configuration that actually produced the
committed numbers -- ``Triangulation.method: DepthMeasurement`` with unit
depth scales and DepthError 3 mm (model ARAP_depth_3mm). Evidence that this,
not the shipped Simulation.yaml's NRSLAM + corrupted scales, generated the
committed traces: the ARAP_depth_{1,3,8}mm InRays initial errors equal
E|N(0, sigma_d)| exactly (1.2 / 2.67 / 6.6 mm), and an independent numpy
transliteration of the shipped NRSLAM code reproduces THIS repo's NRSLAM
numbers, not the committed ones. Under this configuration the repo reproduces
the committed per-instance initial errors to <0.05 mm (FarPoints 11.455 vs
11.50; TwoPoints 10.669 vs 10.67; InRays 2.634 vs 2.67).

Budget: the SHIPPED outer budget (Simulation.yaml: 20 rounds x 30 evals),
no reductions. The outer loop may stop earlier via its convergence criteria
(monotone acceptance, models/outer.py) -- the budget is an upper bound in
the reference too (update-magnitude stop, g2oBundleAdjustment.cc:481-482).

Baselines (``Data/Excels/Synthetic/Depth uncertainty/Errors 3.csv``, row
"20,90 Gradual 10 10"): ARAP_depth_3mm-FarPoints Final = 28.85 mm (the
shipped seed mode; primary), ARAP_depth_3mm-TwoPoints Final = 13.69 mm (the
reference's best column on this condition; also reported).
``vs_baseline`` = baseline / ours (>1 means more accurate than the
reference). Accuracy is the mean over 3 noise seeds.

Extras: per-phase timings, dense-LM iterations/s at the fixture size,
matrix-free-CG LM iterations/s at the reference's committed problem size
(~2600 pairs, 5174-dim in the reference's parameterization; debug.txt:1-5),
compiled-Pallas vs XLA matching time at 2048x2048, and a virtual-8-device
communication-overhead check (same silicon, so not a scaling claim).
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

REF_DATA = "/root/reference/Data"
FIXTURE = os.path.join(REF_DATA, "SinteticDataBase", "20cm Depth", "Gradual",
                       "10 mm gaussian + rigid", "3")
BASELINE_FAR_FINAL_MM = 28.85   # ARAP_depth_3mm-FarPoints Final, row "20,90 Gradual 10 10"
BASELINE_TWO_FINAL_MM = 13.69   # ARAP_depth_3mm-TwoPoints Final, same row
BASELINE_FAR_INITIAL_MM = 11.50
BASELINE_TWO_INITIAL_MM = 10.67


def sweep_cfg(cfg, location):
    return dataclasses.replace(
        cfg,
        triangulation_method="DepthMeasurement",
        triangulation_location=location,
        sim_depth_scale_c1=1.0,
        sim_depth_scale_c2=1.0,
        sim_depth_error=3.0,
        opt_model="ARAP_depth_3mm",
    )


def accuracy_runs(cfg, seeds=(0, 1, 2)):
    from triangulation_in_deformable_scenes_tpu.pipeline.simulation import SimulationPipeline

    out = {}
    orig = os.path.join(FIXTURE, "original_points.csv")
    moved = os.path.join(FIXTURE, "moved_points.csv")
    for location in ("FarPoints", "TwoPoints"):
        c = sweep_cfg(cfg, location)
        finals, initials, walls = [], [], []
        for seed in seeds:
            pipe = SimulationPipeline(c, seed=seed)
            t0 = time.perf_counter()
            res = pipe.run(orig, moved, journal_path=f"/tmp/bench_{location}_{seed}.txt")
            walls.append(time.perf_counter() - t0)
            finals.append(res.final.av_error * 1000.0)
            initials.append(res.initial.av_error * 1000.0)
        out[location] = {
            "final_mm": sum(finals) / len(finals),
            "final_mm_per_seed": [round(v, 3) for v in finals],
            "initial_mm": sum(initials) / len(initials),
            "wall_s": sum(walls) / len(walls),
        }
    return out


def phase_timings(cfg):
    """Per-phase steady-state timings on the FarPoints configuration."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from triangulation_in_deformable_scenes_tpu.models import deformable, outer
    from triangulation_in_deformable_scenes_tpu.pipeline.simulation import SimulationPipeline
    from triangulation_in_deformable_scenes_tpu.utils import csvio

    c = sweep_cfg(cfg, "FarPoints")
    pipe = SimulationPipeline(c, seed=0)
    rng = np.random.default_rng(0)
    orig, moved = csvio.load_point_pairs(
        os.path.join(FIXTURE, "original_points.csv"), os.path.join(FIXTURE, "moved_points.csv")
    )
    T1w, T2w = pipe._poses(moved[0])
    kp1, kp2, d1, d2 = pipe._simulate_observations(orig, moved, T1w, T2w, rng)

    def timed(fn, reps=5):
        fn()  # compile/warm
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        return (time.perf_counter() - t0) / reps

    t_triangulate = timed(lambda: pipe._triangulate(kp1, kp2, T1w, T2w, d1, d2))
    p1, p2, valid, _, _ = pipe._triangulate(kp1, kp2, T1w, T2w, d1, d2)

    t_mesh = timed(
        lambda: deformable.make_pair_data(
            kp1=kp1, kp2=kp2, depth1=d1, depth2=d2, valid=valid,
            cam_params=c.kb8_params, T1w=T1w, T2w=T2w, p1=p1, p2=p2,
        )
    )
    data = deformable.make_pair_data(
        kp1=kp1, kp2=kp2, depth1=d1, depth2=d2, valid=valid,
        cam_params=c.kb8_params, T1w=T1w, T2w=T2w, p1=p1, p2=p2,
    )
    from triangulation_in_deformable_scenes_tpu.precision import FP
    state = deformable.PairState(
        p1=jnp.asarray(p1), p2=jnp.asarray(p2),
        s1=jnp.asarray(1.0, FP), s2=jnp.asarray(1.0, FP),
        Rg=jnp.eye(3, dtype=FP), tg=jnp.zeros(3, dtype=FP),
    )
    hyper = deformable.Hyper(
        rep_w=jnp.asarray(1.0, FP), arap_w=jnp.asarray(1e-4, FP),
        depth_sigma=jnp.asarray(0.003, FP), global_w=jnp.asarray(50.0, FP),
        alpha=jnp.asarray(1.0, FP), beta=jnp.asarray(1.0, FP),
    )
    n_inner = int(cfg.n_opt_iterations)
    t_inner = timed(
        lambda: deformable.solve_pair("KB8", data, hyper, state, n_inner).cost.block_until_ready()
    )

    import numpy as _np
    lb = _np.array([c.nlopt_rep_lower, c.nlopt_global_lower, c.nlopt_arap_lower])
    ub = _np.array([c.nlopt_rep_upper, c.nlopt_global_upper, c.nlopt_arap_upper])
    w0 = _np.array([c.opt_rep_weight, c.opt_global_weight, c.opt_arap_weight])
    wide = (lb > 0) & (ub / _np.maximum(lb, 1e-300) > 1e2)
    zs = _np.where(wide, _np.log10(_np.maximum(w0, 1e-300)), w0)
    zlb = _np.where(wide, _np.log10(_np.maximum(lb, 1e-300)), lb)
    zub = _np.where(wide, _np.log10(_np.maximum(ub, 1e-300)), ub)
    free_idx = _np.nonzero(ub > lb)[0]
    nm_iters = max(1, (int(c.nlopt_n_optimizations) - (len(free_idx) + 1)) * 2 // 3)

    def nm_round():
        w, s, f = outer.nm_weight_search_device(
            "KB8", data, state, jnp.asarray(zs), jnp.asarray(free_idx, jnp.int32),
            jnp.asarray(zlb), jnp.asarray(zub), jnp.asarray(wide),
            jnp.asarray(0.003), jnp.asarray(1.0), jnp.asarray(1.0),
            n_inner=n_inner, spec=deformable.MODELS["ARAP_depth_3mm"],
            nm_iters=nm_iters, xtol_rel=float(c.nlopt_rel_tolerance),
            xtol_abs=float(c.nlopt_abs_tolerance),
        )
        jax.block_until_ready(s)

    t_outer_round = timed(nm_round, reps=2)

    # Steady-state LM iteration throughput (dense backend at fixture size).
    reps = 5
    deformable.solve_pair("KB8", data, hyper, state, n_inner).cost.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        deformable.solve_pair("KB8", data, hyper, state, n_inner).cost.block_until_ready()
    lm_iters_per_sec = n_inner * reps / (time.perf_counter() - t0)

    # Profiler trace of one outer round (SURVEY section 5 tracing commitment).
    trace_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts", "profile")
    trace_ok = False
    try:
        import jax.profiler

        os.makedirs(trace_dir, exist_ok=True)
        with jax.profiler.trace(trace_dir):
            nm_round()
        trace_ok = True
    except Exception:
        pass

    return {
        "phase_triangulate_ms": round(t_triangulate * 1e3, 2),
        "phase_mesh_ms": round(t_mesh * 1e3, 2),
        "phase_inner_lm_ms": round(t_inner * 1e3, 2),
        "phase_outer_round_ms": round(t_outer_round * 1e3, 2),
        "lm_iters_per_sec": round(lm_iters_per_sec, 2),
        "profile_trace": trace_dir if trace_ok else None,
    }


def big_problem_throughput(cfg, n_pairs=2600, n_iters=10):
    """Matrix-free CG LM at the reference's committed problem scale."""
    import numpy as np
    import jax.numpy as jnp

    from triangulation_in_deformable_scenes_tpu.models import deformable
    from triangulation_in_deformable_scenes_tpu.precision import FP
    from triangulation_in_deformable_scenes_tpu.utils import csvio
    from triangulation_in_deformable_scenes_tpu.pipeline.simulation import SimulationPipeline

    c = sweep_cfg(cfg, "FarPoints")
    pipe = SimulationPipeline(c, seed=0)
    rng = np.random.default_rng(0)
    orig0, moved0 = csvio.load_point_pairs(
        os.path.join(FIXTURE, "original_points.csv"), os.path.join(FIXTURE, "moved_points.csv")
    )
    # Tile the fixture into a large cloud with jitter (the reference's
    # committed 5174-dim Hessian corresponds to ~2600 dual-point pairs).
    k = -(-n_pairs // len(orig0))
    orig = np.concatenate([orig0 + rng.normal(scale=0.004, size=orig0.shape) for _ in range(k)])[:n_pairs]
    moved = np.concatenate([moved0 + rng.normal(scale=0.004, size=moved0.shape) for _ in range(k)])[:n_pairs]
    T1w, T2w = pipe._poses(moved[0])
    kp1, kp2, d1, d2 = pipe._simulate_observations(orig, moved, T1w, T2w, rng)
    p1, p2, valid, _, _ = pipe._triangulate(kp1, kp2, T1w, T2w, d1, d2)

    data = deformable.make_pair_data(
        kp1=kp1, kp2=kp2, depth1=d1, depth2=d2, valid=valid,
        cam_params=c.kb8_params, T1w=T1w, T2w=T2w, p1=p1, p2=p2,
    )
    state = deformable.PairState(
        p1=jnp.asarray(p1), p2=jnp.asarray(p2),
        s1=jnp.asarray(1.0, FP), s2=jnp.asarray(1.0, FP),
        Rg=jnp.eye(3, dtype=FP), tg=jnp.zeros(3, dtype=FP),
    )
    hyper = deformable.Hyper(
        rep_w=jnp.asarray(1.0, FP), arap_w=jnp.asarray(1e-4, FP),
        depth_sigma=jnp.asarray(0.003, FP), global_w=jnp.asarray(50.0, FP),
        alpha=jnp.asarray(1.0, FP), beta=jnp.asarray(1.0, FP),
    )
    dim = 6 * n_pairs + 8
    assert dim > deformable.DENSE_DIM_LIMIT  # exercises the CG backend

    solve = lambda: deformable.solve_pair("KB8", data, hyper, state, n_iters).cost.block_until_ready()
    solve()
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        solve()
    return {
        "bigN_pairs": n_pairs,
        "bigN_tangent_dim": dim,
        "bigN_lm_iters_per_sec": round(n_iters * reps / (time.perf_counter() - t0), 2),
    }


def serving_throughput(cfg, batch=16, n_iters=25):
    """Multi-pair serving: refine `batch` keyframe pairs concurrently
    (deformable.solve_pairs vmaps the whole LM solve over the pair axis --
    the reference processes one pair per process)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from triangulation_in_deformable_scenes_tpu.models import deformable
    from triangulation_in_deformable_scenes_tpu.precision import FP

    rng = np.random.default_rng(0)
    n = 128
    datas, states = [], []
    for _ in range(batch):
        p1 = rng.normal(size=(n, 3)) * 0.05 + [0, 0, 0.2]
        p2 = p1 + rng.normal(scale=0.005, size=(n, 3))
        kp = rng.uniform(100, 600, size=(n, 2))
        d = deformable.make_pair_data(
            kp1=kp, kp2=kp, depth1=p1[:, 2], depth2=p2[:, 2], valid=np.ones(n, bool),
            cam_params=np.array([458.654, 457.296, 367.215, 248.375, 0, 0, 0, 0]),
            T1w=(np.eye(3), np.zeros(3)), T2w=(np.eye(3), np.zeros(3)), p1=p1, p2=p2,
            scale_priors=(1.0, 1e6, 1.0, 1e6), degree_bucket=32,
        )
        if d.nbr.shape[1] != 32:  # keep the batch homogeneous
            continue
        datas.append(d)
        states.append(deformable.PairState(
            p1=jnp.asarray(p1, FP), p2=jnp.asarray(p2, FP),
            s1=jnp.asarray(1.0, FP), s2=jnp.asarray(1.0, FP),
            Rg=jnp.eye(3, dtype=FP), tg=jnp.zeros(3, dtype=FP)))
    batch = len(datas)
    bd = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *datas)
    bs = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
    hyper = deformable.Hyper(
        rep_w=jnp.asarray(1.0, FP), arap_w=jnp.asarray(1e-4, FP),
        depth_sigma=jnp.asarray(0.003, FP), global_w=jnp.asarray(50.0, FP),
        alpha=jnp.asarray(1.0, FP), beta=jnp.asarray(1.0, FP))
    run = lambda: deformable.solve_pairs("KB8", bd, hyper, bs, n_iters).cost.block_until_ready()
    run()
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        run()
    dt = (time.perf_counter() - t0) / reps
    return {
        "serving_batch": batch,
        "serving_pairs_per_sec": round(batch / dt, 2),
        "serving_lm_iters_per_sec": round(batch * n_iters / dt, 1),
    }


def pallas_matching(n=2048):
    """Compiled fused kernel vs the XLA path on the matching problem."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    if jax.default_backend() not in ("tpu",):
        return {"pallas_match_ms": None, "xla_match_ms": None,
                "pallas_note": f"backend {jax.default_backend()}: compiled Pallas TPU kernel not exercised"}

    from triangulation_in_deformable_scenes_tpu.ops import matching, pallas_kernels

    rng = np.random.default_rng(0)
    kp_ref = jnp.asarray(rng.uniform(0, 700, size=(n, 2)).astype(np.float32))
    kp_cur = jnp.asarray(rng.uniform(0, 700, size=(n, 2)).astype(np.float32))
    desc_ref = jnp.asarray(rng.integers(0, 2, size=(n, 256)).astype(np.int8))
    desc_cur = jnp.asarray(rng.integers(0, 2, size=(n, 256)).astype(np.int8))
    octave = jnp.zeros((n,), jnp.int32)
    validv = jnp.ones((n,), bool)
    scale_factors = jnp.asarray(np.full(8, 1.2) ** np.arange(8), jnp.float32)

    # Jit the full wrappers: on a tunneled TPU each eager op pays a host
    # round-trip, which would swamp the kernel-time comparison.
    fused_jit = jax.jit(
        lambda *a: pallas_kernels.fused_search_for_initialization(*a, window_factor=100.0)
    )
    xla_jit = jax.jit(
        lambda *a: matching.search_for_initialization(*a, window_factor=100.0, backend="xla")
    )
    args = (kp_ref, desc_ref, octave, validv, kp_cur, desc_cur, octave, validv, scale_factors)

    def run_fused():
        return fused_jit(*args)[1].block_until_ready()

    def run_xla():
        return xla_jit(*args)[1].block_until_ready()

    run_fused(); run_xla()
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        run_fused()
    t_fused = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        run_xla()
    t_xla = (time.perf_counter() - t0) / reps
    return {"pallas_match_ms": round(t_fused * 1e3, 3), "xla_match_ms": round(t_xla * 1e3, 3)}


_SCALING_SNIPPET = r"""
import os, sys, time, json
import numpy as np
import jax, jax.numpy as jnp
from triangulation_in_deformable_scenes_tpu.models import deformable
from triangulation_in_deformable_scenes_tpu.parallel import dist
from triangulation_in_deformable_scenes_tpu.precision import FP

n = 2048
rng = np.random.default_rng(0)
p1 = rng.normal(size=(n, 3)) * 0.05 + [0, 0, 0.2]
p2 = p1 + rng.normal(scale=0.005, size=(n, 3))
kp = rng.uniform(100, 600, size=(n, 2))
data = deformable.make_pair_data(
    kp1=kp, kp2=kp, depth1=p1[:, 2], depth2=p2[:, 2], valid=np.ones(n, bool),
    cam_params=np.array([458.0, 457.0, 367.0, 248.0, 0, 0, 0, 0]),
    T1w=(np.eye(3), np.zeros(3)), T2w=(np.eye(3), np.zeros(3)), p1=p1, p2=p2,
)
state = deformable.PairState(
    p1=jnp.asarray(p1, FP), p2=jnp.asarray(p2, FP),
    s1=jnp.asarray(1.0, FP), s2=jnp.asarray(1.0, FP),
    Rg=jnp.eye(3, dtype=FP), tg=jnp.zeros(3, dtype=FP))
hyper = deformable.Hyper(
    rep_w=jnp.asarray(1.0, FP), arap_w=jnp.asarray(1e-4, FP),
    depth_sigma=jnp.asarray(0.003, FP), global_w=jnp.asarray(50.0, FP),
    alpha=jnp.asarray(1.0, FP), beta=jnp.asarray(1.0, FP))
if len(jax.devices()) > 1:
    mesh = dist.make_mesh()
    data, state = dist.shard_pair(mesh, data, state)
run = lambda: dist.solve_pair_distributed("KB8", data, hyper, state, 5, cg_iters=32).cost.block_until_ready()
run()
t0 = time.perf_counter()
for _ in range(3):
    run()
print(json.dumps({"t": (time.perf_counter() - t0) / 3}))
"""


def virtual_scaling_check():
    """Run the sharded solver on 1 vs 8 virtual CPU devices (same silicon:
    this measures the partitioned program's communication overhead, not
    scaling)."""
    times = {}
    for ndev in (1, 8):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "PALLAS_AXON_POOL_IPS": "",
            "XLA_FLAGS": f"--xla_force_host_platform_device_count={ndev}",
        })
        try:
            out = subprocess.run(
                [sys.executable, "-c", _SCALING_SNIPPET],
                capture_output=True, text=True, timeout=900, env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            times[ndev] = json.loads(out.stdout.strip().splitlines()[-1])["t"]
        except Exception:
            times[ndev] = None
    if times.get(1) and times.get(8):
        return {
            "virtual1_solve_s": round(times[1], 3),
            "virtual8_solve_s": round(times[8], 3),
            "virtual8_comm_overhead": round(times[8] / times[1], 3),
        }
    return {"virtual8_comm_overhead": None}


def main():
    from triangulation_in_deformable_scenes_tpu.config import load_config

    cfg = load_config(os.path.join(REF_DATA, "Simulation.yaml"))

    t_start = time.time()
    acc = accuracy_runs(cfg)
    extras = {}
    extras.update(phase_timings(cfg))
    extras.update(big_problem_throughput(cfg))
    extras.update(serving_throughput(cfg))
    extras.update(pallas_matching())
    extras.update(virtual_scaling_check())

    far = acc["FarPoints"]
    two = acc["TwoPoints"]
    value = far["final_mm"]
    print(json.dumps({
        "metric": "sim_final_avg_3d_error",
        "value": round(value, 4),
        "unit": "mm",
        "vs_baseline": round(BASELINE_FAR_FINAL_MM / value, 4),
        "baseline_far_final_mm": BASELINE_FAR_FINAL_MM,
        "far_final_mm_per_seed": far["final_mm_per_seed"],
        "far_initial_mm": round(far["initial_mm"], 3),
        "baseline_far_initial_mm": BASELINE_FAR_INITIAL_MM,
        "two_points_final_mm": round(two["final_mm"], 4),
        "baseline_two_final_mm": BASELINE_TWO_FINAL_MM,
        "two_points_vs_baseline": round(BASELINE_TWO_FINAL_MM / two["final_mm"], 4),
        "two_initial_mm": round(two["initial_mm"], 3),
        "baseline_two_initial_mm": BASELINE_TWO_INITIAL_MM,
        "pipeline_wall_s": round(far["wall_s"], 2),
        "bench_total_s": round(time.time() - t_start, 1),
        **extras,
    }))


if __name__ == "__main__":
    main()
