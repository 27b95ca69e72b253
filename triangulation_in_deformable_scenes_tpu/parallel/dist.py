"""Landmark-sharded deformable refinement over a device mesh.

The reference is a single-threaded C++ process; scaling out is a NEW
capability of this framework (SURVEY.md section 7 step 7). Design:

- the match/landmark axis N is sharded over a 1-D ``jax.sharding.Mesh``
  ("points" axis); every per-point array of ``PairData``/``PairState`` is
  placed with ``NamedSharding(P("points"))``, scalars/poses replicated;
- the inner solve is MATRIX-FREE: instead of assembling the dense H (whose
  point-point ARAP blocks would be scattered across shards), CG runs on the
  normal equations with Hv = J^T(J v) computed by jvp+vjp through the
  residual vector. ARAP neighbor gathers and the tangent-space reductions
  compile to XLA collectives (all-gathers / psums) over ICI -- no hand-written
  communication;
- preconditioning: Jacobi with the exact diagonal of H, assembled from
  per-edge local Jacobian blocks (cheap, local + one scatter).

``lm_step_cg`` performs one damped Gauss-Newton step (fixed CG iteration
count, jit/shard-friendly); ``solve_pair_distributed`` wraps it in the same
accept/reject damping loop as the dense path. On a single device the math
matches the dense solver up to CG tolerance.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import deformable
from ..ops import lie
from ..precision import FP, TINY

POINTS_AXIS = "points"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (POINTS_AXIS,))


def _pointwise_spec(ndim: int) -> P:
    return P(POINTS_AXIS, *([None] * (ndim - 1)))


def shard_pair(mesh: Mesh, data: deformable.PairData, state: deformable.PairState):
    """Place per-point arrays on the mesh's points axis, replicate the rest."""
    n = data.kp1.shape[0]

    def place(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] == n:
            spec = _pointwise_spec(x.ndim)
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, data), jax.tree_util.tree_map(place, state)


def _delta_residual_fn(cam_kind, data, hyper, state):
    def f(delta):
        return deformable.residual_vector(
            cam_kind, data, hyper, deformable.apply_delta(state, delta)
        )

    return f


def hessian_diag(cam_kind, data, hyper, state):
    """Exact diag(J^T J) from per-edge blocks (no dense H materialized)."""
    return deformable.assemble_diag(cam_kind, data, hyper, state)


def _cg(matvec, b, M_inv, iters):
    """Standard preconditioned CG with a fixed trip count (shard-friendly)."""
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = M_inv * r0
    p0 = z0

    def body(_, carry):
        x, r, z, p = carry
        Ap = matvec(p)
        rz = jnp.dot(r, z)
        alpha = rz / (jnp.dot(p, Ap) + TINY)
        x1 = x + alpha * p
        r1 = r - alpha * Ap
        z1 = M_inv * r1
        beta = jnp.dot(r1, z1) / (rz + TINY)
        p1 = z1 + beta * p
        return (x1, r1, z1, p1)

    x, *_ = jax.lax.fori_loop(0, iters, body, (x0, r0, z0, p0))
    return x


class DistLMResult(NamedTuple):
    state: deformable.PairState
    cost: jnp.ndarray
    initial_cost: jnp.ndarray
    lam: jnp.ndarray
    n_accepted: jnp.ndarray


@functools.partial(
    jax.jit, static_argnames=("cam_kind", "n_iterations", "cg_iters", "max_trials")
)
def solve_pair_distributed(
    cam_kind: str,
    data: deformable.PairData,
    hyper: deformable.Hyper,
    state0: deformable.PairState,
    n_iterations: int,
    cg_iters: int = 50,
    max_trials: int = 6,
    tau: float = 1e-5,
) -> DistLMResult:
    """LM with matrix-free PCG inner solves; same damping policy as ops/lm.

    Works on replicated arrays (single device) or landmark-sharded inputs
    placed by ``shard_pair`` -- the jitted computation is identical, XLA
    partitions it according to the argument shardings.
    """

    def cost_fn(s):
        return deformable.robust_cost(cam_kind, data, hyper, s)

    F0_init = cost_fn(state0)
    n = state0.p1.shape[0]
    dim = 6 * n + 8

    def iteration(carry, _):
        state, lam, nu, F, stop = carry

        def run(operand):
            state, lam, nu, F = operand
            f = _delta_residual_fn(cam_kind, data, hyper, state)
            zero = jnp.zeros((dim,), dtype=state.p1.dtype)
            r0, jvp_lin = jax.linearize(f, zero)
            _, vjp = jax.vjp(f, zero)
            g = vjp(r0)[0]
            diag = hessian_diag(cam_kind, data, hyper, state)
            lam0 = jnp.where(lam < 0, tau * jnp.max(diag), lam)

            def matvec_fn(lam_cur):
                def mv(v):
                    return vjp(jvp_lin(v))[0] + lam_cur * v

                return mv

            def trial_cond(tc):
                _, _, k, accepted, *_ = tc
                return jnp.logical_and(jnp.logical_not(accepted), k < max_trials)

            def trial_body(tc):
                lam, nu, k, _, cur_state, curF = tc
                M_inv = 1.0 / (diag + lam)
                delta = _cg(matvec_fn(lam), -g, M_inv, cg_iters)
                cand = deformable.apply_delta(state, delta)
                F1 = cost_fn(cand)
                scale = jnp.dot(delta, lam * delta - g) + TINY
                rho = (F - F1) / scale
                ok = jnp.logical_and(rho > 0, jnp.isfinite(F1))
                factor = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
                lam_next = jnp.where(ok, lam * factor, lam * nu)
                nu_next = jnp.where(ok, 2.0, 2.0 * nu)
                new_state = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(ok, b, a), cur_state, cand
                )
                return (lam_next, nu_next, k + 1, ok, new_state, jnp.where(ok, F1, curF))

            lam1, nu1, _, accepted, state1, F1 = jax.lax.while_loop(
                trial_cond,
                trial_body,
                (lam0, nu, jnp.int32(0), jnp.bool_(False), state, F),
            )
            return state1, lam1, nu1, F1, jnp.logical_not(accepted), accepted

        def skip(operand):
            state, lam, nu, F = operand
            return state, lam, nu, F, jnp.bool_(True), jnp.bool_(False)

        state1, lam1, nu1, F1, stop1, accepted = jax.lax.cond(
            stop, skip, run, (state, lam, nu, F)
        )
        return (state1, lam1, nu1, F1, jnp.logical_or(stop, stop1)), accepted

    init = (
        state0,
        jnp.array(-1.0, dtype=FP),
        jnp.array(2.0, dtype=FP),
        F0_init,
        jnp.bool_(False),
    )
    (state, lam, _, F, _), accepted = jax.lax.scan(iteration, init, None, length=n_iterations)
    return DistLMResult(
        state=state,
        cost=F,
        initial_cost=F0_init,
        lam=lam,
        n_accepted=jnp.sum(accepted.astype(jnp.int32)),
    )
