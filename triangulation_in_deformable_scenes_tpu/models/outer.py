"""Outer refinement driver: repeated inner solves + derivative-free weight search.

Parity with ``deformationOptimization``
(``Modules/Optimization/g2oBundleAdjustment.cc:446-606``):

- up to ``n_optimizations`` rounds while the point-update magnitude stays
  >= 1e-4 * (number of map points, both sets);
- per round, when ``Optimization.selection == "twoOptimizations"`` with the
  nlopt weight search, a Nelder-Mead minimizes
  log^2(sigma_px_C1) + log^2(sigma_px_C2) over (rep, global, arap) within the
  configured bounds (``nloptOptimization.cc:5-38``), each evaluation running a
  full inner ARAP solve from the same functional snapshot (the reference
  clones the map per evaluation, ``Map::clone``; we just reuse the immutable
  state -- no copy needed);
- the winning weights run once more on the live state and carry over to the
  next round (``g2oBundleAdjustment.cc:525-530``);
- the "eigen" weights selection (Eigen LM over the same objective,
  ``EigenOptimization.h:30-63``) is served by the same Nelder-Mead here: the
  reference's functor is a derivative-free 2-residual LM with numerical
  diff -- an implementation detail, not a different model.

Mesh cadence parity: the Delaunay mesh, cot weights and ARAP rotations are
rebuilt once per (round, snapshot) from current positions and frozen during
the inner LM iterations -- every Nelder-Mead evaluation starts from the same
snapshot, hence shares one mesh, exactly as the reference's per-evaluation
clones do.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..ops import lie
from ..utils import metrics as metrics_mod
from ..utils.neldermead import nelder_mead
from . import deformable


class OuterConfig(NamedTuple):
    rep_w: float
    global_w: float
    arap_w: float
    alpha: float
    beta: float
    depth_sigma: float
    n_optimizations: int
    n_opt_iterations: int
    opt_selection: str
    weights_selection: str
    nlopt_max_eval: int
    nlopt_rel_tol: float
    nlopt_abs_tol: float
    lower_bounds: tuple  # (rep, global, arap)
    upper_bounds: tuple
    # Deformation model family (ARAP / ARAP_NoGlobal / ARAP_OneSet /
    # ARAP_depth_* / ARAP_not_scaled_depth / ARAP_depth_onlyTriang /
    # Elastic / HyperElasticOdgen) -- see deformable.MODELS.
    model: str = "ARAP"


@dataclasses.dataclass
class OuterResult:
    state: deformable.PairState
    weights: np.ndarray  # final (rep, global, arap)
    rounds: int
    last_update: float


def _hyper(weights, cfg: OuterConfig) -> deformable.Hyper:
    sigma = deformable.model_depth_sigma(cfg.model)
    if sigma is None:
        sigma = float(cfg.depth_sigma)
    return deformable.Hyper(
        rep_w=jnp.asarray(float(weights[0])),
        arap_w=jnp.asarray(float(weights[2])),
        depth_sigma=jnp.asarray(sigma),
        global_w=jnp.asarray(float(weights[1])),
        alpha=jnp.asarray(float(cfg.alpha)),
        beta=jnp.asarray(float(cfg.beta)),
    )


def arap_optimization(
    cam_kind: str,
    data: deformable.PairData,
    state: deformable.PairState,
    weights,
    cfg: OuterConfig,
):
    """One inner solve; returns (new_state, update_magnitude).

    ``update`` is the summed point displacement over BOTH sets, the quantity
    the reference accumulates at write-back (``g2oBundleAdjustment.cc:978-990``).
    """
    if cfg.model not in deformable.MODELS:
        raise ValueError(
            f"Unknown deformation model '{cfg.model}'; known: {sorted(deformable.MODELS)}"
        )
    spec = deformable.MODELS[cfg.model]
    res = deformable.solve_pair(
        cam_kind, data, _hyper(weights, cfg), state, cfg.n_opt_iterations, spec
    )
    vm = np.asarray(data.valid, dtype=bool)
    d1 = np.linalg.norm(np.asarray(res.state.p1 - state.p1)[vm], axis=-1).sum()
    d2 = np.linalg.norm(np.asarray(res.state.p2 - state.p2)[vm], axis=-1).sum()
    return res.state, float(d1 + d2)


def _numdiff_lm(residuals, x0, lb, ub, max_evals=10, eps_rel=1e-3, lam0=1e-3):
    """Tiny Levenberg-Marquardt with forward-difference Jacobian over a
    low-dimensional weight vector (the reference's Eigen
    ``NumericalDiff<EigenOptimizationFunctor>`` path). Frozen dimensions
    (lb == ub) are skipped."""
    x = np.clip(np.asarray(x0, dtype=np.float64), lb, ub)
    free = np.nonzero(ub > lb)[0]
    n_eval = 0
    r = residuals(x)
    n_eval += 1
    lam = lam0
    while n_eval < max_evals and len(free):
        J = np.zeros((len(r), len(free)))
        for c, i in enumerate(free):
            h = max(abs(x[i]) * eps_rel, 1e-9)
            xp = x.copy()
            xp[i] = min(x[i] + h, ub[i])
            rp = residuals(xp)
            n_eval += 1
            J[:, c] = (rp - r) / max(xp[i] - x[i], 1e-12)
            if n_eval >= max_evals:
                break
        A = J.T @ J + lam * np.eye(len(free))
        g = J.T @ r
        try:
            delta = np.linalg.solve(A, -g)
        except np.linalg.LinAlgError:
            break
        x_new = x.copy()
        x_new[free] = np.clip(x[free] + delta, lb[free], ub[free])
        if n_eval >= max_evals:
            break
        r_new = residuals(x_new)
        n_eval += 1
        if r_new @ r_new < r @ r:
            x, r = x_new, r_new
            lam = max(lam / 3.0, 1e-12)
        else:
            lam *= 10.0
    return x


def deformation_optimization(
    cam_kind: str,
    cam_params,
    T1w,
    T2w,
    kp1,
    kp2,
    d1,
    d2,
    valid,
    state: deformable.PairState,
    cfg: OuterConfig,
    on_round: Optional[Callable] = None,
    mesh_backend: str = "auto",
) -> OuterResult:
    """Full outer loop. ``on_round(i, state, weights)`` fires after each
    non-final round for journaling (parity with the per-iteration metric
    blocks, ``g2oBundleAdjustment.cc:576-593``)."""
    n_points = 2 * int(np.asarray(valid).sum())
    weights = np.array([cfg.rep_w, cfg.global_w, cfg.arap_w], dtype=np.float64)
    lb = np.asarray(cfg.lower_bounds, dtype=np.float64)
    ub = np.asarray(cfg.upper_bounds, dtype=np.float64)

    update = 100.0
    rounds = 0
    for i in range(1, cfg.n_optimizations + 1):
        if update < 1e-4 * n_points:
            break
        rounds = i

        # Snapshot mesh/rotations once per round (shared by every evaluation).
        data = deformable.make_pair_data(
            kp1=kp1,
            kp2=kp2,
            depth1=d1,
            depth2=d2,
            valid=valid,
            cam_params=cam_params,
            T1w=T1w,
            T2w=T2w,
            p1=np.asarray(state.p1),
            p2=np.asarray(state.p2),
            mesh_backend=mesh_backend,
        )

        if cfg.opt_selection == "open3DArap":
            # ``arapOpen3DOptimization`` (g2oBundleAdjustment.cc:1010-1104):
            # deform the KF1 mesh as-rigidly-as-possible and take the result
            # as the second point set. The reference's constraint list is
            # zero-initialized, pinning only vertex 0 to the first moved
            # point -- reproduced here.
            from ..ops import arap as arap_ops
            from ..ops import mesh as mesh_ops

            vmask = np.asarray(valid, dtype=bool)
            vidx = np.nonzero(vmask)[0]
            p1v = np.asarray(state.p1)[vidx]
            ctx = mesh_ops.build_mesh_context(p1v, backend=mesh_backend)
            deformed = arap_ops.arap_deform(
                p_rest=jnp.asarray(p1v),
                nbr=jnp.asarray(ctx.nbr),
                nbr_mask=jnp.asarray(ctx.nbr_mask),
                weights=jnp.asarray(ctx.weights),
                constraint_idx=jnp.asarray([0]),
                constraint_pos=state.p2[jnp.asarray(vidx[:1])],
                iters=cfg.n_opt_iterations,
            )
            new_p2 = np.array(state.p2)
            new_p2[vidx] = np.asarray(deformed)
            update = float(np.linalg.norm(new_p2[vidx] - np.asarray(state.p2)[vidx], axis=-1).sum())
            state = state._replace(p2=jnp.asarray(new_p2))
            if on_round is not None and i != cfg.n_optimizations:
                on_round(i, state, weights)
            continue

        if cfg.opt_selection == "twoOptimizations" and cfg.weights_selection == "eigen":
            # ``EigenOptimization.h:30-63``: derivative-free LM over the
            # weights with residuals (log sigma_c1)^2, (log sigma_c2)^2 and
            # forward-difference Jacobian, maxfev ~ 10.
            def residuals(x):
                cand_state, _ = arap_optimization(cam_kind, data, state, x, cfg)
                pix = metrics_mod.pixels_stand_dev(
                    cam_kind, cam_params, T1w, T2w, cand_state.p1, cand_state.p2, kp1, kp2, valid
                )
                return np.array(
                    [
                        np.log(max(pix.desvc1, 1e-300)) ** 2,
                        np.log(max(pix.desvc2, 1e-300)) ** 2,
                    ]
                )

            weights = _numdiff_lm(residuals, weights, lb, ub, max_evals=10)

        elif cfg.opt_selection == "twoOptimizations":
            # The objective is a discrepancy principle: log^2(sigma) is
            # minimized when the residual pixel deviation matches the
            # (assumed 1px) observation noise (nloptOptimization.cc:26-31).
            # Weight dimensions spanning many decades (the arap bounds cover
            # 1e-5..1e7) are searched in log10 space -- a robustness deviation
            # from NLopt's linear-space simplex, which cannot resolve the
            # narrow useful sliver of such a range; target optimum unchanged.
            wide = (lb > 0) & (ub / np.maximum(lb, 1e-300) > 1e2)

            def to_search(x):
                return np.where(wide, np.log10(np.maximum(x, 1e-300)), x)

            def from_search(z):
                return np.where(wide, 10.0**z, z)

            def objective(z):
                cand_state, _ = arap_optimization(cam_kind, data, state, from_search(z), cfg)
                pix = metrics_mod.pixels_stand_dev(
                    cam_kind, cam_params, T1w, T2w, cand_state.p1, cand_state.p2, kp1, kp2, valid
                )
                # log^2 objective (nloptOptimization.cc:29-31)
                return np.log(max(pix.desvc1, 1e-300)) ** 2 + np.log(max(pix.desvc2, 1e-300)) ** 2

            z_best, _, _ = nelder_mead(
                objective,
                to_search(weights),
                to_search(lb),
                to_search(ub),
                max_eval=cfg.nlopt_max_eval,
                xtol_rel=cfg.nlopt_rel_tol,
                xtol_abs=cfg.nlopt_abs_tol,
            )
            weights = np.asarray(from_search(z_best), dtype=np.float64)

        state, update = arap_optimization(cam_kind, data, state, weights, cfg)

        if on_round is not None and i != cfg.n_optimizations:
            on_round(i, state, weights)

    return OuterResult(state=state, weights=weights, rounds=rounds, last_update=update)
