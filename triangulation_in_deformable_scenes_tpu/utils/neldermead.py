"""Bounded Nelder-Mead simplex search (host-side, numpy).

Replaces NLopt's LN_NELDERMEAD in the outer weight optimization
(``Modules/Optimization/g2oBundleAdjustment.cc:491-515``): box bounds,
``maxeval``, and per-coordinate xtol_rel/xtol_abs termination. Dimensions with
lower == upper are frozen (the reference pins rep and global weights this way
in ``Data/Simulation.yaml``). The simplex trajectory is not bit-identical to
NLopt's; the search target (argmin of the outer objective) is the same.
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def nelder_mead(
    f: Callable[[np.ndarray], float],
    x0,
    lower,
    upper,
    max_eval: int = 30,
    xtol_rel: float = 0.0,
    xtol_abs: float = 0.0,
):
    """Minimize f over the box [lower, upper]. Returns (x_best, f_best, n_eval)."""
    x0 = np.asarray(x0, dtype=np.float64)
    lower = np.asarray(lower, dtype=np.float64)
    upper = np.asarray(upper, dtype=np.float64)
    x0 = np.clip(x0, lower, upper)

    free = upper > lower
    nfree = int(free.sum())
    if nfree == 0 or max_eval <= 0:
        return x0, f(x0), 1

    def clip(x):
        return np.clip(x, lower, upper)

    n_eval = 0

    def ev(x):
        nonlocal n_eval
        n_eval += 1
        return float(f(clip(x)))

    # Initial simplex: x0 plus one step per free dim (NLopt-style default
    # step, a quarter of the box width, kept inside the bounds).
    steps = np.where(free, 0.25 * (upper - lower), 0.0)
    steps = np.minimum(steps, upper - x0)
    steps = np.where(steps <= 0, -np.minimum(0.25 * (upper - lower), x0 - lower), steps)

    verts = [x0.copy()]
    for i in np.nonzero(free)[0]:
        v = x0.copy()
        v[i] += steps[i]
        verts.append(clip(v))
    verts = np.array(verts)
    fvals = np.array([ev(v) for v in verts])

    alpha, gamma, rho_c, sigma = 1.0, 2.0, 0.5, 0.5

    while n_eval < max_eval:
        order = np.argsort(fvals)
        verts, fvals = verts[order], fvals[order]

        # xtol termination: simplex extent per coordinate.
        extent = np.abs(verts - verts[0]).max(axis=0)
        tol = np.maximum(xtol_abs, xtol_rel * np.abs(verts[0]))
        if nfree > 0 and np.all(extent[free] <= tol[free]):
            break

        centroid = verts[:-1].mean(axis=0)
        worst = verts[-1]

        xr = clip(centroid + alpha * (centroid - worst))
        fr = ev(xr)
        if fr < fvals[0]:
            if n_eval < max_eval:
                xe = clip(centroid + gamma * (xr - centroid))
                fe = ev(xe)
                if fe < fr:
                    verts[-1], fvals[-1] = xe, fe
                else:
                    verts[-1], fvals[-1] = xr, fr
            else:
                verts[-1], fvals[-1] = xr, fr
        elif fr < fvals[-2]:
            verts[-1], fvals[-1] = xr, fr
        else:
            xc = clip(centroid + rho_c * (worst - centroid))
            if n_eval >= max_eval:
                break
            fc = ev(xc)
            if fc < fvals[-1]:
                verts[-1], fvals[-1] = xc, fc
            else:
                # shrink toward best
                for i in range(1, len(verts)):
                    if n_eval >= max_eval:
                        break
                    verts[i] = clip(verts[0] + sigma * (verts[i] - verts[0]))
                    fvals[i] = ev(verts[i])

    best = int(np.argmin(fvals))
    return verts[best], float(fvals[best]), n_eval
