"""Whole-solve fused block-Jacobi PCG as a single Pallas TPU kernel.

The block-sparse LM backend (``models/block_system``) solves every damped
trial with PCG whose operator is the ELLPACK system (D [N,6,6],
Bt [N,K,6,6], C [N,6,8], Hg [8,8]). Through XLA, every CG iteration
re-streams the 12 MB of Bt blocks from HBM (the matvec is bandwidth-bound:
BENCH_r03 measured 148 us marginal, ~11% of stream bandwidth) and pays the
multi-kernel overhead of the gather + einsum + dot + axpy chain ~64 times
per solve. This kernel runs the ENTIRE preconditioned-CG loop -- matvec,
preconditioner, dots, vector updates, tolerance exit -- inside ONE
``pallas_call`` with every operand VMEM-resident: Bt is loaded from HBM
once per damped solve instead of once per iteration.

TPU-shaped data layout ("planes"): all per-point quantities keep the point
index on the LANE axis --

    Bt_planes  [36, K, Np]   Bt_planes[6a+b, k, n] = Bt[n, k, a, b]
    D_planes   [36, Np]      (likewise; Dinv_planes for the preconditioner)
    C_planes   [48, Np]      C_planes[8a+g, n] = C[n, a, g]
    vectors    [6, Np]       packed point tangents, Np = N padded to 128

so the ARAP neighbor gather becomes a LANE gather
(``jnp.take_along_axis(v, idx, axis=1)``, the one dynamic-indexing form
Mosaic lowers; sublane gathers are unsupported) and the 6x6 block
contractions become masked row products -- no scatters, no reshapes, no
MXU (the op is bandwidth-shaped, the win is memory residency, exactly the
hypothesis of VERDICT r3 item 3).

The numerical contract matches ``block_system.pcg_flex`` (same update
formulas, same rtol early exit); parity is pinned by
tests/test_pallas_pcg.py (interpret mode).

STATUS: CORRECT BUT UNCOMPILABLE ON THIS CHIP -- a documented negative
result (VERDICT r3 item 3's alternative outcome). Mosaic rejects the lane
gather whenever the SOURCE spans more than one 128-lane vreg::

    Mosaic failed to compile TPU kernel:
    Not implemented: Multiple source vregs along gather dimension

and the rejection is structural (measured: a [8, 2688] source is refused
even when every index provably stays inside its own vreg). The workaround
lattice was analyzed before retiring the claim:

- Reverse-Cuthill-McKee reordering bounds the mesh bandwidth to 212 at the
  bigN scale (measured; tile offsets <= 2), enabling a shifted-copies +
  intra-vreg-gather decomposition -- but since Mosaic's check is on the
  source WIDTH, the gather must additionally be split per 128-lane tile:
  21 tiles x 5 shifts x 32 slots ~ 3.4k gather ops per CG iteration, at
  which point the in-kernel op count costs more than the 148 us marginal
  the XLA pipeline already achieves per iteration (BENCH_r03).
- Keeping the gather in XLA and fusing only the contraction forfeits the
  VMEM residency of the 12 MB coefficient stream, which was the entire
  win: the op is bandwidth-bound at ~0.5 flop/byte.

The solve-path speedups this round therefore came from XLA-level
restructuring instead (sequential-trial LM, local-Jacobian assembly, lazy
NM -- 3.6x on the outer round; see ops/lm.py, models/deformable.py); this
kernel and its tests stay as the honest record of where the fusion
boundary sits on this toolchain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..precision import TINY

LANE = 128

# VMEM budget guard for the dispatch: planes + vectors must fit alongside
# the while-loop carries. 36*K*Np*4 dominates.
VMEM_BUDGET_BYTES = 15 << 20


def _mk_pcg_kernel(K: int, iters: int):
    def kernel(
        d_ref, dinv_ref, bt_ref, c_ref, hg_ref, hginv_ref, nbr_ref,
        bp_ref, bg_ref, lam_ref, tol2_ref, xp_ref, xg_ref,
    ):
        lam = lam_ref[0, 0]
        Np = bp_ref.shape[1]

        D = d_ref[:, :]
        Dinv = dinv_ref[:, :]
        C = c_ref[:, :]
        Hg = hg_ref[:, :]      # [8, 8]
        Hginv = hginv_ref[:, :]

        def blk66(planes, v):  # [36, Np] x [6, Np] -> [6, Np]
            rows = []
            for a in range(6):
                prod = planes[6 * a : 6 * a + 6, :] * v
                rows.append(jnp.sum(prod, axis=0, keepdims=True))
            return jnp.concatenate(rows, axis=0)

        def precond(r_p, r_g):
            return blk66(Dinv, r_p), r_g @ Hginv.T

        def matvec(v_p, v_g):
            y = blk66(D, v_p) + lam * v_p
            # neighbor coupling: K static lane-gathers against the packed
            # tangent; padded slots carry zero Bt blocks.
            for k in range(K):
                idx = jnp.broadcast_to(nbr_ref[k : k + 1, :], (6, Np))
                vj = jnp.take_along_axis(v_p, idx, axis=1)
                y = y + blk66(bt_ref[36 * k : 36 * k + 36, :], vj)
            # global coupling: y_p += C v_g ; y_g = C^T v_p + (Hg + lam) v_g
            rows = []
            yg = []
            for a in range(6):
                acc = jnp.zeros_like(v_p[0:1, :])
                for g in range(8):
                    acc = acc + C[8 * a + g : 8 * a + g + 1, :] * v_g[0, g]
                rows.append(acc)
            y = y + jnp.concatenate(rows, axis=0)
            for g in range(8):
                s = jnp.zeros((), v_p.dtype)
                for a in range(6):
                    s = s + jnp.sum(C[8 * a + g, :] * v_p[a, :])
                yg.append(s)
            y_g = (
                jnp.stack(yg)[None, :] + v_g @ Hg.T + lam * v_g
            )
            return y, y_g

        def dot(ap, ag, bp, bg):
            return jnp.sum(ap * bp) + jnp.sum(ag * bg)

        b_p = bp_ref[:, :]
        b_g = bg_ref[:, :]
        x_p = jnp.zeros_like(b_p)
        x_g = jnp.zeros_like(b_g)
        r_p, r_g = b_p, b_g
        z_p, z_g = precond(r_p, r_g)
        tol2 = tol2_ref[0, 0]

        def cond(carry):
            r_p, r_g, k = carry[2], carry[3], carry[-1]
            return jnp.logical_and(k < iters, dot(r_p, r_g, r_p, r_g) > tol2)

        def body(carry):
            x_p, x_g, r_p, r_g, z_p, z_g, p_p, p_g, k = carry
            Ap_p, Ap_g = matvec(p_p, p_g)
            rz = dot(r_p, r_g, z_p, z_g)
            alpha = rz / (dot(p_p, p_g, Ap_p, Ap_g) + TINY)
            x_p = x_p + alpha * p_p
            x_g = x_g + alpha * p_g
            r_p = r_p - alpha * Ap_p
            r_g = r_g - alpha * Ap_g
            z_p, z_g = precond(r_p, r_g)
            beta = dot(r_p, r_g, z_p, z_g) / (rz + TINY)
            p_p = z_p + beta * p_p
            p_g = z_g + beta * p_g
            return (x_p, x_g, r_p, r_g, z_p, z_g, p_p, p_g, k + 1)

        carry = (x_p, x_g, r_p, r_g, z_p, z_g, z_p, z_g, jnp.int32(0))
        carry = jax.lax.while_loop(cond, body, carry)
        xp_ref[:, :] = carry[0]
        xg_ref[:, :] = carry[1]

    return kernel


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def pcg_planes(
    d_planes, dinv_planes, bt_planes, c_planes, Hg, Hginv, nbrT,
    b_p, b_g, lam, tol2, iters: int, interpret: bool = False,
):
    """Run the fused PCG on pre-transposed planes. See ``pcg_block_system``
    for the BlockSystem-facing wrapper."""
    K = nbrT.shape[0]
    Np = b_p.shape[1]
    dtype = jnp.float32
    kern = _mk_pcg_kernel(K, iters)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    x_p, x_g = pl.pallas_call(
        kern,
        in_specs=[vspec] * 9 + [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(vspec, vspec),
        out_shape=(
            jax.ShapeDtypeStruct((6, Np), dtype),
            jax.ShapeDtypeStruct((1, 8), dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET_BYTES + (1 << 20),
        ),
        interpret=interpret,
    )(
        d_planes, dinv_planes,
        # [36, K, Np] -> [K*36, Np] with k MAJOR (the kernel slices
        # bt_ref[36k : 36k+36] per neighbor slot).
        (jnp.transpose(bt_planes, (1, 0, 2)).reshape(K * 36, Np)
         if bt_planes.ndim == 3 else bt_planes),
        c_planes, Hg, Hginv, nbrT, b_p, b_g,
        jnp.asarray(lam, dtype).reshape(1, 1),
        jnp.asarray(tol2, dtype).reshape(1, 1),
    )
    return x_p, x_g


def fits_vmem(n: int, K: int) -> bool:
    """VMEM feasibility bound for the fused kernel at problem size (n, K).

    Not a dispatch guard -- nothing dispatches to this kernel (it is a
    measured negative result, see the module docstring); kept as the
    documented feasibility envelope the measurements were taken inside."""
    np_ = -(-n // LANE) * LANE
    planes = (36 * K + 2 * 36 + 48 + K) * np_ * 4  # Bt + D + Dinv + C + nbr
    vectors = 10 * 6 * np_ * 4
    return planes + vectors <= VMEM_BUDGET_BYTES


def pcg_block_system(sys, nbr, b, lam, iters: int, rtol: float, interpret: bool = False):
    """Drop-in fused replacement for ``block_system.pcg_flex`` over the
    assembled BlockSystem: same block-Jacobi preconditioner, same rtol
    early exit, flat [6N + 8] tangent in and out.

    The plane transposes cost one pass over the blocks per damped SOLVE
    (vs. the XLA path's one pass per CG ITERATION); Dinv/Hginv are computed
    here (XLA batched 6x6 inversion) exactly as ``block_jacobi_apply`` does.
    """
    import numpy as _np
    n, K = nbr.shape
    Np = -(-n // LANE) * LANE
    pad = Np - n
    dtype = jnp.float32

    eye6 = jnp.eye(6, dtype=sys.D.dtype)
    Dinv = jnp.linalg.inv(sys.D + lam * eye6[None])
    Hginv = jnp.linalg.inv(sys.Hg + lam * jnp.eye(8, dtype=sys.Hg.dtype))

    def planes66(blocks):  # [N, 6, 6] -> [36, Np]
        p = jnp.transpose(blocks, (1, 2, 0)).reshape(36, n)
        return jnp.pad(p.astype(dtype), ((0, 0), (0, pad)))

    d_planes = planes66(sys.D)
    dinv_planes = planes66(Dinv)
    bt_planes = jnp.pad(
        jnp.transpose(sys.Bt, (2, 3, 1, 0)).reshape(36, K, n).astype(dtype),
        ((0, 0), (0, 0), (0, pad)),
    )
    c_planes = jnp.pad(
        jnp.transpose(sys.C, (1, 2, 0)).reshape(48, n).astype(dtype),
        ((0, 0), (0, pad)),
    )
    nbrT = jnp.pad(
        jnp.maximum(nbr, 0).T.astype(jnp.int32), ((0, 0), (0, pad))
    )

    from ..models import block_system as bs_
    b_p, b_g = bs_._split(b, n)
    bp_planes = jnp.pad(b_p.T.astype(dtype), ((0, 0), (0, pad)))
    bg_row = b_g.astype(dtype).reshape(1, 8)
    bb = jnp.dot(b, b)
    tol2 = rtol * rtol * bb

    x_p, x_g = pcg_planes(
        d_planes, dinv_planes, bt_planes, c_planes,
        sys.Hg.astype(dtype), Hginv.astype(dtype), nbrT,
        bp_planes, bg_row, lam, tol2, iters=iters, interpret=interpret,
    )
    return bs_._join(x_p[:, :n].T.astype(b.dtype), x_g[0].astype(b.dtype))
