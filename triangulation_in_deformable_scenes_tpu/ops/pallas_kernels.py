"""Pallas TPU kernels for the hot front-end op: fused descriptor matching.

The reference's live matcher (``Modules/Matching/DescriptorMatching.cc:39-99``)
walks every reference keypoint, gathers window candidates from the feature
grid, and popcounts 32-byte descriptors one pair at a time. The XLA rewrite in
``ops/matching.py`` turns that into one [N1, N2] Hamming matmul -- but at
N ~ 2000 keypoints that materializes three [N1, N2] f32 intermediates
(distances, pixel distances, masks) in HBM, ~48 MB of traffic whose only
consumer is a per-row top-2 reduction.

This kernel fuses the whole thing: per (row-tile, col-tile) it computes the
Hamming tile on the MXU (bit-count identity ``H = |a| + |b| - 2 a.b``), the
window / octave / validity masks on the VPU, and folds the tile into running
per-row best / second-best / argmin accumulators that live in VMEM for the
entire column sweep. HBM traffic drops to the int8 descriptor blocks plus
O(N1) outputs -- the [N1, N2] matrix never exists.

Used automatically by ``matching.search_for_initialization`` on TPU; the XLA
path remains the reference implementation (and the CPU/interpret test oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1_000_000.0
_IDX_BIG = 2**30  # Python literal: jnp constants would be captured by the kernel

# Row-tile x col-tile of the [N1, N2] logical distance matrix handled per
# grid step. 128 matches the MXU systolic array and the f32 lane width.
TILE_M = 128
TILE_N = 128

# rowmeta columns: x, y, radius^2, octave, row_ok
# colmeta columns: x, y, octave, valid
_ROWMETA_W = 8
_COLMETA_W = 8


def _match_kernel(rowmeta_ref, colmeta_ref, bits_ref, bits_cur_ref,
                  best_d_ref, best_i_ref, second_d_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)

    a = bits_ref[...].astype(jnp.float32)      # [TM, 256]
    b = bits_cur_ref[...].astype(jnp.float32)  # [TN, 256]
    dots = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    sa = jnp.sum(a, axis=-1)
    sb = jnp.sum(b, axis=-1)
    D = sa[:, None] + sb[None, :] - 2.0 * dots  # [TM, TN] exact ints in f32

    rm = rowmeta_ref[...]  # [TM, 8]
    cm = colmeta_ref[...]  # [TN, 8]
    dx = rm[:, 0][:, None] - cm[:, 0][None, :]
    dy = rm[:, 1][:, None] - cm[:, 1][None, :]
    d2 = dx * dx + dy * dy
    oct_r = rm[:, 3][:, None]
    oct_c = cm[:, 2][None, :]
    allowed = (
        (d2 <= rm[:, 2][:, None])
        & (oct_c >= oct_r - 1.0)
        & (oct_c <= oct_r + 1.0)
        & (rm[:, 4][:, None] > 0.5)
        & (cm[:, 3][None, :] > 0.5)
    )
    Dm = jnp.where(allowed, D, BIG)

    # Per-row top-2 of this tile (first-occurrence argmin via iota, matching
    # jnp.argmin semantics so the fused path is bit-identical to the XLA one).
    cols = jax.lax.broadcasted_iota(jnp.int32, Dm.shape, 1)
    tile_best = jnp.min(Dm, axis=1)
    is_best = Dm == tile_best[:, None]
    tile_col = jnp.min(jnp.where(is_best, cols, _IDX_BIG), axis=1)
    tile_idx = tile_col + j * TILE_N
    tile_second = jnp.min(jnp.where(cols == tile_col[:, None], BIG, Dm), axis=1)

    # The [g1, TILE_M] outputs are small enough to stay fully VMEM-resident
    # (index map is constant); row i accumulates across the j sweep.
    @pl.when(j == 0)
    def _():
        best_d_ref[i, :] = tile_best
        best_i_ref[i, :] = tile_idx
        second_d_ref[i, :] = tile_second

    @pl.when(j > 0)
    def _():
        rb = best_d_ref[i, :]
        ri = best_i_ref[i, :]
        rs = second_d_ref[i, :]
        best_d_ref[i, :] = jnp.minimum(rb, tile_best)
        best_i_ref[i, :] = jnp.where(tile_best < rb, tile_idx, ri)
        second_d_ref[i, :] = jnp.minimum(
            jnp.maximum(rb, tile_best), jnp.minimum(rs, tile_second)
        )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _match_scan(rowmeta, colmeta, bits_ref, bits_cur, *, interpret=False):
    """Fused column sweep. Shapes must be tile-padded.

    rowmeta [N1, 8] f32, colmeta [N2, 8] f32, bits int8 [N, 256].
    Returns best_d [N1], best_idx [N1] (column index into N2), second_d [N1].
    """
    n1, n2 = rowmeta.shape[0], colmeta.shape[0]
    g1, g2 = n1 // TILE_M, n2 // TILE_N
    kb = bits_ref.shape[1]

    out = pl.pallas_call(
        _match_kernel,
        grid=(g1, g2),
        in_specs=[
            pl.BlockSpec((TILE_M, _ROWMETA_W), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, _COLMETA_W), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, kb), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, kb), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g1, TILE_M), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g1, TILE_M), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g1, TILE_M), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g1, TILE_M), jnp.float32),
            jax.ShapeDtypeStruct((g1, TILE_M), jnp.int32),
            jax.ShapeDtypeStruct((g1, TILE_M), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n1 * n2 * kb + 8 * n1 * n2,
            bytes_accessed=g2 * n1 * kb + g1 * n2 * kb + 12 * n1,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rowmeta, colmeta, bits_ref, bits_cur)
    best_d, best_i, second_d = (o.reshape(n1) for o in out)
    return best_d, best_i, second_d


def _pad_rows(x, n, fill=0):
    pad = n - x.shape[0]
    if pad == 0:
        return x
    return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1), constant_values=fill)


def fused_search_for_initialization(
    kp_ref,
    desc_ref,
    octave_ref,
    valid_ref,
    kp_cur,
    desc_cur,
    octave_cur,
    valid_cur,
    scale_factors,
    th: float = 50.0,
    window_factor: float = 50.0,
    ratio: float = 0.9,
    max_octave: int = 0,
    interpret: bool = False,
):
    """Drop-in fused-TPU version of ``matching.search_for_initialization``.

    Same contract (parity with ``searchForInitializaion``,
    DescriptorMatching.cc:39-99): returns (matches [N1] int32, n_matches).
    The top-2 scan runs in the Pallas kernel; the O(N1) ratio test and
    one-to-one conflict resolution stay in XLA.
    """
    n1 = kp_ref.shape[0]
    n2 = kp_cur.shape[0]
    n1p = -(-n1 // TILE_M) * TILE_M
    n2p = -(-n2 // TILE_N) * TILE_N

    oct_r = octave_ref
    radius = window_factor * scale_factors[jnp.clip(oct_r, 0, len(scale_factors) - 1)]
    row_ok = (oct_r <= max_octave) & valid_ref

    f32 = jnp.float32
    rowmeta = jnp.zeros((n1p, _ROWMETA_W), f32)
    rowmeta = rowmeta.at[:n1, 0].set(kp_ref[:, 0].astype(f32))
    rowmeta = rowmeta.at[:n1, 1].set(kp_ref[:, 1].astype(f32))
    rowmeta = rowmeta.at[:n1, 2].set((radius**2).astype(f32))
    rowmeta = rowmeta.at[:n1, 3].set(oct_r.astype(f32))
    rowmeta = rowmeta.at[:n1, 4].set(row_ok.astype(f32))
    colmeta = jnp.zeros((n2p, _COLMETA_W), f32)
    colmeta = colmeta.at[:n2, 0].set(kp_cur[:, 0].astype(f32))
    colmeta = colmeta.at[:n2, 1].set(kp_cur[:, 1].astype(f32))
    colmeta = colmeta.at[:n2, 2].set(octave_cur.astype(f32))
    colmeta = colmeta.at[:n2, 3].set(valid_cur.astype(f32))

    bits_a = _pad_rows(desc_ref.astype(jnp.int8), n1p)
    bits_b = _pad_rows(desc_cur.astype(jnp.int8), n2p)

    best_d, best, second_d = _match_scan(
        rowmeta, colmeta, bits_a, bits_b, interpret=interpret
    )
    best_d, best, second_d = best_d[:n1], best[:n1], second_d[:n1]

    ok = (best_d <= th) & (best_d < second_d * ratio)
    # One-to-one conflict resolution (vnMatches21 bookkeeping; see
    # matching._one_to_one for why this is a reduction, not a scatter).
    from .matching import _one_to_one

    return _one_to_one(best, best_d, ok, n2p)
