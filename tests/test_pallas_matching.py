"""Fused Pallas matcher == XLA dense matcher, elementwise.

The XLA path in ``ops/matching.py`` is the oracle (itself validated against
the reference semantics in test_features.py); the Pallas kernel must agree
bit-for-bit since the Hamming sums are exact integers in f32 and the pixel
window uses the identical difference formula.
"""

import numpy as np
import pytest

from triangulation_in_deformable_scenes_tpu.ops import matching, pallas_kernels


def _random_problem(rng, n1, n2, n_scales=4, spread=400.0):
    kp1 = rng.uniform(0, spread, size=(n1, 2)).astype(np.float32)
    kp2 = rng.uniform(0, spread, size=(n2, 2)).astype(np.float32)
    d1 = rng.integers(0, 2, size=(n1, 256)).astype(np.int8)
    d2 = rng.integers(0, 2, size=(n2, 256)).astype(np.int8)
    # Plant near-duplicates so real matches (and ratio-test near-ties) exist.
    k = min(n1, n2) // 2
    d2[:k] = d1[:k]
    flip = rng.integers(0, 256, size=(k, 8))
    for i in range(k):
        d2[i, flip[i]] ^= 1
    kp2[:k] = kp1[:k] + rng.normal(0, 5.0, size=(k, 2))
    o1 = rng.integers(0, n_scales, size=n1).astype(np.int32)
    o2 = rng.integers(0, n_scales, size=n2).astype(np.int32)
    v1 = rng.uniform(size=n1) > 0.1
    v2 = rng.uniform(size=n2) > 0.1
    sf = np.array([1.2**o for o in range(n_scales)], dtype=np.float32)
    return kp1, d1, o1, v1, kp2, d2, o2, v2, sf


@pytest.mark.parametrize("n1,n2", [(128, 128), (200, 330), (100, 513)])
def test_fused_matches_xla(n1, n2):
    rng = np.random.default_rng(n1 * 1000 + n2)
    args = _random_problem(rng, n1, n2)
    kw = dict(th=60.0, window_factor=30.0, ratio=0.9, max_octave=3)
    m_ref, n_ref = matching.search_for_initialization(*args, backend="xla", **kw)
    m_pal, n_pal = pallas_kernels.fused_search_for_initialization(
        *args, interpret=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(m_pal), np.asarray(m_ref))
    assert int(n_pal) == int(n_ref)


def test_fused_empty_rows():
    """Rows that fail every gate must come back unmatched, not garbage."""
    rng = np.random.default_rng(7)
    kp1, d1, o1, v1, kp2, d2, o2, v2, sf = _random_problem(rng, 64, 64)
    v1[:] = False
    m, n = pallas_kernels.fused_search_for_initialization(
        kp1, d1, o1, v1, kp2, d2, o2, v2, sf, interpret=True
    )
    assert int(n) == 0
    assert np.all(np.asarray(m) == -1)


def test_backend_autodispatch_runs():
    """The public entry point must work whatever the local backend is."""
    rng = np.random.default_rng(3)
    args = _random_problem(rng, 96, 140)
    m, n = matching.search_for_initialization(*args)
    m2, n2 = matching.search_for_initialization(*args, backend="xla")
    np.testing.assert_array_equal(np.asarray(m), np.asarray(m2))
    assert int(n) == int(n2)
