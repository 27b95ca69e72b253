import numpy as np
import pytest

from triangulation_in_deformable_scenes_tpu.ops import delaunay, mesh


def grid_points(nx=6, ny=5, jitter=0.01, seed=0):
    rng = np.random.default_rng(seed)
    xs, ys = np.meshgrid(np.linspace(0, 1, nx), np.linspace(0, 1, ny))
    xy = np.stack([xs.ravel(), ys.ravel()], axis=-1)
    xy += rng.normal(scale=jitter, size=xy.shape)
    return xy


def _edge_set(tris):
    edges = set()
    for t in tris:
        i, j, k = int(t[0]), int(t[1]), int(t[2])
        edges.update({(min(i, j), max(i, j)), (min(j, k), max(j, k)), (min(i, k), max(i, k))})
    return edges


def test_native_library_builds_and_runs():
    xy = grid_points()
    tris = delaunay.delaunay_triangles(xy, backend="native")
    assert len(tris) > 0
    # Euler: for a triangulated planar point set, T = 2n - 2 - h (h = hull pts)
    n = len(xy)
    assert len(tris) <= 2 * n


def test_native_matches_scipy_edges():
    """Native Bowyer-Watson and Qhull agree on the Delaunay edge set
    (triangle orderings may differ; near-cocircular cases excluded by jitter)."""
    xy = grid_points(jitter=0.02, seed=3)
    t_native = delaunay.delaunay_triangles(xy, backend="native")
    t_scipy = delaunay.delaunay_triangles(xy, backend="scipy")
    assert _edge_set(t_native) == _edge_set(t_scipy)
    assert len(t_native) == len(t_scipy)


def test_delaunay_empty_circumcircle_property():
    xy = grid_points(seed=5)
    tris = delaunay.delaunay_triangles(xy, backend="native")
    for t in tris[:20]:
        a, b, c = xy[t[0]], xy[t[1]], xy[t[2]]
        # circumcenter
        d = 2 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1]) + c[0] * (a[1] - b[1]))
        ux = ((a @ a) * (b[1] - c[1]) + (b @ b) * (c[1] - a[1]) + (c @ c) * (a[1] - b[1])) / d
        uy = ((a @ a) * (c[0] - b[0]) + (b @ b) * (a[0] - c[0]) + (c @ c) * (b[0] - a[0])) / d
        center = np.array([ux, uy])
        r = np.linalg.norm(a - center)
        dists = np.linalg.norm(xy - center, axis=-1)
        inside = dists < r - 1e-9
        inside[[t[0], t[1], t[2]]] = False
        assert not inside.any()


def test_mesh_context_shapes_and_symmetry():
    xy = grid_points()
    v3 = np.concatenate([xy, 0.2 + 0.01 * np.sin(xy[:, :1] * 5)], axis=-1)
    ctx = mesh.build_mesh_context(v3)
    n = len(v3)
    assert ctx.nbr.shape[0] == n
    assert ctx.nbr.shape[1] % 4 == 0
    assert ctx.surface_area > 0
    # adjacency symmetric: j in nbr[i] <=> i in nbr[j]
    for i in range(n):
        for j in ctx.nbr[i][ctx.nbr_mask[i]]:
            assert i in ctx.nbr[j][ctx.nbr_mask[j]]
    # weights symmetric per undirected edge
    for i in range(n):
        for slot, j in enumerate(ctx.nbr[i]):
            if j < 0:
                continue
            back = list(ctx.nbr[j]).index(i)
            assert ctx.weights[i, slot] == pytest.approx(ctx.weights[j, back])


def test_cot_weights_flat_grid():
    """On a right-isoceles split of a unit square, diagonal edges have
    cot(45)+... known values; just check non-negativity (min_weight=0 parity
    with Geometry.cc:290-296) and magnitude sanity."""
    xy = grid_points(jitter=0.0)
    v3 = np.concatenate([xy, np.zeros((len(xy), 1))], axis=-1)
    ctx = mesh.build_mesh_context(v3)
    assert (ctx.weights >= 0).all()
    w = ctx.weights[ctx.nbr_mask]
    assert w.max() < 50.0


def test_surface_area_flat():
    xy = grid_points(jitter=0.0)
    v3 = np.concatenate([xy, np.zeros((len(xy), 1))], axis=-1)
    ctx = mesh.build_mesh_context(v3)
    # Triangulation of the unit square covers its area.
    assert ctx.surface_area == pytest.approx(1.0, rel=1e-9)
