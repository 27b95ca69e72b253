"""Mesh context: padded adjacency, cotangent edge weights, surface area.

Rebuilds the Open3D TriangleMesh helpers the reference leans on:

- ``ComputeAdjacencyList`` -> fixed-shape padded neighbor lists ``nbr[N, K]``
  (pad value -1) so the device never sees ragged data;
- ``ComputeEdgeWeightsCot`` (``Modules/Utils/Geometry.cc:272-298``): per
  undirected edge, the cotangent of the angle at each opposite vertex of the
  1-2 incident triangles, averaged, clamped below by ``min_weight`` (the
  reference passes 0);
- ``GetSurfaceArea``: sum of 3D triangle areas (used to normalize ARAP
  energies, ``g2oBundleAdjustment.cc:942-946``).

Everything here is host-side numpy; the output arrays feed the jitted solver.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .delaunay import delaunay_triangles


@dataclasses.dataclass
class MeshContext:
    """Fixed-shape mesh data consumed by the ARAP solver."""

    triangles: np.ndarray  # [T, 3] int32
    nbr: np.ndarray  # [N, K] int32, -1 padded
    nbr_mask: np.ndarray  # [N, K] bool
    weights: np.ndarray  # [N, K] f64 cot weights per directed edge
    n_triangles: int
    surface_area: float

    @property
    def max_degree(self) -> int:
        return self.nbr.shape[1]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def surface_area(vertices: np.ndarray, triangles: np.ndarray) -> float:
    a = vertices[triangles[:, 0]]
    b = vertices[triangles[:, 1]]
    c = vertices[triangles[:, 2]]
    return float(0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1).sum())


def cot_edge_weights(vertices: np.ndarray, triangles: np.ndarray, min_weight: float = 0.0):
    """Map (i, j) -> cot weight, parity with ``ComputeEdgeWeightsCot``.

    Returns a dict over ORDERED edges (i < j).
    """
    from collections import defaultdict

    opposite = defaultdict(list)
    for t in triangles:
        i, j, k = int(t[0]), int(t[1]), int(t[2])
        opposite[(min(i, j), max(i, j))].append(k)
        opposite[(min(j, k), max(j, k))].append(i)
        opposite[(min(i, k), max(i, k))].append(j)

    weights = {}
    for (i, j), opp in opposite.items():
        ws = 0.0
        for v2 in opp:
            a = vertices[i] - vertices[v2]
            b = vertices[j] - vertices[v2]
            ws += float(np.dot(a, b) / np.linalg.norm(np.cross(a, b)))
        w = ws / len(opp)
        weights[(i, j)] = max(w, min_weight)
    return weights


def build_mesh_context(
    vertices3d: np.ndarray,
    min_weight: float = 0.0,
    degree_multiple: int = 4,
    triangles: np.ndarray | None = None,
    backend: str = "auto",
) -> MeshContext:
    """Triangulate the (x, y) projection and build padded device arrays.

    ``vertices3d`` are the keyframe-1 world positions, exactly the set the
    reference meshes (``g2oBundleAdjustment.cc:652-659``). K is padded to a
    multiple of ``degree_multiple`` to bucket jit recompiles.
    """
    vertices3d = np.asarray(vertices3d, dtype=np.float64)
    n = len(vertices3d)
    if triangles is None:
        triangles = delaunay_triangles(vertices3d[:, :2], backend=backend)

    adj = [set() for _ in range(n)]
    for t in triangles:
        i, j, k = int(t[0]), int(t[1]), int(t[2])
        adj[i].update((j, k))
        adj[j].update((i, k))
        adj[k].update((i, j))

    weights = cot_edge_weights(vertices3d, triangles, min_weight)

    max_deg = max((len(a) for a in adj), default=0)
    K = max(_round_up(max_deg, degree_multiple), degree_multiple)
    nbr = np.full((n, K), -1, dtype=np.int32)
    wmat = np.zeros((n, K), dtype=np.float64)
    for i, neighbors in enumerate(adj):
        # Sorted for determinism (the reference iterates unordered_set).
        for slot, j in enumerate(sorted(neighbors)):
            nbr[i, slot] = j
            wmat[i, slot] = weights[(min(i, j), max(i, j))]

    return MeshContext(
        triangles=np.asarray(triangles, dtype=np.int32),
        nbr=nbr,
        nbr_mask=nbr >= 0,
        weights=wmat,
        n_triangles=int(len(triangles)),
        surface_area=surface_area(vertices3d, triangles),
    )
