"""Device-side geometry primitives: pairwise distances, FPS, ball query,
k-NN, bounding boxes, face-vertex gathers, vertex normals.

TPU-native replacements for the reference's mix of torch utils
(code/utils.py:233-394) and CPU third-party geometry (sklearn KDTree in
loss.py:469-480, igl.bounding_box, trimesh vertex normals): everything here
is jittable JAX, so neighbor precompute and sampling stay on device instead
of round-tripping through host KD-trees.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def square_distance(src, dst, precision=_HI):
    """(..., N, C) x (..., M, C) -> (..., N, M) squared euclidean distances
    via the inner-product expansion (reference: utils.py:253-272).

    Uses an MXU matmul for the cross term; `precision` defaults to fp32-exact
    because downstream argmin/top-k ordering is sensitive to bf16 rounding.
    """
    cross = jnp.matmul(src, jnp.swapaxes(dst, -1, -2), precision=precision)
    d = -2.0 * cross
    d = d + jnp.sum(src**2, -1)[..., :, None]
    d = d + jnp.sum(dst**2, -1)[..., None, :]
    return d


def index_points(points, idx):
    """Per-batch-row gather: points (B, N, C), idx (B, ...) -> (B, ..., C)
    (reference: utils.py:233-250)."""
    return jax.vmap(lambda p, i: p[i])(points, idx)


def farthest_point_sample(xyz, npoint: int, start_idx=None):
    """Greedy farthest-point sampling (reference: utils.py:275-296).

    xyz: (B, N, 3) -> (B, npoint) int32 indices. The reference seeds with a
    random index per batch row (utils.py:287); pass ``start_idx`` ((B,) int32
    or None for 0) — callers that need torch-reference-like randomness draw it
    from a jax PRNG key.

    Sequential by nature: a ``fori_loop`` of npoint steps, each a full-cloud
    distance update (O(N) per step, fused by XLA; no host syncs).
    """
    B, N, _ = xyz.shape
    if start_idx is None:
        start = jnp.zeros((B,), jnp.int32)
    else:
        start = start_idx.astype(jnp.int32)

    def body(i, carry):
        centroids, distance, farthest = carry
        centroids = centroids.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)
        dist = jnp.sum((xyz - centroid) ** 2, -1)
        distance = jnp.minimum(distance, dist)
        farthest = jnp.argmax(distance, -1).astype(jnp.int32)
        return centroids, distance, farthest

    centroids = jnp.zeros((B, npoint), jnp.int32)
    distance = jnp.full((B, N), 1e10, xyz.dtype)
    centroids, _, _ = jax.lax.fori_loop(0, npoint, body, (centroids, distance, start))
    return centroids


def sample_points(points, npoints: int, start_idx=None):
    """FPS-select npoints rows (reference: utils.py:380-386, B=1 contract)."""
    idx = farthest_point_sample(points, npoints, start_idx)
    return index_points(points, idx)


def query_ball_point(radius, nsample: int, xyz, new_xyz):
    """Radius grouping with sort-truncate-backfill (reference: utils.py:299-320).

    Returns (B, S, nsample) indices into xyz; query points with fewer than
    nsample in-radius neighbors repeat their first in-radius neighbor, exactly
    like the reference (including its quirk: if a query ball is empty, the
    backfill index is N-out-of-range sentinel replaced by the *sorted first*
    element, which the reference leaves as N -> first == N -> all entries N;
    we clamp to N-1 to stay in bounds and document the divergence).
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    sqrdists = square_distance(new_xyz, xyz)
    group_idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, S, N))
    group_idx = jnp.where(sqrdists > radius**2, N, group_idx)
    group_idx = _smallest_k(group_idx, nsample)
    group_first = jnp.broadcast_to(group_idx[:, :, :1], group_idx.shape)
    group_idx = jnp.where(group_idx == N, group_first, group_idx)
    return jnp.minimum(group_idx, N - 1)


def _smallest_k(values, k: int):
    """The k smallest values along the last axis, ascending — value-equal to
    ``jnp.sort(values, -1)[..., :k]`` (the reference's sort-truncate,
    utils.py:309) but via top_k selection: the full (B, S, N) row sort was
    the hottest op of the RPM train step (round-3 verdict task 3), and a
    k<<N selection network beats an N log N sort on the VPU. top_k returns
    the k largest of ``-values`` in descending order == the k smallest of
    ``values`` ascending; only VALUES are consumed, so top_k's tie order is
    irrelevant (and these rows are distinct indices anyway)."""
    return -jax.lax.top_k(-values, k)[0]


def sample_and_group(npoint: int, radius, nsample: int, xyz, points=None,
                     returnfps: bool = False, start_idx=None):
    """PointNet++-style set abstraction (reference: utils.py:323-357):
    FPS npoint centers, ball-query nsample neighbors, center-relative
    coordinates, optional feature concat.

    xyz (B, N, 3), points (B, N, D) or None ->
    (new_xyz (B, npoint, 3), new_points (B, npoint, nsample, 3[+D])), plus
    (grouped_xyz, fps_idx) when returnfps."""
    B, N, C = xyz.shape
    fps_idx = farthest_point_sample(xyz, npoint, start_idx)
    new_xyz = index_points(xyz, fps_idx)
    idx = query_ball_point(radius, nsample, xyz, new_xyz)
    grouped_xyz = index_points(xyz, idx)
    grouped_xyz_norm = grouped_xyz - new_xyz[:, :, None, :]
    if points is not None:
        grouped_points = index_points(points, idx)
        new_points = jnp.concatenate([grouped_xyz_norm, grouped_points], -1)
    else:
        new_points = grouped_xyz_norm
    if returnfps:
        return new_xyz, new_points, grouped_xyz, fps_idx
    return new_xyz, new_points


def sample_and_group_all(xyz, points=None):
    """One global group over the whole cloud (reference: utils.py:360-377)."""
    B, N, C = xyz.shape
    new_xyz = jnp.zeros((B, 1, C), xyz.dtype)
    grouped_xyz = xyz[:, None]
    if points is not None:
        new_points = jnp.concatenate(
            [grouped_xyz, points.reshape(B, 1, N, -1)], -1)
    else:
        new_points = grouped_xyz
    return new_xyz, new_points


def knn_points(query, points, k: int):
    """Brute-force k-nearest-neighbors: query (..., S, 3), points (..., N, 3)
    -> (dists (..., S, k), idx (..., S, k)), sorted ascending by distance.

    Device-side replacement for the reference's CPU sklearn KDTree
    (loss.py:469-480); at the reference's scales (N <= ~20k) a tiled
    matmul + top_k beats the host round-trip by orders of magnitude.
    """
    d = square_distance(query, points)
    neg, idx = jax.lax.top_k(-d, k)
    return -neg, idx.astype(jnp.int32)


def sample_neighs(points, num_sample: int = 5000, num_neigh: int = 3,
                  start_idx=None):
    """FPS-sample num_sample seeds, then k-NN against the full cloud, and
    return the flattened neighborhood array (num_sample*num_neigh, 3) in the
    reference's layout (reference: loss.py:473-485).

    Reference layout: columns of neighbors concatenated then reshaped, i.e.
    row-major [n0_of_s0, n1_of_s0, n2_of_s0, n0_of_s1, ...]. The first
    neighbor of each seed is the seed itself (distance 0).
    """
    pts = points[None] if points.ndim == 2 else points
    n = min(num_sample, pts.shape[1])
    seeds = sample_points(pts, n, start_idx)
    _, idx = knn_points(seeds, pts, num_neigh)
    neigh = index_points(pts, idx.reshape(pts.shape[0], -1))
    neigh = neigh.reshape(pts.shape[0], n * num_neigh, 3)
    return neigh[0] if points.ndim == 2 else neigh


def bounding_box_corners(vertices):
    """8 AABB corners in the reference's ordering (reference: loss.py:325-351).

    vertices: (B, N, 3) -> (B, 8, 3). Corner 0 is max, corner 7 is min; the
    diagonal used for line-sampler radii is ||c0 - c7||.
    """
    minV = jnp.min(vertices, axis=1)
    maxV = jnp.max(vertices, axis=1)
    mx, my, mz = maxV[..., 0], maxV[..., 1], maxV[..., 2]
    nx, ny, nz = minV[..., 0], minV[..., 1], minV[..., 2]
    corners = jnp.stack(
        [
            jnp.stack([mx, my, mz], -1),
            jnp.stack([mx, my, nz], -1),
            jnp.stack([mx, ny, mz], -1),
            jnp.stack([mx, ny, nz], -1),
            jnp.stack([nx, my, mz], -1),
            jnp.stack([nx, my, nz], -1),
            jnp.stack([nx, ny, mz], -1),
            jnp.stack([nx, ny, nz], -1),
        ],
        axis=-2,
    )
    return corners


# Fixed 12-triangle topology over the 8 bbox corners (reference: loss.py:354-362).
# numpy (not jnp): a module-level device constant would initialize the jax
# backend at import time, before CLIs can force a platform.
import numpy as _np

BBOX_FACES = _np.array(
    [[2, 0, 6], [0, 4, 6], [5, 4, 0], [5, 0, 1], [6, 4, 5], [5, 7, 6],
     [3, 0, 2], [1, 0, 3], [3, 2, 6], [6, 7, 3], [5, 1, 3], [3, 7, 5]],
    dtype=_np.int32,
)


def make_face_vertices(vertices, faces):
    """Gather faces (B, F, 3) of vertex indices into (B, F, 9) coordinate
    9-tuples (reference: utils.py:90-105).

    Implemented with take_along_axis rather than a vmapped fancy-index: the
    axon TPU platform miscompiles vmapped gathers whose batch operand is a
    stride-0 broadcast (zeroing non-leading components), and bbox faces are
    exactly such a broadcast constant.
    """
    B = vertices.shape[0]
    idx = faces.reshape(B, -1)[..., None]  # (B, F*3, 1)
    gathered = jnp.take_along_axis(vertices, idx, axis=1)  # (B, F*3, 3)
    return gathered.reshape(B, faces.shape[-2], 9)


def bbox_face_vertices(vertices):
    """AABB corners -> the 12-triangle face-vertex tensor (B, 12, 9) used by
    the line resampler's coarse hit test (reference: loss.py:354-362)."""
    corners = bounding_box_corners(vertices)
    faces = jnp.broadcast_to(BBOX_FACES, (vertices.shape[0],) + BBOX_FACES.shape)
    return make_face_vertices(corners, faces)


def vertex_normals(vertices, faces):
    """Area-weighted vertex normals via segment-sum accumulation.

    Device-side replacement for trimesh.Trimesh.vertex_normals
    (reference: utils.py:410-411, 488-490). vertices (N, 3), faces (F, 3)
    -> unit normals (N, 3).
    """
    v0 = vertices[faces[:, 0]]
    v1 = vertices[faces[:, 1]]
    v2 = vertices[faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)  # area-weighted face normals
    n = jnp.zeros_like(vertices)
    for i in range(3):
        n = n.at[faces[:, i]].add(fn)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    return n / jnp.where(norm == 0, 1.0, norm)


def chamfer_distance(points_x, points_y):
    """Mean of bidirectional nearest-neighbor squared distances
    (reference: loss.py:236-252). points_x (B, M, 3), points_y (B, N, 3).

    Matches the reference exactly: mean over the concatenation of the two
    directions (so M != N weights directions by their cardinality).
    """
    sqrdis = square_distance(points_x, points_y)
    d1 = jnp.min(sqrdis, axis=2).reshape(-1)
    d2 = jnp.min(sqrdis, axis=1).reshape(-1)
    return jnp.mean(jnp.concatenate([d1, d2], 0))


def estimate_normals(points, k: int = 16):
    """Per-point unit normals by local PCA: the smallest-eigenvector of each
    point's k-NN covariance (beyond the reference, which can only take
    normals from meshes via trimesh, utils.py:410-411 — bare point clouds
    like the committed sample data get none). Signs are made consistent by
    orienting away from the cloud centroid (registration features like
    RPM-Net's PPF use normals only through angles, so global orientation
    convention is immaterial).

    points: (N, 3) or (B, N, 3) -> unit normals of the same shape; jittable.
    """
    pts = points[None] if points.ndim == 2 else points
    _, idx = knn_points(pts, pts, k)          # (B, N, k) incl. self
    nbrs = index_points(pts, idx.reshape(pts.shape[0], -1)).reshape(
        pts.shape[0], pts.shape[1], k, 3)
    centered = nbrs - nbrs.mean(axis=2, keepdims=True)
    cov = jnp.einsum("bnki,bnkj->bnij", centered, centered, precision=_HI)
    # eigh returns ascending eigenvalues: column 0 = smallest = normal
    _, vecs = jnp.linalg.eigh(cov)
    n = vecs[..., :, 0]
    outward = pts - pts.mean(axis=1, keepdims=True)
    sign = jnp.where(jnp.sum(n * outward, -1, keepdims=True) < 0, -1.0, 1.0)
    n = n * sign
    return n[0] if points.ndim == 2 else n
