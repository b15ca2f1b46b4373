"""Geometry-primitive tests: FPS/ball-query/kNN vs reference semantics
(sklearn/torch oracles), bbox corner ordering, chamfer parity, OBJ IO."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from a_robust_registration_loss_tpu.data import objio
from a_robust_registration_loss_tpu.ops import geometry as G


def _cloud(rng, b=2, n=256):
    return rng.standard_normal((b, n, 3)).astype(np.float32)


class TestDistancesAndGathers:
    def test_square_distance(self, rng):
        x, y = _cloud(rng, 2, 64), _cloud(rng, 2, 33)
        d = np.asarray(G.square_distance(jnp.asarray(x), jnp.asarray(y)))
        ref = np.sum((x[:, :, None] - y[:, None]) ** 2, -1)
        np.testing.assert_allclose(d, ref, rtol=1e-4, atol=1e-4)

    def test_index_points(self, rng):
        pts = _cloud(rng, 3, 50)
        idx = rng.integers(0, 50, (3, 7)).astype(np.int32)
        out = np.asarray(G.index_points(jnp.asarray(pts), jnp.asarray(idx)))
        for b in range(3):
            np.testing.assert_array_equal(out[b], pts[b][idx[b]])


class TestFPS:
    def test_matches_torch_reference(self, rng):
        torch = pytest.importorskip("torch")
        xyz = _cloud(rng, 2, 128)
        ours = np.asarray(G.farthest_point_sample(jnp.asarray(xyz), 16))

        # reproduce reference semantics (utils.py:275-296) with start=0
        t = torch.from_numpy(xyz)
        B, N, _ = t.shape
        centroids = torch.zeros(B, 16, dtype=torch.long)
        distance = torch.ones(B, N) * 1e10
        farthest = torch.zeros(B, dtype=torch.long)
        bi = torch.arange(B)
        for i in range(16):
            centroids[:, i] = farthest
            centroid = t[bi, farthest, :].view(B, 1, 3)
            dist = torch.sum((t - centroid) ** 2, -1)
            mask = dist < distance
            distance[mask] = dist[mask]
            farthest = torch.max(distance, -1)[1]
        np.testing.assert_array_equal(ours, centroids.numpy())

    def test_spread(self, rng):
        # FPS samples should cover better than the first-k prefix
        xyz = _cloud(rng, 1, 512)
        idx = np.asarray(G.farthest_point_sample(jnp.asarray(xyz), 32))[0]
        assert len(set(idx.tolist())) == 32


class TestKNNAndBallQuery:
    def test_knn_matches_sklearn(self, rng):
        from sklearn.neighbors import KDTree

        pts = _cloud(rng, 1, 300)[0]
        q = pts[:50]
        d, idx = G.knn_points(jnp.asarray(q)[None], jnp.asarray(pts)[None], 3)
        kdt = KDTree(pts)
        sk_d, sk_i = kdt.query(q, 3)
        np.testing.assert_array_equal(np.asarray(idx)[0], sk_i)
        # inner-product-expansion distances cancel catastrophically near 0;
        # index agreement is the strong check, distances are sanity only
        np.testing.assert_allclose(np.sqrt(np.maximum(np.asarray(d)[0], 0)), sk_d, atol=5e-3)

    def test_sample_neighs_layout(self, rng):
        pts = _cloud(rng, 1, 200)[0]
        neigh = np.asarray(G.sample_neighs(jnp.asarray(pts), num_sample=40, num_neigh=3))
        assert neigh.shape == (40 * 3, 3)
        # first neighbor of each seed is the seed itself
        seeds = neigh[0::3]
        d0 = np.linalg.norm(neigh[0::3] - seeds, axis=-1)
        np.testing.assert_allclose(d0, 0, atol=1e-6)

    def test_query_ball_point(self, rng):
        torch = pytest.importorskip("torch")
        xyz = _cloud(rng, 2, 100)
        new_xyz = xyz[:, :20]
        r, ns = 0.7, 8
        ours = np.asarray(G.query_ball_point(r, ns, jnp.asarray(xyz), jnp.asarray(new_xyz)))

        tx, tq = torch.from_numpy(xyz), torch.from_numpy(new_xyz)
        B, N, _ = tx.shape
        S = tq.shape[1]
        gi = torch.arange(N, dtype=torch.long).view(1, 1, N).repeat([B, S, 1])
        sq = torch.cdist(tq, tx) ** 2
        gi[sq > r**2] = N
        gi = gi.sort(dim=-1)[0][:, :, :ns]
        gf = gi[:, :, 0].view(B, S, 1).repeat([1, 1, ns])
        mask = gi == N
        gi[mask] = gf[mask]
        # queries always contain themselves here, so no empty-ball divergence
        np.testing.assert_array_equal(ours, gi.numpy())

    def test_smallest_k_equals_sort_truncate(self, rng):
        """The top_k selection path (round-3 verdict task 3) is value-equal
        to the reference's full sort-truncate for any k, including rows that
        are all-sentinel (empty balls) and duplicated sentinel ties."""
        vals = rng.integers(0, 50, size=(3, 17, 40)).astype(np.int32)
        vals[0, 0] = 50  # an "empty ball" row: all sentinel
        for k in (1, 5, 40):
            got = np.asarray(G._smallest_k(jnp.asarray(vals), k))
            want = np.sort(vals, axis=-1)[:, :, :k]
            np.testing.assert_array_equal(got, want)


class TestBBoxAndChamfer:
    def test_bbox_corner_ordering_matches_reference(self, torch_reference, rng):
        torch = torch_reference.torch
        v = _cloud(rng, 2, 77)
        ours = np.asarray(G.bounding_box_corners(jnp.asarray(v)))
        theirs = torch_reference.loss.generate_bbox(torch.from_numpy(v)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_bbox_faces_match_reference(self, torch_reference, rng):
        torch = torch_reference.torch
        v = _cloud(rng, 1, 50)
        ours = np.asarray(G.bbox_face_vertices(jnp.asarray(v)))
        bbox = torch_reference.loss.generate_bbox(torch.from_numpy(v))
        theirs = torch_reference.loss.generate_mesh_by_bbox(bbox).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_chamfer_parity(self, torch_reference, rng):
        torch = torch_reference.torch
        x, y = _cloud(rng, 2, 64), _cloud(rng, 2, 90)
        ours = float(G.chamfer_distance(jnp.asarray(x), jnp.asarray(y)))
        theirs = float(torch_reference.loss.chamfer_dist(torch.from_numpy(x), torch.from_numpy(y)))
        assert ours == pytest.approx(theirs, rel=1e-5)


class TestVertexNormals:
    def test_flat_triangle(self):
        v = jnp.asarray(np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32))
        f = jnp.asarray(np.array([[0, 1, 2]], np.int32))
        n = np.asarray(G.vertex_normals(v, f))
        np.testing.assert_allclose(n, np.tile([0, 0, 1], (3, 1)), atol=1e-6)


class TestObjIO:
    def test_roundtrip(self, tmp_path, rng):
        v = rng.standard_normal((37, 3)).astype(np.float32)
        f = rng.integers(0, 37, (5, 3)).astype(np.int32)
        p = str(tmp_path / "x.obj")
        objio.write_obj(p, v, f)
        v2, f2 = objio.read_obj(p)
        np.testing.assert_allclose(v2, v, rtol=1e-5)
        np.testing.assert_array_equal(f2, f)

    def test_reads_reference_sample_data(self):
        import os

        path = "/root/reference/code/sample_data/challenge_data/0_src_sample.obj"
        if not os.path.exists(path):
            pytest.skip("reference sample data not mounted")
        v, f = objio.read_obj(path)
        assert v.shape[1] == 3 and v.shape[0] > 100
        assert np.all(np.isfinite(v))


class TestEstimateNormals:
    def test_sphere_normals_radial(self):
        """On a sphere, PCA normals must align with the radial direction."""
        n = 512
        i = np.arange(n) + 0.5
        phi = np.arccos(1 - 2 * i / n)
        th = np.pi * (1 + 5**0.5) * i
        pts = np.stack([np.sin(phi) * np.cos(th), np.sin(phi) * np.sin(th),
                        np.cos(phi)], -1).astype(np.float32)
        normals = np.asarray(G.estimate_normals(jnp.asarray(pts), k=12))
        np.testing.assert_allclose(np.linalg.norm(normals, axis=-1), 1.0,
                                   atol=1e-5)
        cos = np.abs(np.sum(normals * pts, -1))  # radial = the point itself
        assert np.median(cos) > 0.99
        # outward orientation (away from centroid ~ origin)
        assert (np.sum(normals * pts, -1) > 0).mean() > 0.95

    def test_plane_normals(self):
        rng = np.random.default_rng(0)
        pts = np.zeros((256, 3), np.float32)
        pts[:, :2] = rng.standard_normal((256, 2))
        normals = np.asarray(G.estimate_normals(jnp.asarray(pts), k=8))
        np.testing.assert_allclose(np.abs(normals[:, 2]), 1.0, atol=1e-4)

    def test_batched(self):
        rng = np.random.default_rng(1)
        pts = rng.standard_normal((2, 64, 3)).astype(np.float32)
        out = G.estimate_normals(jnp.asarray(pts), k=8)
        assert out.shape == (2, 64, 3)


class TestSampleAndGroup:
    """utils.py:323-377 parity: shapes, center-relative coords, feature
    concat, and the grouped indices against the torch transliteration."""

    def test_group_semantics(self):
        rng = np.random.default_rng(0)
        xyz = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
        feats = jnp.asarray(rng.standard_normal((2, 64, 5)).astype(np.float32))
        new_xyz, new_points, grouped_xyz, fps_idx = G.sample_and_group(
            8, 0.9, 4, xyz, feats, returnfps=True)
        assert new_xyz.shape == (2, 8, 3)
        assert new_points.shape == (2, 8, 4, 8)   # 3 rel-coords + 5 feats
        # relative coords really are grouped - center
        np.testing.assert_allclose(
            np.asarray(new_points[..., :3]),
            np.asarray(grouped_xyz - new_xyz[:, :, None, :]), atol=1e-6)
        # centers come from FPS of the cloud
        np.testing.assert_allclose(
            np.asarray(new_xyz), np.asarray(G.index_points(xyz, fps_idx)),
            atol=0)
        # every grouped point is within the radius of its center (or the
        # backfilled first in-radius neighbor)
        d = np.linalg.norm(np.asarray(grouped_xyz - new_xyz[:, :, None, :]),
                           axis=-1)
        assert (d <= 0.9 + 1e-5).mean() > 0.99

    def test_group_all(self):
        rng = np.random.default_rng(1)
        xyz = jnp.asarray(rng.standard_normal((3, 10, 3)).astype(np.float32))
        feats = jnp.asarray(rng.standard_normal((3, 10, 2)).astype(np.float32))
        new_xyz, new_points = G.sample_and_group_all(xyz, feats)
        assert new_xyz.shape == (3, 1, 3) and (np.asarray(new_xyz) == 0).all()
        assert new_points.shape == (3, 1, 10, 5)
        np.testing.assert_allclose(np.asarray(new_points[..., :3]),
                                   np.asarray(xyz)[:, None], atol=0)
