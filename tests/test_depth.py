"""Depth pipeline tests: the vectorized mesher vs a literal reimplementation
of the reference's per-pixel rules (utils.py:108-151), back-projection math,
discontinuity rejection, and the end-to-end capture."""

import numpy as np
import pytest

from a_robust_registration_loss_tpu.data import depth as D


def _reference_mesh_rules(pts, mask, thresh=0.1):
    """Literal (slow) transliteration of generate_depth_mesh's membership
    rules for oracle comparison on small images."""
    H, W = mask.shape
    idx = {(i, j) for i in range(H) for j in range(W) if mask[i, j] > 0}
    vh = {}
    verts = []
    for i in range(H):
        for j in range(W):
            T1 = ((i, j) in idx and (i, j + 1) in idx and (i + 1, j) in idx
                  and (i + 1, j + 1) in idx)
            T2 = ((i, j) in idx and (i - 1, j) in idx and (i, j - 1) in idx
                  and (i - 1, j - 1) in idx)
            T3 = ((i, j) in idx and (i - 1, j) in idx and (i - 1, j + 1) in idx
                  and (i, j + 1) in idx)
            T4 = ((i, j) in idx and (i + 1, j) in idx and (i + 1, j - 1) in idx
                  and (i, j - 1) in idx)
            if not (T1 or T2 or T3 or T4) or mask[i, j] <= 0:
                continue
            if not (0 < i < H - 1 and 0 < j < W - 1):
                continue  # reference relies on border masking; see module doc
            ok = True
            for c in range(3):
                lap = abs(4 * pts[i, j, c] - pts[i - 1, j, c]
                          - pts[i + 1, j, c] - pts[i, j - 1, c]
                          - pts[i, j + 1, c])
                if lap >= thresh:
                    ok = False
            if ok:
                vh[(i, j)] = len(verts)
                verts.append(pts[i, j])
    faces = []
    for i in range(H):
        for j in range(W):
            if (i, j) in vh and (i + 1, j) in vh and (i + 1, j + 1) in vh:
                faces.append([vh[(i, j)], vh[(i + 1, j)], vh[(i + 1, j + 1)]])
            if (i, j) in vh and (i + 1, j + 1) in vh and (i, j + 1) in vh:
                faces.append([vh[(i, j)], vh[(i + 1, j + 1)], vh[(i, j + 1)]])
    return (np.asarray(verts, np.float32).reshape(-1, 3),
            np.asarray(faces, np.int32).reshape(-1, 3))


def _synthetic_depth(H=24, W=28, step_col=None):
    """A smooth depth ramp, optionally with a depth step at a column."""
    d = 1000.0 + np.arange(H)[:, None] * 2.0 + np.arange(W)[None, :] * 1.0
    d = np.broadcast_to(d, (H, W)).copy()
    if step_col is not None:
        d[:, step_col:] += 500.0  # 0.5 m discontinuity after /1000
    return d


class TestBackprojection:
    def test_pinhole_math(self):
        intr = D.Intrinsics(fx=100.0, fy=100.0, cx=10.0, cy=10.0,
                            depth_scale=1.0)
        depth = np.full((21, 21), 50.0)
        pts, mask = D.backproject_depth(depth, intr, border=3,
                                        exact_grid=False)
        assert mask[10, 10] == 1.0 and mask[0, 0] == 0.0
        np.testing.assert_allclose(pts[10, 10], [0, 0, 50], atol=1e-9)
        np.testing.assert_allclose(pts[10, 12], [(12 - 10) * 50 / 100, 0, 50],
                                   atol=1e-9)

    def test_exact_grid_quirk(self):
        """linspace(0, W, W) vs arange — the reference's stretched grid."""
        depth = np.full((10, 10), 10.0)
        p1, _ = D.backproject_depth(depth, exact_grid=True)
        p2, _ = D.backproject_depth(depth, exact_grid=False)
        assert np.abs(p1 - p2).max() > 0


class TestDepthMesh:
    def test_matches_reference_rules(self):
        d = _synthetic_depth()
        pts, mask = D.backproject_depth(d, D.Intrinsics(), border=3)
        V, F = D.depth_mesh(pts, mask)
        V_ref, F_ref = _reference_mesh_rules(pts, mask)
        np.testing.assert_allclose(V, V_ref, atol=1e-7)
        np.testing.assert_array_equal(F, F_ref)
        assert V.shape[0] > 100 and F.shape[0] > 100

    def test_discontinuity_not_bridged(self):
        d = _synthetic_depth(step_col=14)
        pts, mask = D.backproject_depth(d, D.Intrinsics(), border=3)
        V, F = D.depth_mesh(pts, mask, thresh=0.1)
        V_ref, F_ref = _reference_mesh_rules(pts, mask)
        np.testing.assert_allclose(V, V_ref, atol=1e-7)
        np.testing.assert_array_equal(F, F_ref)
        # no triangle spans the z-step (max edge z-extent << 0.5 m)
        z = V[:, 2]
        tri_z = z[F]
        assert (tri_z.max(1) - tri_z.min(1)).max() < 0.4

    def test_empty_mask(self):
        pts = np.zeros((8, 8, 3))
        V, F = D.depth_mesh(pts, np.zeros((8, 8)))
        assert V.shape == (0, 3) and F.shape == (0, 3)


class TestEndToEnd:
    def test_capture_to_sample(self, tmp_path):
        d = _synthetic_depth(H=40, W=40)
        rng = np.random.default_rng(0)
        p, n, pose = D.capture_to_sample(
            d, str(tmp_path / "cap0"), num=128, subset=500, rng=rng)
        assert p.shape == (128, 3) and n.shape == (128, 3)
        np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-4)
        assert (tmp_path / "cap0_sample.obj").exists()
        assert (tmp_path / "cap0_sample_normals.obj").exists()
        from a_robust_registration_loss_tpu.data import objio

        v2, _ = objio.read_obj(str(tmp_path / "cap0_sample.obj"))
        np.testing.assert_allclose(v2, p, rtol=1e-5, atol=1e-6)

    def test_make_sample_data(self):
        # a small grid mesh
        d = _synthetic_depth(H=16, W=16)
        pts, mask = D.backproject_depth(d, D.Intrinsics(), border=3)
        V, F = D.depth_mesh(pts, mask)
        p, n = D.make_sample_data(V, F, num=32)
        assert p.shape == (32, 3) and n.shape == (32, 3)
        assert not np.isnan(n).any()
