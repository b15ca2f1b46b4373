"""Golden-parity tests of the intersected-line robust metric against the
actual PyTorch reference implementation (code/loss.py), fed identical inputs:
stage-1 labels/counts, the whole loss value, and its gradient."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from a_robust_registration_loss_tpu.ops import geometry as G
from a_robust_registration_loss_tpu.ops import lines as L
from a_robust_registration_loss_tpu.ops import metric as M


def _sphere_cloud(n, rng, noise=0.0):
    """Quasi-uniform points on the unit sphere (structured surface so that
    line-neighborhood intersections actually occur)."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    golden = np.pi * (1 + 5**0.5)
    theta = golden * i
    pts = np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)], -1
    ).astype(np.float32)
    if noise:
        pts = pts + rng.standard_normal(pts.shape).astype(np.float32) * noise
    return pts


def _neighs(pts, num_sample):
    return np.asarray(
        G.sample_neighs(jnp.asarray(pts), num_sample=num_sample, num_neigh=3)
    ).reshape(num_sample, 9)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(7)
    pts1 = _sphere_cloud(300, rng, noise=0.01)
    # cloud 2: small rotation of cloud 1
    ang = 0.3
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        dtype=np.float32,
    )
    pts2 = _sphere_cloud(310, rng, noise=0.01) @ R.T
    neis1 = _neighs(pts1, 128)
    neis2 = _neighs(pts2, 128)
    key = jax.random.PRNGKey(0)
    lines = np.asarray(
        L.resample_lines(key, jnp.float32(3.0), jnp.zeros(3, jnp.float32), 400,
                         jnp.asarray(pts1), jnp.asarray(pts2))
    )
    return dict(pts1=pts1, pts2=pts2, neis1=neis1, neis2=neis2, lines=lines)


class TestStage1Parity:
    def test_labels_and_counts(self, torch_reference, problem):
        torch = torch_reference.torch
        neis, lines = problem["neis1"], problem["lines"]
        _, w_ref, label_ref = torch_reference.loss.cal_intersection_batch2_points_with_line(
            torch.from_numpy(neis[None]), torch.from_numpy(lines[None])
        )
        counts_ref = label_ref.sum(-1).numpy()[0]

        inter = M.find_intersections(jnp.asarray(neis), jnp.asarray(lines))
        np.testing.assert_array_equal(np.asarray(inter.count), counts_ref)
        assert int(np.asarray(inter.count).max()) >= 1, "no intersections — test data too sparse"

        # slot indices must be exactly the nonzero positions (ascending)
        lab = label_ref.numpy()[0]  # (L, F)
        F = neis.shape[0]
        slot_idx = np.asarray(inter.slot_idx)
        for l in np.where((counts_ref >= 1) & (counts_ref <= 4))[0][:50]:
            want = np.where(lab[l])[0]
            got = slot_idx[l][slot_idx[l] < F]
            np.testing.assert_array_equal(got, want)

        # weights parity at filled slots
        w_ref = w_ref.numpy().reshape(lines.shape[0], F, 3)
        slot_w = np.asarray(inter.slot_w)
        for l in np.where((counts_ref >= 1) & (counts_ref <= 4))[0][:20]:
            for s, f in enumerate(slot_idx[l][slot_idx[l] < F]):
                np.testing.assert_allclose(slot_w[l, s], w_ref[l, f], rtol=1e-4, atol=1e-6)

    def test_chunked_equals_unchunked(self, problem):
        neis, lines = problem["neis1"], problem["lines"]
        a = M.find_intersections(jnp.asarray(neis), jnp.asarray(lines))
        b = M.find_intersections(jnp.asarray(neis), jnp.asarray(lines), line_chunk=128)
        np.testing.assert_array_equal(np.asarray(a.count), np.asarray(b.count))
        np.testing.assert_array_equal(np.asarray(a.slot_idx), np.asarray(b.slot_idx))
        # float weights carry the |AC|^2 - proj^2 cancellation (~1e-4 rel
        # noise under different XLA fusion orders inside lax.map)
        np.testing.assert_allclose(np.asarray(a.slot_w), np.asarray(b.slot_w),
                                   rtol=1e-2, atol=1e-5)


class TestLossParity:
    def test_value(self, torch_reference, problem):
        torch = torch_reference.torch
        n1, n2, lines = problem["neis1"], problem["neis2"], problem["lines"]
        ref = torch_reference.loss.cal_loss_intersection_batch_whole_median_pts_lines(
            1, 1, 5, 5, torch.from_numpy(n1[None]), torch.from_numpy(n2[None]),
            torch.from_numpy(lines[None]),
        )
        assert torch.is_tensor(ref), "reference returned no-intersection sentinel"
        ours, valid = M.intersection_loss(jnp.asarray(n1), jnp.asarray(n2), jnp.asarray(lines))
        assert bool(valid)
        assert float(ours) == pytest.approx(float(ref), rel=2e-4)

    def test_value_asymmetric_counts(self, torch_reference, problem):
        # swap clouds to exercise k != j combos and both min directions
        torch = torch_reference.torch
        n1, n2, lines = problem["neis2"], problem["neis1"], problem["lines"]
        ref = torch_reference.loss.cal_loss_intersection_batch_whole_median_pts_lines(
            1, 1, 5, 5, torch.from_numpy(n1[None]), torch.from_numpy(n2[None]),
            torch.from_numpy(lines[None]),
        )
        ours, valid = M.intersection_loss(jnp.asarray(n1), jnp.asarray(n2), jnp.asarray(lines))
        assert bool(valid)
        assert float(ours) == pytest.approx(float(ref), rel=2e-4)

    def test_gradient(self, torch_reference, problem):
        torch = torch_reference.torch
        n1, n2, lines = problem["neis1"], problem["neis2"], problem["lines"]
        t1 = torch.from_numpy(n1[None]).clone().requires_grad_(True)
        ref = torch_reference.loss.cal_loss_intersection_batch_whole_median_pts_lines(
            1, 1, 5, 5, t1, torch.from_numpy(n2[None]), torch.from_numpy(lines[None]),
        )
        ref.backward()
        g_ref = t1.grad.numpy()[0]

        g_ours = np.asarray(
            jax.grad(lambda a: M.intersection_loss(a, jnp.asarray(n2), jnp.asarray(lines))[0])(
                jnp.asarray(n1)
            )
        )
        scale = np.abs(g_ref).max()
        assert scale > 0
        np.testing.assert_allclose(g_ours, g_ref, atol=2e-3 * scale)

    def test_no_intersections_flag(self):
        rng = np.random.default_rng(3)
        # far-apart tiny neighborhoods and lines that miss everything
        neis = np.tile(rng.standard_normal((16, 1, 3)).astype(np.float32) * 100, (1, 3, 1))
        neis = (neis + rng.standard_normal(neis.shape).astype(np.float32) * 1e-4).reshape(16, 9)
        lines = np.concatenate(
            [np.tile([[1.0, 0, 0]], (32, 1)), np.tile([[0, 0, 1e5]], (32, 1))], -1
        ).astype(np.float32)
        loss, valid = M.intersection_loss(jnp.asarray(neis), jnp.asarray(neis), jnp.asarray(lines))
        assert not bool(valid)
        assert float(loss) == 0.0

    @pytest.mark.slow
    def test_batched_vmap(self, problem):
        n1, n2, lines = problem["neis1"], problem["neis2"], problem["lines"]
        lb, vb = M.intersection_loss_batch(
            jnp.asarray(np.stack([n1, n1])), jnp.asarray(np.stack([n2, n2])),
            jnp.asarray(np.stack([lines, lines])),
        )
        l0, _ = M.intersection_loss(jnp.asarray(n1), jnp.asarray(n2), jnp.asarray(lines))
        np.testing.assert_allclose(np.asarray(lb), float(l0), rtol=1e-6)

    def test_jit_compiles(self, problem):
        n1, n2, lines = problem["neis1"], problem["neis2"], problem["lines"]
        f = jax.jit(lambda a, b, l: M.intersection_loss(a, b, l, line_chunk=128))
        loss, valid = f(jnp.asarray(n1), jnp.asarray(n2), jnp.asarray(lines))
        assert np.isfinite(float(loss))


class TestLineSampler:
    def test_triangle_hits_parity(self, torch_reference, problem):
        torch = torch_reference.torch
        v = problem["pts1"]
        fvs = np.asarray(G.bbox_face_vertices(jnp.asarray(v)[None]))[0]
        lines = problem["lines"]
        ours = np.asarray(L.triangle_hits(jnp.asarray(fvs), jnp.asarray(lines)))
        theirs = torch_reference.loss.cal_intersection_batch2_rand_lines(
            torch.from_numpy(fvs[None]), torch.from_numpy(lines[None])
        ).numpy()[0]
        # the barycentric A+B+C <= S test has zero margin in exact arithmetic
        # for inside points, so individual borderline lines flip under any
        # change of float association; require distribution-level agreement
        agree = (ours == theirs).mean()
        assert agree >= 0.97, f"triangle hit agreement too low: {agree}"

    def test_sample_lines_geometry(self):
        key = jax.random.PRNGKey(42)
        r, center = jnp.float32(2.0), jnp.asarray([1.0, -1.0, 0.5])
        lines = L.sample_lines(key, r, center, 4096)
        dirs, x0 = np.asarray(lines[:, :3]), np.asarray(lines[:, 3:])
        np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-5)
        # origins lie on the radius-r sphere around center
        np.testing.assert_allclose(
            np.linalg.norm(x0 - np.asarray(center), axis=-1), 2.0, atol=1e-5
        )

    def test_resample_fills_buffer(self, problem):
        # with a generous radius all lines hitting both bboxes: buffer fills
        key = jax.random.PRNGKey(1)
        out = np.asarray(
            L.resample_lines(key, jnp.float32(3.0), jnp.zeros(3, jnp.float32), 256,
                             jnp.asarray(problem["pts1"]), jnp.asarray(problem["pts2"]))
        )
        nonzero = np.any(out != 0, axis=-1).sum()
        assert nonzero > 200  # nearly all slots filled
        # no duplicate rows (each accepted line stored once)
        assert len(np.unique(out[np.any(out != 0, -1)], axis=0)) == nonzero


@pytest.mark.slow
class TestGatherThenTransform:
    """intersection_loss_transformed must equal transforming the neighbor
    array first — value AND gradient (it is a reassociation of the same
    computation; the point is the backward without the full-array scatter)."""

    def test_value_and_gradient_equal(self, problem):
        from a_robust_registration_loss_tpu.se3 import se3

        neis1 = jnp.asarray(problem["neis1"])
        neis2 = jnp.asarray(problem["neis2"])
        lines = jnp.asarray(problem["lines"])
        twist = jnp.asarray([0.05, -0.02, 0.08, 0.01, 0.0, -0.03])

        def loss_pre(p):
            R, t = se3.exp3(p)
            neis_t = (neis1.reshape(-1, 3) @ R + t).reshape(neis1.shape)
            l, v = M.intersection_loss(neis_t, neis2, lines)
            return l

        def loss_fused(p):
            R, t = se3.exp3(p)
            l, v = M.intersection_loss_transformed(
                lambda pts: pts @ R + t, neis1, neis2, lines)
            return l

        v1, g1 = jax.value_and_grad(loss_pre)(twist)
        v2, g2 = jax.value_and_grad(loss_fused)(twist)
        np.testing.assert_allclose(float(v2), float(v1), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                                   rtol=1e-4, atol=1e-7)


class TestMaskedMedian:
    """Masked lower-median semantics (torch.median parity is also pinned by
    the whole-loss goldens; these are the direct edge cases)."""

    def test_edge_cases(self):
        assert float(M._masked_lower_median(
            jnp.asarray([3.5]), jnp.asarray([True]))) == 3.5
        # even count -> lower middle (torch.median semantics)
        v = jnp.asarray([4.0, 1.0, 3.0, 2.0])
        assert float(M._masked_lower_median(v, jnp.ones(4, bool))) == 2.0
        v = jnp.asarray([0.0, 0.0, 1.0])
        assert float(M._masked_lower_median(v, jnp.ones(3, bool))) == 0.0
        out = M._masked_lower_median(jnp.asarray([1.0, 2.0]),
                                     jnp.zeros(2, bool))
        assert np.isinf(float(out))
