"""Pallas-kernel equivalence tests (interpret mode on CPU).

SURVEY.md §7 step 5 demands the fused stage-1 kernel
(ops/pallas/intersect.py) be "equivalence-tested vs the jnp reference at
fp32 tolerance". These tests cover the cases where such kernels break
silently: F / L not multiples of the tile sizes, per-line hit counts
exceeding kmax, and hits straddling face-tile boundaries (the
cross-tile rank carry in _kernel).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from a_robust_registration_loss_tpu.ops import geometry as G
from a_robust_registration_loss_tpu.ops import lines as L
from a_robust_registration_loss_tpu.ops import metric as M
from a_robust_registration_loss_tpu.ops.pallas import intersect as PK


def _sphere_cloud(n, rng, noise=0.0):
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5**0.5) * i
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


def _random_problem(seed=7, f1=333, f2=301, n_lines=257):
    """F and L deliberately NOT multiples of any tile size."""
    rng = np.random.default_rng(seed)
    pts1 = _sphere_cloud(400, rng, noise=0.01)
    pts2 = _sphere_cloud(410, rng, noise=0.01)
    neis1 = _neighs(pts1, f1)
    neis2 = _neighs(pts2, f2)
    lines = np.asarray(
        L.resample_lines(jax.random.PRNGKey(3), jnp.float32(3.0),
                         jnp.zeros(3, jnp.float32), n_lines,
                         jnp.asarray(pts1), jnp.asarray(pts2))
    )
    return neis1, neis2, lines


def _compare_intersections(neis, lines, tl, tf, w_atol=3e-4):
    """Run both backends' stage 1 and assert count/slot_idx equality and
    slot weight closeness."""
    neis_j = jnp.asarray(neis)
    lines_j = jnp.asarray(lines)
    ref = M.find_intersections(neis_j, lines_j, backend="xla")

    delta = M.neighborhood_delta(neis_j)
    count, slot_idx, slot_d2, slot_recon, _ = PK.intersect_stage1(
        neis_j, lines_j, delta, tl=tl, tf=tf, interpret=True
    )
    F = neis.shape[0]
    filled = slot_idx < F
    slot_idx = jnp.where(filled, slot_idx, F)
    d = jnp.sqrt(slot_d2 + 2e-4)
    w = d / jnp.sum(d, -1, keepdims=True)
    w = jnp.where(filled[..., None], w, 0.0)

    np.testing.assert_array_equal(np.asarray(count), np.asarray(ref.count))
    np.testing.assert_array_equal(np.asarray(slot_idx), np.asarray(ref.slot_idx))
    np.testing.assert_allclose(np.asarray(w), np.asarray(ref.slot_w),
                               rtol=1e-4, atol=w_atol)
    # in-kernel reconstruction vs the XLA gather + weighted sum
    recon_ref = np.sum(
        np.asarray(ref.slot_w)[..., None]
        * np.asarray(neis).reshape(F, 3, 3)[np.minimum(np.asarray(slot_idx), F - 1)],
        axis=-2)
    recon_ref = np.where(np.asarray(filled)[..., None], recon_ref, 0.0)
    recon = np.where(np.asarray(filled)[..., None], np.asarray(slot_recon), 0.0)
    np.testing.assert_allclose(recon, recon_ref, rtol=1e-4,
                               atol=max(w_atol, 1e-5) * 3)
    return ref


class TestStage1Equivalence:
    @pytest.mark.slow
    def test_non_multiple_tiles(self):
        """F=333, L=257 with 128-tiles: 3x3 grid, ragged last tiles on both
        axes; the face sweep exercises the cross-tile rank carry."""
        neis1, neis2, lines = _random_problem()
        ref = _compare_intersections(neis1, lines, tl=128, tf=128)
        # the problem must actually have intersections to be a real test
        assert int(np.asarray(ref.count).sum()) > 50
        _compare_intersections(neis2, lines, tl=128, tf=128)

    def test_single_tile(self):
        neis1, _, lines = _random_problem(seed=11, f1=128, n_lines=128)
        _compare_intersections(neis1, lines, tl=128, tf=128)

    def test_counts_exceed_kmax_across_face_tiles(self):
        """One line hitting 6 neighborhoods at face indices straddling the
        tf=128 tile boundaries; count must be the uncapped 6 and the slots
        the first 4 ascending indices — requires the rank carry to be exact
        across tiles."""
        F = 384
        hit_faces = [3, 126, 127, 128, 200, 310]  # straddles 128 and 256
        rng = np.random.default_rng(0)
        # all faces far from the x-axis line by default
        centers = rng.standard_normal((F, 3)).astype(np.float32)
        centers[:, 1] += 5.0
        # hit faces: tight neighborhoods centered on the x-axis
        for k, f in enumerate(hit_faces):
            centers[f] = [0.5 * k, 0.0, 0.0]
        # neighbors spread ALONG the line direction (x): large pairwise
        # spacing (big delta) but near-zero perpendicular distances
        spread = np.array(
            [[0.0, 0.0, 0.0], [0.1, 0.001, 0.0], [-0.1, 0.0, 0.001]], np.float32
        )
        neis = (centers[:, None, :] + spread[None]).reshape(F, 9)
        line = np.array([[1.0, 0.0, 0.0, -10.0, 0.0, 0.0]], np.float32)
        lines = np.repeat(line, 129, axis=0)  # L=129: ragged line tile too
        lines[1:, 4] = 50.0  # all other lines miss everything

        # the line passes exactly through the points, so perpendicular d^2 is
        # catastrophic-cancellation-dominated (|AC|^2 ~ 1e2, true perp^2
        # ~ 1e-6): both backends' weights carry ~1% rounding noise; this is a
        # count/slot-ordering test, so compare weights loosely here.
        ref = _compare_intersections(neis, lines, tl=128, tf=128, w_atol=2e-2)
        count = np.asarray(ref.count)
        slot_idx = np.asarray(ref.slot_idx)
        assert count[0] == len(hit_faces)
        np.testing.assert_array_equal(slot_idx[0], hit_faces[:4])
        assert (count[1:] == 0).all()

    @pytest.mark.slow
    def test_default_tiles_padding(self):
        """Default (1024, 512) tiles with tiny F/L: heavy padding on both
        axes must not leak phantom intersections."""
        neis1, _, lines = _random_problem(seed=5, f1=100, n_lines=77)
        _compare_intersections(neis1, lines, tl=1024, tf=512)


class TestEndToEndEquivalence:
    def test_loss_matches_xla(self):
        """The full metric through the pallas backend (the exact path
        bench.py measures) vs the golden-tested XLA path."""
        neis1, neis2, lines = _random_problem(seed=13)
        loss_x, valid_x = M.intersection_loss(
            jnp.asarray(neis1), jnp.asarray(neis2), jnp.asarray(lines),
            backend="xla",
        )
        loss_p, valid_p = M.intersection_loss(
            jnp.asarray(neis1), jnp.asarray(neis2), jnp.asarray(lines),
            backend="pallas", interpret=True,
        )
        assert bool(valid_x) and bool(valid_p)
        # count/slot/weight equivalence is asserted tightly above; the loss
        # amplifies the backends' ~3e-4 detached-weight rounding through the
        # squared slot distances and the small valid-line count of this
        # 257-line problem, so the end-to-end bar is looser (measured
        # ~0.4% worst case across sampler streams)
        np.testing.assert_allclose(float(loss_p), float(loss_x),
                                   rtol=8e-3, atol=2e-5)

    @pytest.mark.slow
    def test_gradient_matches_xla(self):
        """Gradients w.r.t. the source neighborhoods flow only through the
        differentiable reconstruction, which both backends share — but the
        detached weights differ by kernel rounding, so check closeness."""
        neis1, neis2, lines = _random_problem(seed=17, f1=200, f2=200,
                                              n_lines=150)

        def loss_with(backend):
            def f(n1):
                l, _ = M.intersection_loss(
                    n1, jnp.asarray(neis2), jnp.asarray(lines),
                    backend=backend, interpret=(backend == "pallas"),
                )
                return l
            return jax.grad(f)(jnp.asarray(neis1))

        g_x = np.asarray(loss_with("xla"))
        g_p = np.asarray(loss_with("pallas"))
        np.testing.assert_allclose(g_p, g_x, rtol=5e-3, atol=1e-5)


@pytest.mark.slow
class TestRigidFastPath:
    def test_rigid_matches_transformed_value_and_grad(self):
        """intersection_loss_rigid's pallas shortcut (kernel-emitted
        reconstruction + one affine op) vs the generic gather-then-transform
        path: same value and same gradient w.r.t. (R, t)."""
        from a_robust_registration_loss_tpu.se3 import se3

        neis1, neis2, lines = _random_problem(seed=23, f1=200, f2=200,
                                              n_lines=150)
        twist = jnp.asarray([0.04, -0.03, 0.06, 0.02, 0.0, -0.01])

        def loss_generic(p):
            R, t = se3.exp3(p)
            l, _ = M.intersection_loss_transformed(
                lambda q: q @ R + t, jnp.asarray(neis1), jnp.asarray(neis2),
                jnp.asarray(lines), backend="pallas", interpret=True)
            return l

        def loss_rigid(p):
            R, t = se3.exp3(p)
            l, _ = M.intersection_loss_rigid(
                R, t, jnp.asarray(neis1), jnp.asarray(neis2),
                jnp.asarray(lines), backend="pallas", interpret=True)
            return l

        v1, g1 = jax.value_and_grad(loss_generic)(twist)
        v2, g2 = jax.value_and_grad(loss_rigid)(twist)
        # 5e-5: the rigid path derives the detached slot weights from the
        # exact gathered coordinates (same formula, ulp-level op-order
        # differences vs the generic path's dense-tensor distances); the
        # exact masked median can then select a neighboring order statistic
        np.testing.assert_allclose(float(v2), float(v1), rtol=5e-5)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                                   rtol=5e-3, atol=1e-6)

    def test_rigid_xla_fallback(self):
        from a_robust_registration_loss_tpu.se3 import se3

        neis1, neis2, lines = _random_problem(seed=29, f1=150, f2=150,
                                              n_lines=120)
        R, t = se3.exp3(jnp.asarray([0.05, 0.0, -0.02, 0.01, 0.03, 0.0]))
        l_x, v_x = M.intersection_loss_rigid(
            R, t, jnp.asarray(neis1), jnp.asarray(neis2), jnp.asarray(lines),
            backend="xla")
        l_p, v_p = M.intersection_loss_rigid(
            R, t, jnp.asarray(neis1), jnp.asarray(neis2), jnp.asarray(lines),
            backend="pallas", interpret=True)
        assert bool(v_x) and bool(v_p)
        np.testing.assert_allclose(float(l_p), float(l_x), rtol=3e-4,
                                   atol=2e-5)


@pytest.mark.slow
class TestPairKernelAndEmitModes:
    """The paired dispatch (intersect_stage1_pair) and the emit_d2 /
    emit_recon / emit_pts output modes must be bitwise consistent with the
    full single-cloud call — these are the production configurations the
    metric glue actually selects (ops/metric.py:_find_intersections_pallas_pair)."""

    def test_pair_matches_two_singles(self):
        neis1, neis2, lines = _random_problem(seed=31)
        j1, j2, lj = map(jnp.asarray, (neis1, neis2, lines))
        d1 = M.neighborhood_delta(j1)
        d2 = M.neighborhood_delta(j2)
        pair1, pair2 = PK.intersect_stage1_pair(
            j1, j2, lj, d1, d2, tl=128, tf=128, emit_d2=True,
            emit_recon=True, emit_pts=True, interpret=True)
        for (neis, delta, pair) in ((j1, d1, pair1), (j2, d2, pair2)):
            single = PK.intersect_stage1(
                neis, lj, delta, tl=128, tf=128, emit_d2=True,
                emit_recon=True, emit_pts=True, interpret=True)
            for a, b, name in zip(pair, single,
                                  ("count", "idx", "d2", "recon", "pts")):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                              err_msg=name)

    def test_pair_unequal_cloud_sizes(self):
        """F1 != F2: the smaller cloud is padded to the common face count;
        padded faces must never intersect."""
        neis1, neis2, lines = _random_problem(seed=37, f1=333, f2=190)
        j1, j2, lj = map(jnp.asarray, (neis1, neis2, lines))
        d1 = M.neighborhood_delta(j1)
        d2 = M.neighborhood_delta(j2)
        pair1, pair2 = PK.intersect_stage1_pair(
            j1, j2, lj, d1, d2, tl=128, tf=128, interpret=True)
        s1 = PK.intersect_stage1(j1, lj, d1, tl=128, tf=128, interpret=True)
        s2 = PK.intersect_stage1(j2, lj, d2, tl=128, tf=128, interpret=True)
        for pair, single in ((pair1, s1), (pair2, s2)):
            for a, b in zip(pair, single):
                if a is not None or b is not None:
                    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_emit_modes_subset_full(self):
        """Every emit combination returns exactly the full call's arrays for
        the fields it keeps, and None for the ones it drops."""
        neis1, _, lines = _random_problem(seed=41, f1=150, n_lines=130)
        j1, lj = jnp.asarray(neis1), jnp.asarray(lines)
        d1 = M.neighborhood_delta(j1)
        full = PK.intersect_stage1(j1, lj, d1, tl=128, tf=128, emit_d2=True,
                                   emit_recon=True, emit_pts=True,
                                   interpret=True)
        for emit_d2 in (False, True):
            for emit_recon in (False, True):
                for emit_pts in (False, True):
                    out = PK.intersect_stage1(
                        j1, lj, d1, tl=128, tf=128, emit_d2=emit_d2,
                        emit_recon=emit_recon, emit_pts=emit_pts,
                        interpret=True)
                    flags = (True, True, emit_d2, emit_recon, emit_pts)
                    for f, a, b in zip(flags, out, full):
                        if not f:
                            assert a is None
                        else:
                            np.testing.assert_array_equal(np.asarray(a),
                                                          np.asarray(b))

    def test_pts_mode_reconstruction_matches(self):
        """recon built outside from (d2, pts) — the emit_pts consumer path —
        vs the in-kernel recon."""
        neis1, _, lines = _random_problem(seed=43, f1=200, n_lines=150)
        j1, lj = jnp.asarray(neis1), jnp.asarray(lines)
        d1 = M.neighborhood_delta(j1)
        count, slot_idx, slot_d2, slot_recon, slot_pts = PK.intersect_stage1(
            j1, lj, d1, tl=128, tf=128, emit_d2=True, emit_recon=True,
            emit_pts=True, interpret=True)
        F = j1.shape[0]
        filled = np.asarray(slot_idx) < F
        d = np.sqrt(np.asarray(slot_d2) + 2e-4)
        w = d / d.sum(-1, keepdims=True)
        recon_out = (w[..., None] * np.asarray(slot_pts)).sum(-2)
        recon_in = np.asarray(slot_recon)
        np.testing.assert_allclose(
            np.where(filled[..., None], recon_out, 0.0),
            np.where(filled[..., None], recon_in, 0.0),
            rtol=1e-4, atol=1e-5)


class TestResampleKernel:
    """The fused sample+hit candidate kernel (ops/pallas/resample.py),
    interpret mode. Bitwise parity with the XLA path is NOT a goal: the
    barycentric acceptance test compares A+B+C against S where equality
    holds exactly in real arithmetic for interior hits, so the label is
    rounding-determined on EVERY implementation (the torch reference
    included) — only the sampling measure is contractual."""

    def _setup(self, seed=5, n_pts=300):
        rng = np.random.default_rng(seed)
        v1 = jnp.asarray(_sphere_cloud(n_pts, rng, noise=0.05))
        v2 = jnp.asarray(_sphere_cloud(n_pts, rng, noise=0.05)) + 0.1
        fvs1 = G.bbox_face_vertices(v1[None])[0]
        fvs2 = G.bbox_face_vertices(v2[None])[0]
        return v1, v2, fvs1, fvs2

    def test_candidate_geometry_and_acceptance(self):
        from a_robust_registration_loss_tpu.ops.pallas import resample as PR

        v1, v2, fvs1, fvs2 = self._setup()
        key = jax.random.PRNGKey(11)
        C = 4000
        u4 = jax.random.uniform(key, (4, C))
        cand_x = L.sample_lines(key, jnp.float32(2.2), v2.mean(0), C)
        ok_x = ((L.triangle_hits(fvs1, cand_x) > 0)
                & (L.triangle_hits(fvs2, cand_x) > 0))
        fv = PR.prep_faces(fvs1, fvs2)
        cand_p, ok_p = PR.sample_and_hit(u4, jnp.float32(2.2), v2.mean(0),
                                         fv, tc=1024, interpret=True)
        # same uniforms -> same candidate geometry (up to trig ulps)
        np.testing.assert_allclose(np.asarray(cand_p), np.asarray(cand_x),
                                   rtol=1e-5, atol=1e-5)
        # same sampling measure -> acceptance rates agree closely
        ax, ap = float(jnp.mean(ok_x)), float(jnp.mean(ok_p))
        assert abs(ax - ap) < 0.05 * max(ax, 0.02), (ax, ap)

    def test_resample_lines_pallas_fill_semantics(self):
        """backend='pallas' output == first-n-accepted of the kernel's own
        candidate stream (the shared fill), deterministic per key."""
        from a_robust_registration_loss_tpu.ops.pallas import resample as PR

        v1, v2, fvs1, fvs2 = self._setup()
        key = jax.random.PRNGKey(4)
        n, rounds = 256, 10
        out = L.resample_lines(key, jnp.float32(2.2), v2.mean(0), n, v1, v2,
                               backend="pallas", interpret=True)
        out2 = L.resample_lines(key, jnp.float32(2.2), v2.mean(0), n, v1, v2,
                                backend="pallas", interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))

        fv = PR.prep_faces(fvs1, fvs2)
        u4 = jax.random.uniform(key, (4, rounds * n))
        cand, ok = PR.sample_and_hit(u4, jnp.float32(2.2), v2.mean(0), fv,
                                     tc=1024, interpret=True)
        kept = np.asarray(cand)[np.asarray(ok)][:n]
        expect = np.zeros((n, 6), np.float32)
        expect[: len(kept)] = kept
        np.testing.assert_array_equal(np.asarray(out), expect)

    def test_tile_padding_independence(self):
        """A C that is NOT a multiple of the tile (padded grid) must produce
        bitwise the same candidates/acceptances as an exactly-tiled run —
        the observable contract of the in-kernel padded-tail masking."""
        from a_robust_registration_loss_tpu.ops.pallas import resample as PR

        v1, v2, fvs1, fvs2 = self._setup()
        fv = PR.prep_faces(fvs1, fvs2)
        C = 700
        u4 = jax.random.uniform(jax.random.PRNGKey(9), (4, C))
        cand_pad, ok_pad = PR.sample_and_hit(u4, jnp.float32(2.2), v2.mean(0),
                                             fv, tc=512, interpret=True)
        cand_ex, ok_ex = PR.sample_and_hit(u4, jnp.float32(2.2), v2.mean(0),
                                           fv, tc=350, interpret=True)
        assert cand_pad.shape == (C, 6) and ok_pad.shape == (C,)
        assert int(jnp.sum(ok_pad)) > 0
        np.testing.assert_array_equal(np.asarray(cand_pad),
                                      np.asarray(cand_ex))
        np.testing.assert_array_equal(np.asarray(ok_pad), np.asarray(ok_ex))


class TestKmaxGeneralization:
    """The kernel's slot capacity is a static parameter, not a compiled-in
    constant (round-1 VERDICT weak item 4): any kmax must match the XLA
    path exactly."""

    @pytest.mark.parametrize("kmax", [
        2, pytest.param(6, marks=pytest.mark.slow)])
    def test_stage1_any_kmax(self, kmax):
        neis1, _, lines = _random_problem(seed=17, f1=260, n_lines=200)
        j1, lj = jnp.asarray(neis1), jnp.asarray(lines)
        ref = M.find_intersections(j1, lj, kmax=kmax, backend="xla")
        got = M.find_intersections(j1, lj, kmax=kmax, backend="pallas",
                                   interpret=True)
        np.testing.assert_array_equal(np.asarray(got.count),
                                      np.asarray(ref.count))
        np.testing.assert_array_equal(np.asarray(got.slot_idx),
                                      np.asarray(ref.slot_idx))
        np.testing.assert_allclose(np.asarray(got.slot_w),
                                   np.asarray(ref.slot_w),
                                   rtol=1e-4, atol=3e-4)

    @pytest.mark.slow  # fast tier keeps the kmax=2 stage-1 equivalence
    def test_whole_loss_kmax2(self):
        neis1, neis2, lines = _random_problem(seed=19, f1=200, f2=180,
                                              n_lines=200)
        j1, j2 = jnp.asarray(neis1), jnp.asarray(neis2)
        lj = jnp.asarray(lines)
        lx, vx = M.intersection_loss(j1, j2, lj, kmin=1, kmax=2,
                                     backend="xla")
        lp, vp = M.intersection_loss(j1, j2, lj, kmin=1, kmax=2,
                                     backend="pallas", interpret=True)
        assert bool(vx) == bool(vp)
        np.testing.assert_allclose(float(lp), float(lx), rtol=1e-5)


class TestNneiGeneralization:
    """The kernel derives the neighborhood size from the input shape (the
    reference only ever uses nnei=3, loss.py:473 — but the XLA path is
    general, so the pallas backend must be too; round-2 frontier item).
    Covers the packed face-row layout (3*nnei+1 rounded to 8 sublanes), the
    emit_pts gather rows, and the lane-major rigid reconstruction."""

    @staticmethod
    def _problem(nnei, seed=23, f=180, n_lines=200):
        rng = np.random.default_rng(seed)
        ctr = rng.standard_normal((f, 1, 3)).astype(np.float32)

        def mk():
            n = ctr + 0.08 * rng.standard_normal((f, nnei, 3)).astype(np.float32)
            return jnp.asarray(n.reshape(f, nnei * 3))

        lines = np.concatenate(
            [rng.standard_normal((n_lines, 3)),
             0.3 * rng.standard_normal((n_lines, 3))], -1).astype(np.float32)
        lines[:, :3] /= np.linalg.norm(lines[:, :3], axis=-1, keepdims=True)
        return mk(), mk(), jnp.asarray(lines)

    @pytest.mark.parametrize("nnei", [
        2, pytest.param(5, marks=pytest.mark.slow)])
    def test_stage1_any_nnei(self, nnei):
        n1, _, lj = self._problem(nnei)
        ref = M.find_intersections(n1, lj, kmax=4, backend="xla")
        got = M.find_intersections(n1, lj, kmax=4, backend="pallas",
                                   interpret=True)
        assert int(np.asarray(ref.count).sum()) > 0  # non-trivial problem
        np.testing.assert_array_equal(np.asarray(got.count),
                                      np.asarray(ref.count))
        np.testing.assert_array_equal(np.asarray(got.slot_idx),
                                      np.asarray(ref.slot_idx))
        assert got.slot_w.shape[-1] == nnei
        np.testing.assert_allclose(np.asarray(got.slot_w),
                                   np.asarray(ref.slot_w),
                                   rtol=1e-4, atol=3e-4)

    @pytest.mark.slow
    def test_whole_loss_and_grad_nnei4(self):
        n1, n2, lj = self._problem(4)

        def run(be):
            return jax.value_and_grad(
                lambda a: M.intersection_loss(
                    a, n2, lj, backend=be, interpret=(be == "pallas"))[0])(n1)

        (vx, gx), (vp, gp) = run("xla"), run("pallas")
        np.testing.assert_allclose(float(vp), float(vx), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=1e-4, atol=1e-7)

    @pytest.mark.slow
    def test_rigid_lanemajor_nnei4(self):
        n1, n2, lj = self._problem(4, seed=29)
        th = 0.1
        R = jnp.asarray([[np.cos(th), -np.sin(th), 0.0],
                         [np.sin(th), np.cos(th), 0.0],
                         [0.0, 0.0, 1.0]], jnp.float32)
        t = jnp.asarray([0.02, -0.01, 0.03], jnp.float32)

        def run(be):
            return jax.value_and_grad(
                lambda Rt: M.intersection_loss_rigid(
                    Rt[0], Rt[1], n1, n2, lj, backend=be,
                    interpret=(be == "pallas"))[0])((R, t))

        (vx, gx), (vp, gp) = run("xla"), run("pallas")
        np.testing.assert_allclose(float(vp), float(vx), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gp)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-7)


class TestRigidLaneMajorVmap:
    """The training losses vmap intersection_loss_rigid over the batch
    (train/losses.py _metric_batch_rt); the lane-major path must match the
    generic gather-then-transform path under vmap too."""

    @pytest.mark.slow
    def test_vmapped_rigid_matches_transformed(self):
        from a_robust_registration_loss_tpu.se3 import se3

        B = 3
        neis1 = []
        neis2 = []
        lines = []
        for b in range(B):
            n1, n2, ln = _random_problem(seed=31 + b, f1=200, f2=200,
                                         n_lines=150)
            neis1.append(n1), neis2.append(n2), lines.append(ln)
        neis1 = jnp.asarray(np.stack(neis1))
        neis2 = jnp.asarray(np.stack(neis2))
        lines = jnp.asarray(np.stack(lines))
        twists = jnp.asarray([[0.04, -0.03, 0.06, 0.02, 0.0, -0.01],
                              [-0.02, 0.05, 0.01, 0.0, 0.03, 0.02],
                              [0.0, 0.0, 0.0, 0.0, 0.0, 0.0]])

        def batch_loss(fn):
            def per(p, a, b, l):
                R, t = se3.exp3(p)
                return fn(R, t, a, b, l)
            def total(ps):
                return jnp.sum(jax.vmap(per)(ps, neis1, neis2, lines))
            return jax.value_and_grad(total)(twists)

        v_r, g_r = batch_loss(
            lambda R, t, a, b, l: M.intersection_loss_rigid(
                R, t, a, b, l, backend="pallas", interpret=True)[0])
        v_g, g_g = batch_loss(
            lambda R, t, a, b, l: M.intersection_loss_transformed(
                lambda q: q @ R + t, a, b, l, backend="pallas",
                interpret=True)[0])
        np.testing.assert_allclose(float(v_r), float(v_g), rtol=5e-5)
        np.testing.assert_allclose(np.asarray(g_r), np.asarray(g_g),
                                   rtol=5e-3, atol=1e-6)


class TestResampleCoinUnbiased:
    """The barycentric accept labels are rounding coins (see
    TestResampleKernel docstring); what must NOT differ between backends is
    the SPATIAL distribution of accepted lines — a systematically biased
    coin (e.g. trig rounding correlated with the sphere angle) would skew
    the metric's line coverage."""

    @pytest.mark.slow
    def test_direction_octants_match(self):
        from a_robust_registration_loss_tpu.ops.pallas import resample as PR

        rng = np.random.default_rng(2)
        v1 = jnp.asarray(_sphere_cloud(300, rng, noise=0.05))
        v2 = jnp.asarray(_sphere_cloud(300, rng, noise=0.05)) + 0.1
        fvs1 = G.bbox_face_vertices(v1[None])[0]
        fvs2 = G.bbox_face_vertices(v2[None])[0]
        fv = PR.prep_faces(fvs1, fvs2)
        C = 40000
        key = jax.random.PRNGKey(21)
        u4 = jax.random.uniform(key, (4, C))
        cand_x = L.sample_lines(key, jnp.float32(2.2), v2.mean(0), C)
        ok_x = np.asarray((L.triangle_hits(fvs1, cand_x) > 0)
                          & (L.triangle_hits(fvs2, cand_x) > 0))
        cand_p, ok_p = PR.sample_and_hit(u4, jnp.float32(2.2), v2.mean(0),
                                         fv, tc=8192, interpret=True)
        cand_p, ok_p = np.asarray(cand_p), np.asarray(ok_p)

        def octants(cand, ok):
            d = cand[ok][:, :3]
            code = ((d[:, 0] > 0).astype(int) * 4
                    + (d[:, 1] > 0).astype(int) * 2
                    + (d[:, 2] > 0).astype(int))
            return np.bincount(code, minlength=8).astype(float)

        hx, hp = octants(np.asarray(cand_x), ok_x), octants(cand_p, ok_p)
        hx, hp = hx / hx.sum(), hp / hp.sum()
        # per-octant shares within 15% relative of each other (the label
        # coins flip ~25-30% of individual accepts, but must not shift the
        # spatial measure)
        np.testing.assert_allclose(hp, hx, rtol=0.15, atol=0.01)


class TestSlotPointsKernelVJP:
    """_slot_points_kernel: the generic pallas path's forward now takes its
    slot points straight from the kernel's exact MXU gather (emit_pts), with
    a custom VJP that reproduces the gather path's gradient (w/nnei
    scatter-add into the selected rows). The two must agree EXACTLY when fed
    the same Intersections — the only difference is where the gather runs."""

    def _case(self, seed=3, F=64, L=48, kmax=4):
        rng = np.random.default_rng(seed)
        P = jnp.asarray(rng.standard_normal((F, 9)), jnp.float32)
        idx = jnp.asarray(
            np.where(rng.random((L, kmax)) < 0.6,
                     rng.integers(0, F, (L, kmax)), F), jnp.int32)
        w = rng.random((L, kmax, 3)).astype(np.float32)
        w = jnp.asarray(w / w.sum(-1, keepdims=True))
        w = jnp.where((idx < F)[..., None], w, 0.0)
        return P, idx, w

    def test_value_is_kernel_pts(self):
        P, idx, w = self._case()
        inter = M.Intersections(jnp.sum((idx < P.shape[0]), -1), idx, w)
        kp = M.reconstruct_intersection_points(P, inter)
        out = M._slot_points_kernel(P, kp, idx, w)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(kp))

    def test_grad_matches_gather_path_exactly(self):
        P, idx, w = self._case()
        inter = M.Intersections(jnp.sum((idx < P.shape[0]), -1), idx, w)
        cot_seed = jnp.asarray(
            np.random.default_rng(9).standard_normal(
                (idx.shape[0], idx.shape[1], 3)), jnp.float32)

        def via_gather(p):
            return jnp.sum(M.reconstruct_intersection_points(p, inter)
                           * cot_seed)

        def via_kernel(p):
            kp = jax.lax.stop_gradient(
                M.reconstruct_intersection_points(p, inter))
            return jnp.sum(M._slot_points_kernel(p, kp, idx, w) * cot_seed)

        g_g = np.asarray(jax.grad(via_gather)(P))
        g_k = np.asarray(jax.grad(via_kernel)(P))
        np.testing.assert_allclose(g_k, g_g, rtol=1e-6, atol=1e-7)

    def test_grad_under_vmap(self):
        P, idx, w = self._case()
        inter = M.Intersections(jnp.sum((idx < P.shape[0]), -1), idx, w)
        kp = M.reconstruct_intersection_points(P, inter)

        def f(p):
            return jnp.sum(M._slot_points_kernel(p, kp, idx, w) ** 2)

        batch = jnp.stack([P, P * 1.5])
        g = jax.vmap(jax.grad(f))(batch)
        np.testing.assert_allclose(np.asarray(g[0]),
                                   np.asarray(jax.grad(f)(P)),
                                   rtol=1e-6, atol=0)


class TestMXUGatherKernel:
    """ops/pallas/gather.py — the MXU one-hot row gather. A measured
    negative result at RPM's C=6 shape (XLA's flat take is 2x faster there,
    models/rpmnet.py:_group_gather) but kept for the wide-C regime;
    correctness is pinned here in interpret mode."""

    @pytest.mark.parametrize("shape", [(2, 40, 6, 100), (1, 128, 3, 128),
                                       (3, 17, 5, 33)])
    def test_fwd_bitexact_and_bwd(self, shape):
        from a_robust_registration_loss_tpu.ops.pallas.gather import (
            gather_rows,
        )

        B, N, C, Q = shape
        rng = np.random.default_rng(0)
        tab = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, N, (B, Q)).astype(np.int32))
        out = gather_rows(tab, idx, True)
        ref = jnp.take_along_axis(tab, idx[..., None], axis=1)
        assert bool(jnp.all(out == ref))  # exact: 0/1 fp32 one-hot @ HIGHEST
        g = jnp.asarray(rng.standard_normal((B, Q, C)).astype(np.float32))
        g1 = jax.grad(lambda t: jnp.sum(gather_rows(t, idx, True) * g))(tab)
        g2 = jax.grad(lambda t: jnp.sum(
            jnp.take_along_axis(t, idx[..., None], 1) * g))(tab)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-5, atol=1e-5)
