"""Unit tests for the SE(3)/SO(3)/sinc library: Taylor-branch boundaries,
log/exp round-trips, the pi-rotation branch, gradient checks, and golden
parity against the PyTorch reference (code/LieAlgebra/)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from a_robust_registration_loss_tpu.se3 import se3, sinc, so3

jax.config.update("jax_enable_x64", False)


def _rand_twists(rng, n, scale=1.0):
    return rng.standard_normal((n, 6)).astype(np.float32) * scale


class TestSinc:
    @pytest.mark.parametrize("fn,exact,rtol", [
        (sinc.sinc1, lambda t: np.sin(t) / t, 2e-5),
        # fp32 cancellation in 1-cos(t) near t=0.02 bounds achievable accuracy
        (sinc.sinc2, lambda t: (1 - np.cos(t)) / t**2, 3e-4),
        (sinc.sinc3, lambda t: (t - np.sin(t)) / t**3, 5e-3),
        (sinc.rsinc1, lambda t: t / np.sin(t), 2e-5),
    ])
    def test_matches_exact_away_from_zero(self, fn, exact, rtol):
        t = np.linspace(0.02, 3.0, 100, dtype=np.float32)
        np.testing.assert_allclose(fn(t), exact(t.astype(np.float64)), rtol=rtol)

    @pytest.mark.parametrize("fn,tol", [
        # fp32 cancellation in the exact branches of sinc2/sinc3 dominates at
        # the 0.01 boundary (the torch reference has the identical artifact)
        (sinc.sinc1, 1e-6), (sinc.sinc2, 1e-3), (sinc.sinc3, 1e-2),
    ])
    def test_continuity_at_branch(self, fn, tol):
        lo, hi = fn(jnp.float32(0.00999)), fn(jnp.float32(0.01001))
        assert abs(float(lo) - float(hi)) < tol

    @pytest.mark.parametrize("fn,limit", [
        (sinc.sinc1, 1.0), (sinc.sinc2, 0.5), (sinc.sinc3, 1 / 6), (sinc.rsinc1, 1.0),
    ])
    def test_value_and_grad_finite_at_zero(self, fn, limit):
        assert float(fn(jnp.float32(0.0))) == pytest.approx(limit, abs=1e-7)
        g = jax.grad(lambda t: fn(t))(jnp.float32(0.0))
        assert np.isfinite(float(g))

    def test_grad_matches_reference_dt(self):
        t = jnp.asarray(np.linspace(-2.0, 2.0, 41, dtype=np.float32))
        for fn, dt, atol in [(sinc.sinc1, sinc.sinc1_dt, 1e-6),
                             (sinc.sinc2, sinc.sinc2_dt, 1e-5),
                             (sinc.sinc3, sinc.sinc3_dt, 5e-4)]:
            autodiff = jax.vmap(jax.grad(fn))(t)
            np.testing.assert_allclose(autodiff, dt(t), rtol=1e-4, atol=atol)


class TestSO3:
    def test_hat_vee_roundtrip(self, rng):
        w = rng.standard_normal((7, 3)).astype(np.float32)
        np.testing.assert_allclose(so3.vec(so3.mat(w)), w)

    def test_exp_is_rotation(self, rng):
        w = _rand_twists(rng, 16)[:, :3]
        R = so3.exp(jnp.asarray(w))
        eye = jnp.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)

    def test_log_exp_roundtrip(self, rng):
        w = rng.standard_normal((32, 3)).astype(np.float32)
        w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0.01, 3.0, (32, 1)).astype(np.float32)
        w2 = so3.log(so3.exp(jnp.asarray(w)))
        np.testing.assert_allclose(w2, w, rtol=1e-3, atol=2e-5)

    def test_log_at_pi(self):
        # exactly pi engages the sqrt-of-diagonal branch (so3.py:110-128);
        # slightly-off-pi angles stay in the main branch by the reference's
        # 1e-7 sinc threshold and are noise-amplified there in fp32 (same as
        # the torch reference) — so we test the branch itself.
        axis = np.array([1.0, 2.0, -0.5], dtype=np.float32)
        axis /= np.linalg.norm(axis)
        w = axis * np.float32(np.pi)
        R = so3.exp(jnp.asarray(w))
        w2 = np.asarray(so3.log(R))
        # log may return the antipodal representative; compare rotations
        R2 = so3.exp(jnp.asarray(w2))
        np.testing.assert_allclose(R2, R, atol=1e-3)

    def test_inv_left_jacobian(self, rng):
        w = rng.standard_normal((8, 3)).astype(np.float32) * 0.7
        V = so3.vecs_Xg_ig(jnp.asarray(w))
        H = so3.inv_vecs_Xg_ig(jnp.asarray(w))
        np.testing.assert_allclose(V @ H, np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)


class TestSE3:
    def test_hat_vee_roundtrip(self, rng):
        x = _rand_twists(rng, 5)
        np.testing.assert_allclose(se3.vec(se3.mat(x)), x)

    def test_exp_log_roundtrip(self, rng):
        x = _rand_twists(rng, 32, scale=0.8)
        x2 = se3.log(se3.exp(jnp.asarray(x)))
        np.testing.assert_allclose(x2, x, rtol=1e-3, atol=3e-5)

    def test_exp3_matches_exp(self, rng):
        x = _rand_twists(rng, 6)
        g = se3.exp(jnp.asarray(x))
        R, t = se3.exp3(jnp.asarray(x))
        np.testing.assert_allclose(g[..., :3, :3], R, atol=1e-6)
        np.testing.assert_allclose(g[..., :3, 3], t, atol=1e-6)

    def test_inverse(self, rng):
        x = _rand_twists(rng, 4)
        g = se3.exp(jnp.asarray(x))
        gi = se3.inverse(g)
        np.testing.assert_allclose(g @ gi, np.broadcast_to(np.eye(4), (4, 4, 4)), atol=1e-5)

    def test_transform_matches_matrix(self, rng):
        x = _rand_twists(rng, 1)[0]
        pts = rng.standard_normal((10, 3)).astype(np.float32)
        g = se3.exp(jnp.asarray(x))
        hom = np.concatenate([pts, np.ones((10, 1), np.float32)], -1) @ np.asarray(g).T
        # same-ndim convention: a is (3, N) (reference: se3.py:143-144)
        out_mat = se3.transform(g, jnp.asarray(pts.T))
        np.testing.assert_allclose(out_mat.T, hom[:, :3], atol=1e-5)
        # batched-points convention (g.ndim != a.ndim): a is (..., 3)
        # (reference: se3.py:145-146, used as transform(g.unsqueeze(1), p))
        out_pts = se3.transform(g[None], jnp.asarray(pts))
        np.testing.assert_allclose(out_pts, hom[:, :3], atol=1e-5)

    def test_grad_through_exp3_finite(self):
        def f(x):
            R, t = se3.exp3(x)
            return jnp.sum(R) + jnp.sum(t)

        for scale in (0.0, 1e-4, 1.0):
            g = jax.grad(f)(jnp.full((6,), scale, jnp.float32))
            assert np.all(np.isfinite(np.asarray(g)))

    def test_rt_helpers(self, rng):
        x = _rand_twists(rng, 4, 0.5)
        g = se3.exp(jnp.asarray(x))
        rt = g[..., :3, :]
        pts = jnp.asarray(rng.standard_normal((4, 11, 3)).astype(np.float32))
        np.testing.assert_allclose(
            se3.rt_transform(rt, pts),
            jnp.einsum("bij,bnj->bni", g[..., :3, :3], pts) + g[..., None, :3, 3],
            atol=1e-6,
        )
        inv = se3.rt_inverse(rt)
        comp = se3.rt_concatenate(rt, inv)
        np.testing.assert_allclose(comp, se3.rt_identity((4,)), atol=1e-5)


class TestGoldenParity:
    """Bit-comparable-to-tolerance parity with the PyTorch reference."""

    def test_exp_parity(self, torch_reference, rng):
        torch = torch_reference.torch
        x = _rand_twists(rng, 16, scale=1.5)
        ours = np.asarray(se3.exp(jnp.asarray(x)))
        theirs = torch_reference.se3.exp(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)

    def test_exp3_parity(self, torch_reference, rng):
        torch = torch_reference.torch
        x = _rand_twists(rng, 8, scale=0.001)  # demo-init scale, loss.py:441-447
        R_o, t_o = se3.exp3(jnp.asarray(x))
        R_t, t_t = torch_reference.se3.exp3(torch.from_numpy(x))
        np.testing.assert_allclose(np.asarray(R_o), R_t.numpy(), rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(t_o), t_t.numpy(), rtol=1e-5, atol=1e-7)

    def test_log_parity(self, torch_reference, rng):
        torch = torch_reference.torch
        x = _rand_twists(rng, 16, scale=0.9)
        g = np.asarray(se3.exp(jnp.asarray(x)))
        ours = np.asarray(se3.log(jnp.asarray(g)))
        theirs = torch_reference.se3.log(torch.from_numpy(g)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-5)

    def test_sinc_parity(self, torch_reference):
        torch = torch_reference.torch
        t = np.linspace(-3, 3, 601, dtype=np.float32)  # crosses both branches
        for ours, theirs in [
            (sinc.sinc1, torch_reference.sinc.sinc1),
            (sinc.sinc2, torch_reference.sinc.sinc2),
            (sinc.sinc3, torch_reference.sinc.sinc3),
        ]:
            np.testing.assert_allclose(
                np.asarray(ours(jnp.asarray(t))),
                theirs(torch.from_numpy(t)).numpy(),
                rtol=1e-4, atol=1e-5,
            )
