"""Model zoo tests: shapes, rotation validity, head/pointer configurations,
sinkhorn parity vs the reference algorithm, IC-solver convergence on an
exactly-solvable pair, and jit/grad compatibility."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from a_robust_registration_loss_tpu.models import common
from a_robust_registration_loss_tpu.models.dcp import DCP, DCPConfig
from a_robust_registration_loss_tpu.models.fmr import FMRConfig, SolveRegistration
from a_robust_registration_loss_tpu.models.rpmnet import (
    RPMNetConfig,
    RPMNetEarlyFusion,
    compute_rigid_transform,
    sinkhorn,
)
from a_robust_registration_loss_tpu.se3 import se3


def _clouds(rng, b=2, n=96):
    src = rng.standard_normal((b, n, 3)).astype(np.float32) * 0.4
    nrm = rng.standard_normal((b, n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    return jnp.asarray(src), jnp.asarray(nrm)


class TestDCP:
    @pytest.mark.parametrize("emb", [
        pytest.param("pointnet", marks=pytest.mark.slow), "dgcnn"])
    @pytest.mark.parametrize("head", [
        "svd", pytest.param("mlp", marks=pytest.mark.slow)])
    def test_configs(self, rng, emb, head):
        src, _ = _clouds(rng)
        tgt, _ = _clouds(rng)
        cfg = DCPConfig(emb_nn=emb, pointer="transformer", head=head,
                        emb_dims=128, ff_dims=128, n_blocks=1, n_heads=4)
        m = DCP(cfg)
        params = m.init(jax.random.PRNGKey(0), src, tgt)
        R, t, R_ba, t_ba = m.apply(params, src, tgt)
        assert R.shape == (2, 3, 3) and t.shape == (2, 3)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-4)
        # ba is the inverse of ab when cycle=False (dcp/model.py:505-509)
        RtR = np.asarray(R_ba) @ np.asarray(R)
        np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-5)

    @pytest.mark.slow
    def test_grad(self, rng):
        src, _ = _clouds(rng, n=64)
        tgt, _ = _clouds(rng, n=64)
        cfg = DCPConfig(emb_nn="pointnet", emb_dims=128, ff_dims=64)
        m = DCP(cfg)
        params = m.init(jax.random.PRNGKey(0), src, tgt)

        def loss(p):
            R, t, _, _ = m.apply(p, src, tgt)
            return jnp.sum(jnp.abs(jnp.einsum("bij,bnj->bni", R, src) + t[:, None] - tgt))

        g = jax.jit(jax.grad(loss))(params)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))


class TestRPMNet:
    @pytest.mark.slow
    def test_forward_and_det(self, rng):
        src, nsrc = _clouds(rng)
        ref, nref = _clouds(rng)
        m = RPMNetEarlyFusion(RPMNetConfig(num_neighbors=16))
        params = m.init(jax.random.PRNGKey(0), src, nsrc, ref, nref, num_iter=2)
        transforms, ep = m.apply(params, src, nsrc, ref, nref, num_iter=2)
        assert len(transforms) == 2 and transforms[0].shape == (2, 3, 4)
        np.testing.assert_allclose(
            np.linalg.det(np.asarray(transforms[-1][..., :3, :3])), 1.0, atol=1e-4
        )
        pm = np.asarray(ep["perm_matrices"][0])
        assert pm.sum(-1).max() <= 1.0 + 1e-4  # rows sum <= 1 with slack

    def test_sinkhorn_reference_parity(self, rng):
        torch = pytest.importorskip("torch")
        la = rng.standard_normal((2, 10, 12)).astype(np.float32)
        ours = np.asarray(sinkhorn(jnp.asarray(la), 5, True))
        t = torch.from_numpy(la)
        p = torch.nn.ZeroPad2d((0, 1, 0, 1))(t[:, None]).squeeze(1)
        for _ in range(5):
            p = torch.cat((p[:, :-1, :] - torch.logsumexp(p[:, :-1, :], 2, keepdim=True),
                           p[:, -1, None, :]), 1)
            p = torch.cat((p[:, :, :-1] - torch.logsumexp(p[:, :, :-1], 1, keepdim=True),
                           p[:, :, -1, None]), 2)
        np.testing.assert_allclose(ours, p[:, :-1, :-1].numpy(), atol=3e-6)

    def test_anneal_constant_variant(self, rng):
        """cfg.anneal='constant' swaps in the learnable-constant ablation
        (feature_nets.py:91-115): a single 2-vector parameter, (beta, alpha)
        independent of the input clouds."""
        src, nsrc = _clouds(rng, n=24)
        ref, nref = _clouds(rng, n=24)
        m = RPMNetEarlyFusion(RPMNetConfig(feat_dim=32, num_neighbors=8,
                                           num_sk_iter=2, anneal="constant"))
        params = m.init(jax.random.PRNGKey(0), src, nsrc, ref, nref,
                        num_iter=1)["params"]
        assert set(params["weights_net"]) == {"anneal_weights"}
        assert params["weights_net"]["anneal_weights"].shape == (2,)
        t1, ep1 = m.apply({"params": params}, src, nsrc, ref, nref, num_iter=1)
        t2, ep2 = m.apply({"params": params}, src * 2.0, nsrc, ref, nref,
                          num_iter=1)
        # softplus(0) on both, and identical regardless of inputs
        np.testing.assert_allclose(np.asarray(ep1["beta"][0]), np.log(2.0),
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(ep1["beta"][0]),
                                      np.asarray(ep2["beta"][0]))
        np.testing.assert_array_equal(np.asarray(ep1["alpha"][0]),
                                      np.asarray(ep2["alpha"][0]))
        assert t1[0].shape == (2, 3, 4)

    def test_weighted_kabsch_exact(self, rng):
        a = jnp.asarray(rng.standard_normal((3, 40, 3)).astype(np.float32))
        tw = jnp.asarray(rng.standard_normal((3, 6)).astype(np.float32) * 0.4)
        g = se3.exp(tw)
        b = se3.transform(g[:, None], a)
        w = jnp.ones((3, 40))
        T = compute_rigid_transform(a, b, w)
        np.testing.assert_allclose(np.asarray(T), np.asarray(g[..., :3, :]),
                                   rtol=1e-3, atol=1e-5)


@pytest.mark.slow
class TestFMR:
    def test_converges_on_exact_pair(self, rng):
        tgt, _ = _clouds(rng, b=2, n=128)
        tw = jnp.asarray(np.tile([0.05, 0.02, -0.03, 0.04, 0.0, 0.02], (2, 1)).astype(np.float32))
        src = se3.transform(se3.exp(tw)[:, None], tgt)
        cfg = FMRConfig(dim_k=128, num_points=128, maxiter=5)
        m = SolveRegistration(cfg)
        params = m.init(jax.random.PRNGKey(0), tgt, src)
        out = m.apply(params, tgt, src)
        assert out["g"].shape == (2, 4, 4)
        assert out["g_series"].shape == (5, 2, 4, 4)
        # bottom row stays homogeneous after un-normalization
        np.testing.assert_allclose(np.asarray(out["g"][:, 3]), [[0, 0, 0, 1]] * 2, atol=1e-6)

    def test_decoder_shapes(self, rng):
        tgt, _ = _clouds(rng, b=1, n=64)
        cfg = FMRConfig(dim_k=128, num_points=64)
        m = SolveRegistration(cfg)
        params = m.init(jax.random.PRNGKey(0), tgt, tgt)
        out = m.apply(params, tgt, tgt)
        assert float(out["loss_ende"]) > 0


class TestCommon:
    def test_quat2mat_identity(self):
        R = common.quat2mat(jnp.asarray([[0.0, 0, 0, 1.0]]))
        np.testing.assert_allclose(np.asarray(R)[0], np.eye(3), atol=1e-6)

    def test_quat2mat_parity(self, torch_reference, rng):
        torch = torch_reference.torch
        sys_path = "/root/reference/code"
        import sys

        if sys_path not in sys.path:
            sys.path.insert(0, sys_path)
        import utils as ref_utils

        q = rng.standard_normal((5, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        ours = np.asarray(common.quat2mat(jnp.asarray(q)))
        theirs = ref_utils.quat2mat(torch.from_numpy(q)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)

    def test_torch_layernorm_matches_reference_formula(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.standard_normal((2, 7, 16)).astype(np.float32)
        ln = common.TorchLayerNorm()
        params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
        ours = np.asarray(ln.apply(params, jnp.asarray(x)))
        t = torch.from_numpy(x)
        mean = t.mean(-1, keepdim=True)
        std = t.std(-1, keepdim=True)  # unbiased, like dcp/model.py:158-168
        ref = (t - mean) / (std + 1e-6)
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-5)

    def test_svd_orientation_proper(self, rng):
        H = jnp.asarray(rng.standard_normal((8, 3, 3)).astype(np.float32))
        R = common.svd_orientation(H)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)
