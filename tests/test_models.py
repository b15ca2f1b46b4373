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

    def test_ffn_param_names_pinned(self, rng):
        """Checkpoint/transplant name contract: FeedForward's Dense_0 is the
        OUTER d_model projection (torch w_2) and Dense_1 the inner d_ff
        expansion (torch w_1). A round-4 refactor silently flipped the flax
        auto-names, breaking --init_from_torch and restore of every earlier
        DCP checkpoint; the names are now pinned explicitly in models/dcp.py
        and this test fails the default tier if they ever move again."""
        src, _ = _clouds(rng, n=16)
        tgt, _ = _clouds(rng, n=16)
        cfg = DCPConfig(emb_nn="pointnet", emb_dims=32, ff_dims=64)
        m = DCP(cfg)
        params = m.init(jax.random.PRNGKey(0), src, tgt)["params"]
        ffn = params["pointer"]["enc0"]["FeedForward_0"]
        assert set(ffn) == {"Dense_0", "Dense_1"}
        # outer: d_ff -> d_model; inner: d_model -> d_ff
        assert ffn["Dense_0"]["kernel"].shape == (64, 32)
        assert ffn["Dense_1"]["kernel"].shape == (32, 64)
        # a pre-refactor checkpoint tree (same names/shapes) restores and runs
        old_tree = jax.tree.map(lambda x: jnp.zeros_like(x), params)
        R, t, _, _ = m.apply({"params": old_tree}, src, tgt)
        assert R.shape == (2, 3, 3) and np.all(np.isfinite(np.asarray(R)))

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

    def test_singular_jtj_guard(self, rng):
        """Degenerate (collinear) cloud -> singular JtJ. The reference bails
        out of the solve via try/except (fmr/model.py:375-380); our jitted
        solver freezes the bad sample's IC update and counts it in
        n_singular, keeping every output finite. The healthy sample in the
        same batch must still solve normally (per-sample guard)."""
        good, _ = _clouds(rng, b=1, n=64)
        degen = jnp.zeros((1, 64, 3), jnp.float32)  # all points coincident
        tgt = jnp.concatenate([good, degen], axis=0)
        src = tgt + 0.01
        cfg = FMRConfig(dim_k=64, num_points=64, maxiter=3)
        m = SolveRegistration(cfg)
        params = m.init(jax.random.PRNGKey(0), tgt, src)
        out = jax.jit(m.apply)(params, tgt, src)
        for k in ("g", "g_series", "r"):
            assert np.all(np.isfinite(np.asarray(out[k]))), k
        assert int(out["n_singular"]) == 1  # only the degenerate sample
        np.testing.assert_allclose(
            np.asarray(out["g"][:, 3]), [[0, 0, 0, 1]] * 2, atol=1e-6)
        # bail behavior: the frozen sample's g reduces to the centroid
        # un-normalization (identity in the normalized frame)
        np.testing.assert_allclose(np.asarray(out["g"][1, :3, :3]),
                                   np.eye(3), atol=1e-6)


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


class TestMixedPrecision:
    """The opt-in bfloat16 compute mode (configs' dtype field, trainers'
    --dtype): params stay fp32 (identical trees either way — same init, same
    checkpoints, same transplant), rotation/translation outputs come back
    fp32, and bf16 forwards track the fp32 forwards to bf16 tolerance.
    The reference has no comparable mode (fp32-only torch)."""

    def _assert_fp32_params(self, params):
        assert all(x.dtype == jnp.float32
                   for x in jax.tree_util.tree_leaves(params))

    def test_dcp_bf16_tracks_fp32(self, rng):
        src, _ = _clouds(rng, n=64)
        tgt, _ = _clouds(rng, n=64)
        kw = dict(emb_nn="dgcnn", dgcnn_k=8, emb_dims=64, ff_dims=64,
                  n_heads=4)
        m32 = DCP(DCPConfig(**kw))
        mbf = DCP(DCPConfig(dtype="bfloat16", **kw))
        params = m32.init(jax.random.PRNGKey(0), src, tgt)
        self._assert_fp32_params(params)
        R32, t32, _, _ = m32.apply(params, src, tgt)
        Rbf, tbf, _, _ = jax.jit(mbf.apply)(params, src, tgt)
        assert Rbf.dtype == jnp.float32 and tbf.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(Rbf), np.asarray(R32), atol=0.05)
        np.testing.assert_allclose(np.asarray(tbf), np.asarray(t32), atol=0.05)
        np.testing.assert_allclose(np.linalg.det(np.asarray(Rbf)), 1.0,
                                   atol=1e-3)

    @pytest.mark.slow
    def test_dcp_mlp_head_bf16(self, rng):
        src, _ = _clouds(rng, n=64)
        tgt, _ = _clouds(rng, n=64)
        kw = dict(emb_nn="pointnet", head="mlp", emb_dims=64, ff_dims=64)
        m32 = DCP(DCPConfig(**kw))
        mbf = DCP(DCPConfig(dtype="bfloat16", **kw))
        params = m32.init(jax.random.PRNGKey(0), src, tgt)
        R32, t32, _, _ = m32.apply(params, src, tgt)
        Rbf, tbf, _, _ = mbf.apply(params, src, tgt)
        assert Rbf.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(Rbf), np.asarray(R32), atol=0.08)

    def test_rpmnet_bf16_tracks_fp32(self, rng):
        src, nsrc = _clouds(rng, n=64)
        ref, nref = _clouds(rng, n=64)
        m32 = RPMNetEarlyFusion(RPMNetConfig(num_neighbors=16))
        mbf = RPMNetEarlyFusion(RPMNetConfig(num_neighbors=16,
                                             dtype="bfloat16"))
        params = m32.init(jax.random.PRNGKey(0), src, nsrc, ref, nref)
        self._assert_fp32_params(params)
        t32, _ = m32.apply(params, src, nsrc, ref, nref, num_iter=2)
        tbf, _ = mbf.apply(params, src, nsrc, ref, nref, num_iter=2)
        assert tbf[-1].dtype == jnp.float32
        # transforms track loosely (sinkhorn sharpens small feature diffs)
        np.testing.assert_allclose(np.asarray(tbf[-1]), np.asarray(t32[-1]),
                                   atol=0.12)
        R = np.asarray(tbf[-1][..., :3, :3])
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-3)

    def test_fmr_bf16_tracks_fp32(self, rng):
        src, _ = _clouds(rng, n=64)
        tgt, _ = _clouds(rng, n=64)
        kw = dict(dim_k=64, num_points=64)
        m32 = SolveRegistration(FMRConfig(**kw))
        mbf = SolveRegistration(FMRConfig(dtype="bfloat16", **kw))
        params = m32.init(jax.random.PRNGKey(0), tgt, src)
        self._assert_fp32_params(params)
        o32 = m32.apply(params, tgt, src, maxiter=3)
        obf = mbf.apply(params, tgt, src, maxiter=3)
        assert obf["g"].dtype == jnp.float32
        # the IC loop amplifies encoder rounding (pinv + 3 compounding
        # updates on random params), so the transform bar is loose; the
        # trained-convergence evidence is benchmarks/MIXED_PRECISION.json
        np.testing.assert_allclose(np.asarray(obf["g"]), np.asarray(o32["g"]),
                                   atol=0.25)
        np.testing.assert_allclose(float(obf["loss_ende"]),
                                   float(o32["loss_ende"]), rtol=0.1)

    @pytest.mark.slow
    def test_dcp_bf16_train_step_runs(self, rng):
        """A bf16 DCP train step through the real harness loss produces
        finite fp32 grads and an updated fp32 param tree."""
        from a_robust_registration_loss_tpu.train import dcp as TD
        from a_robust_registration_loss_tpu.train import losses as L

        B, N = 2, 64
        src = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
        tgt = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
        from a_robust_registration_loss_tpu.ops import geometry as G

        batch = {
            "points_src_sample": src, "points_tar_sample": tgt,
            "points_based_neighs_src": jnp.stack(
                [G.sample_neighs(s, N, 3) for s in src]),
            "points_based_neighs_tar": jnp.stack(
                [G.sample_neighs(t, N, 3) for t in tgt]),
            "tar_box": jnp.concatenate(
                [tgt.min(1, keepdims=True), tgt.max(1, keepdims=True),
                 jnp.zeros((B, 6, 3))], axis=1),
            "centers": jnp.zeros((B, 3)),
            "R": jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
            "T": jnp.zeros((B, 3)),
        }
        from a_robust_registration_loss_tpu.models.dcp import (
            DCPConfig as DC,
        )

        cfg = TD.DCPTrainConfig(
            loss=L.LossConfig(n_lines=256, backend="xla"),
            model=DC(emb_nn="dgcnn", dgcnn_k=8, emb_dims=64, ff_dims=64,
                     dtype="bfloat16"))
        model, opt, train_step, _, _, _ = TD.make_steps(cfg)
        params = TD.init_params(model, jax.random.PRNGKey(0), batch)
        new_params, _, metrics = jax.jit(train_step)(
            params, opt.init(params), batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert all(x.dtype == jnp.float32
                   for x in jax.tree_util.tree_leaves(new_params))


class TestCommittedCheckpointCompat:
    def test_committed_dcp_checkpoint_restores_and_matches_golden(self):
        """A REAL orbax checkpoint committed to the repo (round-5, after the
        round-4 FFN auto-name flip broke restore of every earlier DCP
        checkpoint): the current module must restore it by name and
        reproduce the committed golden forward. Any future param-naming or
        numerics drift fails here against an on-disk artifact, not a
        synthesized tree."""
        import json
        import os

        from a_robust_registration_loss_tpu.utils.checkpoint import (
            CheckPointManager,
        )

        d = os.path.join(os.path.dirname(__file__), "data", "dcp_tiny_ckpt")
        with open(os.path.join(d, "config.json")) as f:
            meta = json.load(f)
        cfg = DCPConfig(emb_nn=meta["emb_nn"], pointer=meta["pointer"],
                        head=meta["head"], emb_dims=meta["emb_dims"],
                        ff_dims=meta["ff_dims"], n_blocks=meta["n_blocks"],
                        n_heads=meta["n_heads"])
        m = DCP(cfg)
        rng = np.random.default_rng(meta["input_seed"])
        B, N, _ = meta["shape"]
        src = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
        tgt = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
        template = m.init(jax.random.PRNGKey(0), src, tgt)["params"]
        mgr = CheckPointManager(d, max_to_keep=1)
        state, step = mgr.load({"params": template})
        assert step == 0
        R, t, _, _ = m.apply({"params": state["params"]}, src, tgt)
        golden_R = np.load(os.path.join(d, "golden_R.npy"))
        golden_t = np.load(os.path.join(d, "golden_t.npy"))
        np.testing.assert_allclose(np.asarray(R), golden_R, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), golden_t, atol=1e-5)
