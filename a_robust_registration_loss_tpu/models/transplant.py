"""Load reference PyTorch checkpoints into this framework's Flax params.

Migration path for users of the reference: a trained torch ``state_dict``
from dcp/model.py or fmr/model.py maps onto our Flax modules' parameter
trees (weight-transplant). Forward parity of the transplanted networks is
asserted in tests/test_transplant.py against the actual reference modules.

All functions take a plain ``dict[str, np.ndarray]`` (call
``{k: v.cpu().numpy() for k, v in sd.items()}`` on a torch state_dict), so
torch is not required here.

Layout notes:
- torch Conv1d(k=1) weight (C_out, C_in, 1) and Linear weight (C_out, C_in)
  both map to a Dense kernel (C_in, C_out) via transpose;
- the reference's GroupNorm -> our TorchGroupNorm (flax GroupNorm scale/bias);
- the annotated-transformer LayerNorm (a_2/b_2) -> TorchLayerNorm (a/b);
- our FeedForward names Dense_0 = torch w_2 and Dense_1 = torch w_1
  (flax @nn.compact names follow call order; the outer Dense is constructed
  first).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _dense(sd: Dict[str, np.ndarray], key: str, bias: bool = True):
    w = np.asarray(sd[f"{key}.weight"])
    if w.ndim == 3:  # Conv1d kernel-size-1
        w = w[:, :, 0]
    out = {"kernel": w.T.copy()}
    if bias and f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"]).copy()
    return out


def _groupnorm(sd, key):
    return {"GroupNorm_0": {"scale": np.asarray(sd[f"{key}.weight"]).copy(),
                            "bias": np.asarray(sd[f"{key}.bias"]).copy()}}


def _layernorm(sd, key):
    return {"a": np.asarray(sd[f"{key}.a_2"]).copy(),
            "b": np.asarray(sd[f"{key}.b_2"]).copy()}


def _mha(sd, key):
    names = ["wq", "wk", "wv", "wo"]
    return {n: _dense(sd, f"{key}.linears.{i}") for i, n in enumerate(names)}


def _ffn(sd, key):
    # Dense_0 == w_2 (outer), Dense_1 == w_1 (inner) — names pinned
    # explicitly in models.dcp.FeedForward, independent of construction order
    return {"Dense_0": _dense(sd, f"{key}.w_2"),
            "Dense_1": _dense(sd, f"{key}.w_1")}


def dcp_from_state_dict(sd: Dict[str, np.ndarray], n_blocks: int = 1) -> dict:
    """Reference DCP state_dict -> our models.dcp.DCP params tree (nested
    plain dicts). Covers every config: emb_nn pointnet/dgcnn (detected from
    the conv kernel rank), pointer transformer/identity (detected from key
    presence), head svd (parameterless) / mlp (detected from head.* keys)."""
    params: dict = {"emb_nn": {}}
    for i in range(5):
        # pointnet: Conv1d (O, I, 1); dgcnn: Conv2d (O, I, 1, 1) — _dense
        # squeezes Conv1d; squeeze the extra dgcnn axis first
        w = np.asarray(sd[f"emb_nn.conv{i + 1}.weight"])
        if w.ndim == 4:
            w = w[:, :, :, 0]
        params["emb_nn"][f"Dense_{i}"] = {"kernel": w[:, :, 0].T.copy()}
        params["emb_nn"][f"TorchGroupNorm_{i}"] = _groupnorm(
            sd, f"emb_nn.bn{i + 1}")

    # MLPHead (dcp/model.py:334-362); the svd head only registers a
    # parameterless `head.reflect` buffer
    if "head.nn.0.weight" in sd:
        head = {}
        for j, li in enumerate([0, 3, 6]):
            head[f"Dense_{j}"] = _dense(sd, f"head.nn.{li}")
            head[f"TorchGroupNorm_{j}"] = _groupnorm(sd, f"head.nn.{li + 1}")
        head["Dense_3"] = _dense(sd, "head.proj_rot")
        head["Dense_4"] = _dense(sd, "head.proj_trans")
        params["head"] = head

    if not any(k.startswith("pointer.model.") for k in sd):
        return params
    params["pointer"] = {}

    for i in range(n_blocks):
        enc = f"pointer.model.encoder.layers.{i}"
        params["pointer"][f"enc{i}"] = {
            "MultiHeadAttention_0": _mha(sd, f"{enc}.self_attn"),
            "FeedForward_0": _ffn(sd, f"{enc}.feed_forward"),
            "TorchLayerNorm_0": _layernorm(sd, f"{enc}.sublayer.0.norm"),
            "TorchLayerNorm_1": _layernorm(sd, f"{enc}.sublayer.1.norm"),
        }
        dec = f"pointer.model.decoder.layers.{i}"
        params["pointer"][f"dec{i}"] = {
            "MultiHeadAttention_0": _mha(sd, f"{dec}.self_attn"),
            "MultiHeadAttention_1": _mha(sd, f"{dec}.src_attn"),
            "FeedForward_0": _ffn(sd, f"{dec}.feed_forward"),
            "TorchLayerNorm_0": _layernorm(sd, f"{dec}.sublayer.0.norm"),
            "TorchLayerNorm_1": _layernorm(sd, f"{dec}.sublayer.1.norm"),
            "TorchLayerNorm_2": _layernorm(sd, f"{dec}.sublayer.2.norm"),
        }
    params["pointer"]["enc_norm"] = _layernorm(sd,
                                               "pointer.model.encoder.norm")
    params["pointer"]["dec_norm"] = _layernorm(sd,
                                               "pointer.model.decoder.norm")
    return params


def fmr_encoder_from_state_dict(sd, prefix: str = "") -> dict:
    """fmr PointNet (h1/h2 Sequential stacks) -> PointNetEncoder params."""
    # h1: Conv@0, GN@1, Conv@3, GN@4; h2: Conv@0, GN@1, Conv@3, GN@4, Conv@6, GN@7
    src = [("h1", 0), ("h1", 3), ("h2", 0), ("h2", 3), ("h2", 6)]
    out = {}
    for i, (blk, li) in enumerate(src):
        out[f"Dense_{i}"] = _dense(sd, f"{prefix}{blk}.{li}")
        out[f"TorchGroupNorm_{i}"] = _groupnorm(sd, f"{prefix}{blk}.{li + 1}")
    return out


def fmr_decoder_from_state_dict(sd, prefix: str = "") -> dict:
    out = {}
    for i in range(4):
        out[f"Dense_{i}"] = _dense(sd, f"{prefix}fc{i + 1}")
    for i in range(3):
        out[f"TorchGroupNorm_{i}"] = _groupnorm(sd, f"{prefix}bn{i + 1}")
    return out


def rpmnet_from_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """Reference RPMNetEarlyFusion state_dict (rpm/models/rpmnet.py:242-253)
    -> our models.rpmnet.RPMNetEarlyFusion params.

    weights_net: prepool Conv1d@{0,3,6,9,12} + GN@{1,4,7,10,13}, postpool
    Linear@{0,3,6} + GN@{1,4} (feature_nets.py:31-63); the final Linear emits
    2 + prod(weights_dim) values of which the reference uses the first two
    (beta, alpha) — we keep only those rows when weights_dim > 0.
    feat_extractor: prepool Conv2d@{0,3,6} + GN@{1,4,7}, postpool
    Conv1d@{0,3,6} + GN@{1,4} (feature_nets.py:118-152).

    The constant-annealing ablation variant (feature_nets.py:91-115) is a
    single ``weights_net.anneal_weights`` parameter — detected by key."""
    wn = {}
    if "weights_net.anneal_weights" in sd:
        # reference allocates 2 + prod(weights_dim) but reads only the first
        # two (feature_nets.py:102-114)
        wn["anneal_weights"] = np.asarray(
            sd["weights_net.anneal_weights"]).reshape(-1)[:2].copy()
        return {"weights_net": wn,
                "feat_extractor": _rpm_feat_extractor(sd)}
    for i, li in enumerate([0, 3, 6, 9, 12]):
        wn[f"Dense_{i}"] = _dense(sd, f"weights_net.prepool.{li}")
        wn[f"TorchGroupNorm_{i}"] = _groupnorm(sd,
                                               f"weights_net.prepool.{li + 1}")
    for j, li in enumerate([0, 3]):
        wn[f"Dense_{5 + j}"] = _dense(sd, f"weights_net.postpool.{li}")
        wn[f"TorchGroupNorm_{5 + j}"] = _groupnorm(
            sd, f"weights_net.postpool.{li + 1}")
    final = _dense(sd, "weights_net.postpool.6")
    wn["Dense_7"] = {"kernel": final["kernel"][:, :2],
                     "bias": final["bias"][:2]}
    return {"weights_net": wn, "feat_extractor": _rpm_feat_extractor(sd)}


def _rpm_feat_extractor(sd) -> dict:
    fe = {}
    for i, li in enumerate([0, 3, 6]):
        w = np.asarray(sd[f"feat_extractor.prepool.{li}.weight"])  # (O,I,1,1)
        fe[f"Dense_{i}"] = {
            "kernel": w[:, :, 0, 0].T.copy(),
            "bias": np.asarray(sd[f"feat_extractor.prepool.{li}.bias"]).copy(),
        }
        fe[f"TorchGroupNorm_{i}"] = _groupnorm(
            sd, f"feat_extractor.prepool.{li + 1}")
    for j, li in enumerate([0, 3, 6]):
        fe[f"Dense_{3 + j}"] = _dense(sd, f"feat_extractor.postpool.{li}")
        if li != 6:
            fe[f"TorchGroupNorm_{3 + j}"] = _groupnorm(
                sd, f"feat_extractor.postpool.{li + 1}")
    return fe


def fmr_from_state_dict(sd: Dict[str, np.ndarray],
                        use_decoder: bool = True) -> dict:
    """Reference SolveRegistration state_dict -> our models.fmr
    SolveRegistration params (encoder, decoder, dt).

    With ``use_decoder=False`` the decoder subtree is omitted — the
    reference's eval-time load strips ``decoder.*`` keys
    (fmr/evaluate_fmr.py:165-173); overlay the result onto a freshly
    initialized tree with :func:`merge_params` to keep the (unused at eval)
    decoder randomly initialized, as the reference does."""
    params = {"encoder": fmr_encoder_from_state_dict(sd, "encoder.")}
    if use_decoder and any(k.startswith("decoder.") for k in sd):
        params["decoder"] = fmr_decoder_from_state_dict(sd, "decoder.")
    params["dt"] = np.asarray(sd["dt"]).reshape(1, 6).copy()
    return params


def merge_params(base: dict, overlay: dict) -> dict:
    """Recursively overwrite ``base``'s leaves with ``overlay``'s (partial
    trees allowed — missing subtrees keep the base values). Mirrors torch's
    ``load_state_dict(strict=False)`` used by the reference's stripped-key
    loads. Raises KeyError on overlay keys absent from base (a transplant
    layout mismatch should fail loudly, like strict key checks would)."""
    out = dict(base)
    for k, v in overlay.items():
        if k not in base:
            raise KeyError(f"transplant overlay key {k!r} not in params tree "
                           f"(have {sorted(base)})")
        out[k] = (merge_params(base[k], v) if isinstance(v, dict)
                  and isinstance(base[k], dict) else v)
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a reference ``.pth``/``.t7`` checkpoint into numpy arrays.
    Unwraps the {'state_dict': ...} container some reference savers use and
    strips DataParallel's ``module.`` prefix (Train_DCP.py:683-688 saves
    ``net.module.state_dict()`` but older blobs may carry the prefix)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    sd = sd.get("state_dict", sd)
    # checkpoints may carry non-tensor metadata (epoch counters, scores) at
    # top level next to the weights — skip those instead of crashing on
    # .cpu() of an int
    out = {k.removeprefix("module."): v.cpu().numpy() for k, v in sd.items()
           if isinstance(v, torch.Tensor)}
    if not out:
        raise ValueError(f"{path}: no tensor entries found "
                         f"(keys: {sorted(sd)[:8]}...)")
    return out
