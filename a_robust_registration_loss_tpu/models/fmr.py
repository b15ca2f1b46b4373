"""FMR (Feature-Metric Registration) as Flax modules.

Re-design of the reference's fmr/model.py for TPU: the inverse-compositional
(IC) Lucas-Kanade solver with a finite-difference Jacobian over 6 learnable
twist steps, run as a fixed-maxiter masked loop (XLA-friendly) instead of a
host-synced Python break.

Parity notes:
- Encoder: PointNet MLP 3-64-64 / 64-128-1024 with GroupNorm(8) + ReLU and
  global max pool (fmr/model.py:57-126).
- Decoder: FC 1024-1024-512-256-3N, GroupNorm(8), tanh*10 (fmr/model.py:130-154).
- estimate_t zero-means both clouds with bookkeeping matrices a0/a1 and
  un-normalizes g and the whole g_series (fmr/model.py:205-257).
- ic_algo: J = (f0 - enc(exp(-diag(dt)) p0)) / dt with dt a learnable
  parameter initialized to 1e-2 (fmr/model.py:170-173, 408-433); pinv =
  (J^T J)^-1 J^T — the reference's custom InvMatrix autograd
  (fmr/se_math/invmat.py) collapses to jnp.linalg.inv, which JAX
  differentiates natively; update g <- exp(dx) g (fmr/model.py:385-401).
- Early stop: the reference breaks out of the loop when max ||dx|| < xtol
  (fmr/model.py:393-397), leaving later g_series_gpu entries ZERO (a latent
  bug its loss path only avoids because xtol=1e-7 never triggers in
  training). Here the loop is fixed-length with a stop mask that FREEZES g —
  a strictly safer equivalent; divergence documented.
- The AE branch chamfer (fmr/model.py:442-453) returns the two directional
  min vectors; loss_ende = sum of their means over both clouds
  (fmr/model.py:344-358).

Convention: p1 = source, p0 = target; g maps p1 onto p0 (fmr/model.py:203-204).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from a_robust_registration_loss_tpu.models.common import TorchGroupNorm
from a_robust_registration_loss_tpu.ops import geometry as G
from a_robust_registration_loss_tpu.se3 import se3

_HI = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class FMRConfig:
    dim_k: int = 1024
    num_points: int = 2048   # decoder output size
    maxiter: int = 5         # train default (eval uses 10, fmr/model.py:758)
    xtol: float = 1.0e-7
    use_decoder: bool = True
    # Mixed precision (TPU MXU): compute dtype for the AE branch only (the
    # f1_full encoder pass + decoder). Params stay fp32, and EVERY encoder
    # pass feeding the IC solver (f0, the FD Jacobian, the loop residuals)
    # is pinned to fp32 regardless of this setting: the Jacobian subtracts
    # near-equal feature vectors and bf16 feature noise measurably degrades
    # registration (held-out rot RMSE 3.26 -> 5.19 deg before the pin,
    # benchmarks/MIXED_PRECISION.json history). The reference is fp32-only;
    # this is an opt-in TPU performance mode.
    dtype: str = "float32"


class PointNetEncoder(nn.Module):
    dim_k: int = 1024
    dtype: str = "float32"

    @nn.compact
    def __call__(self, points, dtype: str | None = None):  # (B, N, 3) -> (B, K)
        """``dtype`` overrides the compute dtype per call (params are shared
        and stay fp32 either way). The IC solver passes "float32": its
        finite-difference Jacobian subtracts near-equal feature vectors, and
        bf16 feature noise dominates the f0-f1 differences (measured: bf16
        encoder in the solve degraded held-out rot RMSE 3.26 -> 5.19 deg at
        the 40-epoch protocol; fp32 solve restores it while the AE branch
        keeps the bf16 MXU speedup)."""
        dt = self.dtype if dtype is None else dtype
        x = points
        for width in [64, 64, 64, 128, self.dim_k]:
            x = nn.Dense(width, dtype=dt)(x)
            x = TorchGroupNorm(8, dtype=dt)(x)
            x = nn.relu(x)
        # pooled features in fp32: they feed the IC Jacobian / residuals
        return jnp.max(x, axis=1).astype(jnp.float32)


class Decoder(nn.Module):
    num_points: int = 2048
    bottleneck: int = 1024
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):  # (B, K) -> (B, num_points, 3)
        for width, g in [(self.bottleneck, 8), (self.bottleneck // 2, 8),
                         (self.bottleneck // 4, 8)]:
            x = nn.Dense(width, dtype=self.dtype)(x)
            x = TorchGroupNorm(g, dtype=self.dtype)(x)
            x = nn.relu(x)
        x = nn.Dense(self.num_points * 3, dtype=self.dtype)(x)
        x = jnp.tanh(x.astype(jnp.float32)) * 10.0  # points back in fp32
        # reference reshapes (B, 3, N) then transposes (fmr/model.py:153)
        return x.reshape(-1, 3, self.num_points).transpose(0, 2, 1)


def ae_chamfer(a, b):
    """The AE branch's chamfer: sum of means of both directional mins
    (reference: fmr/model.py:344-358, 442-453)."""
    d = G.square_distance(a, b)
    return jnp.mean(jnp.min(d, axis=1)) + jnp.mean(jnp.min(d, axis=2))


class SolveRegistration(nn.Module):
    """IC solver. __call__(p0=target, p1=source) returns a dict with the
    un-normalized g, g_series (maxiter entries, graph-attached), the final
    feature residual r, and the encoder-decoder loss."""

    cfg: FMRConfig = FMRConfig()

    def setup(self):
        self.encoder = PointNetEncoder(self.cfg.dim_k, dtype=self.cfg.dtype)
        self.decoder = (Decoder(self.cfg.num_points, self.cfg.dim_k,
                                dtype=self.cfg.dtype)
                        if self.cfg.use_decoder else None)
        # learnable finite-difference step (fmr/model.py:170-173)
        self.dt = self.param("dt", lambda key: jnp.full((1, 6), 1.0e-2))

    def _approx_jac(self, p0, f0, dt):
        """J[b, :, k] = (f0 - enc(exp(-e_k dt_k) p0)) / dt_k
        (reference: fmr/model.py:408-433)."""
        B, N, _ = p0.shape
        twists = -jnp.eye(6)[None] * dt[:, None, :]  # (B, 6, 6) rows
        D = se3.exp(twists)  # (B, 6, 4, 4)
        p = se3.transform(D[:, :, None], p0[:, None])  # (B, 6, N, 3)
        # fp32: FD Jacobian of near-equal features (see PointNetEncoder)
        f1 = self.encoder(p.reshape(B * 6, N, 3),
                          dtype="float32").reshape(B, 6, -1)
        f = jnp.swapaxes(f1, 1, 2)  # (B, K, 6)
        return (f0[..., None] - f) / dt[:, None, :]

    def __call__(self, p0, p1, maxiter: int | None = None):
        cfg = self.cfg
        maxiter = cfg.maxiter if maxiter is None else maxiter
        B = p0.shape[0]

        # zero-mean + bookkeeping (fmr/model.py:212-226)
        p0_m = p0.mean(axis=1)
        p1_m = p1.mean(axis=1)
        q0 = p0 - p0_m[:, None]
        q1 = p1 - p1_m[:, None]
        a0 = jnp.broadcast_to(jnp.eye(4), (B, 4, 4)).at[:, 0:3, 3].set(p0_m)
        a1 = jnp.broadcast_to(jnp.eye(4), (B, 4, 4)).at[:, 0:3, 3].set(-p1_m)

        # AE loss (fmr/model.py:344-358). f0 feeds the IC residual/Jacobian:
        # fp32 (the AE branch below keeps the config dtype)
        f0 = self.encoder(q0, dtype="float32")
        loss_ende = 0.0
        if self.decoder is not None:
            f1_full = self.encoder(q1)
            d0 = self.decoder(f0)
            d1 = self.decoder(f1_full)
            loss_ende = ae_chamfer(q0, d0) + ae_chamfer(q1, d1)

        # Jacobian + pseudo-inverse (fmr/model.py:364-374)
        dt = jnp.broadcast_to(self.dt, (B, 6))
        J = self._approx_jac(q0, f0, dt)  # (B, K, 6)
        Jt = jnp.swapaxes(J, 1, 2)
        H = jnp.matmul(Jt, J, precision=_HI)  # (B, 6, 6)
        # Singular-JtJ guard (fmr/model.py:375-380): the reference wraps
        # torch.inverse in try/except and bails out with the residual when
        # JtJ is singular (e.g. a degenerate/collinear cloud). No exceptions
        # under jit — instead detect per-sample non-finite or severely
        # ill-conditioned inverses, zero that sample's pinv (so dx = 0 and g
        # stays identity; the identity-frame residual is still returned,
        # matching the reference's bail), and count them in `n_singular`.
        Hinv = jnp.linalg.inv(H)
        sv = jnp.linalg.svd(H, compute_uv=False)  # (B, 6), descending
        cond = sv[:, 0] / jnp.maximum(sv[:, -1], jnp.finfo(sv.dtype).tiny)
        ok = (jnp.all(jnp.isfinite(H), axis=(1, 2))
              & jnp.all(jnp.isfinite(Hinv), axis=(1, 2))
              & (cond < 1e8))
        n_singular = jnp.sum(~ok)
        Hinv = jnp.where(ok[:, None, None], Hinv, 0.0)
        pinv = jnp.matmul(Hinv, Jt, precision=_HI)  # (B, 6, K)

        # IC iterations: fixed-length loop with freeze-on-converge mask
        g = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
        g_series = []
        stopped = jnp.asarray(False)
        r = None
        for _ in range(maxiter):
            p = se3.transform(g[:, None], q1)  # (B, N, 3)
            f1 = self.encoder(p, dtype="float32")  # residual vs fp32 f0
            r_new = f1 - f0
            r = r_new if r is None else jnp.where(stopped, r, r_new)
            dx = -jnp.matmul(pinv, r[..., None], precision=_HI)[..., 0]  # (B, 6)
            check = jnp.max(jnp.linalg.norm(dx, axis=1))
            stopped = stopped | (check < cfg.xtol)
            g_new = se3.group_prod(se3.exp(dx), g)
            g = jnp.where(stopped, g, g_new)
            g_series.append(g)

        # un-normalize (fmr/model.py:235-257): est = a0 . g . a1
        def unnorm(gg):
            return jnp.matmul(jnp.matmul(a0, gg, precision=_HI), a1, precision=_HI)

        g_out = unnorm(g)
        g_series = jnp.stack([unnorm(gg) for gg in g_series])  # (maxiter, B, 4, 4)
        return dict(g=g_out, g_series=g_series, r=r, loss_ende=loss_ende,
                    n_singular=n_singular)
