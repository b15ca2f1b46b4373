"""End-to-end test of the classical SE(3) optimization demo: on a synthetic
pair related by a known rigid transform, the intersection metric must drive
chamfer distance down and recover the transform (the reference's empirical
verification strategy — chamfer as the independent oracle,
test_demo_optimized_Lie_Algebra.py:68-74 — turned into an automated test)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from a_robust_registration_loss_tpu.se3 import se3
from a_robust_registration_loss_tpu.train import classical


def _blob(n, rng):
    """Anisotropic blobby cloud (break rotational symmetry)."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5**0.5) * i
    p = np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)], -1
    )
    p = p * (1.0 + 0.3 * np.sin(3 * p[:, :1]) + 0.2 * np.cos(2 * p[:, 1:2]))
    p = p @ np.diag([1.0, 0.7, 0.45])
    return (p + rng.standard_normal(p.shape) * 0.005).astype(np.float32)


@pytest.mark.slow
def test_recovers_small_transform():
    rng = np.random.default_rng(0)
    src = _blob(400, rng)
    ang = 0.25
    R_true = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        np.float32,
    )
    t_true = np.array([0.05, -0.08, 0.1], np.float32)
    # independent sampling of the same surface (like real scans): perfect
    # alignment is impossible, so the median scale never collapses to zero
    tar = _blob(410, rng) @ R_true + t_true  # matches points @ R + t convention

    cfg = classical.ClassicalConfig(
        n_epochs=150, n_lines=3000, num_sample=160, line_chunk=None,
        log_every=50, seed=3, compute_chamfer=True,
    )
    params, hist = classical.run(src, tar, cfg)

    assert np.all(hist["valid"]), "metric must stay valid on overlapping pair"
    c0 = hist["chamfer"][:5].mean()
    c1 = hist["chamfer"][-5:].mean()
    assert c1 < 0.35 * c0, f"chamfer did not decrease: {c0} -> {c1}"

    # the demo centers both clouds; in centered frames the true transform is
    # R_true with a translation conjugated by the centers
    R, t, _ = classical.final_transform(params)
    rot_err = np.degrees(
        np.arccos(np.clip((np.trace(R.T @ R_true) - 1) / 2, -1, 1))
    )
    assert rot_err < 8.0, f"rotation error too large: {rot_err} deg"


def test_init_twist_distribution():
    key = jax.random.PRNGKey(0)
    p = np.asarray(classical.init_twist(key))
    assert p.shape == (6,)
    np.testing.assert_allclose(np.linalg.norm(p[:3]), 0.001, rtol=1e-5)
    assert np.all(np.abs(p[3:]) < 0.01)


def test_lr_schedule_halves_at_zero():
    cfg = classical.ClassicalConfig()
    f = classical.lr_schedule(cfg)
    assert f(0) == pytest.approx(1e-2)
    assert f(999) == pytest.approx(1e-2)
    assert f(1000) == pytest.approx(5e-3)


def test_apply_twist_matches_se3():
    key = jax.random.PRNGKey(1)
    params = jax.random.normal(key, (6,)) * 0.3
    pts = jax.random.normal(jax.random.PRNGKey(2), (17, 3))
    neis = jax.random.normal(jax.random.PRNGKey(3), (11, 9))
    pts_t, neis_t = classical.apply_twist(params, pts, neis)
    R, t = se3.exp3(params)
    np.testing.assert_allclose(np.asarray(pts_t), np.asarray(pts @ R + t), atol=1e-6)
    assert neis_t.shape == neis.shape


@pytest.mark.slow
class TestBatchedRegistration:
    """run_batch (beyond-reference capability): B simultaneous registrations
    converge like B independent runs."""

    def test_batch_converges(self):
        import numpy as np

        rng = np.random.default_rng(5)
        i = np.arange(128) + 0.5
        phi = np.arccos(1 - 2 * i / 128)
        th = np.pi * (1 + 5**0.5) * i
        base = np.stack([np.sin(phi) * np.cos(th), np.sin(phi) * np.sin(th),
                         np.cos(phi)], -1).astype(np.float32)
        angs = [0.25, -0.2]
        srcs, tars = [], []
        for a in angs:
            R = np.array([[np.cos(a), -np.sin(a), 0],
                          [np.sin(a), np.cos(a), 0], [0, 0, 1]], np.float32)
            src = base + rng.standard_normal(base.shape).astype(np.float32) * 0.01
            srcs.append(src)
            tars.append(src @ R + np.float32([0.05, 0.0, -0.02]))
        src_b = np.stack(srcs)
        tar_b = np.stack(tars)

        cfg = classical.ClassicalConfig(
            n_epochs=120, n_lines=512, num_sample=128, line_chunk=None,
            log_every=40, compute_chamfer=True, seed=3)
        params, hist = classical.run_batch(src_b, tar_b, cfg)
        assert params.shape == (2, 6)
        assert hist["chamfer"].shape == (120, 2)
        start = hist["chamfer"][0]
        end = hist["chamfer"][-1]
        assert (end < start * 0.5).all(), (start, end)
        assert np.isfinite(hist["loss"]).all()


class TestFinalTransformNumpy:
    def test_matches_se3_exp3(self):
        """final_transform's host-side numpy Rodrigues must equal se3.exp3
        (it exists so the demo callback makes zero device dispatches)."""
        from a_robust_registration_loss_tpu.se3 import se3
        from a_robust_registration_loss_tpu.train import classical

        rng = np.random.default_rng(0)
        for scale in (1e-4, 1e-2, 0.5, 2.0):   # both sinc Taylor branches
            tw = (rng.standard_normal(6) * scale).astype(np.float32)
            R_np, t_np, out = classical.final_transform(tw)
            R_j, t_j = se3.exp3(jnp.asarray(tw))
            np.testing.assert_allclose(R_np, np.asarray(R_j), atol=2e-6)
            np.testing.assert_allclose(t_np, np.asarray(t_j), atol=2e-6)
            np.testing.assert_allclose(out[:, :3], R_np, atol=1e-7)


class TestRegisterCLI:
    def test_register_two_files(self, tmp_path):
        """arrl-register: one-shot registration of two arbitrary cloud
        files -> 3x4 transform + registered cloud."""
        import numpy as np

        from a_robust_registration_loss_tpu.data import objio
        from a_robust_registration_loss_tpu import register as REG

        rng = np.random.default_rng(0)
        i = np.arange(300) + 0.5
        phi = np.arccos(1 - 2 * i / 300)
        th = np.pi * (1 + 5**0.5) * i
        p = np.stack([np.sin(phi) * np.cos(th), np.sin(phi) * np.sin(th),
                      np.cos(phi)], -1).astype(np.float32)
        p = p * np.array([1.0, 0.6, 0.4], np.float32)
        ang = 0.2
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        tar = p @ R.T + np.array([0.05, 0.02, -0.01], np.float32)
        objio.write_obj(str(tmp_path / "s.obj"), p)
        objio.write_obj(str(tmp_path / "t.obj"), tar)
        out = tmp_path / "tf.txt"
        pred_out = tmp_path / "pred.obj"
        REG.main([str(tmp_path / "s.obj"), str(tmp_path / "t.obj"),
                  "--out", str(out), "--pred_out", str(pred_out),
                  "--n_epochs", "60", "--n_lines", "512",
                  "--num_sample", "200", "--uncentered"])
        tf = np.loadtxt(out)
        assert tf.shape == (3, 4)
        pred, _ = objio.read_obj(str(pred_out))
        assert pred.shape == p.shape
        # the optimizer must make real progress toward the target
        d0 = np.linalg.norm(p[:, None] - tar[None], axis=-1).min(1).mean()
        d1 = np.linalg.norm(pred[:, None] - tar[None], axis=-1).min(1).mean()
        assert d1 < 0.5 * d0, (d0, d1)
