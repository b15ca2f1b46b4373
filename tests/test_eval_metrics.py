"""Eval metric tests: closed-form Euler extraction vs the scipy oracle the
reference uses (utils.py:70-75), error metrics vs their literal formulas, and
the FMR dm twist error."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from a_robust_registration_loss_tpu.eval import metrics as EM
from a_robust_registration_loss_tpu.se3 import se3, so3


def _random_rotations(n, rng, max_angle=np.pi * 0.9):
    axes = rng.standard_normal((n, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = rng.uniform(-max_angle, max_angle, (n, 1))
    w = jnp.asarray((axes * angles).astype(np.float64))
    return np.asarray(jax.vmap(so3.exp)(w))


class TestMat2Euler:
    @pytest.mark.parametrize("seq", ["xyz", "zyx"])
    def test_matches_scipy(self, seq, rng):
        scipy_rot = pytest.importorskip("scipy.spatial.transform").Rotation
        R = _random_rotations(64, rng)
        ours = np.asarray(EM.mat2euler(jnp.asarray(R), seq))
        ref = np.stack([scipy_rot.from_matrix(R[i]).as_euler(seq, degrees=True)
                        for i in range(R.shape[0])])
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_rejects_unknown_seq(self):
        with pytest.raises(ValueError):
            EM.mat2euler(jnp.eye(3), "zxz")


class TestErrorMetrics:
    def test_euler_errors_zero_for_identical(self, rng):
        R = jnp.asarray(_random_rotations(8, rng))
        mae, rmse = EM.rotation_euler_errors(R, R)
        assert float(mae) < 1e-5 and float(rmse) < 1e-5

    def test_euler_errors_formula(self, rng):
        R1 = jnp.asarray(_random_rotations(8, rng, max_angle=0.5))
        R2 = jnp.asarray(_random_rotations(8, rng, max_angle=0.5))
        mae, rmse = EM.rotation_euler_errors(R1, R2, "xyz")
        d = np.asarray(EM.mat2euler(R1, "xyz")) - np.asarray(EM.mat2euler(R2, "xyz"))
        np.testing.assert_allclose(float(mae), np.mean(np.abs(d)), rtol=1e-6)
        np.testing.assert_allclose(float(rmse), np.sqrt(np.mean(d**2)), rtol=1e-6)

    def test_mse_and_ppwise(self, rng):
        a = jnp.asarray(rng.standard_normal((4, 100, 3)))
        b = jnp.asarray(rng.standard_normal((4, 100, 3)))
        np.testing.assert_allclose(
            float(EM.pp_wise_rmse(a, b)),
            np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)), rtol=1e-6)
        np.testing.assert_allclose(
            float(EM.pp_wise_mae(a, b)),
            np.mean(np.abs(np.asarray(a) - np.asarray(b))), rtol=1e-6)
        np.testing.assert_allclose(
            float(EM.translation_mse(a[:, 0], b[:, 0])),
            np.mean((np.asarray(a[:, 0]) - np.asarray(b[:, 0])) ** 2), rtol=1e-6)

    def test_gt_consistency_zero_for_exact(self, rng):
        R = jnp.asarray(_random_rotations(4, rng))
        t = jnp.asarray(rng.standard_normal((4, 3)))
        assert float(EM.gt_consistency_loss(R, t, R, t)) < 1e-10


class TestDmTwistError:
    def test_identity_composition_is_zero(self, rng):
        """g_hat = igt^{-1} -> dg = I -> dm = 0 (fmr/model.py:800 comment)."""
        w = jnp.asarray(rng.standard_normal((4, 6)) * 0.3)
        igt = jax.vmap(se3.exp)(w)
        g_hat = jax.vmap(se3.inverse)(igt)
        dm, dn = EM.dm_twist_error(g_hat, igt)
        assert float(dm) < 1e-5
        assert dn.shape == (4,)

    def test_known_error(self):
        """g_hat = exp(x) @ igt^{-1} -> dm = ||x||."""
        x = jnp.asarray([0.1, -0.2, 0.05, 0.3, 0.0, -0.1])
        igt = se3.exp(jnp.asarray([0.2, 0.1, -0.3, 0.5, 0.2, 0.1]))
        g_hat = se3.exp(x) @ se3.inverse(igt)
        dm, _ = EM.dm_twist_error(g_hat[None], igt[None])
        np.testing.assert_allclose(float(dm), float(jnp.linalg.norm(x)),
                                   rtol=1e-5)

    def test_csv_rows(self, rng):
        w = jnp.asarray(rng.standard_normal((3, 6)) * 0.2)
        g = jax.vmap(se3.exp)(w)
        rows = np.asarray(EM.twist_csv_rows(g, g))
        assert rows.shape == (3, 12)
        np.testing.assert_allclose(rows[:, :6], -rows[:, 6:], rtol=1e-5,
                                   atol=1e-6)
        assert len(EM.TWIST_CSV_HEADER.split(",")) == 12
