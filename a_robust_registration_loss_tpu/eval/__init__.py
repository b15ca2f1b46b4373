"""Evaluation metrics and entry points (the reference's accuracy oracles)."""

from a_robust_registration_loss_tpu.eval import metrics  # noqa: F401
