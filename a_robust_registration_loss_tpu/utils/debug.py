"""Anomaly debugging: the reference TorchDebugger's role, JAX-style.

The reference wraps training in ``torch.autograd.detect_anomaly`` and drops
into pdb when a backward produces NaN (rpm/common/torch.py:161-172, enabled
by --debug, rpm/arguments.py:22-24). The JAX equivalents composed here:

- ``jax_debug_nans``: re-runs the offending jitted computation un-jitted and
  raises FloatingPointError at the primitive that produced the NaN (the
  detect_anomaly role — names the op, not just the loss);
- ``debugger()``: a context manager that post-mortems into pdb on any
  FloatingPointError/RuntimeError escaping the wrapped block (the pdb
  drop-in role) — skipped when a debugger is already tracing, exactly like
  the reference's ``sys.gettrace()`` guard.

Trainer CLIs expose this as ``--debug`` (anomaly detection + pdb) next to
the lighter ``--debug_nans`` (anomaly detection only).
"""

from __future__ import annotations

import contextlib
import pdb
import sys
import traceback


@contextlib.contextmanager
def debugger(enabled: bool = True):
    """Post-mortem pdb on numeric anomalies escaping the block."""
    if not enabled:
        yield
        return
    try:
        yield
    except (FloatingPointError, RuntimeError) as e:
        traceback.print_exc()
        print(e)
        if sys.gettrace() is None:
            pdb.post_mortem()
        raise


def enable_anomaly_detection(with_pdb: bool = False):
    """Turn on NaN anomaly detection; returns a context manager to wrap the
    training entry (identity unless with_pdb)."""
    import jax

    jax.config.update("jax_debug_nans", True)
    return debugger(with_pdb)


def install_pdb_excepthook():
    """Process-wide pdb post-mortem on numeric anomalies (the TorchDebugger
    drop-in without wrapping call sites): chains the existing excepthook,
    then enters pdb for FloatingPointError/RuntimeError when no debugger is
    already tracing."""
    old = sys.excepthook

    def hook(tp, val, tb):
        old(tp, val, tb)
        if issubclass(tp, (FloatingPointError, RuntimeError)) \
                and sys.gettrace() is None:
            pdb.post_mortem(tb)

    sys.excepthook = hook
