#!/usr/bin/env python
"""Single-pair classical registration demo (thin launcher).

The implementation lives in ``a_robust_registration_loss_tpu.demo`` (also
installed as the ``arrl-demo`` console script); this root-level script keeps
the reference-style invocation ``python demo.py ...`` working from a checkout.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from a_robust_registration_loss_tpu.demo import cli, main, main_batch  # noqa: F401,E402

if __name__ == "__main__":
    cli()
