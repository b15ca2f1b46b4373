"""Single SE(3)/SO(3)/sinc Lie-algebra library (the reference triplicates this
code across code/LieAlgebra/, fmr/se_math/ and rpm/common/math*/ — see
SURVEY.md §2.2; here there is exactly one copy)."""

from a_robust_registration_loss_tpu.se3 import se3, sinc, so3  # noqa: F401
from a_robust_registration_loss_tpu.se3.se3 import (  # noqa: F401
    exp,
    exp3,
    inverse,
    log,
    rt_concatenate,
    rt_identity,
    rt_inverse,
    rt_transform,
    transform,
)
