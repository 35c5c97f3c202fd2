"""Batched, masked GP math for TPU (pure JAX + Pallas).

All functions here are shape-static, mask-aware and vmap/pjit friendly: the
unit of work is a *batch of local experts*, not a single model — this is the
layer that replaces the reference's per-expert GPflow graphs
(reference: GPSat/models/gpflow_models.py).
"""

from gpsat_tpu.ops.transforms import (  # noqa: F401
    Identity, Exp, Softplus, Sigmoid, get_bijector,
)
from gpsat_tpu.ops.kernels import kernel_fn, KERNEL_NAMES  # noqa: F401
from gpsat_tpu.ops import gpr as gpr_math  # noqa: F401
from gpsat_tpu.ops.lbfgs import batched_lbfgs  # noqa: F401
