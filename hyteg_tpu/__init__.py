"""hyteg_tpu: TPU-native matrix-free finite elements + geometric multigrid.

Package-wide numerical policy: on TPU, XLA's DEFAULT matmul precision
feeds f32 ``dot``/``einsum`` operands through the MXU in bf16.  For an FE
solver stack this is not a benign speed knob — CG step sizes computed
from bf16 dot products turned the box-GMG coarse solve into an error
*amplifier* (residual x2.11/cycle at level 6 on v5e) while the identical
float32 program converged on CPU.  A numerics framework must default to
f32-accurate matmuls; the hot stencil paths are Pallas/elementwise code
and do not pay for this.  Set HYTEG_TPU_FAST_MATMUL=1 before import to
opt out for ML-style workloads layered on top.
"""

import logging
import os

import jax

if not os.environ.get("HYTEG_TPU_FAST_MATMUL"):
    jax.config.update("jax_default_matmul_precision", "highest")
    logging.getLogger(__name__).info(
        "hyteg_tpu: set jax_default_matmul_precision='highest' "
        "(solver dot products must not round to bf16; opt out with "
        "HYTEG_TPU_FAST_MATMUL=1)")
