"""gaussianformer-tpu: a TPU-native JAX/XLA/Pallas framework for 3D semantic
occupancy prediction with 3D Gaussian scene representations.

Re-designed from scratch for TPU (reference capability set:
huang-yh/GaussianFormer — vision-based occupancy via iteratively refined
3D semantic Gaussians splatted to a voxel grid).
"""

__version__ = "0.1.0"

# Must run before the XLA backend initializes (first device use): disable
# the space-to-batch conv rewrite, whose tile relayouts cost the flagship
# forward ~13 ms/frame on TPU (see utils/xla_flags.py).
from .utils.xla_flags import apply_perf_flags as _apply_perf_flags

_apply_perf_flags()

import jax as _jax

# jax 0.9.0's direct-linearize autodiff path (default on) leaks
# LinearizeTracers out of nested lax.scan bodies, breaking jax.grad over
# the splat pipeline with an UnexpectedTracerError at the enclosing jit
# boundary. The classic jvp+partial-eval path is correct; pin it.
try:
    _jax.config.update("jax_use_direct_linearize", False)
except AttributeError:  # flag removed in newer jax → bug presumably fixed
    pass
