"""gaussianformer-tpu: a TPU-native JAX/XLA/Pallas framework for 3D semantic
occupancy prediction with 3D Gaussian scene representations.

Re-designed from scratch for TPU (reference capability set:
huang-yh/GaussianFormer — vision-based occupancy via iteratively refined
3D semantic Gaussians splatted to a voxel grid).
"""

__version__ = "0.1.0"
