from .gaussian_head import GaussianHead
