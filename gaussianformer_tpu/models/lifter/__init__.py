from .gaussian_lifter import GaussianLifter
from .gaussian_lifter_v2 import GaussianLifterV2
