from .safe_ops import safe_sigmoid, safe_inverse_sigmoid
from .rotation import quaternion_to_rotation_matrix
from .covariance import build_covariance, build_covariance_inverse, symmetric_inverse_3x3
from .coords import cartesian, reverse_cartesian, spherical_to_cartesian
