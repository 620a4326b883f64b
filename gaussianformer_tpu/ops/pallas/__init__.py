from .splat_kernel import splat_raw_pallas
