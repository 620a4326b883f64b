from .nuscenes import (
    GaussianFormerConfig,
    get_config,
    list_configs,
)
