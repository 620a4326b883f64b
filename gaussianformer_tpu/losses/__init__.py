from .occupancy import OccupancyLossCfg, occupancy_loss
from .lovasz import lovasz_softmax
from .bce import binary_cross_entropy_loss, pixel_distribution_loss
from .multi_loss import MultiLoss, LossTerm
