from .occupancy import OccupancyLossCfg, occupancy_loss
from .lovasz import lovasz_softmax
from .bce import (binary_cross_entropy_loss, pixel_distribution_loss,
                  occ_depth_loss, density_loss)
from .focal import (sigmoid_focal_loss, softmax_focal_loss,
                    distance_weighted_focal_loss, dice_loss)
from .multi_loss import MultiLoss, LossTerm
