from .mean_iou import MeanIoU, iou_counts, compute_iou
