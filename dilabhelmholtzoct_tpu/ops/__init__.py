from .losses import bce_with_logits, dice_ce_loss, dice_loss, segmentation_loss
from .metrics import average_precision, binary_confusion, binary_report
from .postprocess import postprocess_masks
from .preprocess import (
    COLORMAP_NAMES,
    apply_pseudocolor,
    colormap_lut,
    preprocess_image,
    preprocess_shape,
    rescale_boxes,
    rescale_coords,
)
from .topology import topo_loss

__all__ = [
    "bce_with_logits", "dice_ce_loss", "dice_loss", "segmentation_loss",
    "average_precision", "binary_confusion", "binary_report",
    "postprocess_masks", "COLORMAP_NAMES", "apply_pseudocolor",
    "colormap_lut", "preprocess_image", "preprocess_shape",
    "rescale_boxes", "rescale_coords", "topo_loss",
]
