"""Device-side hot ops.

  crop.py          — fused crop+pad+resize(+normalize): gather and
                     separable-matmul (MXU) formulations
  pallas/decode.py — fused penalty-window decode kernel (Mosaic/Pallas)
  correlation      — the pixel-wise cross-correlation lives with the model
                     blocks (models/blocks.py: ``pixelwise_correlation``,
                     an einsum the XLA partitioner maps onto the MXU) and is
                     re-exported here for discoverability.
"""

from feartracker_tpu.models.blocks import pixelwise_correlation  # noqa: F401
from feartracker_tpu.ops.crop import (  # noqa: F401
    crop_bbox_in_window,
    crop_resize,
    crop_resize_mm,
    extended_crop_window,
    normalize_imagenet,
)
