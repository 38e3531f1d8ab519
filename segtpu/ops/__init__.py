"""Core math ops: losses, metrics, meters, fused ABN."""

from segtpu.ops.losses import (  # noqa: F401
    LOSS_REGISTRY,
    bce_smooth_jaccard_loss,
    bce_with_logits,
    bce_with_sigmoid_loss,
    dice_loss,
    focal_loss_binary,
    focal_loss_multi,
    get_loss,
    jaccard_loss,
    jaccard_loss_multi,
    smooth_jaccard_loss,
)
from segtpu.ops.meters import AverageMeter, PRCurveMeter  # noqa: F401
from segtpu.ops.metrics import (  # noqa: F401
    METRIC_REGISTRY,
    default_metrics,
    jaccard_score,
    pixel_accuracy,
    pr_curve_counts,
)
