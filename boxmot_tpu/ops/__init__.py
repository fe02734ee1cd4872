"""Pure device-side ops: geometry, IoU family, rotated IoU, assignment."""

from boxmot_tpu.ops import geometry  # noqa: F401
from boxmot_tpu.ops.iou import (  # noqa: F401
    ASSO_FUNCS,
    ASSO_FUNCS_WH,
    ciou_batch,
    centroid_batch,
    centroid_batch_obb,
    diou_batch,
    get_asso_func,
    giou_batch,
    hmiou_batch,
    iou_batch,
    iou_batch_obb,
)
from boxmot_tpu.ops.lap import (  # noqa: F401
    linear_assignment,
    linear_assignment_np,
    masked_assignment,
)
