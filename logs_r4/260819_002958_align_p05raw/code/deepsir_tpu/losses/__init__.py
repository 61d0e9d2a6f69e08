from deepsir_tpu.losses.align import scan_alignment_loss, correspondence_correct  # noqa: F401
from deepsir_tpu.losses.detdes import det_des_loss, circle_loss  # noqa: F401
from deepsir_tpu.losses.semantic import semantic_loss, confusion_matrix, SemanticMetric  # noqa: F401
from deepsir_tpu.losses.chamfer import chamfer_loss, single_side_chamfer  # noqa: F401
