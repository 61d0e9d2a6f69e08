from deepsir_tpu.utils.metrics import (  # noqa: F401
    rte_rre, compute_metrics, summarize_metrics, print_metrics,
)
from deepsir_tpu.utils.timer import Timer, AverageMeter  # noqa: F401
from deepsir_tpu.utils.logging import prepare_logger  # noqa: F401
