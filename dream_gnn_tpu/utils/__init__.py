from dream_gnn_tpu.utils.activations import get_activation  # noqa: F401
from dream_gnn_tpu.utils.metrics import auroc, aupr, roc_aupr_host  # noqa: F401
from dream_gnn_tpu.utils.logging import MetricLogger  # noqa: F401
