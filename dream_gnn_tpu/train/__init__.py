from dream_gnn_tpu.train.losses import bce_with_logits, common_loss, total_loss  # noqa: F401
from dream_gnn_tpu.train.optim import make_optimizer, PlateauScheduler  # noqa: F401
from dream_gnn_tpu.train.step import TrainState, make_train_fns  # noqa: F401
from dream_gnn_tpu.train.loop import train_fold  # noqa: F401
