from dream_gnn_tpu.sharding.mesh import make_mesh  # noqa: F401
from dream_gnn_tpu.sharding.foldstack import stack_folds, StackedFolds  # noqa: F401
from dream_gnn_tpu.sharding.partition import (  # noqa: F401
    make_multichip_train_step, stacked_input_sharding)
