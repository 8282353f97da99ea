from dream_gnn_tpu.data.loader import DreamDataset, FoldData  # noqa: F401
from dream_gnn_tpu.data.splits import make_cv_splits  # noqa: F401
from dream_gnn_tpu.data.synthetic import synthetic_raw_data  # noqa: F401
