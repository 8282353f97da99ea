from dream_gnn_tpu.eval.novel import get_top_novel_predictions  # noqa: F401
