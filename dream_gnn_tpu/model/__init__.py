from dream_gnn_tpu.model.dream_gnn import init_params, forward, ModelInputs  # noqa: F401
