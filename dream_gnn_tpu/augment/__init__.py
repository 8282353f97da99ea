from dream_gnn_tpu.augment.masks import (  # noqa: F401
    augment_inputs, edge_dropout_masks, feature_masking, feature_noise,
    graph_noise, mixup_features, sparse_edge_dropout)
