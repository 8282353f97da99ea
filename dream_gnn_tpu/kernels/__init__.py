from dream_gnn_tpu.kernels.spmm import spmm, spmm_coo, spmm_dense  # noqa: F401
