from dream_gnn_tpu.nn.dropout import dropout  # noqa: F401
from dream_gnn_tpu.nn import init  # noqa: F401
from dream_gnn_tpu.nn.gcmc import gcmc_layer_init, gcmc_layer_apply  # noqa: F401
from dream_gnn_tpu.nn.fgcn import fgcn_init, fgcn_apply  # noqa: F401
from dream_gnn_tpu.nn.attention import attention_init, attention_apply  # noqa: F401
from dream_gnn_tpu.nn.decoder import decoder_init, decoder_apply  # noqa: F401
