"""Evidence for rejecting ``gcn_agg_accum='stack'`` (PARITY.md).

The reference accepts --gcn_agg_accum=stack (train.py:411, default
"sum") and sizes its layers for it (layers.py:52-57, model.py:26-33),
but the mode cannot actually run its own forward pass: DGL's
``HeteroGraphConv(aggregate='stack')`` emits per-node (N, R, eff)
stacks, GCMCLayer's output projection maps them to (N, R, out)
(layers.py:140-149 applies ``nn.Linear`` to the trailing dim), and
``Net.forward`` then hits

    th.stack([drug_out, drug_sim_out], dim=1)        # model.py:93

where the FGCN route's ``drug_sim_out`` is (N, out) — torch raises
"stack expects each tensor to be equal size".  This test reproduces
that failure with the reference's exact shape algebra (DGL itself is
not in this image; the stack aggregate is one documented torch.stack
over per-relation outputs), which is why this framework rejects the
mode loudly at init (model/dream_gnn.py:55-61) instead of failing 3
layers deep into a training step.
"""

import pytest
import torch as th


def test_reference_stack_mode_shape_algebra_breaks_downstream():
    n_drug, r, out_units, eff = 6, 2, 8, 16

    # HeteroGraphConv(aggregate='stack'): per-relation GCMCGraphConv
    # outputs (N, eff) are stacked on dim 1 -> (N, R, eff).
    per_relation = [th.randn(n_drug, eff) for _ in range(r)]
    drug_feat = th.stack(per_relation, dim=1)
    assert drug_feat.shape == (n_drug, r, eff)

    # GCMCLayer.forward (layers.py:140-149): activation, dropout, and
    # the ufc/ifc Linear(eff, out) all broadcast over the stack dim.
    ifc = th.nn.Linear(eff, out_units)
    drug_out = ifc(th.relu(drug_feat))
    assert drug_out.shape == (n_drug, r, out_units)

    # Net.forward model.py:93: the attention fusion stacks the GCMC
    # route against the FGCN route's (N, out) features — impossible
    # with the (N, R, out) stack.
    drug_sim_out = th.randn(n_drug, out_units)
    with pytest.raises(RuntimeError, match="stack expects each tensor"):
        th.stack([drug_out, drug_sim_out], dim=1)


def test_framework_rejects_stack_at_init():
    import jax

    from dream_gnn_tpu.config import ModelConfig
    from dream_gnn_tpu.model.dream_gnn import init_params

    cfg = ModelConfig(gcn_agg_accum="stack")
    with pytest.raises(NotImplementedError, match="stack"):
        init_params(jax.random.key(0), cfg)
