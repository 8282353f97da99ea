"""Cross-framework learning parity: torch-CPU vs dream_gnn_tpu.

Trains the identical model math (dense formulation, shared config,
dropout/augmentation off so only init RNG differs) in eager PyTorch
and in the framework on the same synthetic dataset, then compares test
AUROC.  This validates end-to-end learning dynamics — optimizer, loss,
schedule, eval protocol — beyond the per-activation oracle tests.
"""

import dataclasses

import jax
import numpy as np
import pytest
import torch as th

from dream_gnn_tpu.config import AugmentConfig, ModelConfig, TrainConfig
from dream_gnn_tpu.data.loader import DreamDataset
from dream_gnn_tpu.data.synthetic import synthetic_raw_data
from dream_gnn_tpu.train.loop import train_fold
from dream_gnn_tpu.utils.metrics import roc_aupr_host


def _train_torch(dataset, model_cfg, cfg, iters, eval_every):
    """Minimal eager-torch training of the same dense math."""
    th.manual_seed(0)
    f = dataset.fold(0)
    split = dataset.splits[0]
    e_tr = split.train_pairs.shape[1]
    a1 = th.tensor(np.asarray(f.train_enc.a1))
    mask = th.tensor(np.asarray(f.train_enc.mask))
    ci_d = th.tensor(np.asarray(f.train_enc.ci_drug))
    ci_v = th.tensor(np.asarray(f.train_enc.ci_dis))
    te_a1 = th.tensor(np.asarray(f.test_enc.a1))
    te_mask = th.tensor(np.asarray(f.test_enc.mask))
    te_ci_d = th.tensor(np.asarray(f.test_enc.ci_drug))
    te_ci_v = th.tensor(np.asarray(f.test_enc.ci_dis))
    src = th.tensor(np.asarray(f.train_src)[:e_tr], dtype=th.long)
    dst = th.tensor(np.asarray(f.train_dst)[:e_tr], dtype=th.long)
    lab = th.tensor(np.asarray(f.train_labels)[:e_tr])
    e_te = split.test_pairs.shape[1]
    te_src = th.tensor(np.asarray(f.test_src)[:e_te], dtype=th.long)
    te_dst = th.tensor(np.asarray(f.test_dst)[:e_te], dtype=th.long)
    te_lab = np.asarray(f.test_labels)[:e_te]
    x_d = th.tensor(np.asarray(dataset.drug_feat))
    x_v = th.tensor(np.asarray(dataset.dis_feat))
    sim_d = th.tensor(np.asarray(dataset.drug_sim_feat))
    sim_v = th.tensor(np.asarray(dataset.dis_sim_feat))
    adjs = [th.tensor(np.asarray(g.a)) for g in (
        dataset.drug_graph, dataset.dis_graph,
        dataset.drug_feature_graph, dataset.dis_feature_graph)]

    m = model_cfg
    ps = []

    def lin(i, o):
        k = 1.0 / np.sqrt(i)
        w = th.empty(i, o).uniform_(-k, k).requires_grad_()
        b = th.empty(o).uniform_(-k, k).requires_grad_()
        ps.extend([w, b])
        return w, b

    def xav(*shape):
        t = th.empty(*shape)
        th.nn.init.xavier_uniform_(t.view(shape[0], -1) if len(shape) > 2
                                   else t)
        t.requires_grad_()
        ps.append(t)
        return t

    layers = []
    for li in range(m.layers):
        att = xav(2, m.basis_units)
        basis = xav(m.basis_units, m.layer_in_units(li),
                    m.effective_msg_units(li))
        fc = lin(m.effective_msg_units(li), m.gcn_out_units)
        layers.append((att, basis, fc))
    g1d = lin(m.fdim_drug, m.nhid1)
    g2d = lin(m.nhid1, m.nhid2)
    g1v = lin(m.fdim_disease, m.nhid1)
    g2v = lin(m.nhid1, m.nhid2)
    fd = lin(2 * m.nhid2, m.nhid2)
    fv = lin(2 * m.nhid2, m.nhid2)
    at1 = lin(m.gcn_out_units, 16)
    at2 = lin(16, 1)
    d1 = lin(2 * m.gcn_out_units, m.decoder_hidden1)
    d2 = lin(m.decoder_hidden1, m.decoder_hidden2)
    d3 = lin(m.decoder_hidden2, 1)
    opt = th.optim.Adam(ps, lr=cfg.train_lr, weight_decay=cfg.weight_decay)

    def fwd(A1, MSK, CID, CIV, e_src, e_dst):
        a0 = MSK - A1
        xd, xv = x_d, x_v
        do = dv = None
        for li, (att, basis, (fw, fb)) in enumerate(layers):
            w = (att @ basis.reshape(m.basis_units, -1)).reshape(
                2, basis.shape[1], basis.shape[2])
            md = mv = 0.0
            for r, a in enumerate((a0, A1)):
                mv = mv + a.T @ ((xd @ w[r]) * CID)
                md = md + a @ ((xv @ w[r]) * CIV)
            hd = th.nn.functional.leaky_relu(md * CID, 0.1) @ fw + fb
            hv = th.nn.functional.leaky_relu(mv * CIV, 0.1) @ fw + fb
            if li == 0:
                do, dv = hd, hv
            else:
                do = do + hd / (li + 1)
                dv = dv + hv / (li + 1)
            xd, xv = hd, hv

        def gcn(x, adj, l1, l2):
            h = th.relu(adj @ (x @ l1[0]) + l1[1])
            return adj @ (h @ l2[0]) + l2[1]

        e1 = th.relu(th.cat([gcn(sim_d, adjs[0], g1d, g2d),
                             gcn(sim_d, adjs[2], g1d, g2d)], 1) @ fd[0]
                     + fd[1])
        e2 = th.relu(th.cat([gcn(sim_v, adjs[1], g1v, g2v),
                             gcn(sim_v, adjs[3], g1v, g2v)], 1) @ fv[0]
                     + fv[1])

        def fuse(z):
            w = th.tanh(z @ at1[0] + at1[1]) @ at2[0]
            beta = th.softmax(w, dim=1)
            return (beta * z).sum(1)

        hd = fuse(th.stack([do, e1], 1))
        hv = fuse(th.stack([dv, e2], 1))
        dd = hd.shape[1]
        h = th.relu(hd[e_src] @ d1[0][:dd] + hv[e_dst] @ d1[0][dd:]
                    + d1[1])
        h = th.relu(h @ d2[0] + d2[1])
        pred = (h @ d3[0] + d3[1])[:, 0]
        return pred, do, e1, dv, e2

    def common(e1, e2):
        e1 = e1 - e1.mean(0, keepdim=True)
        e2 = e2 - e2.mean(0, keepdim=True)
        e1 = th.nn.functional.normalize(e1, p=2, dim=1)
        e2 = th.nn.functional.normalize(e2, p=2, dim=1)
        return ((e1 @ e1.t() - e2 @ e2.t()) ** 2).mean()

    best = 0.0
    for it in range(1, iters):
        pred, do, e1, dv, e2 = fwd(a1, mask, ci_d, ci_v, src, dst)
        loss = th.nn.functional.binary_cross_entropy_with_logits(
            pred, lab) + cfg.beta * (common(do, e1) + common(dv, e2))
        opt.zero_grad()
        loss.backward()
        th.nn.utils.clip_grad_norm_(ps, cfg.train_grad_clip)
        opt.step()
        if it % eval_every == 0:
            with th.no_grad():
                p, *_ = fwd(te_a1, te_mask, te_ci_d, te_ci_v, te_src,
                            te_dst)
            roc, _ = roc_aupr_host(te_lab, p.numpy())
            best = max(best, roc)
    return best


@pytest.mark.slow
def test_learning_parity_with_torch():
    raw = synthetic_raw_data(n_drug=60, n_dis=45, n_pos=150, seed=21)
    dataset = DreamDataset(raw, k=3)
    model = ModelConfig(layers=2, gcn_agg_units=96, gcn_out_units=32,
                        nhid1=64, nhid2=32, dropout=0.0,
                        attention_dropout=0.0)
    cfg = TrainConfig(train_max_iter=801, train_valid_interval=200,
                      model=model, augment=AugmentConfig(methods=()))
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        model, fdim_drug=dataset.n_drug, fdim_disease=dataset.n_dis))

    ours = train_fold(dataset, 0, cfg, jax.random.key(3), verbose=False)
    theirs = _train_torch(dataset, cfg.model, cfg, iters=801,
                          eval_every=200)

    assert ours["best_auroc"] > 0.75
    assert theirs > 0.75
    assert abs(ours["best_auroc"] - theirs) < 0.08, \
        f"jax {ours['best_auroc']:.3f} vs torch {theirs:.3f}"
