"""Independent NumPy oracle of the reference model's forward math.

This transcribes the *semantics* of the PyTorch+DGL reference
(layers.py / model.py) in eval mode, using literal per-edge
gather/scatter (``np.add.at``) where the reference uses DGL
``update_all`` / ``apply_edges``, and explicit concat in the decoder.
Our framework instead reformulates everything as dense masked matmuls
— this oracle is what proves the reformulation exact (BASELINE.json
demands activation-level matching).

Used by tests only; not part of the framework.
"""

from __future__ import annotations

import numpy as np


def leaky(x, slope=0.1):
    return np.where(x >= 0, x, slope * x)


def relu(x):
    return np.maximum(x, 0.0)


def calc_norm(deg):
    """_calc_norm (data_loader.py:454-457): 1/sqrt with 0 -> inf -> 0."""
    deg = deg.astype(np.float64)
    out = np.where(deg == 0, np.inf, deg)
    return (1.0 / np.sqrt(out))[:, None]


class EncGraphNP:
    """Per-rating edge lists + ci/cj, as _generate_enc_graph builds them."""

    def __init__(self, pairs, values, n_drug, n_dis, symm=True):
        pairs = np.asarray(pairs)
        values = np.asarray(values)
        self.n_drug, self.n_dis = n_drug, n_dis
        self.edges = {}  # rating -> (drug_ids, dis_ids)
        for r in (0, 1):
            idx = np.where(values == r)[0]
            self.edges[r] = (pairs[0][idx], pairs[1][idx])
        deg_drug = np.zeros(n_drug)
        deg_dis = np.zeros(n_dis)
        for r in (0, 1):
            dr, di = self.edges[r]
            np.add.at(deg_drug, dr, 1)
            np.add.at(deg_dis, di, 1)
        self.ci_drug = calc_norm(deg_drug)
        self.ci_dis = calc_norm(deg_dis)
        if symm:
            self.cj_drug, self.cj_dis = self.ci_drug, self.ci_dis
        else:
            self.cj_drug = np.ones((n_drug, 1))
            self.cj_dis = np.ones((n_dis, 1))


def gcmc_conv(edges_src_dst, feat_src, w, cj_src, ci_dst, n_dst):
    """GCMCGraphConv.forward in eval mode (layers.py:169-236):
    feat @ W, * cj, copy_u/sum scatter, * ci."""
    src, dst = edges_src_dst
    h = feat_src @ w
    h = h * cj_src          # per-src-node norm applied before the gather
    out = np.zeros((n_dst, h.shape[1]), h.dtype)
    np.add.at(out, dst, h[src])
    return out * ci_dst


def gcmc_layer(params, g: EncGraphNP, drug_feat, dis_feat, share_param=True):
    """GCMCLayer.forward, agg='sum', eval mode (layers.py:117-143)."""
    att = np.asarray(params["att"])
    basis = np.asarray(params["basis"])
    b, in_units, msg_units = basis.shape
    w = (att @ basis.reshape(b, -1)).reshape(att.shape[0], in_units,
                                             msg_units)
    msg_drug = 0.0
    msg_dis = 0.0
    for r in (0, 1):
        dr, di = g.edges[r]
        # etype str(r): drug -> disease
        msg_dis = msg_dis + gcmc_conv((dr, di), drug_feat, w[r],
                                      g.cj_drug, g.ci_dis, g.n_dis)
        # rev etype: disease -> drug, same W[r] (layers.py:126-127)
        msg_drug = msg_drug + gcmc_conv((di, dr), dis_feat, w[r],
                                        g.cj_dis, g.ci_drug, g.n_drug)
    drug_h = leaky(msg_drug)
    dis_h = leaky(msg_dis)
    fc_w, fc_b = np.asarray(params["fc_w"]), np.asarray(params["fc_b"])
    if share_param:
        return drug_h @ fc_w + fc_b, dis_h @ fc_w + fc_b
    return (drug_h @ np.asarray(params["ifc_w"]) + np.asarray(params["ifc_b"]),
            dis_h @ fc_w + fc_b)


def gcn(params, x, adj):
    """GCN.forward eval (layers.py:245-249); adj dense row-normalised."""
    h = relu(adj @ (x @ np.asarray(params["w1"])) + np.asarray(params["b1"]))
    return adj @ (h @ np.asarray(params["w2"])) + np.asarray(params["b2"])


def fgcn(params, drug_adj, drug_sim_feat, dis_adj, dis_sim_feat,
         drug_feat_adj, dis_feat_adj):
    e1s = gcn(params["drug_gcn"], drug_sim_feat, drug_adj)
    e2s = gcn(params["dis_gcn"], dis_sim_feat, dis_adj)
    e1f = gcn(params["drug_gcn"], drug_sim_feat, drug_feat_adj)
    e2f = gcn(params["dis_gcn"], dis_sim_feat, dis_feat_adj)
    fused_drug = relu(np.concatenate([e1s, e1f], 1)
                      @ np.asarray(params["drug_fusion_w"])
                      + np.asarray(params["drug_fusion_b"]))
    fused_dis = relu(np.concatenate([e2s, e2f], 1)
                     @ np.asarray(params["dis_fusion_w"])
                     + np.asarray(params["dis_fusion_b"]))
    return fused_drug, fused_dis


def attention(params, z):
    w = np.tanh(z @ np.asarray(params["w1"]) + np.asarray(params["b1"])) \
        @ np.asarray(params["w2"])
    e = np.exp(w - w.max(axis=1, keepdims=True))
    beta = e / e.sum(axis=1, keepdims=True)
    return (beta * z).sum(1)


def decoder(params, src, dst, drug_feat, dis_feat):
    """MLPDecoder eval: literal concat(src_h, dst_h) per edge
    (layers.py:360-379)."""
    m = np.concatenate([drug_feat[src], dis_feat[dst]], axis=1)
    h = relu(m @ np.asarray(params["w1"]) + np.asarray(params["b1"]))
    h = relu(h @ np.asarray(params["w2"]) + np.asarray(params["b2"]))
    return (h @ np.asarray(params["w3"]) + np.asarray(params["b3"]))[:, 0]


def net_forward(params, *, enc: EncGraphNP, dec_src, dec_dst,
                drug_adj, drug_sim_feat, drug_feat,
                dis_adj, dis_sim_feat, dis_feat,
                drug_feat_adj, dis_feat_adj, layers=3, share_param=True):
    """Net.forward eval mode (model.py:60-103)."""
    drug_out = dis_out = None
    for i in range(layers):
        drug_o, dis_o = gcmc_layer(params["tgcn"][i], enc, drug_feat,
                                   dis_feat, share_param)
        if i == 0:
            drug_out, dis_out = drug_o, dis_o
        else:
            drug_out = drug_out + drug_o / float(i + 1)
            dis_out = dis_out + dis_o / float(i + 1)
        drug_feat, dis_feat = drug_o, dis_o

    drug_sim_out, dis_sim_out = fgcn(params["fgcn"], drug_adj, drug_sim_feat,
                                     dis_adj, dis_sim_feat, drug_feat_adj,
                                     dis_feat_adj)

    drug_feats = attention(params["attention"],
                           np.stack([drug_out, drug_sim_out], axis=1))
    dis_feats = attention(params["attention"],
                          np.stack([dis_out, dis_sim_out], axis=1))
    pred = decoder(params["decoder"], dec_src, dec_dst, drug_feats, dis_feats)
    return pred, drug_out, drug_sim_out, dis_out, dis_sim_out
