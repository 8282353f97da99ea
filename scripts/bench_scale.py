"""Scaling benchmark: sparse GCMC training step on a large synthetic
bipartite graph (BASELINE.json config 5: 100k x 100k, ~10M edges).

Measures single-chip edges/s of the padded-COO path and (on a virtual
or real mesh) the fold/edge-sharded step, reporting scaling efficiency.
Run on one TPU chip by default; pass --cpu-mesh to exercise the
8-virtual-device partitioned path instead (correctness/compile check,
not a perf number).
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)

_bootstrap.setup_jax_cache()

import dataclasses
import sys
import time

import numpy as np


def main():
    cpu_mesh = "--cpu-mesh" in sys.argv
    small = "--small" in sys.argv
    if cpu_mesh:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    if cpu_mesh:
        # Pallas kernels only run in interpret mode on the CPU backend
        # (the virtual mesh is a correctness check, not a perf number).
        import dream_gnn_tpu.kernels.pallas_spmm_gather as _psg
        _psg.INTERPRET = True

    from dream_gnn_tpu.config import ModelConfig, TrainConfig
    from dream_gnn_tpu.graph.bipartite_coo import synthetic_bipartite_coo
    from dream_gnn_tpu.model.dream_gnn import ModelInputs, init_params
    from dream_gnn_tpu.graph.knn import NormAdj
    from dream_gnn_tpu.train.step import make_train_fns

    tiny = "--tiny" in sys.argv
    if tiny:
        # cpu-mesh interpret-mode correctness check: interpret kernels
        # run the grid in Python, so keep the graph small enough to
        # finish in minutes.
        n_drug = n_dis = 1024
        n_edges = 8_000
    elif small:
        n_drug = n_dis = 4096
        n_edges = 200_000
    else:
        n_drug = n_dis = 100_000
        n_edges = 10_000_000
    feat_dim = 128

    grouped = "--grouped" in sys.argv
    sharded = "--sharded" in sys.argv
    ring = "--ring" in sys.argv
    sharded_grouped = "--sharded-grouped" in sys.argv or ring
    print(f"building {n_drug}x{n_dis} graph, {n_edges} edges"
          f" (grouped={grouped}, sharded={sharded}, "
          f"sharded_grouped={sharded_grouped}, ring={ring})...", flush=True)
    if sharded or sharded_grouped:
        import numpy as _np

        from dream_gnn_tpu.sharding.mesh import make_mesh
        from dream_gnn_tpu.sharding.scale_graph import (
            build_enc_graph_sharded, build_enc_graph_sharded_grouped)

        n_dev = len(jax.devices())
        mesh = make_mesh(dp=n_dev, mp=1)
        rng0 = _np.random.default_rng(0)
        dr = rng0.integers(0, n_drug, n_edges)
        di = rng0.integers(0, n_dis, n_edges)
        vals = (rng0.random(n_edges) < 0.3).astype(_np.float32)
        if sharded_grouped:
            graph = build_enc_graph_sharded_grouped(
                _np.stack([dr, di]), vals, n_drug, n_dis, mesh, "dp",
                ring=ring)
        else:
            graph = build_enc_graph_sharded(
                _np.stack([dr, di]), vals, n_drug, n_dis, mesh, "dp")
        print(f"sharded over {n_dev} device(s) (ring={ring})", flush=True)
    elif grouped:
        import numpy as _np

        from dream_gnn_tpu.graph.grouped import build_enc_graph_grouped

        rng0 = _np.random.default_rng(0)
        dr = rng0.integers(0, n_drug, n_edges)
        di = rng0.integers(0, n_dis, n_edges)
        vals = (rng0.random(n_edges) < 0.3).astype(_np.float32)
        graph = build_enc_graph_grouped(_np.stack([dr, di]), vals,
                                        n_drug, n_dis)
    else:
        graph = synthetic_bipartite_coo(n_drug, n_dis, n_edges, seed=0)

    rng = np.random.default_rng(1)
    drug_feat = jnp.asarray(rng.normal(size=(n_drug, feat_dim))
                            .astype(np.float32))
    dis_feat = jnp.asarray(rng.normal(size=(n_dis, feat_dim))
                           .astype(np.float32))

    # Decoder candidates: a 1M-edge sample (training on all pairs is
    # not meaningful at this scale).
    n_cand = 10_000 if tiny else 100_000 if small else 1_000_000
    dec_src = jnp.asarray(rng.integers(0, n_drug, n_cand).astype(np.int32))
    dec_dst = jnp.asarray(rng.integers(0, n_dis, n_cand).astype(np.int32))
    labels = jnp.asarray((rng.random(n_cand) < 0.3).astype(np.float32))

    # FGCN runs on embedding features at this scale (not similarity
    # rows); identity-free: use kNN-free dense adjacency off, keep the
    # route by feeding a trivial sparse graph.
    from dream_gnn_tpu.graph.coo import coo_from_arrays
    eye_d = coo_from_arrays(np.arange(n_drug), np.arange(n_drug),
                            np.ones(n_drug, np.float32), n_drug, n_drug)
    eye_v = coo_from_arrays(np.arange(n_dis), np.arange(n_dis),
                            np.ones(n_dis, np.float32), n_dis, n_dis)

    model = ModelConfig(
        layers=3, gcn_agg_units=384, gcn_out_units=128,
        src_in_units=feat_dim, dst_in_units=feat_dim,
        fdim_drug=feat_dim, fdim_disease=feat_dim,
        nhid1=256, nhid2=128, compute_dtype="bfloat16")
    import dataclasses as _dc

    from dream_gnn_tpu.config import AugmentConfig
    cfg = TrainConfig(model=model, beta=0.0,   # NxN grams infeasible
                      augment=AugmentConfig(methods=()))

    inputs = ModelInputs(
        enc_graph=graph, dec_src=dec_src, dec_dst=dec_dst,
        drug_graph=eye_d, drug_sim_feat=drug_feat, drug_feat=drug_feat,
        dis_graph=eye_v, dis_sim_feat=dis_feat, dis_feat=dis_feat,
        drug_feature_graph=None, dis_feature_graph=None)

    init_state, run_steps, *_ = make_train_fns(model, cfg)
    params = init_params(jax.random.key(0), model)
    state = init_state(params, jax.random.key(1, impl=cfg.rng_impl))

    steps = 1 if cpu_mesh else 20
    t0 = time.perf_counter()
    state, losses = run_steps(state, inputs, labels, steps)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s "
          f"loss={float(losses[-1]):.4f}", flush=True)
    if cpu_mesh:
        # Virtual-mesh interpret-mode run is a correctness/compile
        # check only — timings are meaningless and interpret kernels
        # are minutes/step; stop after the finite-loss assertion.
        assert np.isfinite(float(losses[-1]))
        print("cpu-mesh check OK", flush=True)
        return

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses = run_steps(state, inputs, labels, steps)
        float(losses[-1])
        times.append(time.perf_counter() - t0)
    ms = min(times) / steps * 1e3
    # message edges per step: L layers x (all relation edges, both dirs)
    # x fwd+bwd, plus decoder candidates x2.
    msg_edges = 2.0 * (model.layers * 2.0 * n_edges + n_cand)
    print(f"{ms:.2f} ms/step  -> {msg_edges / ms * 1e3:.3e} edges/s",
          flush=True)


if __name__ == "__main__":
    main()
