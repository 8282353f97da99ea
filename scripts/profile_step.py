"""Decompose the lrssl train-step time on the TPU chip."""

import _bootstrap  # noqa: F401  (repo root on sys.path)

_bootstrap.setup_jax_cache()

import time

import jax
import jax.numpy as jnp

from dream_gnn_tpu.config import TrainConfig
from dream_gnn_tpu.data.loader import DreamDataset
from dream_gnn_tpu.model.dream_gnn import forward, init_params
from dream_gnn_tpu.train.loop import derive_model_cfg, fold_inputs
from dream_gnn_tpu.train.losses import total_loss
from dream_gnn_tpu.train.step import make_train_fns
from dream_gnn_tpu.augment.masks import augment_inputs


def timeit(name, fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:35s} {dt:8.2f} ms")
    return dt


def main():
    cfg = TrainConfig(data_name="lrssl")
    dataset = DreamDataset.load("lrssl", k=cfg.num_neighbor)
    model_cfg = derive_model_cfg(cfg, dataset)
    inputs, _, labels, _ = fold_inputs(dataset, 0)
    params = init_params(jax.random.key(0), model_cfg)
    key = jax.random.key(1)

    fwd_eval = jax.jit(lambda p, x: forward(p, x, model_cfg, train=False)[0])
    timeit("forward eval", fwd_eval, params, inputs)

    def fwd_train(p, x, k):
        aug, masks = augment_inputs(jax.random.fold_in(k, 0), x, cfg.augment)
        return forward(p, aug, model_cfg, train=True, key=k,
                       edge_masks=masks)[0]

    timeit("forward train (aug+dropout)", jax.jit(fwd_train), params,
           inputs, key)

    def loss_only(p, x, k):
        aug, masks = augment_inputs(jax.random.fold_in(k, 0), x, cfg.augment)
        pred, a, b, c, d = forward(p, aug, model_cfg, train=True, key=k,
                                   edge_masks=masks)
        return total_loss(pred, labels, a, b, c, d, beta=cfg.beta)[0]

    timeit("loss fwd", jax.jit(loss_only), params, inputs, key)
    timeit("loss fwd+bwd", jax.jit(jax.grad(loss_only)), params, inputs, key)

    init_state, run_steps, evaluate, _ = make_train_fns(model_cfg, cfg)
    state = init_state(params, key)
    # run_steps donates its state arg -> thread the state through.
    state, _ = run_steps(state, inputs, labels, 50)   # compile
    t0 = time.perf_counter()
    for _ in range(3):
        state, losses = run_steps(state, inputs, labels, 50)
    jax.block_until_ready(losses)
    dt = (time.perf_counter() - t0) / 3 * 1e3
    print(f"{'full 50-step scan':35s} {dt:8.2f} ms")
    print(f"{'per step':35s} {dt / 50:8.2f} ms")
    timeit("evaluate", evaluate, params, inputs, labels, n=20)

    # Piece timings
    enc = inputs.enc_graph
    x768 = dataset.drug_feat
    w = jnp.zeros((768, 341))
    timeit("  one GCMC matmul pair",
           jax.jit(lambda a, x, w: (a.T @ (x @ w), a @ (x @ w)[: a.shape[1]])),
           enc.mask, x768, w, n=50)
    timeit("  common_loss pair",
           jax.jit(lambda a, b: total_loss(jnp.zeros(10), jnp.zeros(10), a, b,
                                           a, b, beta=1.0)[0]),
           jnp.ones((763, 128)), jnp.ones((763, 128)), n=50)

    dec_e = inputs.dec_src.shape[0]
    h = jnp.ones((dec_e, 128))
    timeit("  decoder mid-MLP (E,128)@(128,64)",
           jax.jit(lambda h: jax.nn.relu(h @ jnp.zeros((128, 64)))), h)
    timeit("  edge gather (E,) from (763,128)",
           jax.jit(lambda s: jnp.take(jnp.ones((763, 128)), s, axis=0)),
           inputs.dec_src)


if __name__ == "__main__":
    main()
