"""Optimizer / loss / scheduler parity against PyTorch oracles.

The reference trains with torch Adam(weight_decay) + global-norm clip
+ ReduceLROnPlateau (train.py:217,235,297-300).  These tests pin our
optax chain and host-side scheduler to torch's exact semantics.
"""

import numpy as np
import pytest
import torch as th

import jax
import jax.numpy as jnp

from dream_gnn_tpu.train.losses import bce_with_logits, common_loss
from dream_gnn_tpu.train.optim import PlateauScheduler, make_optimizer


def test_bce_matches_torch(rng):
    logits = rng.normal(size=50).astype(np.float32)
    targets = (rng.random(50) < 0.3).astype(np.float32)
    ours = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    ref = float(th.nn.functional.binary_cross_entropy_with_logits(
        th.tensor(logits), th.tensor(targets)))
    assert ours == pytest.approx(ref, abs=1e-6)


def test_label_smoothing_matches_reference(rng):
    """LabelSmoothingBCELoss: target*(1-s) + s*0.5 (train.py:20-23)."""
    logits = rng.normal(size=20).astype(np.float32)
    targets = (rng.random(20) < 0.5).astype(np.float32)
    s = 0.1
    ours = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets),
                                 smoothing=s))
    smoothed = th.tensor(targets) * (1 - s) + s * 0.5
    ref = float(th.nn.functional.binary_cross_entropy_with_logits(
        th.tensor(logits), smoothed))
    assert ours == pytest.approx(ref, abs=1e-6)


def test_common_loss_matches_torch(rng):
    e1 = rng.normal(size=(30, 8)).astype(np.float32)
    e2 = rng.normal(size=(30, 8)).astype(np.float32)
    ours = float(common_loss(jnp.asarray(e1), jnp.asarray(e2)))

    t1, t2 = th.tensor(e1), th.tensor(e2)
    t1 = t1 - t1.mean(dim=0, keepdim=True)
    t2 = t2 - t2.mean(dim=0, keepdim=True)
    t1 = th.nn.functional.normalize(t1, p=2, dim=1)
    t2 = th.nn.functional.normalize(t2, p=2, dim=1)
    ref = float(((t1 @ t1.t() - t2 @ t2.t()) ** 2).mean())
    assert ours == pytest.approx(ref, abs=1e-6)


def test_optimizer_matches_torch_adam(rng):
    """clip(1.0) -> Adam(lr, weight_decay) over several steps on a
    quadratic, matching torch's L2-in-gradient weight decay."""
    w0 = rng.normal(size=(5, 3)).astype(np.float32)
    target = rng.normal(size=(5, 3)).astype(np.float32)
    lr, wd, clip = 0.01, 1e-2, 1.0

    # torch
    wt = th.tensor(w0.copy(), requires_grad=True)
    opt = th.optim.Adam([wt], lr=lr, weight_decay=wd)
    for _ in range(10):
        loss = ((wt - th.tensor(target)) ** 2).sum()
        opt.zero_grad()
        loss.backward()
        th.nn.utils.clip_grad_norm_([wt], clip)
        opt.step()

    # ours
    tx = make_optimizer(clip, wd)
    params = jnp.asarray(w0)
    opt_state = tx.init(params)

    def loss_fn(p):
        return jnp.sum((p - jnp.asarray(target)) ** 2)

    for _ in range(10):
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = params + jax.tree.map(lambda u: -lr * u, updates)

    np.testing.assert_allclose(np.asarray(params), wt.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_plateau_matches_torch(rng):
    """Feed the same metric sequence to both schedulers."""
    metrics = np.abs(rng.normal(size=60)).astype(np.float64)
    metrics[20:] = 0.01  # long plateau to trigger reductions

    wt = th.tensor([1.0], requires_grad=True)
    opt = th.optim.Adam([wt], lr=0.002)
    sched = th.optim.lr_scheduler.ReduceLROnPlateau(
        opt, "max", patience=5, factor=0.5)
    ours = PlateauScheduler(0.002, patience=5, factor=0.5)

    for m in metrics:
        sched.step(float(m))
        our_lr = ours.step(float(m))
        torch_lr = opt.param_groups[0]["lr"]
        assert our_lr == pytest.approx(torch_lr, rel=1e-9), \
            f"lr diverged at metric {m}"
