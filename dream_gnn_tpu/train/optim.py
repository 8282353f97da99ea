"""Optimizer + LR plateau schedule.

Reference: ``th.optim.Adam(lr, weight_decay)`` with
``clip_grad_norm_(1.0)`` before each step (train.py:217,297-300) and
``ReduceLROnPlateau('max', patience=500, factor=0.5)`` stepped on test
AUPR every eval (train.py:235,323).

torch-Adam weight decay is L2-added-to-gradient (not decoupled AdamW),
and the clip happens before the decay term is added, so the optax chain
is clip -> add_decayed_weights -> scale_by_adam.  The learning rate is
applied outside the chain so the host-side plateau scheduler can feed a
scalar into the jitted step (SURVEY.md §7.3.13).
"""

from __future__ import annotations

import optax


def make_optimizer(grad_clip: float, weight_decay: float):
    """LR-less transform; the step multiplies updates by -lr."""
    parts = []
    if grad_clip and grad_clip > 0:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay and weight_decay > 0:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    return optax.chain(*parts)


class PlateauScheduler:
    """torch ReduceLROnPlateau equivalent (mode='max', threshold_mode
    ='rel', threshold=1e-4, cooldown=0, min_lr=0)."""

    def __init__(self, lr: float, patience: int = 500, factor: float = 0.5,
                 threshold: float = 1e-4, min_lr: float = 0.0):
        self.lr = lr
        self.patience = patience
        self.factor = factor
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = float("-inf")
        self.num_bad = 0

    def step(self, metric: float) -> float:
        # torch is_better (mode='max', threshold_mode='rel'):
        # a > best * (1 + threshold); AUPR metrics are non-negative.
        if metric > self.best * (1.0 + self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr
