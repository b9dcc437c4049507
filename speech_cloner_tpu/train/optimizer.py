"""Optimizer: Adam with the reference's epoch-indexed LR decay.

Reference semantics (encoder.py:162-194 / decoder.py:227-263):
  lr(epoch) = lr_start / (1 + decay * epoch), assigned once per epoch;
  Adam(beta1=0.9, beta2=0.999, eps=1e-8).

The schedule state (step, epoch) lives in the TrainState pytree so
checkpoint/resume restores the schedule exactly, like the reference kept
them as graph variables (encoder.py:164-169).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 1e-3
    decay: float = 1e-3           # epoch-indexed decay factor
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-8

    def make(self) -> optax.GradientTransformation:
        # scale_by_adam(eps_root=0) matches TF AdamOptimizer's update form
        # m_hat / (sqrt(v_hat) + eps) (SURVEY.md §2.1 C10).
        return optax.scale_by_adam(b1=self.beta1, b2=self.beta2, eps=self.epsilon)

    def lr_at(self, epoch):
        return self.learning_rate / (1.0 + self.decay * epoch)


def make_train_state(params, model_state, opt_cfg: OptimizerConfig, rng) -> dict[str, Any]:
    """TrainState as a plain pytree: jit/pjit/checkpoint friendly."""
    return {
        "params": params,
        "model_state": model_state,
        "opt_state": opt_cfg.make().init(params),
        "step": jnp.zeros((), jnp.int32),
        "epoch": jnp.zeros((), jnp.int32),
        "rng": rng,
    }


def apply_updates(ts, grads, new_model_state, opt_cfg: OptimizerConfig, opt):
    """One optimizer step: Adam-scaled updates times the epoch-indexed LR."""
    lr = opt_cfg.lr_at(ts["epoch"].astype(jnp.float32))
    updates, new_opt_state = opt.update(grads, ts["opt_state"], ts["params"])
    new_params = jax.tree.map(lambda p, u: p - lr * u, ts["params"], updates)
    return {
        "params": new_params,
        "model_state": new_model_state,
        "opt_state": new_opt_state,
        "step": ts["step"] + 1,
        "epoch": ts["epoch"],
        "rng": ts["rng"],
    }, lr


def next_epoch(ts):
    return {**ts, "epoch": ts["epoch"] + 1}
