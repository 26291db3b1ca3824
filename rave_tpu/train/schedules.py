"""Training schedules as pure functions of the step counter.

The reference implements these as stateful Lightning callbacks
(``rave/model.py:50-111``: WarmupCallback, QuantizeCallback,
BetaWarmupCallback) whose counters must be checkpointed; here they are
pure ``f(step, cfg)`` so resume is trivially exact.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import RAVEConfig


def warmed_up(step, cfg: RAVEConfig):
    """Discriminators activate after phase 1 (reference model.py:56-59)."""
    return step >= cfg.phase_1_duration


def quantize_enabled(step, cfg: RAVEConfig):
    """RVQ enable gate (reference QuantizeCallback, model.py:69-80):
    ``warmup_quantize=-1`` means enabled from the start."""
    if cfg.warmup_quantize is None:
        return jnp.asarray(True)
    return step >= cfg.warmup_quantize


def beta_factor(step, cfg: RAVEConfig):
    """Log-space beta warmup (reference BetaWarmupCallback,
    model.py:94-105)."""
    t = jnp.clip((step + 1) / cfg.beta_warmup_len, 0.0, 1.0)
    log_beta = (jnp.log(cfg.beta_initial) * (1 - t)
                + jnp.log(cfg.beta_target) * t)
    return jnp.where((step + 1) >= cfg.beta_warmup_len,
                     cfg.beta_target, jnp.exp(log_beta))


def is_discriminator_step(step, cfg: RAVEConfig):
    """Reference model.py:543-544: D trains on every
    ``update_discriminator_every``-th batch once warmed."""
    return warmed_up(step, cfg) & (step % cfg.update_discriminator_every == 0)
