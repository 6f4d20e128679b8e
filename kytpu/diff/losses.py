"""Image losses for inverse rendering."""

from __future__ import annotations

import jax.numpy as jnp


def mse(img, target):
    return jnp.mean((img - target) ** 2)


def relmse(img, target, eps: float = 1e-2):
    """Relative MSE — the standard inverse-rendering loss: normalizes by the
    target intensity so bright emitters don't dominate albedo gradients."""
    return jnp.mean((img - target) ** 2 / (target ** 2 + eps))


def l1(img, target):
    return jnp.mean(jnp.abs(img - target))
