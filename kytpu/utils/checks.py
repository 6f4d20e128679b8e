"""Runtime validity checks — the reference's CHECK/LOG_VAST parity
(ky.cpp:61-126, 3719, 4593): radiance finiteness and sample validity, as
opt-in assertions so production renders pay nothing.

Enable with KYTPU_DEBUG=1 (env) or checks.enable(True). Inside jit use
`checked(x, "name")` which inserts a jax.debug-based finite check; on the
host use `validate_radiance`.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

_ENABLED = bool(int(os.environ.get("KYTPU_DEBUG", "0")))


def enable(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = on


def enabled() -> bool:
    return _ENABLED


def checked(x, name: str = "value"):
    """Identity, plus an in-graph finiteness check when debug is enabled
    (the reference's CHECK_DEBUG(Li.is_valid()), ky.cpp:3719)."""
    if not _ENABLED:
        return x

    def _report(bad_count):
        if int(bad_count):
            raise FloatingPointError(
                f"kytpu check failed: {name} has {int(bad_count)} "
                f"non-finite elements")

    bad = jnp.size(x) - jnp.isfinite(x).sum()
    jax.debug.callback(_report, bad)
    return x


def validate_radiance(img, name: str = "radiance") -> None:
    """Host-side postcondition: finite and non-negative."""
    a = np.asarray(img)
    n_nan = int(np.isnan(a).sum())
    n_inf = int(np.isinf(a).sum())
    n_neg = int((a < 0).sum())
    if n_nan or n_inf:
        raise FloatingPointError(
            f"{name}: {n_nan} NaN, {n_inf} inf values")
    if n_neg:
        raise ValueError(f"{name}: {n_neg} negative values")
