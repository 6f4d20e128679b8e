"""Finite-difference validation of rendering gradients.

The BASELINE.md correctness metric: pixel gradients of the Monte Carlo
render must match central finite differences of the *same* estimator at the
*same* seed (common random numbers make the FD noise cancel exactly, so the
comparison is tight even at low spp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from kytpu.diff.params import get_params, set_params


def fd_gradient(f, params: dict, name: str, index, eps: float = 1e-3):
    """Central finite difference of scalar f(params) w.r.t. params[name][index]."""
    def shifted(sign):
        p = dict(params)
        p[name] = p[name].at[index].add(sign * eps)
        return f(p)
    return (shifted(+1.0) - shifted(-1.0)) / (2.0 * eps)


def check_gradients(scene, loss_of_scene, probes, eps: float = 1e-3):
    """Compare autodiff vs FD at given probes.

    loss_of_scene: scene -> scalar (must be deterministic given its closure,
    i.e. fixed key). probes: list of (param_name, index_tuple).
    Returns list of (name, index, autodiff, fd).
    """
    params = get_params(scene)

    def f(p):
        return loss_of_scene(set_params(scene, p))

    grads = jax.grad(f)(params)
    out = []
    for name, idx in probes:
        ad = float(grads[name][idx])
        fd = float(fd_gradient(f, params, name, idx, eps))
        out.append((name, idx, ad, fd))
    return out
