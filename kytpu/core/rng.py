"""Counter-based RNG plumbing.

Replaces the reference's cloned mt19937 samplers (ky.cpp:829-985). The
reference has two RNG defects the functional design makes impossible by
construction (SURVEY.md §5): every row re-seeds to 1234 so all rows draw the
identical stream, and `plastic_material_t` shares one mutable rng across
threads. Here every (pixel, sample, bounce, purpose) tuple owns an
independent threefry stream derived by folding, so renders are reproducible
bitwise for a given root seed regardless of sharding or execution order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def sample_keys(key: jax.Array, pixel_ids: jax.Array, sample_id) -> jax.Array:
    """One key per ray: fold (pixel_id, sample_id) into the root key.

    pixel_ids: (N,) int32 flat pixel index; sample_id: scalar int.
    Returns a (N,) key array.
    """
    k = jax.random.fold_in(key, sample_id)
    return jax.vmap(lambda p: jax.random.fold_in(k, p))(pixel_ids)


def bounce_key(keys: jax.Array, bounce) -> jax.Array:
    """Derive the per-bounce key array from per-ray keys."""
    return jax.vmap(lambda k: jax.random.fold_in(k, bounce))(keys)


def split_channels(keys: jax.Array, n: int):
    """Split a (N,) key array into n per-purpose (N,) key arrays."""
    ks = jax.vmap(lambda k: jax.random.split(k, n))(keys)  # (N, n)
    return tuple(ks[:, i] for i in range(n))


def uniform(keys: jax.Array, shape_suffix=(), sampler: str = "random",
            index: jax.Array | None = None) -> jax.Array:
    """U[0,1) draw per key; result shape = keys.shape + shape_suffix.

    sampler="debug" reproduces the reference's debug_sampler_t
    (ky.cpp:922-947): every draw is the constant 0.5, making any single
    path fully deterministic — the cheapest bisection oracle.

    sampler="sobol" with `index` = (N,) per-lane sample ids draws from a
    per-key shuffled Owen-scrambled Sobol sequence (core/lds.py) instead of
    an independent stream: the key must then be sample-independent (fold
    only pixel/bounce/purpose — see render.trace_lanes), so that one
    pixel's samples walk one low-discrepancy point set.
    """
    if sampler == "debug":
        return jnp.full(keys.shape + shape_suffix, 0.5, jnp.float32)
    if sampler == "sobol" and index is not None:
        from kytpu.core import lds
        seeds = jax.vmap(lambda k: jax.random.bits(k, (3,)))(keys)
        if shape_suffix == ():
            return lds.owen_sobol1(index, seeds[:, 0], seeds[:, 1])
        assert shape_suffix == (2,), shape_suffix
        u0, u1 = lds.owen_sobol2(index, seeds[:, 0], seeds[:, 1],
                                 seeds[:, 2])
        return jnp.stack([u0, u1], axis=-1)
    return jax.vmap(lambda k: jax.random.uniform(k, shape_suffix))(keys)


def uniform2(keys: jax.Array, sampler: str = "random",
             index: jax.Array | None = None) -> jax.Array:
    return uniform(keys, (2,), sampler, index)


def stratum_grid(spp: int) -> tuple[int, int]:
    """Largest near-square (a, b) with a*b <= spp: the camera stratification
    grid (completes the reference's stratified_sampler_t stub, ky.cpp:978)."""
    a = int(spp ** 0.5)
    while a > 1 and spp % a:
        a -= 1
    return a, spp // a
