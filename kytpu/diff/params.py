"""Trainable-parameter views of a Scene.

The reference has no notion of parameters — materials are hardwired structs
(ky.cpp:3273-3282). For inverse rendering the differentiable leaves are the
material color tables and the light emission; `get_params` extracts them as
a flat dict (an optax-compatible pytree) and `set_params` writes them back,
keeping the two places area-light radiance lives (the per-surface emission
table used at hit time, scene.emission, and the light table used by NEE,
scene.lights.emit) consistent from the single "emission" parameter.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from kytpu.scene.scene import Scene

TRAINABLE = ("mat_diffuse", "mat_specular", "emission")


def get_params(scene: Scene, names=TRAINABLE) -> dict:
    return {n: getattr(scene, n) for n in names}


def set_params(scene: Scene, params: dict) -> Scene:
    updates = dict(params)
    if "emission" in updates:
        em = updates["emission"]
        lights = scene.lights
        sids = jnp.asarray(
            [max(s, 0) for s in lights.surface_ids], jnp.int32)
        has_surface = jnp.asarray(
            [s >= 0 for s in lights.surface_ids])[:, None]
        new_emit = jnp.where(has_surface, em[sids], lights.emit)
        updates["lights"] = dataclasses.replace(lights, emit=new_emit)
    return dataclasses.replace(scene, **updates)
