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
# opt-in extras: get_params(scene, TRAINABLE + ("mat_exponent",)).
# mat_exponent (Phong glossiness) differentiates through the jnp engines —
# the lobe value (e+2)/2pi cos^e carries the gradient while the sample map
# and pdf stay detached (bsdf.py::sample_local) — unbiased by the same
# detached-sampling argument as the color parameters.
#
# Texture leaves (scenes built with textures): "tex_color_a" / "tex_color_b"
# (checker colors) and "tex_image" (the texel atlas — bilinear lookup is
# linear in the texels, so per-texel gradients are exact; inverse rendering
# can recover a painted texture, see cli/inverse --mode texture).

_TEX_ALIASES = {"tex_color_a": "color_a", "tex_color_b": "color_b",
                "tex_image": "image"}

_SOFTPLUS_FLOOR = 1e-6   # zero-emission rows map to a finite theta (~-13.8)


def make_codec(param_spaces: dict | None):
    """(encode, decode) pytree maps between natural parameter space and the
    optimization space.

    `param_spaces` maps a parameter name to "linear" (identity, default) or
    "log" (softplus: p = log(1+e^theta)). Log space conditions emission
    recovery: area-light radiance is O(25) while albedos are O(1)
    (ky.cpp:3365 vs 3273-3282), so a shared Adam step in linear space either
    crawls on emission or overshoots color; in log space the step is
    multiplicative and one learning rate serves both. Rows at exactly 0
    (non-emitting surfaces) get theta = softplus^{-1}(1e-6) with a ~1e-6
    forward derivative — note this suppresses their GRADIENT, not the
    optimizer step: Adam's per-parameter normalization can still walk a
    consistently-signed tiny gradient up over many hundreds of steps, so
    for long runs keep structurally-zero emitters out of the trainable set
    (optax.masked, or a restricted `names=` in make_train_step) rather
    than relying on the floor."""
    spaces = param_spaces or {}

    def _enc_one(name, p):
        if spaces.get(name) == "log":
            q = jnp.maximum(p, _SOFTPLUS_FLOOR)
            # softplus^{-1}(q) = log(expm1(q)), stable form
            return jnp.where(q > 20.0, q, jnp.log(jnp.expm1(q)))
        return p

    def _dec_one(name, th):
        if spaces.get(name) == "log":
            return jnp.logaddexp(th, 0.0)   # softplus, overflow-safe
        return th

    def encode(params):
        return {n: _enc_one(n, p) for n, p in params.items()}

    def decode(theta):
        return {n: _dec_one(n, t) for n, t in theta.items()}

    return encode, decode


def get_params(scene: Scene, names=TRAINABLE) -> dict:
    out = {}
    for n in names:
        if n in _TEX_ALIASES:
            out[n] = getattr(scene.textures, _TEX_ALIASES[n])
        else:
            out[n] = getattr(scene, n)
    return out


def set_params(scene: Scene, params: dict) -> Scene:
    updates = dict(params)
    tex_updates = {leaf: updates.pop(name)
                   for name, leaf in _TEX_ALIASES.items() if name in updates}
    if tex_updates:
        updates["textures"] = dataclasses.replace(scene.textures,
                                                  **tex_updates)
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
