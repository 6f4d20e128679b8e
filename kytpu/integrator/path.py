"""Wavefront path integrators.

The reference implements five integrators as separate recursive/iterative
classes (ky.cpp:4094-4618). All of them are instances of one transport loop
with different gating, so here a single masked wavefront engine — a
`lax.scan` over bounces on a ray SoA — expresses every variant:

  variant "simple"    ~ simple_path_tracing_recursion_t (ky.cpp:4191-4238):
      BSDF sampling only, emission collected at every vertex, Russian
      roulette on the sampled f's max component after 3 bounces.
  variant "recursion" ~ path_tracing_recursion_t (ky.cpp:4305-4402):
      NEE at diffuse vertices; at specular vertices an extra one-bounce
      emission "peek" with an independent BSDF draw; emission otherwise only
      at bounce 0.
  variant "defered"   ~ path_tracing_recursion_defered_t (ky.cpp:4409-4514):
      NEE at diffuse vertices; specular direct lighting deferred via the
      prev-specular emission gate; f-max Russian roulette.
  variant "iteration" ~ path_tracing_iteration_t (ky.cpp:4523-4618), the
      production integrator: prev-specular emission gate, NEE each non-delta
      vertex, throughput q = max(.05, 1-beta_max) roulette after bounce 3.

All variants share `direct_sample_enum_t`-equivalent NEE strategies
(kytpu.light.nee). Control flow divergence (break / specular skip / RR) is
per-lane masking; the loop is a fixed-length scan so XLA compiles one fused
program per (scene shape, config).

Differentiability: sampled directions, pdfs, lobe/RR decisions are
stop_gradient-ed (detached sampling), leaving unbiased gradients w.r.t.
material colors, emission and light radiance.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from kytpu import bsdf as kbsdf
from kytpu.core import math as km
from kytpu.core import rng as krng
from kytpu.light import nee as knee
from kytpu.scene import scene as kscene
from kytpu.scene import shapes as kshapes

_sg = jax.lax.stop_gradient

VARIANTS = ("simple", "recursion", "defered", "iteration")


@dataclass(frozen=True)
class PathConfig:
    """Static integrator configuration (hashable; part of the jit key).

    Mirrors the reference's typed-enum config surface (SURVEY.md §5):
    integrator_enum_t -> variant, direct_sample_enum_t -> strategy +
    light_selection, max_path_depth -> max_depth.
    """

    max_depth: int = 5
    variant: str = "iteration"
    strategy: str = "both_mis"          # one of knee.STRATEGIES
    light_selection: str = "all"        # "all" | "single"
    rr_start: int = 3                   # roulette kicks in after this bounce
    unroll: int = 1                     # scan unroll factor (perf knob)
    sampler: str = "random"   # "random" | "stratified" | "debug" | "sobol"
    strata: tuple = (1, 1)              # camera strata grid for "stratified"
    filter: str = "box"                 # "box" | "tent" (smallpt's 2x2 tent)
    # "parity" replicates the reference's shadow-ray self-occlusion quirk
    # (ky.cpp:3193 + 614, see kytpu.scene.scene.occluded); "robust" measures
    # the shadow tmax from the actual offset origin (physically correct,
    # deviates from reference renders)
    shadow: str = "parity"              # "parity" | "robust"


def _black(f):
    return jnp.all(f <= 0.0, axis=-1)


def _gather_material(scene: kscene.Scene, hit):
    sid = hit.sid
    return (scene.mat_kind[sid], scene.diffuse_at(sid, hit.uv),
            scene.mat_specular[sid], scene.mat_exponent[sid],
            scene.mat_eta[sid], scene.mat_d_prob[sid], scene.mat_s_prob[sid])


def _resolve(scene, hit, k_lobe, sampler="random", index=None):
    mk, dif, spec, expo, eta, dp, sp = _gather_material(scene, hit)
    u_lobe = _sg(krng.uniform(k_lobe, sampler=sampler, index=index))
    return kbsdf.resolve_bsdf(mk, dif, spec, expo, eta, dp, sp, u_lobe)


def li_path(scene: kscene.Scene, o, d, keys, cfg: PathConfig, index=None):
    """Radiance for a batch of primary rays. o, d: (N,3); keys: (N,) PRNG.

    Returns (N, 3) radiance estimates (one sample per lane).

    With cfg.sampler="sobol", `keys` must be sample-independent (pixel-only
    folds) and `index` the per-lane sample ids: every (bounce, purpose)
    draw site then walks its own Owen-scrambled Sobol sequence
    (core/lds.py) over the pixel's samples.
    """
    n = o.shape[0]
    f32 = o.dtype

    emit_always = cfg.variant == "simple"
    emit_prev_spec = cfg.variant in ("defered", "iteration")
    use_nee = cfg.variant != "simple"
    spec_peek = cfg.variant == "recursion"
    rr_beta_q = cfg.variant == "iteration"

    def body(carry, bounce):
        o, d, beta, big_l, alive, prev_spec = carry

        hit = kscene.intersect(scene, o, d)
        le = jnp.where(hit.valid[:, None], hit.emission, scene.env_radiance(n))

        if emit_always:
            emit_gate = alive
        elif emit_prev_spec:
            emit_gate = alive & ((bounce == 0) | prev_spec)
        else:  # "recursion": emission only for camera rays
            emit_gate = alive & (bounce == 0)
        big_l = big_l + jnp.where(emit_gate[:, None], beta * le, 0.0)

        cont = alive & hit.valid & (bounce < cfg.max_depth)

        bkeys = krng.bounce_key(keys, bounce)
        k_lobe, k_nee, k_bsdf, k_rr, k_peek = krng.split_channels(bkeys, 5)
        params = _resolve(scene, hit, k_lobe, cfg.sampler, index)
        delta = kbsdf.is_delta(params)

        if use_nee:
            ld = knee.sample_all_lights(
                scene, hit, params, k_nee, cont & ~delta,
                cfg.strategy, cfg.light_selection, cfg.sampler, index,
                cfg.shadow)
            big_l = big_l + beta * ld

        if spec_peek:
            # path_tracing_recursion_t's specular branch (ky.cpp:4339-4350):
            # an independent BSDF draw whose next-hit emission is collected.
            pk = kbsdf.sample_world(
                params, hit.normal, hit.wo,
                _sg(krng.uniform2(k_peek, cfg.sampler, index)))
            wi_pk = _sg(pk.wi)
            # reference spawns WITHOUT origin offset here (ky.cpp:4343)
            h_pk = kscene.intersect(scene, hit.position, wi_pk)
            le_pk = jnp.where(h_pk.valid[:, None], h_pk.emission,
                              scene.env_radiance(n))
            contrib = pk.f * le_pk * km.safe_div(
                km.absdot(wi_pk, hit.normal), _sg(pk.pdf))[:, None]
            big_l = big_l + jnp.where((cont & delta)[:, None],
                                      beta * contrib, 0.0)

        # extension ray
        bs = kbsdf.sample_world(
            params, hit.normal, hit.wo,
            _sg(krng.uniform2(k_bsdf, cfg.sampler, index)))
        wi = _sg(bs.wi)
        pdf = _sg(bs.pdf)
        ok = cont & ~_black(bs.f) & (pdf != 0.0)

        throughput = bs.f * km.safe_div(km.absdot(wi, hit.normal), pdf)[:, None]
        u_rr = _sg(krng.uniform(k_rr, sampler=cfg.sampler, index=index))

        if rr_beta_q:
            # q = max(.05, 1 - beta_max) AFTER the throughput update
            # (ky.cpp:4601-4613)
            beta_new = beta * throughput
            q = _sg(jnp.maximum(0.05, 1.0 - km.max_component(beta_new)))
            rr_on = bounce > cfg.rr_start
            kill = rr_on & (u_rr < q)
            scale = jnp.where(rr_on, km.safe_div(1.0, 1.0 - q), 1.0)
            beta_new = beta_new * scale[:, None]
        else:
            # f-max roulette BEFORE the throughput update
            # (ky.cpp:4219-4226 / 4389-4397 / 4500-4509): continue with
            # probability min(f_max, 1) implicitly via u < f_max.
            f_max = _sg(km.max_component(bs.f))
            rr_on = bounce >= cfg.rr_start
            kill = rr_on & ~(u_rr < f_max)
            scale = jnp.where(rr_on, km.safe_div(1.0, f_max), 1.0)
            beta_new = beta * throughput * scale[:, None]

        alive_next = ok & ~kill
        beta_next = jnp.where(alive_next[:, None], beta_new, beta)
        o_next = jnp.where(alive_next[:, None],
                           kshapes.offset_ray_origin(hit.position, hit.normal, wi),
                           o)
        d_next = jnp.where(alive_next[:, None], wi, d)
        prev_spec_next = jnp.where(alive_next, bs.delta, prev_spec)
        return (o_next, d_next, beta_next, big_l, alive_next,
                prev_spec_next), None

    init = (o, d,
            jnp.ones((n, 3), f32),
            jnp.zeros((n, 3), f32),
            jnp.ones((n,), bool),
            jnp.zeros((n,), bool))
    (_, _, _, big_l, _, _), _ = jax.lax.scan(
        body, init, jnp.arange(cfg.max_depth + 1), unroll=cfg.unroll)
    return big_l


def li_direct_lighting(scene: kscene.Scene, o, d, keys, cfg: PathConfig,
                       index=None):
    """Emission + NEE only (direct_lighting_t, ky.cpp:4125-4155)."""
    n = o.shape[0]
    hit = kscene.intersect(scene, o, d)
    lo = jnp.where(hit.valid[:, None], hit.emission, scene.env_radiance(n))
    k_lobe, k_nee = krng.split_channels(keys, 2)
    params = _resolve(scene, hit, k_lobe, cfg.sampler, index)
    active = hit.valid & ~kbsdf.is_delta(params)
    ld = knee.sample_all_lights(scene, hit, params, k_nee, active,
                                cfg.strategy, cfg.light_selection,
                                cfg.sampler, index, cfg.shadow)
    return lo + ld


def li_aov(scene: kscene.Scene, o, d, keys, which: str):
    """Debug AOVs (debug_integrator_t, ky.cpp:4094-4123).

    which: "position" -> normalized hit position, "normal", or
    "basecolor" -> bsdf.eval(wo, n) (ky.cpp:4117).
    """
    hit = kscene.intersect(scene, o, d)
    if which == "position":
        out = km.normalize(hit.position)
    elif which == "normal":
        out = km.normalize(hit.normal)
    elif which == "basecolor":
        params = _resolve(scene, hit, keys)
        out = kbsdf.eval_world(params, hit.normal, hit.wo, hit.normal)
    else:
        raise ValueError(f"unknown AOV {which!r}")
    return jnp.where(hit.valid[:, None], out, 0.0)


def make_li(cfg: PathConfig | None = None, aov: str | None = None,
            direct_only: bool = False):
    """Factory mirroring create_integrator (ky.cpp:4621-4639)."""
    cfg = cfg or PathConfig()
    if aov is not None:
        return lambda scene, o, d, keys: li_aov(scene, o, d, keys, aov)
    if direct_only:
        return lambda scene, o, d, keys: li_direct_lighting(scene, o, d, keys, cfg)
    return lambda scene, o, d, keys: li_path(scene, o, d, keys, cfg)
