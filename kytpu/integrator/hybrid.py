"""Hybrid big-scene integrator: fast-engine transport + Pallas sweeps +
alive-compaction (see kytpu/kernels/hybrid.py for the architecture note).

The estimator is IDENTICAL to kytpu.integrator.fast.li_path_fast — same
single-sample MIS, same RNG discipline (per-lane keys; every lane's draws
depend only on its key and the bounce), same RR rule — so the two engines
converge to the same image; the only differences are the geometry
primitives (Pallas table sweeps instead of the jnp chunked sweep) and the
control flow (an unrolled per-bounce loop with lane partitioning instead
of one lax.scan). Per-lane math is order-independent, so the partition
never changes any lane's radiance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from kytpu import bsdf as kbsdf
from kytpu.core import math as km
from kytpu.integrator import fast as kfast
from kytpu.light import lights as klights
from kytpu.scene import scene as kscene
from kytpu.scene import shapes as kshapes

_sg = jax.lax.stop_gradient


def _partition_by(alive, tree):
    """Stable alive-first permutation of every (N, ...) leaf. Pure XLA
    (cumsum + one scatter + per-leaf gathers); static shapes."""
    n = alive.shape[0]
    a = alive.astype(jnp.int32)
    na = jnp.cumsum(a)
    total = na[-1]
    dest = jnp.where(alive, na - 1, total + jnp.cumsum(1 - a) - 1)
    inv = jnp.zeros((n,), jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32))
    return jax.tree.map(lambda x: x[inv], tree)


def _bind_hit(b, o, d, t, alive):
    """Surface binding for sweep winners. The binding columns arrive
    FROM the closest-hit kernel (resolved in-kernel over the winner-row
    range — a per-lane XLA gather of the same table costs ~27 ms per 1M
    lanes on v5e); this is pure elementwise math applying the
    orientation/emission rules of scene.py:163-190 /
    shapes.surface_normal. Misses carry all-zero columns (masked by
    `valid`, like scene.intersect's sid=0 gathers)."""
    valid = alive & jnp.isfinite(t)
    from kytpu.kernels.hybrid import (
        B_FLAG, B_LIX, B_KIND, B_EXP, B_ETA, B_DPROB, B_SPROB, B_SID)
    t_safe = jnp.where(valid, t, 1.0)
    position = o + t_safe[:, None] * d
    flag = b[:, B_FLAG]
    noc = b[:, 0:3]
    # planar: stored normal (rects flip toward the ray, ky.cpp:1289);
    # sphere: outward geometric normal (ky.cpp:1389)
    n_sp = km.normalize(position - noc)
    flip = (flag == 1.0) & (km.dot(noc, d) > 0)
    n_pl = jnp.where(flip[:, None], -noc, noc)
    normal = jnp.where((flag == 2.0)[:, None], n_sp, n_pl)
    wo = -d
    facing = km.dot(normal, wo) > 0.0
    emission = jnp.where((valid & facing)[:, None], b[:, 4:7], 0.0)
    light_index = jnp.where(valid, b[:, B_LIX].astype(jnp.int32), -1)
    sid = b[:, B_SID].astype(jnp.int32)
    hit = kscene.Hit(t=t, valid=valid, position=position, normal=normal,
                     wo=wo, sid=sid, emission=emission,
                     light_index=light_index,
                     uv=jnp.zeros((o.shape[0], 2), o.dtype))
    mat = dict(kind=b[:, B_KIND].astype(jnp.int32),
               diffuse=b[:, 9:12], specular=b[:, 12:15],
               exponent=b[:, B_EXP], eta=b[:, B_ETA],
               d_prob=b[:, B_DPROB], s_prob=b[:, B_SPROB])
    return hit, mat


def li_path_hybrid(scene, o, d, keys, cfg: kfast.FastConfig,
                   index=None, kcfg=None, interpret: bool = False,
                   repartition: bool = False):
    """Radiance for a batch of primary rays; (N, 3). Table-eligible
    scenes only (raises NotImplementedError otherwise, like the bigscene
    kernel)."""
    from kytpu.kernels import hybrid as khyb
    from kytpu.kernels import wavefront as kwf

    if cfg.sampler == "sobol" and index is None:
        raise ValueError("hybrid engine: sampler='sobol' needs the "
                         "per-lane sample index")
    kcfg = kcfg or kwf.KernelConfig()
    closest, any_hit, _, own_row = khyb.make_sweeps(scene, kcfg, interpret)

    n = o.shape[0]
    f32 = o.dtype
    L = scene.n_lights
    n_draws = 2 * L + 4
    env_i = kfast._env_index(scene)
    if index is None:
        index = jnp.zeros((n,), jnp.int32)

    state = dict(
        o=o, d=d,
        beta=jnp.ones((n, 3), f32),
        big_l=jnp.zeros((n, 3), f32),
        alive=jnp.ones((n,), bool),
        prev_n=-d,
        spec_prev=jnp.zeros((n,), bool),
        pdf_prev=jnp.ones((n,), f32),
        keys=keys,
        index=index,
        lane=jnp.arange(n, dtype=jnp.int32),
    )

    for bounce in range(cfg.max_depth + 1):
        o = state["o"]
        d = state["d"]
        beta = state["beta"]
        big_l = state["big_l"]
        alive = state["alive"]
        prev_n = state["prev_n"]
        spec_prev = state["spec_prev"]
        pdf_prev = state["pdf_prev"]
        keys = state["keys"]

        t, bind_cols = closest(o, d, alive)
        hit, mat = _bind_hit(bind_cols, o, d, t, alive)
        if cfg.sampler == "sobol":
            u = _sg(kfast._draws_sobol(keys, bounce, L, state["index"]))
        else:
            u = _sg(kfast._draws(keys, bounce, n_draws, cfg.sampler))

        # ---- emission with BSDF-side MIS weight (fast.py:115-130) ----
        le = jnp.where(hit.valid[:, None], hit.emission, 0.0)
        pdf_l_hit = _sg(kfast._hit_light_pdf(scene, o, prev_n, d,
                                             hit.light_index))
        full = (bounce == 0) | spec_prev
        w_emit = jnp.where(full, 1.0,
                           km.safe_div(pdf_prev, pdf_prev + pdf_l_hit))
        big_l = big_l + jnp.where(alive[:, None],
                                  beta * le * w_emit[:, None], 0.0)
        if env_i is not None:
            le_env = scene.env_radiance(n)
            pdf_env = _sg(klights.pdf_li(scene.lights, env_i, o, prev_n, d))
            w_env = jnp.where(full, 1.0,
                              km.safe_div(pdf_prev, pdf_prev + pdf_env))
            big_l = big_l + jnp.where(
                (alive & ~hit.valid)[:, None],
                beta * le_env * w_env[:, None], 0.0)

        cont = alive & hit.valid & (bounce < cfg.max_depth)

        # ---- resolve material (fast.py:134-141; cols from the same
        # binding gather) ----
        params = kbsdf.resolve_bsdf(
            mat["kind"], mat["diffuse"], mat["specular"], mat["exponent"],
            mat["eta"], mat["d_prob"], mat["s_prob"], u[:, 0])
        delta = kbsdf.is_delta(params)
        nee_act = cont & ~delta

        # ---- light-side NEE, batched shadow sweep (fast.py:144-191) ----
        if L:
            contribs = []
            sh_o, sh_d, sh_t, sh_skip = [], [], [], []
            for i, kind in enumerate(scene.lights.kinds):
                u2 = u[:, 1 + 2 * i:3 + 2 * i]
                ls = klights.sample_li(scene.lights, i, scene.world_radius,
                                       hit.position, hit.normal, u2)
                wi = _sg(ls.wi)
                pdf_l = _sg(ls.pdf)
                f_cos = kbsdf.eval_world(params, hit.normal, hit.wo, wi) \
                    * km.absdot(wi, hit.normal)[:, None]
                if klights.is_delta_light(kind):
                    w = km.safe_div(1.0, pdf_l)
                else:
                    pdf_b = _sg(kbsdf.pdf_world(params, hit.normal,
                                                hit.wo, wi))
                    w = km.safe_div(1.0, pdf_l + pdf_b)
                ok = nee_act & (pdf_l > 0.0) \
                    & ~jnp.all(ls.li <= 0.0, axis=-1) \
                    & ~jnp.all(f_cos <= 0.0, axis=-1)
                contribs.append((ok, f_cos * ls.li * w[:, None]))
                o_i = kshapes.offset_ray_origin(hit.position, hit.normal,
                                                wi)
                sh_o.append(o_i)
                sh_d.append(wi)
                d_from = o_i if cfg.shadow == "robust" else hit.position
                sh_t.append(km.distance(d_from, ls.position)
                            - km.SHADOW_EPSILON)
                # robust mode excludes the light's own emitting surface
                # from the shadow sweep (fast.py skip_row / bigscene
                # own_geo semantics) — the offset-origin tmax would
                # otherwise let area lights self-occlude
                skip_i = own_row.get(i, -1) if cfg.shadow == "robust" \
                    else -1
                sh_skip.append(jnp.full((n,), np.float32(skip_i)))
            oc_o = jnp.concatenate(sh_o, 0)
            oc_d = jnp.concatenate(sh_d, 0)
            oc_t = jnp.concatenate(sh_t, 0)
            oc_skip = jnp.concatenate(sh_skip, 0)
            oc_act = jnp.concatenate(
                [ok for ok, _ in contribs], 0)
            occ = any_hit(oc_o, oc_d, oc_t, oc_act, oc_skip).reshape(L, n)
            ld = jnp.zeros((n, 3), f32)
            for i, (ok, c) in enumerate(contribs):
                ld = ld + jnp.where((ok & ~occ[i])[:, None], c, 0.0)
            big_l = big_l + beta * ld

        # ---- extension ray + RR (fast.py:193-219) ----
        bsm = kbsdf.sample_world(params, hit.normal, hit.wo,
                                 u[:, 2 * L + 1:2 * L + 3])
        wi = _sg(bsm.wi)
        pdf = _sg(bsm.pdf)
        ok = cont & ~jnp.all(bsm.f <= 0.0, axis=-1) & (pdf != 0.0)
        throughput = bsm.f * km.safe_div(km.absdot(wi, hit.normal),
                                         pdf)[:, None]
        beta_new = beta * throughput
        q = _sg(jnp.maximum(0.05, 1.0 - km.max_component(beta_new)))
        rr_on = bounce > cfg.rr_start
        kill = rr_on & (u[:, 2 * L + 3] < q)
        beta_new = beta_new * jnp.where(rr_on, km.safe_div(1.0, 1.0 - q),
                                        1.0)[:, None]
        alive_n = ok & ~kill
        sel = alive_n[:, None]

        state = dict(
            o=jnp.where(sel, kshapes.offset_ray_origin(
                hit.position, hit.normal, wi), o),
            d=jnp.where(sel, wi, d),
            beta=jnp.where(sel, beta_new, beta),
            big_l=big_l,
            alive=alive_n,
            prev_n=jnp.where(sel, hit.normal, prev_n),
            spec_prev=jnp.where(alive_n, bsm.delta, spec_prev),
            pdf_prev=jnp.where(alive_n, pdf, pdf_prev),
            keys=keys,
            index=state["index"],
            lane=state["lane"],
        )
        # Lane death is spatially clustered (whole sky/miss regions die
        # together) and lanes arrive pixel-ordered, so the sweep kernels'
        # whole-tile dead skip already captures most of the compaction win
        # for free. An explicit alive-first permutation (repartition=True)
        # packs the stragglers too, but XLA's 1M-row gathers cost ~200 ms
        # per bounce on v5e (measured) — far more than they save; off by
        # default until a DMA-based in-kernel pack exists.
        if repartition and bounce < cfg.max_depth:
            state = _partition_by(state["alive"], state)

    # restore original lane order
    out = jnp.zeros((n, 3), f32).at[state["lane"]].set(state["big_l"])
    return out


def render_hybrid(scene, spp: int = 16, seed: int = 1234, cfg=None,
                  clamp: bool = True, rays_per_pass: int = 1 << 20,
                  kcfg=None, interpret: bool = False):
    """Full-frame render through the hybrid engine -> (H, W, 3).

    Same chunked-pass structure and RNG construction as the fast engine
    under integrator.render (per-lane keys folded from (seed, sample,
    pixel)), so at matched seeds it converges to the same image."""
    import numpy as np

    from kytpu.core import rng as krng

    cfg = cfg if isinstance(cfg, kfast.FastConfig) else kfast.FastConfig(
        max_depth=getattr(cfg, "max_depth", 5),
        sampler=getattr(cfg, "sampler", "random"),
        shadow=getattr(cfg, "shadow", "parity"))
    cam = scene.camera
    w, h = cam.width, cam.height
    npix = w * h
    key = krng.root_key(seed)
    k = max(1, min(spp, rays_per_pass // max(npix, 1)))
    pid = jnp.tile(jnp.arange(npix, dtype=jnp.int32), k)
    px0 = (pid % w).astype(jnp.float32)
    py0 = (pid // w).astype(jnp.float32)

    # scene stays a closure constant: the sweep builder extracts host-side
    # tables from it (concrete values), which a traced argument would break
    @jax.jit
    def one_pass(s_base):
        sid = s_base + jnp.repeat(jnp.arange(k, dtype=jnp.int32), npix)
        if cfg.sampler == "sobol":
            keys = jax.vmap(lambda p: jax.random.fold_in(key, p))(pid)
            index = sid
        else:
            keys = jax.vmap(
                lambda s_, p_: jax.random.fold_in(
                    jax.random.fold_in(key, s_), p_))(sid, pid)
            index = None
        # identical construction to render.trace_lanes: camera jitter from
        # the first split channel, transport keys from the second
        k_cam, k_path = krng.split_channels(keys, 2)
        u = krng.uniform2(k_cam, cfg.sampler, index)
        o, d = kscene.generate_rays(
            cam, jnp.stack([px0 + u[:, 0], py0 + u[:, 1]], -1))
        out = li_path_hybrid(scene, o, d, k_path, cfg, index=index,
                             kcfg=kcfg, interpret=interpret)
        return out.reshape(k, npix, 3).sum(axis=0)

    accum = jnp.zeros((npix, 3), jnp.float32)
    s0 = 0
    while s0 < spp:
        accum = accum + one_pass(jnp.int32(s0))
        s0 += k
    img = (accum / np.float32(spp)).reshape(h, w, 3)
    if clamp:
        img = jnp.clip(img, 0.0, 1.0)
    return img
