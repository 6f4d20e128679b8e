"""Sub-phase decomposition of the NEE block via trace-time ablation.

The kernel body is built at trace time from python helpers, so
monkeypatching a helper with a cheap stand-in and recompiling isolates that
helper's cycle share (the stand-in keeps shapes/selects so downstream code
compiles unchanged). Ablated kernels are WRONG — this is a profiler, not a
renderer. Honest tunnel timing per CLAUDE.md.

Run on the TPU:  timeout 3600 python benchmarks/nee_share_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"))

W, H, LANES = 512, 308, 1 << 22


def _marginal(fn, n=6):
    float(jnp.ravel(fn(0))[0])

    def run(k, base):
        float(jnp.ravel(fn(base))[0])
        t0 = time.perf_counter()
        v = None
        for i in range(k):
            v = fn(base + 1 + i)
        float(jnp.ravel(v)[0])
        return time.perf_counter() - t0

    return (run(n + 1, 200) - run(1, 100)) / n


def main():
    from kytpu.kernels import wavefront as wf
    from kytpu.kernels.v3 import V3
    from kytpu.scene import builders, scene as kscene

    scene = builders.veach_mis(width=W, height=H)
    npix = W * H
    key = jax.random.key(0)
    u = jax.random.uniform(key, (LANES, 2))
    pid = jnp.arange(LANES, dtype=jnp.int32) % npix
    px = (pid % W).astype(jnp.float32) + u[:, 0]
    py = (pid // W).astype(jnp.float32) + u[:, 1]
    o, d = kscene.generate_rays(scene.camera, jnp.stack([px, py], -1))
    jax.block_until_ready((o, d))

    def bench(tag, extra=0):
        wf._TRACER_MEMO.clear()
        cfg = wf.KernelConfig(max_depth=5, rows=16)
        tracer = wf.make_pallas_tracer(scene, cfg)

        @jax.jit
        def fwd(seed):
            return jnp.sum(tracer(scene, o, d, seed))

        dt = _marginal(lambda i: fwd(jnp.int32(11 + i)))
        print(json.dumps({"ablate": tag, "ms": round(dt * 1e3, 2),
                          "mrays_per_s": round(LANES / dt / 1e6, 1)}),
              flush=True)
        return dt

    orig_any_multi = wf._any_hit_multi
    orig_eval = wf._bsdf_eval_pdf_dots
    orig_lsample = wf._light_sample
    orig_closest = wf._closest_hit

    bench("none")

    # occlusion sweep -> constant false masks
    def no_occ(static, hp, n_shade, rays, skips, robust=False,
               sphere_skips=None, nd=None):
        f = rays[0][1] < rays[0][1] - 1.0
        return [f for _ in rays]
    wf._any_hit_multi = no_occ
    bench("occlusion")
    wf._any_hit_multi = orig_any_multi

    # NEE bsdf eval -> cheap constant-unit eval (keeps shapes)
    def cheap_eval(kind, exponent, wo_z, wi_z, cos_alpha, lobes=None,
                   static_exp=None):
        c = jnp.abs(wi_z) * np.float32(0.3)
        return c, c
    wf._bsdf_eval_pdf_dots = cheap_eval
    bench("nee_eval")
    wf._bsdf_eval_pdf_dots = orig_eval

    # light sampling -> varying-but-cheap direction/pdf (keeps the
    # downstream eval/occlusion from constant-folding away)
    def cheap_sample(lt, world_radius, p, n_shade, u1, u2, azim=None):
        wi = V3(u1 * 0.01, u1 * 0.0 + 1.0, u2 * 0.01)
        return (wi, u1 + 1.0, jnp.ones_like(u1), u2 + 5.0,
                jnp.zeros_like(u1))
    wf._light_sample = cheap_sample
    bench("light_sample")
    wf._light_sample = orig_lsample

    # closest hit -> plane z: t = const, sid = 0
    def cheap_closest(static, o, d):
        t = jnp.abs(d.y) + 1.0
        sid = jnp.zeros(o.x.shape, jnp.int32)
        nrm = V3(t * 0.0, t * 0.0 + 1.0, t * 0.0)
        return t, sid, sid >= 0, nrm
    wf._closest_hit = cheap_closest
    bench("closest_hit")
    wf._closest_hit = orig_closest


if __name__ == "__main__":
    main()
