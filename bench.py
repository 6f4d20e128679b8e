"""Headline benchmark: rays/s/chip, forward+backward, Veach MIS @ 256 spp.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so vs_baseline is measured
against a pinned aspirational target from BASELINE.json-era planning:
50 Mrays/s/chip forward+backward. The metric counts PRIMARY rays; every
primary ray carries the full path workload (up to max_depth bounces, each
with both-MIS NEE = 2 extra scene sweeps per light per bounce).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

TARGET_RAYS_PER_S = 50e6


def main():
    from kytpu.scene import builders
    from kytpu.integrator import fast as kfast
    from kytpu.integrator.render import trace_lanes
    from kytpu.diff.params import get_params, set_params

    w, h = 512, 308
    spp = 256
    cfg = kfast.FastConfig(max_depth=5)
    scene = builders.veach_mis(width=w, height=h)
    key = jax.random.key(1234)

    lanes = 1 << 18  # rays per pass; full frame = many passes
    npix = w * h

    def fwd_bwd(params, key, pid, sid):
        def loss(p):
            sc = set_params(scene, p)
            px = (pid % w).astype(jnp.float32)
            py = (pid // w).astype(jnp.float32)
            out = trace_lanes(sc, key, px, py, pid, sid, cfg, "fast", None)
            return jnp.sum(out) / lanes
        l, g = jax.value_and_grad(loss)(params)
        return l, g

    step = jax.jit(fwd_bwd)
    params = get_params(scene)

    pid0 = jnp.arange(lanes, dtype=jnp.int32) % npix
    sid0 = jnp.zeros(lanes, jnp.int32)

    # warmup/compile
    jax.block_until_ready(step(params, key, pid0, sid0))

    n_passes = max(2, min(8, (npix * spp) // lanes // 16))
    t0 = time.perf_counter()
    total = 0
    for i in range(n_passes):
        pid = (pid0 + i * lanes) % npix
        sid = jnp.full((lanes,), i, jnp.int32)
        jax.block_until_ready(step(params, key, pid, sid))
        total += lanes
    dt = time.perf_counter() - t0

    rays_per_s = total / dt
    print(json.dumps({
        "metric": "veach_mis_fwd_bwd_rays_per_s_per_chip",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / TARGET_RAYS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
