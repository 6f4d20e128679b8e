"""Phase decomposition of the megakernel forward via config sweeps.

Where does a veach forward lane-second go? Sweeping max_depth isolates the
marginal cost per bounce; nee="all" (4 sphere-light NEE blocks: sample +
eval + occlusion sweep each) vs nee="single" (one switch-picked block)
isolates the NEE share of a bounce. Honest tunnel timing: steady-state
marginal over pipelined launches, completion forced by a host value fetch
(see CLAUDE.md / benchmarks/bf16_probe.py).

Run on the TPU:  timeout 3600 python benchmarks/phase_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

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

    def bench(depth, nee):
        cfg = wf.KernelConfig(max_depth=depth, rows=16, nee=nee)
        tracer = wf.make_pallas_tracer(scene, cfg)

        @jax.jit
        def fwd(seed):
            return jnp.sum(tracer(scene, o, d, seed))

        dt = _marginal(lambda i: fwd(jnp.int32(11 + i)))
        print(json.dumps({"depth": depth, "nee": nee,
                          "ms": round(dt * 1e3, 2),
                          "mrays_per_s": round(LANES / dt / 1e6, 1)}),
              flush=True)
        return dt

    for depth in (0, 1, 2, 3, 5):
        bench(depth, "all")
    bench(5, "single")


if __name__ == "__main__":
    main()
