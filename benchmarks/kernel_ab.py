"""A/B re-measurement of megakernel knobs under honest tunnel timing.

The original knob choices (rows=16, sampler=random for fwd+bwd,
backward=replay-vs-residual) were made with per-call blocked timing that
silently added a ~27 ms host round-trip per launch, hiding differences
below that floor. This sweeps the knobs on the headline workload
(veach fwd+bwd, 4M lanes) with the steady-state marginal timer.

Results (2026-08-18, v5e) — every production choice stands:
    rows:     8 -> 136.2   16 -> 151.3   32 -> 150.1   Mrays/s
    sampler:  random 151.3 vs sobol 146.5 (sobol's 18% lower MSE costs 3%)
    backward: residual 151.3 vs replay 80.7 (coefficient cache is 1.9x)

Round-4 re-run (2026-08-20, after the ops/bounce cuts; rows default 24,
fwd sweep in BASELINE.md): sobol+residual 177.6 at rows=16 (random 186.7
— sobol now costs ~5%); random+replay 99.8 vs residual 187.8 (still
1.9x).

Run on the TPU:  timeout 3600 python benchmarks/kernel_ab.py
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
    """fn(i) -> jax value; steady-state marginal seconds per launch."""
    float(jnp.ravel(jax.tree.leaves(fn(0))[0])[0])

    def run(k, base):
        float(jnp.ravel(jax.tree.leaves(fn(base))[0])[0])
        t0 = time.perf_counter()
        v = None
        for i in range(k):
            v = fn(base + 1 + i)
        float(jnp.ravel(jax.tree.leaves(v)[0])[0])
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
    env0 = jnp.zeros(3, jnp.float32)
    args = (scene.mat_diffuse, scene.mat_specular, scene.emission)

    def bench_cfg(rows, sampler, backward):
        cfg = wf.KernelConfig(max_depth=5, rows=rows, sampler=sampler)
        tracer = wf.make_pallas_diff_tracer(scene, cfg, backward=backward)
        sob = (jnp.zeros(LANES, jnp.int32), pid) if sampler == "sobol" \
            else ()

        @jax.jit
        def fwd_bwd(diffuse, specular, emission, seed):
            def loss(dd, ss, ee):
                return jnp.sum(tracer(dd, ss, ee, env0, o, d, seed,
                                      *sob)) / LANES
            return jax.value_and_grad(loss, argnums=(0, 1, 2))(
                diffuse, specular, emission)

        dt = _marginal(lambda i: fwd_bwd(*args, jnp.int32(11 + i)))
        rate = LANES / dt
        print(json.dumps({"rows": rows, "sampler": sampler,
                          "backward": backward,
                          "mrays_per_s": round(rate / 1e6, 1)}), flush=True)
        return rate

    # sweep around the current production point (rows=16, random, residual)
    # (rows sweep measured 2026-08-18: 8 -> 136.2, 16 -> 151.3, 32 -> 150.1)
    bench_cfg(16, "sobol", "residual")
    bench_cfg(16, "random", "replay")


if __name__ == "__main__":
    main()
