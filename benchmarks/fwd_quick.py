"""Quick single-config veach forward rate (honest tunnel timing).

timeout 1800 python benchmarks/fwd_quick.py [depth]
"""

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


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 16
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

    tracer = wf.make_pallas_tracer(scene, wf.KernelConfig(max_depth=depth,
                                                          rows=rows))

    @jax.jit
    def fwd(seed):
        return jnp.sum(tracer(scene, o, d, seed))

    def run(k, base):
        float(jnp.ravel(fwd(jnp.int32(base)))[0])
        t0 = time.perf_counter()
        v = None
        for i in range(k):
            v = fwd(jnp.int32(base + 1 + i))
        float(jnp.ravel(v)[0])
        return time.perf_counter() - t0

    float(jnp.ravel(fwd(jnp.int32(0)))[0])
    n = 6
    dt = (run(n + 1, 200) - run(1, 100)) / n
    print(json.dumps({"depth": depth, "rows": rows, "ms": round(dt * 1e3, 2),
                      "mrays_per_s": round(LANES / dt / 1e6, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
