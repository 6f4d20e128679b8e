"""Headline benchmark: rays/s/chip, forward+backward, Veach MIS @ 256 spp.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Measures the production path: the fused Pallas wavefront megakernel with
path-replay backprop (kytpu/kernels/wavefront.py), differentiating the
render w.r.t. the material/emission tables. Falls back to the jnp fast
integrator if the kernel cannot compile on the local backend.

The reference publishes no numbers (BASELINE.md), so vs_baseline is against
a pinned aspirational target: 50 Mrays/s/chip forward+backward. The metric
counts PRIMARY rays; every primary ray carries the full path workload
(depth-5 transport with per-light NEE + MIS).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"))

TARGET_RAYS_PER_S = 50e6
LANES = 1 << 22   # large batches amortize the per-launch overhead
W, H = 512, 308


def _rays(scene, n):
    from kytpu.scene import scene as kscene

    npix = W * H
    key = jax.random.key(0)
    u = jax.random.uniform(key, (n, 2))
    pid = jnp.arange(n, dtype=jnp.int32) % npix
    px = (pid % W).astype(jnp.float32) + u[:, 0]
    py = (pid // W).astype(jnp.float32) + u[:, 1]
    return kscene.generate_rays(scene.camera, jnp.stack([px, py], -1))


def _bench_kernel(scene):
    from kytpu.kernels import wavefront as wf

    # rows re-tuned round 4 (16 after the V3.dot folding: 196.4 vs 195.7
    # fwd+bwd against 24);
    # ROWS/BWD_ROWS env vars override for A/B sweeps
    tracer = wf.make_pallas_diff_tracer(scene, wf.KernelConfig(
        max_depth=5, rows=int(os.environ.get("ROWS", "16")),
        bwd_rows=int(os.environ.get("BWD_ROWS", "0"))))
    o, d = _rays(scene, LANES)
    jax.block_until_ready((o, d))

    env0 = (scene.env_radiance_ if scene.has_env
            else jnp.zeros(3, jnp.float32))

    @jax.jit
    def fwd_bwd(diffuse, specular, emission, seed):
        def loss(dd, ss, ee):
            return jnp.sum(tracer(dd, ss, ee, env0, o, d, seed)) / LANES
        return jax.value_and_grad(loss, argnums=(0, 1, 2))(
            diffuse, specular, emission)

    args = (scene.mat_diffuse, scene.mat_specular, scene.emission)
    jax.block_until_ready(fwd_bwd(*args, jnp.int32(1)))

    def run(n, base):
        # launches pipeline through the tunnel; only materializing a HOST
        # value forces completion (block_until_ready returns at dispatch,
        # measured 2026-08-18 — see benchmarks/bf16_probe.py), and the
        # device executes in-order so fetching the last loss drains all n
        v, _ = fwd_bwd(*args, jnp.int32(7))
        float(v)
        t0 = time.perf_counter()
        for i in range(n):
            v, _ = fwd_bwd(*args, jnp.int32(base + i))
        float(v)
        return time.perf_counter() - t0

    # marginal steady-state rate cancels pipeline-fill and per-call
    # dispatch overhead (~27 ms/launch through the tunnel) that a real
    # render/training loop never pays
    t_small, t_big = run(8, 100), run(64, 200)
    return 56 * LANES / (t_big - t_small), "pallas_prb"


def _bench_jnp(scene):
    from kytpu.diff.params import get_params, set_params
    from kytpu.integrator import fast as kfast
    from kytpu.integrator.render import trace_lanes

    cfg = kfast.FastConfig(max_depth=5)
    key = jax.random.key(1234)
    npix = W * H
    pid = jnp.arange(LANES, dtype=jnp.int32) % npix
    sid = jnp.zeros(LANES, jnp.int32)

    def fwd_bwd(params, key):
        def loss(p):
            sc = set_params(scene, p)
            px = (pid % W).astype(jnp.float32)
            py = (pid // W).astype(jnp.float32)
            out = trace_lanes(sc, key, px, py, pid, sid, cfg, "fast", None)
            return jnp.sum(out) / LANES
        return jax.value_and_grad(loss)(params)

    step = jax.jit(fwd_bwd)
    params = get_params(scene)
    jax.block_until_ready(step(params, key))

    def run(n, base):
        v, _ = step(params, jax.random.fold_in(key, 7))
        float(v)
        t0 = time.perf_counter()
        for i in range(n):
            v, _ = step(params, jax.random.fold_in(key, base + i))
        float(v)
        return time.perf_counter() - t0

    t_small, t_big = run(2, 100), run(8, 200)
    return 6 * LANES / (t_big - t_small), "jnp_fast"


def main():
    import sys
    import traceback

    from kytpu.scene import builders

    scene = builders.veach_mis(width=W, height=H)
    kernel_error = None
    try:
        rays_per_s, engine = _bench_kernel(scene)
    except Exception as e:
        # a kernel failure must be UNMISTAKABLE in the recorded JSON (the
        # jnp engine is ~240x slower — a quiet fallback would masquerade as
        # a terrible result instead of a regression)
        traceback.print_exc(file=sys.stderr)
        print("bench.py: PALLAS KERNEL FAILED — falling back to the jnp "
              "engine; this is NOT a comparable result", file=sys.stderr)
        kernel_error = f"{type(e).__name__}: {e}"
        rays_per_s, engine = _bench_jnp(scene)
        engine = "jnp_fast_FALLBACK"

    record = {
        "metric": f"veach_mis_fwd_bwd_rays_per_s_per_chip[{engine}]",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / TARGET_RAYS_PER_S, 4),
    }
    if kernel_error is not None:
        record["kernel_error"] = kernel_error[:500]
    print(json.dumps(record))


if __name__ == "__main__":
    main()
