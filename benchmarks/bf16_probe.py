"""Micro-probe for ROADMAP open item B: does packed bf16 raise VPU
throughput on this chip for the megakernel's op mix?

VERDICT (measured 2026-08-18, v5e via tunnel): **NO — bf16 is SLOWER.**

    ilp=1  f32 2.21 Tops/s   bf16 1.43 Tops/s   (0.65x)
    ilp=4  f32 3.21 Tops/s   bf16 1.57 Tops/s   (0.49x)

and bf16 *comparisons* do not compile at all (Mosaic: "Target does not
support this comparison" on arith.cmpf over vector<8x128x2xbf16>), so the
kernel's compare-born masks would have to stay f32 regardless. Conclusion:
Mosaic emulates bf16 elementwise arithmetic (unpack -> f32 -> repack)
rather than retiring 2 lanes/cycle; a bf16 shading path would ~halve the
megakernel's VPU throughput. Open item B is closed as measured-negative.
f32 at ilp=4 lands at 3.2 Tops/s, a plausible VPU ceiling for this chip —
the megakernel's ~1 Tops/s effective (BASELINE.md) has maybe 2-3x of
instruction-level headroom, not a dtype lever.

Measurement methodology (the interesting part — the tunnel fights you):
- Host `block_until_ready` on a pallas output does NOT wait for device
  execution of the launch (time-to-ready is flat in ITERS); only
  materializing a VALUE on the host waits. Time `float(y[0,0])`.
- Value round-trip latency is ~29 ms; size launches to hundreds of ms.
- The tunnel memoizes value-identical launches, so chained y=fn(y) loops
  that saturate (inf/nan or a fixed point) time nothing. Iterate a
  chaotic logistic map: bounded, never repeats, can't be folded.
  (Output checked bit-exact against a CPU replay of the map.)
- Use `lax.fori_loop` in-kernel so ITERS doesn't unroll at trace time.

Run on the TPU:  timeout 1800 python benchmarks/bf16_probe.py
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"))

ROWS, LANE = 64, 128      # (rows,128) VMEM blocks; rows>=256 fail on v5e
GRID = 64                 # blocks per launch
ITERS = 1 << 17           # fori_loop steps; 3 ops/step/chain


def _mk(dtype, ilp):
    def kernel(x_ref, o_ref):
        x = x_ref[...].astype(dtype)
        # `ilp` independent chaotic chains separate latency from throughput
        rs = [jnp.asarray(3.57 + 0.01 * k, dtype) for k in range(ilp)]
        chains = [x * jnp.asarray(0.9 - 0.11 * k, dtype)
                  + jnp.asarray(0.01 * k + 0.02, dtype) for k in range(ilp)]

        def body(_, cs):
            return tuple(r * (c - c * c) for r, c in zip(rs, cs))

        chains = jax.lax.fori_loop(0, ITERS, body, tuple(chains))
        r = chains[0]
        for c in chains[1:]:
            r = r * jnp.asarray(0.5, dtype) + c
        o_ref[...] = r.astype(jnp.float32)

    blk = pl.BlockSpec((ROWS, LANE), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    return jax.jit(pl.pallas_call(
        kernel, grid=(GRID,), in_specs=[blk], out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((GRID * ROWS, LANE), jnp.float32)))


def _time_to_value(fn, x, reps=2):
    float(fn(x)[0, 0])    # warmup / compile
    ts = []
    for i in range(reps):
        xi = x + np.float32(1e-3 * (i + 1))
        jax.block_until_ready(xi)
        t0 = time.perf_counter()
        float(fn(xi)[0, 0])   # host value materialization == real wait
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.2, 0.8,
                                (GRID * ROWS, LANE)).astype(np.float32))
    res = {}
    for ilp in (1, 4):
        for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            dt = _time_to_value(_mk(dtype, ilp), x)
            ops = 3 * ITERS * ilp * GRID * ROWS * LANE
            res[name] = ops / dt
            print(f"ilp={ilp} {name}: {dt*1e3:.1f} ms -> "
                  f"{ops/dt/1e12:.3f} Tops/s")
        print(f"ilp={ilp} bf16/f32: {res['bf16']/res['f32']:.3f}x")


if __name__ == "__main__":
    main()
