"""Probe: do the cluster-cull primitives compile + actually skip work on
this TPU? Checks (1) scalar full-plane reductions inside a Mosaic kernel,
(2) jax.lax.cond with a multi-plane carry, (3) whether the false branch is
REALLY skipped (timed: all-true vs all-false predicates).

Run standalone on the TPU: python benchmarks/cull_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

ROWS, LANE = 16, 128
N_CLUSTERS = 128
WORK_PER_CLUSTER = 8


def make_kernel(force):
    def kernel(thresh_ref, x_ref, o_ref):
        x = x_ref[:]

        def body(i, acc):
            # scalar predicate from a full-plane reduction + SMEM scalar
            m = jnp.max(acc)
            pred = m < thresh_ref[0] + jnp.float32(i)
            if force == "true":
                pred = pred | (i >= 0)
            elif force == "false":
                pred = pred & (i < 0)

            def heavy(a):
                for k in range(WORK_PER_CLUSTER):
                    a = a * jnp.float32(0.9999) + x * jnp.float32(1e-6) \
                        + jnp.sin(a) * jnp.float32(1e-3)
                return a

            return jax.lax.cond(pred, heavy, lambda a: a, acc)

        acc = jax.lax.fori_loop(0, N_CLUSTERS, body, x)
        o_ref[:] = acc

    return kernel


def run(force, reps=64):
    k = make_kernel(force)
    x = jnp.ones((ROWS, LANE), jnp.float32) * 0.5
    th = jnp.full((1,), -1e9 if force == "false" else 1e9, jnp.float32)

    @jax.jit
    def f(th, x):
        return pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, LANE), jnp.float32),
            grid=(512,),
        )(th, x)

    y = f(th, x)
    _ = float(y[0, 0])
    t0 = time.perf_counter()
    for i in range(reps):
        y = f(th + i * 0.0, x)
    _ = float(y[0, 0])
    t1 = time.perf_counter()
    return (t1 - t0) / reps


if __name__ == "__main__":
    for force in ("true", "false"):
        dt = run(force)
        print(f"force={force}: {dt*1e3:.3f} ms/call")
    print("if false << true, lax.cond really skips on this TPU")
