"""Marginal VPU cost of div / sqrt / rsqrt / rcp-approx vs mul on this TPU.

Chains of dependent ops inside one Pallas kernel (ILP=4 like
bf16_probe's ceiling measurement); the per-op slot cost decides whether
div-elimination rewrites (sign tricks, reciprocal+Newton) are worth their
extra mul/select traffic. Honest tunnel timing.

timeout 1800 python benchmarks/op_cost_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"))

ROWS, LANE, GRID = 256, 128, 64
N_OPS = 64          # chained ops per ILP stream
ILP = 4


def make_fn(op):
    def kernel(x_ref, o_ref):
        xs = [x_ref[:] * np.float32(1.0 + 0.1 * i) for i in range(ILP)]
        for i in range(N_OPS):
            if op == "mul":
                xs = [x * np.float32(1.0000001) for x in xs]
            elif op == "add":
                xs = [x + np.float32(1e-7) for x in xs]
            elif op == "div":
                xs = [np.float32(1.0) / x for x in xs]
            elif op == "div_xy":
                xs = [x / (x + np.float32(0.5)) for x in xs]
            elif op == "sqrt":
                xs = [jnp.sqrt(x + np.float32(1.0)) for x in xs]
            elif op == "rsqrt":
                xs = [jax.lax.rsqrt(x + np.float32(1.0)) for x in xs]
            elif op == "rcp":
                xs = [pl.reciprocal(x, approx=True) for x in xs]
            elif op == "rcp_newton":
                xs2 = []
                for x in xs:
                    r = pl.reciprocal(x, approx=True)
                    xs2.append(r * (np.float32(2.0) - x * r))
                xs = xs2
            elif op == "select":
                xs = [jnp.where(x > np.float32(0.5), x,
                                x + np.float32(1e-6)) for x in xs]
            elif op == "cmp_and":
                ys = [(x > np.float32(0.5)) & (x < np.float32(2.0))
                      for x in xs]
                xs = [jnp.where(y, x, x + np.float32(1e-6))
                      for x, y in zip(xs, ys)]
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        o_ref[:] = acc

    blk = pl.BlockSpec((ROWS, LANE), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)

    @jax.jit
    def fn(x):
        return pl.pallas_call(kernel, grid=(GRID,), in_specs=[blk],
                              out_specs=blk,
                              out_shape=jax.ShapeDtypeStruct(
                                  (ROWS, LANE), jnp.float32))(x)
    return fn


def marginal(fn, x, n=8):
    float(jnp.ravel(fn(x))[0])

    def run(k, s):
        y = fn(x + s)
        float(jnp.ravel(y)[0])
        t0 = time.perf_counter()
        for i in range(k):
            y = fn(x + s + i * 1e-6)
        float(jnp.ravel(y)[0])
        return time.perf_counter() - t0

    return (run(n + 1, 0.001) - run(1, 0.002)) / n


def main():
    x = jnp.linspace(0.6, 1.6, ROWS * LANE).reshape(ROWS, LANE)
    x = jnp.asarray(x, jnp.float32)
    jax.block_until_ready(x)
    lanes = ROWS * LANE * GRID
    res = {}
    base = None
    for op in ("add", "mul", "div", "div_xy", "sqrt", "rsqrt", "rcp",
               "rcp_newton", "select", "cmp_and"):
        try:
            dt = marginal(make_fn(op), x)
        except Exception as e:
            res[op] = f"FAIL {type(e).__name__}: {str(e)[:120]}"
            continue
        per_op = dt / (N_OPS * ILP * lanes)
        res[op] = round(per_op * 1e12, 3)   # picoseconds per lane-op
        if op == "mul":
            base = per_op
    out = {"ps_per_lane_op": res}
    if base:
        out["vs_mul"] = {k: (round(v / res["mul"], 2)
                             if isinstance(v, float) else v)
                        for k, v in res.items()}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
