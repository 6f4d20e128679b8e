"""Prototype probe: traced-geometry sweeps for the big-scene megakernel.

The production megakernel bakes geometry into the instruction stream —
compile time and code size grow O(N), capping it at toy scenes. The
big-scene variant must loop over SMEM geometry tables with
jax.lax.fori_loop (O(1) code size). This probe measures the ONLY risky
part: the per-surface cost of a fori_loop sphere sweep whose body reads 4
scalars from SMEM, vs the same sweep fully unrolled with python-float
constants, vs the jnp (lane, chunk)-broadcast sweep the fast engine uses.

Run on the TPU:  timeout 3600 python benchmarks/bigscene_probe.py
"""

from __future__ import annotations

import functools
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

LANE, ROWS = 128, 16
LANES = 1 << 21


def _sphere_test(cx, cy, cz, r, ox, oy, oz, dx, dy, dz, t_best, sid, s):
    ocx, ocy, ocz = cx - ox, cy - oy, cz - oz
    neg_b = ocx * dx + ocy * dy + ocz * dz
    oc2 = ocx * ocx + ocy * ocy + ocz * ocz
    discr = r * r - oc2 + neg_b * neg_b
    sq = jnp.sqrt(jnp.maximum(discr, 0.0))
    q = neg_b + jnp.where(neg_b >= 0.0, sq, -sq)
    tq = (oc2 - r * r) / q
    t1 = jnp.minimum(q, tq)
    t2 = jnp.maximum(q, tq)
    t1_ok = t1 > 1e-3
    t = jnp.where(t1_ok, t1, t2)
    accept = (discr >= 0) & (t1_ok | (t2 > 1e-3)) & (t < t_best)
    return jnp.where(accept, t, t_best), jnp.where(accept, s, sid)


def make_baked(centers, radii):
    cs = [(float(c[0]), float(c[1]), float(c[2]), float(r))
          for c, r in zip(centers, radii)]

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               t_ref, sid_ref):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        t_best = jnp.full(ox.shape, np.float32(np.inf))
        sid = jnp.full(ox.shape, np.int32(-1))
        for s, (cx, cy, cz, r) in enumerate(cs):
            t_best, sid = _sphere_test(
                np.float32(cx), np.float32(cy), np.float32(cz), np.float32(r),
                ox, oy, oz, dx, dy, dz, t_best, sid, np.int32(s))
        t_ref[:] = t_best
        sid_ref[:] = sid

    return kernel


def make_loop(n, table_space, unroll=1):
    assert n % unroll == 0

    def kernel(tab_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               t_ref, sid_ref):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

        def body(i, carry):
            t_best, sid = carry
            for k in range(unroll):
                s = i * unroll + k
                cx = tab_ref[s, 0]
                cy = tab_ref[s, 1]
                cz = tab_ref[s, 2]
                r = tab_ref[s, 3]
                t_best, sid = _sphere_test(
                    cx, cy, cz, r, ox, oy, oz, dx, dy, dz, t_best, sid, s)
            return t_best, sid

        t_best, sid = jax.lax.fori_loop(
            0, n // unroll, body,
            (jnp.full(ox.shape, np.float32(np.inf)),
             jnp.full(ox.shape, np.int32(-1))))
        t_ref[:] = t_best
        sid_ref[:] = sid

    return kernel


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

    return (run(n + 1, 40) - run(1, 20)) / n


def main():
    key = jax.random.key(0)
    o = jax.random.uniform(key, (LANES, 3)) * 2.0
    d = jax.random.normal(jax.random.fold_in(key, 1), (LANES, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    grid = LANES // (ROWS * LANE)
    planes = [v.reshape(grid * ROWS, LANE) for v in
              (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2])]
    jax.block_until_ready(planes)
    blk = pl.BlockSpec((ROWS, LANE), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)

    def run_one(n, mode):
        kc = jax.random.fold_in(key, 2)
        centers = np.asarray(jax.random.uniform(kc, (n, 3))) * 20.0
        radii = np.full((n,), 0.4, np.float32)
        t0 = time.perf_counter()
        if mode == "baked":
            kern = make_baked(centers, radii)
            in_specs = [blk] * 6
            args = planes
        else:
            space = pltpu.VMEM if "vmem" in mode else pltpu.SMEM
            unroll = int(mode.rsplit("_u", 1)[1]) if "_u" in mode else 1
            kern = make_loop(n, space, unroll)
            in_specs = [pl.BlockSpec(memory_space=space)] + [blk] * 6
            tab = jnp.concatenate(
                [jnp.asarray(centers, jnp.float32),
                 jnp.asarray(radii)[:, None]], axis=-1)
            args = [tab] + planes

        call = pl.pallas_call(
            kern, grid=(grid,), in_specs=in_specs,
            out_specs=[blk, blk],
            out_shape=[jax.ShapeDtypeStruct((grid * ROWS, LANE), jnp.float32),
                       jax.ShapeDtypeStruct((grid * ROWS, LANE), jnp.int32)])

        @jax.jit
        def f(seed):
            outs = call(*args[:-1], args[-1] + seed * 0.0)
            return outs[0]

        try:
            f(jnp.float32(0)).block_until_ready()
        except Exception as e:
            print(json.dumps({"n": n, "mode": mode,
                              "error": str(e)[:200]}), flush=True)
            return
        compile_s = time.perf_counter() - t0
        dt = _marginal(lambda i: f(jnp.float32(i)))
        print(json.dumps({
            "n": n, "mode": mode, "compile_s": round(compile_s, 1),
            "ms": round(dt * 1e3, 2),
            "gtests_per_s": round(LANES * n / dt / 1e9, 2)}), flush=True)

    for mode in ("loop_smem_u4", "loop_smem_u8", "loop_smem_u16",
                 "loop_vmem_u8"):
        run_one(1024, mode)
    run_one(2048, "loop_smem_u8")
    run_one(4096, "loop_vmem_u8")


if __name__ == "__main__":
    main()
