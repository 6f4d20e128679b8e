"""Cost of an in-kernel dynamic row-pack (the ROADMAP item D primitive).

Measures a Pallas kernel that compacts the alive sublane-rows of K state
planes into packed scratch via per-row dynamic-index copies under
lax.cond — the minimal building block any in-kernel lane-compaction
scheme needs — against the same kernel with the pack replaced by a
whole-plane copy (the control isolates the dynamic-row machinery cost).

Context for the verdict (docs/ROADMAP.md item D): the megakernel's
per-bounce transport costs ~0.47 ms per 1M lanes (~60 ns per 128-lane
row, depth-16 glass cornell, round 3). A pack is profitable only if
  (rows moved) * cost_per_row_copy < (dead rows) * 60ns * remaining_bounces
AND the pack can actually shrink the downstream work — which inside the
fused megakernel it cannot: per-tile work is plane-shaped (static
(rows, 128) vector ops), so packing within a tile saves nothing, and
packing across tiles requires per-bounce relaunch + HBM state traffic
(~200 B/lane/bounce), the hybrid engine's measured failure mode.

timeout 1800 python benchmarks/rowpack_probe.py
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

ROWS, LANE = 16, 128
K = 24            # state planes (o,d,beta,big_l,keys,pdf_prev,... ~24)
GRID = 512        # tiles (1M lanes)


def make_fn(mode):
    """mode: 'pack' (dynamic row-pack) | 'copy' (whole-plane control)."""

    def kernel(alive_ref, *refs):
        in_refs = refs[:K]
        out_refs = refs[K:2 * K]
        if mode == "copy":
            for p in range(K):
                out_refs[p][:] = in_refs[p][:] * np.float32(1.0000001)
            return
        # per-row alive flags live in SMEM (dynamic scalar reads);
        # cond-guarded dynamic-index row copies per plane. NB a first
        # attempt read the flag from a VMEM value (alive[i, :]) —
        # Mosaic has no dynamic_slice on values, only on refs.

        def body(i, pos):
            def do_copy(p_):
                for p in range(K):
                    out_refs[p][pl.ds(p_, 1), :] = \
                        in_refs[p][pl.ds(i, 1), :]
                return p_ + 1

            return jax.lax.cond(alive_ref[i, 0] > 0, do_copy,
                                lambda p_: p_, pos)

        jax.lax.fori_loop(0, ROWS, body, jnp.int32(0))

    blk = pl.BlockSpec((ROWS, LANE), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    sblk = pl.BlockSpec((ROWS, 1), lambda i: (i, 0),
                        memory_space=pltpu.SMEM)

    @jax.jit
    def fn(alive_rows, planes):
        outs = pl.pallas_call(
            kernel, grid=(GRID,),
            in_specs=[sblk] + [blk] * K,
            out_specs=[blk] * K,
            out_shape=[jax.ShapeDtypeStruct((GRID * ROWS, LANE),
                                            jnp.float32)] * K,
        )(alive_rows, *planes)
        return outs[0]
    return fn


def marginal(fn, alive, planes, n=8):
    float(jnp.ravel(fn(alive, planes))[0])

    def run(k):
        y = fn(alive, planes)
        float(jnp.ravel(y)[0])
        t0 = time.perf_counter()
        for _ in range(k):
            y = fn(alive, planes)
        float(jnp.ravel(y)[0])
        return time.perf_counter() - t0

    return (run(n + 1) - run(1)) / n


def main():
    key = jax.random.key(0)
    total_rows = GRID * ROWS
    planes = [jax.random.uniform(jax.random.fold_in(key, p),
                                 (total_rows, LANE)) for p in range(K)]
    res = {}
    for frac in (1.0, 0.5, 0.25):
        alive = (jax.random.uniform(jax.random.fold_in(key, 99),
                                    (total_rows, 1))
                 < frac).astype(jnp.int32)
        jax.block_until_ready((alive, planes))
        for mode in ("pack", "copy"):
            dt = marginal(make_fn(mode), alive, planes)
            per_row = dt / (GRID * ROWS)
            res[f"{mode}_frac{frac}"] = {
                "ms_per_1M_lanes": round(dt * 1e3, 3),
                "ns_per_row": round(per_row * 1e9, 1)}
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
