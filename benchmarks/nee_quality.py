"""Estimator-efficiency comparison: nee="all" vs nee="single" on Veach.

rays/s alone can be gamed by weakening the estimator, so the default-config
decision uses inverse efficiency = MSE x time (lower is better, invariant
to trivial re-batching): if single-light NEE loses less quality than it
gains speed at the HEADLINE config (256 spp), it is the better production
default; otherwise nee="all" stays.

MSE is computed against a 4096-spp nee="all" reference render at the same
resolution, over the linear (unclamped) image, with per-pixel relative
normalization (the veach lights span 1.2..900 radiance).

Run on the TPU:  timeout 3600 python benchmarks/nee_quality.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"))

W, H = 512, 308
SPP = 256


def main():
    from kytpu.kernels import wavefront as wf
    from kytpu.scene import builders

    scene = builders.veach_mis(width=W, height=H)

    def render(nee, spp, seed):
        cfg = wf.KernelConfig(max_depth=5, rows=16, nee=nee)
        img = wf.render_pallas(scene, spp=spp, seed=seed, cfg=cfg,
                               clamp=False)
        return np.asarray(img)

    # timed render at the headline spp (per-mode wall time incl. host
    # assembly; the marginal-rate subtleties matter less here because the
    # full 256-spp frame takes seconds — pipeline effects amortize out)
    out = {}
    imgs = {}
    for nee in ("all", "single"):
        render(nee, 16, 9)   # warm the compile at a different shape config
        t0 = time.perf_counter()
        imgs[nee] = render(nee, SPP, 3)
        out[f"time_{nee}"] = round(time.perf_counter() - t0, 3)

    ref = render("all", 4096, 777)
    norm = np.maximum(np.abs(ref), 1e-2)

    for nee in ("all", "single"):
        rel = (imgs[nee] - ref) / norm
        mse = float(np.mean(rel * rel))
        out[f"mse_{nee}"] = mse
        out[f"eff_{nee}"] = mse * out[f"time_{nee}"]

    out["mse_ratio_single_over_all"] = out["mse_single"] / out["mse_all"]
    out["time_ratio_all_over_single"] = out["time_all"] / out["time_single"]
    out["single_wins"] = out["eff_single"] < out["eff_all"]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
