"""Elastic tile rendering: failure detection, re-dispatch, resume.

The reference has no failure story — a CHECK failure aborts the whole
render (SURVEY.md §5). Here the film is decomposed into tiles whose
radiance is a PURE function of (scene, seed, tile id): a worker failure
costs exactly one tile re-dispatch, and a checkpoint written after every
tile makes the render resumable across process restarts — the design that
lets pod-scale renders survive preemption.

`render_elastic` is deliberately host-scheduled (the reference's
OpenMP-dynamic-rows analog at datacenter granularity): workers are any
callable that renders a tile — the local device, a remote host, a thread
pool. `fault_rate`/rng inject synthetic failures for testing.
"""

from __future__ import annotations

import numpy as np

from kytpu.integrator import path as kpath
from kytpu.integrator.render import render_region
from kytpu.utils.checkpoint import load_checkpoint, save_checkpoint


class WorkerFailure(RuntimeError):
    pass


def tile_boxes(width: int, height: int, tile: int):
    """Static tile decomposition: list of (x0, y0, x1, y1)."""
    boxes = []
    for y0 in range(0, height, tile):
        for x0 in range(0, width, tile):
            boxes.append((x0, y0, min(x0 + tile, width),
                          min(y0 + tile, height)))
    return boxes


def render_tile(scene, box, spp, seed, cfg):
    x0, y0, x1, y1 = box
    return np.asarray(render_region(scene, x0, y0, x1, y1, spp=spp,
                                    seed=seed, cfg=cfg, clamp=False))


def render_elastic(scene, spp: int = 16, seed: int = 1234,
                   cfg: kpath.PathConfig | None = None, tile: int = 64,
                   checkpoint: str | None = None, max_retries: int = 3,
                   fault_rate: float = 0.0, fault_rng=None,
                   worker=render_tile, clamp: bool = True):
    """Render the film tile-by-tile with retry + checkpoint/resume.

    Returns (H, W, 3). Each tile render is retried up to `max_retries`
    times on any exception (real worker failures or injected ones via
    `fault_rate`). With `checkpoint`, completed tiles persist and a rerun
    resumes from the last checkpoint. Tile radiance depends only on
    (scene, seed, tile pixels), so results are identical regardless of
    which attempt / process / host computes each tile.
    """
    cfg = cfg or kpath.PathConfig()
    w, h = scene.camera.width, scene.camera.height
    boxes = tile_boxes(w, h, tile)
    film = np.zeros((h, w, 3), np.float32)
    done = np.zeros(len(boxes), bool)

    if checkpoint is not None:
        try:
            (film_j, done_j), _ = load_checkpoint(
                checkpoint, (film, done.astype(np.int32)))
            film = np.array(film_j, np.float32)
            done = np.array(done_j).astype(bool)
        except FileNotFoundError:
            pass

    fault_rng = fault_rng or np.random.default_rng(0)

    for i, box in enumerate(boxes):
        if done[i]:
            continue
        last_err = None
        for attempt in range(max_retries + 1):
            try:
                if fault_rate > 0.0 and fault_rng.random() < fault_rate:
                    raise WorkerFailure(f"injected fault on tile {i}")
                out = worker(scene, box, spp, seed, cfg)
                break
            except Exception as e:  # noqa: BLE001 — any worker death
                last_err = e
                out = None
        if out is None:
            raise RuntimeError(
                f"tile {i} failed after {max_retries + 1} attempts"
            ) from last_err
        x0, y0, x1, y1 = box
        film[y0:y1, x0:x1] = out
        done[i] = True
        if checkpoint is not None:
            save_checkpoint(checkpoint, (film, done.astype(np.int32)),
                            step=int(done.sum()))

    if clamp:
        film = np.clip(film, 0.0, 1.0)
    return film
