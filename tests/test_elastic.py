"""Failure injection, retry, and checkpoint/resume for tile rendering."""

import numpy as np
import pytest

from kytpu.dist.elastic import (WorkerFailure, render_elastic, render_tile,
                                tile_boxes)
from kytpu.integrator.path import PathConfig
from kytpu.integrator.render import render
from kytpu.scene import builders

CFG = PathConfig(max_depth=2)


@pytest.fixture(scope="module")
def scene():
    return builders.cornell_box(width=16, height=16)


def test_tile_boxes_cover():
    boxes = tile_boxes(20, 12, 8)
    cover = np.zeros((12, 20), int)
    for x0, y0, x1, y1 in boxes:
        cover[y0:y1, x0:x1] += 1
    assert (cover == 1).all()


def test_elastic_matches_monolithic(scene):
    a = np.asarray(render(scene, spp=2, seed=9, cfg=CFG))
    b = render_elastic(scene, spp=2, seed=9, cfg=CFG, tile=8)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_elastic_survives_faults(scene):
    rng = np.random.default_rng(3)
    img = render_elastic(scene, spp=2, seed=9, cfg=CFG, tile=8,
                         fault_rate=0.4, fault_rng=rng, max_retries=8)
    ref = render_elastic(scene, spp=2, seed=9, cfg=CFG, tile=8)
    np.testing.assert_array_equal(img, ref)


def test_elastic_gives_up(scene):
    def dead_worker(*a, **k):
        raise WorkerFailure("always down")
    with pytest.raises(RuntimeError, match="failed after"):
        render_elastic(scene, spp=1, seed=9, cfg=CFG, tile=16,
                       worker=dead_worker, max_retries=1)


def test_elastic_resume(scene, tmp_path):
    ck = str(tmp_path / "film.npz")
    calls = []

    def counting_worker(sc, box, spp, seed, cfg):
        calls.append(box)
        if len(calls) == 3:
            raise KeyboardInterrupt  # simulated preemption mid-render
        return render_tile(sc, box, spp, seed, cfg)

    with pytest.raises(RuntimeError):
        # KeyboardInterrupt escapes retries as a worker failure after
        # retries exhausted? No: it's caught like any exception; force
        # give-up by making every retry of tile 3 also die
        def dying(sc, box, spp, seed, cfg):
            calls.append(box)
            if len(calls) >= 3:
                raise WorkerFailure("preempted")
            return render_tile(sc, box, spp, seed, cfg)
        render_elastic(scene, spp=2, seed=9, cfg=CFG, tile=8,
                       checkpoint=ck, worker=dying, max_retries=0)

    # resume: completed tiles are not recomputed
    resumed_calls = []

    def resuming(sc, box, spp, seed, cfg):
        resumed_calls.append(box)
        return render_tile(sc, box, spp, seed, cfg)

    img = render_elastic(scene, spp=2, seed=9, cfg=CFG, tile=8,
                         checkpoint=ck, worker=resuming)
    ref = render_elastic(scene, spp=2, seed=9, cfg=CFG, tile=8)
    np.testing.assert_array_equal(img, ref)
    assert len(resumed_calls) < 4  # most tiles restored from checkpoint
