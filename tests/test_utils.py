"""Checkpoint/resume and profiling utilities."""

import jax.numpy as jnp
import numpy as np
import optax

from kytpu.utils import save_checkpoint, load_checkpoint, RenderTimer


def test_checkpoint_roundtrip(tmp_path):
    state = {"film": jnp.arange(12.0).reshape(2, 2, 3),
             "params": {"a": jnp.ones(3), "b": jnp.zeros((2, 2))}}
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, state, step=7)
    back, step = load_checkpoint(p, state)
    assert step == 7
    np.testing.assert_array_equal(np.asarray(back["film"]),
                                  np.asarray(state["film"]))
    np.testing.assert_array_equal(np.asarray(back["params"]["b"]),
                                  np.asarray(state["params"]["b"]))


def test_checkpoint_optimizer_state(tmp_path):
    opt = optax.adam(1e-2)
    params = {"w": jnp.ones((4, 3))}
    st = opt.init(params)
    p = str(tmp_path / "opt.npz")
    save_checkpoint(p, (params, st))
    (params2, st2), _ = load_checkpoint(p, (params, st))
    np.testing.assert_array_equal(np.asarray(params2["w"]), 1.0)


def test_checkpoint_structure_mismatch(tmp_path):
    import pytest
    from kytpu.utils.checkpoint import CheckpointMismatchError
    p = str(tmp_path / "x.npz")
    save_checkpoint(p, {"a": jnp.ones(2)})
    with pytest.raises(CheckpointMismatchError):
        load_checkpoint(p, {"a": jnp.ones(2), "b": jnp.ones(2)})
    # same leaf count, wrong leaf shape -> named error at the load site,
    # not a downstream broadcast error
    with pytest.raises(CheckpointMismatchError, match="shape"):
        load_checkpoint(p, {"a": jnp.ones(3)})
    # same leaf count + shapes but different structure -> treedef mismatch
    with pytest.raises(CheckpointMismatchError, match="treedef"):
        load_checkpoint(p, (jnp.ones(2),))
    # scalar shape mismatch (the silent-broadcast case) also raises
    save_checkpoint(p, {"a": jnp.float32(1.0)})
    with pytest.raises(CheckpointMismatchError, match="shape"):
        load_checkpoint(p, {"a": jnp.ones(2)})


def test_render_timer():
    t = RenderTimer()
    with t.phase("intersect", rays=100):
        pass
    with t.phase("shade", rays=100):
        pass
    assert set(t.phases) == {"intersect", "shade"}
    assert t.rays == 200
    assert "total" in t.report()


def test_checks_validate_radiance():
    from kytpu.utils import checks
    checks.validate_radiance(np.ones((4, 4, 3)))
    import pytest
    with pytest.raises(FloatingPointError):
        checks.validate_radiance(np.array([[np.nan, 1.0, 2.0]]))
    with pytest.raises(ValueError):
        checks.validate_radiance(np.array([[-1.0, 1.0, 2.0]]))


def test_checks_checked_in_jit():
    import jax
    import jax.numpy as jnp
    from kytpu.utils import checks
    checks.enable(True)
    try:
        @jax.jit
        def f(x):
            return checks.checked(x * 2.0, "x2")
        assert float(f(jnp.ones(4)).sum()) == 8.0
    finally:
        checks.enable(False)
