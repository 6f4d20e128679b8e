"""Checkpoint / resume for long renders and inverse-rendering runs.

The reference has no persistence beyond the final image write (SURVEY.md §5:
"Checkpoint/resume: None"). Here every piece of render state is already a
pytree (film accumulator, optimizer state, trainable params), so a
checkpoint is just the flattened leaves + treedef — written atomically so a
killed process never leaves a torn file. A render sharded over a pod can
checkpoint per-host film tiles and resume on a different topology, because
lane radiance depends only on (seed, sample_id, pixel_id).
"""

from __future__ import annotations

import json
import os
import tempfile

import jax
import numpy as np


def _encode_aux(treedef) -> str:
    return str(treedef)


def save_checkpoint(path: str, pytree, step: int | None = None) -> str:
    """Atomically write a pytree of arrays (+ optional step counter)."""
    leaves, treedef = jax.tree.flatten(pytree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = dict(n_leaves=len(leaves), step=step,
                treedef=_encode_aux(treedef))
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, __meta__=json.dumps(meta), **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return path


class CheckpointMismatchError(ValueError):
    """Checkpoint structure does not match the restore template."""


def load_checkpoint(path: str, like, strict: bool = True):
    """Restore into the structure of `like` (a template pytree).

    Returns (pytree, step). Structure-checked, not blindly unpickled:
    raises CheckpointMismatchError at the load site if the leaf count, any
    leaf SHAPE, or (strict) the stored treedef string disagrees with the
    template — a wrong-template restore must not surface later as a
    broadcast error (or silently, for scalars). Weakly-typed template
    leaves (python floats) are restored as saved; array leaves are cast to
    the template dtype (f32 checkpoints restore fine into bf16 params).
    """
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        leaves = [z[f"leaf_{i}"] for i in range(meta["n_leaves"])]
    template_leaves, treedef = jax.tree.flatten(like)
    if len(template_leaves) != len(leaves):
        raise CheckpointMismatchError(
            f"checkpoint has {len(leaves)} leaves, template has "
            f"{len(template_leaves)}")
    if strict and meta.get("treedef") not in (None, _encode_aux(treedef)):
        raise CheckpointMismatchError(
            f"checkpoint treedef does not match template:\n"
            f"  saved:    {meta['treedef']}\n"
            f"  template: {_encode_aux(treedef)}")
    restored = []
    for i, (x, t) in enumerate(zip(leaves, template_leaves)):
        t_shape = np.shape(t)
        if x.shape != t_shape:
            raise CheckpointMismatchError(
                f"leaf {i}: checkpoint shape {x.shape} != template shape "
                f"{t_shape}")
        restored.append(
            jax.numpy.asarray(x, dtype=t.dtype) if hasattr(t, "dtype")
            else x)
    return jax.tree.unflatten(treedef, restored), meta.get("step")
