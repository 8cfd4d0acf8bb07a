"""Checkpoint save/load/average as single-file msgpack bundles.

Mirrors the reference single-file .pt bundle
(/root/reference/wesep/utils/checkpoint.py:81-105): a dict
{"models": [...], "opt_states": [...], "batch_stats": [...], "step": n}
holding the generator (and optionally discriminator) stacks, serialized
with flax msgpack — host-portable, no pickle. `latest_checkpoint.pt`-style
symlinking and epoch-from-filename resume (reference bin/train.py:272-280,
379-395) live in the bin/ entry points; averaging matches
bin/average_model.py:64-100.
"""

import os
import re
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "load_pretrained_model",
    "average_checkpoints",
    "find_epoch_checkpoints",
]


def _to_host(tree):
    # to_state_dict unwraps FrozenDict / optax NamedTuples into plain
    # containers that msgpack can serialize
    tree = serialization.to_state_dict(tree)
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str,
    models: List,
    opt_states: Optional[List] = None,
    batch_stats: Optional[List] = None,
    step: int = 0,
    extra: Optional[dict] = None,
):
    """Save {models, opt_states, batch_stats, step} to one msgpack file.

    `models` is a list of param pytrees — [generator] or
    [generator, discriminator] like the reference lists
    (checkpoint.py:81-105).
    """
    bundle = {
        "models": [_to_host(m) for m in models],
        "opt_states": [_to_host(o) for o in (opt_states or [])],
        "batch_stats": [_to_host(b) for b in (batch_stats or [])],
        "step": int(step),
        "extra": extra or {},
    }
    data = serialization.msgpack_serialize(bundle)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    """Load a bundle saved by save_checkpoint."""
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def _restore_like(template, loaded):
    """Coerce a loaded (dict-of-numpy) tree onto a template pytree's
    structure/dtypes (strict=False spirit of reference load_checkpoint)."""
    return serialization.from_state_dict(template, loaded)


def load_pretrained_model(template_params, path: str, model_index: int = 0):
    """Pick states['models'][i] and map onto `template_params`
    (reference checkpoint.py:8-27)."""
    bundle = load_checkpoint(path)
    return _restore_like(template_params, bundle["models"][model_index])


def restore_train_state(state, path: str, model_index: int = 0):
    """Restore a TrainState in place-of from a bundle (resume training)."""
    bundle = load_checkpoint(path)
    params = _restore_like(state.params, bundle["models"][model_index])
    opt_state = state.opt_state
    if bundle.get("opt_states"):
        opt_state = _restore_like(
            state.opt_state, bundle["opt_states"][model_index]
        )
    batch_stats = state.batch_stats
    if bundle.get("batch_stats"):
        batch_stats = _restore_like(
            state.batch_stats, bundle["batch_stats"][model_index]
        )
    return state.replace(
        step=jnp.asarray(bundle.get("step", 0), jnp.int32),
        params=params,
        opt_state=opt_state,
        batch_stats=batch_stats,
    )


def find_epoch_checkpoints(model_dir: str):
    """[(epoch, path)] for checkpoint_<N>.ckpt files, sorted by epoch
    (reference bin/train.py:272-280 filename-regex resume)."""
    out = []
    for name in os.listdir(model_dir):
        m = re.match(r"checkpoint_(\d+)\.ckpt$", name)
        if m:
            out.append((int(m.group(1)), os.path.join(model_dir, name)))
    return sorted(out)


def average_checkpoints(paths: List[str], model_index: int = 0):
    """Uniform average of params over checkpoints
    (reference bin/average_model.py:64-100)."""
    if not paths:
        raise ValueError("no checkpoints to average")
    acc = None
    for p in paths:
        params = load_checkpoint(p)["models"][model_index]
        flat = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float64), params
        )
        if acc is None:
            acc = flat
        else:
            acc = jax.tree_util.tree_map(lambda a, b: a + b, acc, flat)
    n = float(len(paths))
    return jax.tree_util.tree_map(
        lambda a: (a / n).astype(np.float32), acc
    )
