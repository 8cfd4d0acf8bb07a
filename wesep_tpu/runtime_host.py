"""In-process model host for the C++ serving runtime.

The C++ `separate_main` embeds CPython and calls this module: the model
math runs as the XLA-compiled executable (TPU when available, CPU
otherwise) while wav I/O, the streaming fbank frontend, and queueing stay
native C++. This replaces the reference's LibTorch TorchScript engine
(/root/reference/runtime/separate/separate_engine.cc) with the TPU-native
AOT path.

Loads either:
  * an export dir from wesep_tpu.bin.export (model.stablehlo + model.ckpt +
    export.json) — fixed shapes, no retracing; or
  * a model dir (config.yaml + avg_model.ckpt) — jitted with shape buckets.
"""

import json
import os

import numpy as np

_STATE = {}


def load(model_path: str):
    """Initialize the model host. Returns the sample rate."""
    import jax

    # the env-var route can be overridden by site hooks (e.g. a
    # sitecustomize pinning a TPU relay); jax.config is authoritative
    platform = os.environ.get("WESEP_JAX_PLATFORMS")
    if platform:
        jax.config.update("jax_platforms", platform)

    from wesep_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    if os.path.exists(os.path.join(model_path, "export.json")):
        from jax import export as jax_export

        from wesep_tpu.train.checkpoint import load_checkpoint

        with open(os.path.join(model_path, "export.json")) as f:
            manifest = json.load(f)
        exported = jax_export.deserialize(
            open(os.path.join(model_path, "model.stablehlo"), "rb").read()
        )
        bundle = load_checkpoint(os.path.join(model_path, "model.ckpt"))
        variables = {"params": bundle["models"][0]}
        if bundle.get("batch_stats") and bundle["batch_stats"][0]:
            variables["batch_stats"] = bundle["batch_stats"][0]
        _STATE.update(
            mode="export",
            exported=exported,
            variables=variables,
            manifest=manifest,
        )
        return int(manifest.get("sample_rate", 16000))

    import yaml

    from wesep_tpu.models import get_model
    from wesep_tpu.train.checkpoint import load_checkpoint

    with open(os.path.join(model_path, "config.yaml")) as f:
        configs = yaml.safe_load(f)
    model_args = dict(configs["model_args"]["tse_model"])
    model_args.pop("spk_model_init", None)
    model = get_model(configs["model"]["tse_model"])(**model_args)
    bundle = load_checkpoint(os.path.join(model_path, "avg_model.ckpt"))
    variables = {"params": bundle["models"][0]}
    if bundle.get("batch_stats") and bundle["batch_stats"][0]:
        variables["batch_stats"] = bundle["batch_stats"][0]

    fwd = jax.jit(lambda v, m, e: model.apply(v, m, e, train=False)[0])
    _STATE.update(
        mode="jit",
        forward=fwd,
        variables=variables,
        manifest={
            "speaker_feat": model_args.get("spk_feat", False),
            "joint_training": model_args.get("joint_training", False),
            "sample_rate": configs["dataset_args"].get(
                "resample_rate", 16000
            ),
        },
    )
    return int(_STATE["manifest"]["sample_rate"])


def expects_fbank() -> bool:
    m = _STATE["manifest"]
    return bool(m.get("joint_training")) and bool(m.get("speaker_feat"))


def separate(mix: np.ndarray, enroll1: np.ndarray, enroll2: np.ndarray):
    """mix [T] float32; enroll{1,2} either fbank [T', F] or wav [T'].

    Returns est [2, T] float32 (mixture batched twice against the two
    enrollment cues, reference ForwardFunc semantics,
    separate_engine.cc:76-123).
    """
    import jax.numpy as jnp

    mix = np.ascontiguousarray(mix, np.float32).reshape(-1)
    t_len = mix.shape[0]
    e1 = np.ascontiguousarray(enroll1, np.float32)
    e2 = np.ascontiguousarray(enroll2, np.float32)
    # equalize enrollment lengths (min mode, reference collate semantics)
    s = min(e1.shape[0], e2.shape[0])
    e1, e2 = e1[:s], e2[:s]
    enroll = np.stack([e1, e2])

    if _STATE["mode"] == "export":
        manifest = _STATE["manifest"]
        want_t = manifest["mix_shape"][1]
        want_e = manifest["enroll_shape"]
        mix_b = np.zeros((manifest["mix_shape"][0], want_t), np.float32)
        mix_b[:2] = _fit(mix[None], want_t)
        enroll_b = np.zeros(want_e, np.float32)
        enroll_b[:2] = _fit(enroll, want_e[1], extra_dims=want_e[2:])
        out = _STATE["exported"].call(
            _STATE["variables"], jnp.asarray(mix_b), jnp.asarray(enroll_b)
        )
        return np.asarray(out)[:2, :t_len]

    mixes = np.stack([mix, mix])
    out = _STATE["forward"](
        _STATE["variables"], jnp.asarray(mixes), jnp.asarray(enroll)
    )
    return np.asarray(out)[:, :t_len]


def _fit(x: np.ndarray, length: int, extra_dims=()):
    """Pad/trim axis 1 to `length` (wrap-pad)."""
    if x.shape[1] >= length:
        return x[:, :length]
    reps = length // x.shape[1] + 1
    tiled = np.tile(x, (1, reps) + (1,) * (x.ndim - 2))
    return tiled[:, :length]
