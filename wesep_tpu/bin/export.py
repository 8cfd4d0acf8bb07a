"""AOT export: serialize the jitted forward as StableHLO + params.

TPU-native equivalent of /root/reference/wesep/bin/export_jit.py:22-49
(torch.jit.script -> .zip for the LibTorch runtime): exports the model's
forward via jax.export to a portable serialized StableHLO artifact
(model.stablehlo) plus the parameter bundle (model.ckpt) and a small
manifest (export.json) describing shapes. The C++/serving runtime (or any
jax process) reloads with jax.export.deserialize and calls without
retracing. Dummy shapes default to the reference's export shapes
(mix [2, 81280], fbank [2, 300, 80], export_jit.py:40-44).

  python -m wesep_tpu.bin.export --config exp/config.yaml \
      --checkpoint exp/avg_model.ckpt --output_dir exp/export

--format savedmodel additionally writes a TensorFlow SavedModel
(jax2tf native serialization of the same StableHLO) that the C++
runtime executes through the TF C API with NO Python interpreter —
the fully self-contained serving artifact (the reference's LibTorch
equivalent, runtime/separate/separate_engine.cc:31-35).
"""

import argparse
import json
import os


def get_args():
    parser = argparse.ArgumentParser(description="wesep-tpu export")
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--samples", type=int, default=81280)
    parser.add_argument("--enroll_frames", type=int, default=300)
    parser.add_argument("--enroll_dim", type=int, default=80)
    parser.add_argument(
        "--format", default="stablehlo",
        choices=["stablehlo", "savedmodel", "both"],
        help="stablehlo: jax.export artifact (needs a jax process); "
        "savedmodel: TF SavedModel for the Python-free C++ runtime",
    )
    return parser.parse_args()


def export_model(config, checkpoint, output_dir, batch=2, samples=81280,
                 enroll_frames=300, enroll_dim=80, fmt="stablehlo"):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jax_export

    from wesep_tpu.models import get_model
    from wesep_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from wesep_tpu.utils.config import parse_config_or_kwargs

    configs = parse_config_or_kwargs(config)
    model_args = dict(configs["model_args"]["tse_model"])
    model_args.pop("spk_model_init", None)
    model = get_model(configs["model"]["tse_model"])(**model_args)
    bundle = load_checkpoint(checkpoint)
    variables = {"params": bundle["models"][0]}
    if bundle.get("batch_stats") and bundle["batch_stats"][0]:
        variables["batch_stats"] = bundle["batch_stats"][0]

    speaker_feat = model_args.get("spk_feat", False)
    joint = model_args.get("joint_training", False)
    if joint and speaker_feat:
        enroll_shape = (batch, enroll_frames, enroll_dim)
    elif joint:
        enroll_shape = (batch, samples)
    else:
        enroll_shape = (batch, model_args.get("spk_emb_dim", 256))

    def fwd(variables, mix, enroll):
        est, _ = model.apply(variables, mix, enroll, train=False)
        return est

    manifest = {
        "model": configs["model"]["tse_model"],
        "mix_shape": [batch, samples],
        "enroll_shape": list(enroll_shape),
        "speaker_feat": bool(speaker_feat),
        "joint_training": bool(joint),
        "sample_rate": configs["dataset_args"].get("resample_rate", 16000),
    }
    os.makedirs(output_dir, exist_ok=True)
    if fmt in ("savedmodel", "both"):
        _export_savedmodel(
            fwd, variables, (batch, samples), enroll_shape, output_dir,
            manifest,
        )
        if fmt == "savedmodel":
            return output_dir

    mix_spec = jax.ShapeDtypeStruct((batch, samples), jnp.float32)
    enroll_spec = jax.ShapeDtypeStruct(enroll_shape, jnp.float32)
    var_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), jnp.asarray(x).dtype),
        variables,
    )
    exported = jax_export.export(jax.jit(fwd))(
        var_spec, mix_spec, enroll_spec
    )
    with open(os.path.join(output_dir, "model.stablehlo"), "wb") as f:
        f.write(exported.serialize())
    save_checkpoint(
        os.path.join(output_dir, "model.ckpt"),
        [variables["params"]],
        batch_stats=[variables.get("batch_stats", {})],
    )
    manifest["platforms"] = list(exported.platforms)
    with open(os.path.join(output_dir, "export.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    # round-trip check
    restored = jax_export.deserialize(
        open(os.path.join(output_dir, "model.stablehlo"), "rb").read()
    )
    out = restored.call(
        variables,
        jnp.zeros((batch, samples), jnp.float32),
        jnp.zeros(enroll_shape, jnp.float32),
    )
    assert out.shape == (batch, samples), out.shape
    print(f"exported to {output_dir} (platforms {exported.platforms})")
    return output_dir


def _export_savedmodel(fwd, variables, mix_shape, enroll_shape,
                       output_dir, manifest):
    """TF SavedModel via jax2tf: params become tf.Variables, the forward
    is natively-serialized StableHLO executed by TF's XlaCallModule. The
    C++ runtime loads it with the TF C API — no Python at serving time
    (runtime/separate/tf_engine.cc)."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    # Portable lowering: Pallas kernels only lower for TPU, so force the
    # lax.scan recurrence for the serving artifact (CPU hosts are the
    # deployment target, mirroring the reference's CPU LibTorch engine).
    prev_no_pallas = os.environ.get("WESEP_NO_PALLAS")
    os.environ["WESEP_NO_PALLAS"] = "1"
    # multi-platform: the artifact must run on CPU regardless of
    # which platform the export process ran on
    tf_fn = jax2tf.convert(
        fwd, with_gradient=False,
        native_serialization_platforms=("cpu", "tpu"),
    )

    class Served(tf.Module):
        def __init__(self, variables):
            super().__init__()
            self._vars = tf.nest.map_structure(
                tf.Variable, dict(variables)
            )

        @tf.function(
            autograph=False,
            input_signature=[
                tf.TensorSpec(mix_shape, tf.float32, name="mix"),
                tf.TensorSpec(enroll_shape, tf.float32, name="enroll"),
            ],
        )
        def serve(self, mix, enroll):
            est = tf_fn(
                tf.nest.map_structure(lambda v: v.read_value(),
                                      self._vars),
                mix, enroll,
            )
            return {"est": tf.identity(est, name="est")}

    module = Served(variables)
    sm_dir = os.path.join(output_dir, "saved_model")
    try:
        # the jax trace happens inside tf.saved_model.save (tf.function
        # tracing), so the Pallas override must cover this call
        tf.saved_model.save(
            module, sm_dir,
            signatures={"serving_default": module.serve},
        )
    finally:
        if prev_no_pallas is None:
            os.environ.pop("WESEP_NO_PALLAS", None)
        else:
            os.environ["WESEP_NO_PALLAS"] = prev_no_pallas
    with open(os.path.join(sm_dir, "wesep_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    # flat key-value twin for the C++ engine (no JSON parser needed)
    with open(os.path.join(sm_dir, "wesep_manifest.txt"), "w") as f:
        f.write(f"sample_rate {manifest['sample_rate']}\n")
        f.write(f"speaker_feat {int(manifest['speaker_feat'])}\n")
        f.write(f"joint_training {int(manifest['joint_training'])}\n")
        f.write(f"mix_batch {mix_shape[0]}\n")
        f.write(f"mix_samples {mix_shape[1]}\n")
        f.write(
            "enroll_shape "
            + " ".join(str(d) for d in enroll_shape) + "\n"
        )
    print(f"wrote TF SavedModel to {sm_dir}")
    return sm_dir


def main():
    args = get_args()
    export_model(
        args.config, args.checkpoint, args.output_dir, args.batch,
        args.samples, args.enroll_frames, args.enroll_dim,
        fmt=args.format,
    )


if __name__ == "__main__":
    main()
