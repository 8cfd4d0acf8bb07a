"""Serving-RTF benchmark for the C++ runtime.

Builds runtime/ (cmake), runs `separate_main` over synthetic utterances
with a full-size BSRNN model dir, and reports the binary's own total RTF
(the same metric the reference LibTorch runtime logs,
/root/reference/runtime/bin/separate_main.cc:100-113). Appends the result
to BENCH_DETAILS.json.

    python -m tools.bench_runtime [--device tpu|cpu] [--utt_sec 10]
"""

import argparse
import json
import os
import re
import shutil
import site
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_runtime() -> str:
    build = os.path.join(REPO, "runtime", "build")
    gen = ["-G", "Ninja"] if shutil.which("ninja") else []
    subprocess.run(
        ["cmake", "-B", build, "-S", os.path.join(REPO, "runtime")] + gen,
        check=True, capture_output=True, text=True,
    )
    subprocess.run(
        ["cmake", "--build", build], check=True, capture_output=True,
        text=True,
    )
    return build


def make_model_dir(tmp: str) -> str:
    import numpy as np
    import yaml

    import jax
    import jax.numpy as jnp

    from wesep_tpu.models.bsrnn import BSRNN
    from wesep_tpu.train.checkpoint import save_checkpoint

    margs = {
        "spk_emb_dim": 256, "feature_dim": 128, "num_repeat": 6,
        "joint_training": True, "use_spk_transform": False,
        "spk_fuse_type": "multiply", "multi_fuse": False,
        "spk_model": "ResNet34",
        "spk_args": {"feat_dim": 80, "embed_dim": 256,
                     "pooling_func": "TSTP", "two_emb_layer": False},
        "spk_feat": True, "remat": False,
    }
    model = BSRNN(**margs)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((2, 4000)),
        jnp.zeros((2, 50, 80)), train=False,
    )
    model_dir = os.path.join(tmp, "mdl")
    os.makedirs(model_dir)
    save_checkpoint(
        os.path.join(model_dir, "avg_model.ckpt"), [variables["params"]],
        batch_stats=[variables.get("batch_stats", {})],
    )
    with open(os.path.join(model_dir, "config.yaml"), "w") as f:
        yaml.dump({
            "model": {"tse_model": "BSRNN"},
            "model_args": {"tse_model": margs},
            "dataset_args": {"resample_rate": 16000},
        }, f)
    return model_dir


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    parser.add_argument(
        "--engine", default="embedded", choices=["embedded", "tf"],
        help="embedded: CPython+XLA in-process; tf: Python-free TF C API "
        "over the SavedModel export (always CPU)",
    )
    parser.add_argument("--utt_sec", type=float, default=10.0)
    parser.add_argument("--n_utts", type=int, default=4)
    parser.add_argument(
        "--num_threads", type=int, default=1,
        help="parallel TF-engine workers (tf engine only); >1 records "
        "the WALL throughput RTF",
    )
    args = parser.parse_args()

    import numpy as np

    from wesep_tpu.data.wav_io import write_wav

    build = build_runtime()
    tmp = tempfile.mkdtemp(prefix="rt_bench_")
    model_dir = make_model_dir(tmp)
    if args.engine == "tf":
        # static-shape SavedModel sized to the benchmark utterances
        from wesep_tpu.bin.export import export_model

        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        export_dir = os.path.join(tmp, "export")
        export_model(
            os.path.join(model_dir, "config.yaml"),
            os.path.join(model_dir, "avg_model.ckpt"),
            export_dir, batch=2, samples=int(args.utt_sec * 16000),
            enroll_frames=300, fmt="savedmodel",
        )
        model_dir = export_dir

    sr = 16000
    t = int(args.utt_sec * sr)
    rng = np.random.default_rng(0)
    ts = np.arange(t) / sr
    scp = os.path.join(tmp, "wav.scp")
    lines = []
    for i in range(args.n_utts):
        mix = (0.4 * np.sin(2 * np.pi * (300 + 40 * i) * ts)
               + 0.3 * rng.standard_normal(t) * 0.2).astype(np.float32)
        e1 = (0.4 * np.sin(
            2 * np.pi * (300 + 40 * i) * np.arange(6000) / sr
        )).astype(np.float32)
        e2 = rng.standard_normal(6000).astype(np.float32) * 0.2
        for name, wav in ((f"mix{i}", mix), (f"e1_{i}", e1),
                          (f"e2_{i}", e2)):
            write_wav(os.path.join(tmp, f"{name}.wav"), wav, sr)
        lines.append(
            f"utt{i} {tmp}/mix{i}.wav {tmp}/e1_{i}.wav {tmp}/e2_{i}.wav"
        )
    with open(scp, "w") as f:
        f.write("\n".join(lines) + "\n")
    out_dir = os.path.join(tmp, "out")
    os.makedirs(out_dir)

    env = dict(os.environ)
    if args.engine == "tf":
        env.pop("WESEP_PYTHONPATH", None)  # prove no Python is involved
    else:
        env["WESEP_PYTHONPATH"] = (
            REPO + ":" + ":".join(site.getsitepackages())
        )
    if args.device == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
        env["WESEP_JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [os.path.join(build, "separate_main"),
         "--wav_scp", scp, "--model_path", model_dir,
         "--result_dir", out_dir,
         "--num_threads", str(args.num_threads)],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    sys.stderr.write(r.stdout[-2000:] + r.stderr[-2000:])
    if r.returncode != 0:
        raise SystemExit("separate_main failed")
    if args.num_threads > 1:
        m = re.search(r"WALL:.*throughput RTF ([0-9.]+)",
                      r.stdout + r.stderr)
    else:
        m = re.search(r"TOTAL:.*RTF ([0-9.]+)", r.stdout + r.stderr)
    if not m:
        # per-utt lines: average them
        rtfs = re.findall(r"RTF ([0-9.]+)", r.stdout + r.stderr)
        rtf = sum(map(float, rtfs)) / len(rtfs) if rtfs else float("nan")
    else:
        rtf = float(m.group(1))
    eng = "tf" if args.engine == "tf" else args.device
    key = f"serving_rtf_{eng}_bsrnn_{int(args.utt_sec)}s"
    if args.num_threads > 1:
        key += f"_w{args.num_threads}"
    print(json.dumps({key: rtf}))
    details_path = os.path.join(REPO, "BENCH_DETAILS.json")
    details = {}
    if os.path.exists(details_path):
        with open(details_path) as f:
            details = json.load(f)
    details[key] = rtf
    with open(details_path, "w") as f:
        json.dump(details, f, indent=1)


if __name__ == "__main__":
    main()
