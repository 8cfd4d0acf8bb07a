"""C++ serving runtime: build, unit tests, and end-to-end separate_main."""

import os
import shutil
import subprocess

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNTIME = os.path.join(REPO, "runtime")


@pytest.fixture(scope="module")
def runtime_build(tmp_path_factory):
    if shutil.which("cmake") is None or shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")
    # reuse a persistent build dir (runtime/build/ is gitignored) so
    # repeat suite runs only recompile what changed — the cold cmake +
    # g++ build is ~50 s of the fast suite
    if os.environ.get("WESEP_TPU_NO_BUILD_CACHE") == "1":
        build = str(tmp_path_factory.mktemp("rt_build"))
    else:
        build = os.path.join(RUNTIME, "build", "test_build")
        os.makedirs(build, exist_ok=True)
    cfg = subprocess.run(
        ["cmake", "-B", build, "-S", RUNTIME, "-G", "Ninja"]
        if shutil.which("ninja")
        else ["cmake", "-B", build, "-S", RUNTIME],
        capture_output=True, text=True,
    )
    if cfg.returncode != 0:
        pytest.skip(f"cmake configure failed: {cfg.stderr[-500:]}")
    bld = subprocess.run(
        ["cmake", "--build", build], capture_output=True, text=True
    )
    assert bld.returncode == 0, bld.stderr[-2000:]
    return build


def test_runtime_unit_tests(runtime_build):
    r = subprocess.run(
        [os.path.join(runtime_build, "runtime_test")],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "ALL RUNTIME TESTS PASSED" in r.stdout


def test_separate_main_end_to_end(runtime_build, tmp_path):
    from wesep_tpu.data.wav_io import write_wav
    from wesep_tpu.models.bsrnn import BSRNN
    from wesep_tpu.train.checkpoint import save_checkpoint

    # joint speaker-feat BSRNN model dir
    model = BSRNN(
        spk_emb_dim=32, feature_dim=8, num_repeat=1, joint_training=True,
        use_spk_transform=False, spk_fuse_type="multiply", multi_fuse=False,
        spk_model="ResNet18",
        spk_args={"feat_dim": 80, "embed_dim": 32, "two_emb_layer": False},
        spk_feat=True, remat=False,
    )
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((2, 4000)), jnp.zeros((2, 50, 80)),
        train=False,
    )
    model_dir = str(tmp_path / "mdl")
    os.makedirs(model_dir)
    save_checkpoint(
        os.path.join(model_dir, "avg_model.ckpt"), [variables["params"]],
        batch_stats=[variables.get("batch_stats", {})],
    )
    config = {
        "model": {"tse_model": "BSRNN"},
        "model_args": {"tse_model": {
            "spk_emb_dim": 32, "feature_dim": 8, "num_repeat": 1,
            "joint_training": True, "use_spk_transform": False,
            "spk_fuse_type": "multiply", "multi_fuse": False,
            "spk_model": "ResNet18",
            "spk_args": {"feat_dim": 80, "embed_dim": 32,
                         "two_emb_layer": False},
            "spk_feat": True, "remat": False,
        }},
        "dataset_args": {"resample_rate": 16000},
    }
    with open(os.path.join(model_dir, "config.yaml"), "w") as f:
        yaml.dump(config, f)

    sr, t = 16000, 8000
    ts = np.arange(t) / sr
    mix = (0.4 * np.sin(2 * np.pi * 440 * ts)
           + 0.3 * np.sin(2 * np.pi * 1000 * ts)).astype(np.float32)
    e1 = (0.4 * np.sin(2 * np.pi * 440 * np.arange(6000) / sr)).astype(
        np.float32
    )
    e2 = (0.3 * np.sin(2 * np.pi * 1000 * np.arange(6000) / sr)).astype(
        np.float32
    )
    write_wav(str(tmp_path / "mix.wav"), mix, sr)
    write_wav(str(tmp_path / "e1.wav"), e1, sr)
    write_wav(str(tmp_path / "e2.wav"), e2, sr)
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)

    import site

    site_dirs = ":".join(p for p in site.getsitepackages())
    env = dict(os.environ)
    env["WESEP_PYTHONPATH"] = f"{REPO}:{site_dirs}"
    env["JAX_PLATFORMS"] = "cpu"
    env["WESEP_JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [
            os.path.join(runtime_build, "separate_main"),
            "--model_path", model_dir,
            "--wav_path", str(tmp_path / "mix.wav"),
            "--spk1_enroll", str(tmp_path / "e1.wav"),
            "--spk2_enroll", str(tmp_path / "e2.wav"),
            "--result_dir", out_dir,
        ],
        capture_output=True, text=True, env=env, timeout=500,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "RTF" in r.stdout
    from wesep_tpu.data.wav_io import read_wav

    for i in (1, 2):
        wav, osr = read_wav(os.path.join(out_dir, f"utt-spk{i}.wav"))
        assert osr == sr and wav.shape[1] == t
        assert np.isfinite(wav).all()


@pytest.mark.slow  # 60s; embedded-XLA engine test keeps fast runtime coverage
def test_tf_engine_python_free(runtime_build, tmp_path):
    """SavedModel export -> separate_main runs it through the TF C API
    with no Python: the fully self-contained serving path (counterpart of
    the reference's LibTorch engine). Output must match the embedded-
    Python XLA engine's decode of the same model."""
    pytest.importorskip("tensorflow")
    from wesep_tpu.bin.export import export_model
    from wesep_tpu.data.wav_io import read_wav, write_wav
    from wesep_tpu.models.bsrnn import BSRNN
    from wesep_tpu.train.checkpoint import save_checkpoint

    margs = dict(
        spk_emb_dim=32, feature_dim=8, num_repeat=1, joint_training=True,
        use_spk_transform=False, spk_fuse_type="multiply",
        multi_fuse=False, spk_model="ResNet18",
        spk_args={"feat_dim": 80, "embed_dim": 32, "two_emb_layer": False},
        spk_feat=True, remat=False,
    )
    model = BSRNN(**margs)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((2, 4000)),
        jnp.zeros((2, 50, 80)), train=False,
    )
    model_dir = str(tmp_path / "mdl")
    os.makedirs(model_dir)
    ckpt = os.path.join(model_dir, "avg_model.ckpt")
    save_checkpoint(ckpt, [variables["params"]],
                    batch_stats=[variables.get("batch_stats", {})])
    cfg_path = os.path.join(model_dir, "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump({
            "model": {"tse_model": "BSRNN"},
            "model_args": {"tse_model": margs},
            "dataset_args": {"resample_rate": 16000},
        }, f)
    export_model(cfg_path, ckpt, str(tmp_path / "export"), batch=2,
                 samples=8000, enroll_frames=48, fmt="savedmodel")
    assert os.path.exists(
        tmp_path / "export" / "saved_model" / "saved_model.pb"
    )
    assert os.path.exists(
        tmp_path / "export" / "saved_model" / "wesep_manifest.txt"
    )

    sr, t = 16000, 8000
    ts = np.arange(t) / sr
    mix = (0.4 * np.sin(2 * np.pi * 440 * ts)
           + 0.3 * np.sin(2 * np.pi * 1000 * ts)).astype(np.float32)
    e1 = (0.4 * np.sin(2 * np.pi * 440 * np.arange(6000) / sr)).astype(
        np.float32)
    e2 = (0.3 * np.sin(2 * np.pi * 1000 * np.arange(6000) / sr)).astype(
        np.float32)
    write_wav(str(tmp_path / "mix.wav"), mix, sr)
    write_wav(str(tmp_path / "e1.wav"), e1, sr)
    write_wav(str(tmp_path / "e2.wav"), e2, sr)
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)

    # NO WESEP_PYTHONPATH / python env needed for this engine
    env = dict(os.environ)
    env.pop("WESEP_PYTHONPATH", None)
    r = subprocess.run(
        [os.path.join(runtime_build, "separate_main"),
         "--model_path", str(tmp_path / "export"),
         "--wav_path", str(tmp_path / "mix.wav"),
         "--spk1_enroll", str(tmp_path / "e1.wav"),
         "--spk2_enroll", str(tmp_path / "e2.wav"),
         "--result_dir", out_dir],
        capture_output=True, text=True, env=env, timeout=500,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "engine: tensorflow (python-free)" in r.stdout
    assert "RTF" in r.stdout

    # parity with the in-process XLA decode of the same model
    from wesep_tpu.ops.fbank import apply_cmvn, kaldi_fbank

    def feats(wav):
        f = kaldi_fbank(jnp.asarray(wav), sample_rate=sr,
                        input_scale=32768.0)
        return apply_cmvn(f)

    enroll = jnp.stack([feats(e1)[:48], feats(e2)[:48]])
    want, _ = model.apply(
        variables, jnp.stack([jnp.asarray(mix)] * 2), enroll, train=False,
    )
    for i in range(2):
        got, got_sr = read_wav(os.path.join(out_dir, f"utt-spk{i+1}.wav"))
        got = np.asarray(got).reshape(-1)
        assert got_sr == sr
        w = np.asarray(want)[i]
        # wav roundtrip is int16-quantized; C++ fbank vs jax fbank differ
        # at dither/rounding level
        err = np.abs(got - w).max()
        assert err < 0.05, f"spk{i+1} decode mismatch (max err {err})"

    # long utterance (2.5x the export length): the engine must window
    # with overlap-add crossfade, not truncate. Parity reference is an
    # independent Python replica of the same windowing over
    # model.apply outputs.
    t_long = 20000
    ts_l = np.arange(t_long) / sr
    mix_long = (0.4 * np.sin(2 * np.pi * 440 * ts_l)
                + 0.3 * np.sin(2 * np.pi * 1000 * ts_l)).astype(np.float32)
    write_wav(str(tmp_path / "mix_long.wav"), mix_long, sr)
    out_dir2 = str(tmp_path / "out_long")
    os.makedirs(out_dir2)
    r = subprocess.run(
        [os.path.join(runtime_build, "separate_main"),
         "--model_path", str(tmp_path / "export"),
         "--wav_path", str(tmp_path / "mix_long.wav"),
         "--spk1_enroll", str(tmp_path / "e1.wav"),
         "--spk2_enroll", str(tmp_path / "e2.wav"),
         "--result_dir", out_dir2],
        capture_output=True, text=True, env=env, timeout=500,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    # python replica of tf_engine.cc's overlap-add (t_len 8000 ->
    # overlap 2000, hop 6000): full-length windows, last one ANCHORED at
    # t_long - t_len (cli/extractor.py _decode "starts + [t - win]"),
    # trapezoid crossfade weights normalized by the weight sum
    t_len, overlap = 8000, 2000
    hop = t_len - overlap
    # int16 roundtrip like the engine saw from the wav file
    mix_q = (np.round(mix_long * 32768.0).clip(-32768, 32767)
             / 32768.0).astype(np.float32)
    window = np.ones(t_len, np.float32)
    ramp = np.arange(1, overlap + 1, dtype=np.float32) / (overlap + 1)
    window[:overlap] = ramp
    window[t_len - overlap:] = ramp[::-1]
    acc = np.zeros((2, t_long), np.float32)
    wsum = np.zeros(t_long, np.float32)
    starts = list(range(0, t_long - t_len, hop)) + [t_long - t_len]
    for start in starts:
        est, _ = model.apply(
            variables,
            jnp.stack([jnp.asarray(mix_q[start:start + t_len])] * 2),
            enroll, train=False,
        )
        acc[:, start:start + t_len] += np.asarray(est) * window
        wsum[start:start + t_len] += window
    acc /= np.maximum(wsum, 1e-12)
    for i in range(2):
        got, got_sr = read_wav(os.path.join(out_dir2, f"utt-spk{i+1}.wav"))
        got = np.asarray(got).reshape(-1)
        assert got_sr == sr and got.shape[0] == t_long, (
            f"long decode truncated: {got.shape}"
        )
        err = np.abs(got - acc[i]).max()
        assert err < 0.05, f"long spk{i+1} windowing mismatch (max {err})"


@pytest.mark.slow  # 33s; embedded-XLA engine test keeps fast runtime coverage
def test_tf_engine_multithreaded_scp(runtime_build, tmp_path):
    """--num_threads N: parallel TF-engine workers over an scp give
    bit-identical outputs to the sequential run (per-worker sessions, no
    shared output buffer)."""
    pytest.importorskip("tensorflow")
    from wesep_tpu.bin.export import export_model
    from wesep_tpu.data.wav_io import read_wav, write_wav
    from wesep_tpu.models.bsrnn import BSRNN
    from wesep_tpu.train.checkpoint import save_checkpoint

    margs = dict(
        spk_emb_dim=32, feature_dim=8, num_repeat=1, joint_training=True,
        use_spk_transform=False, spk_fuse_type="multiply",
        multi_fuse=False, spk_model="ResNet18",
        spk_args={"feat_dim": 80, "embed_dim": 32, "two_emb_layer": False},
        spk_feat=True, remat=False,
    )
    model = BSRNN(**margs)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((2, 4000)),
        jnp.zeros((2, 50, 80)), train=False,
    )
    model_dir = str(tmp_path / "mdl")
    os.makedirs(model_dir)
    ckpt = os.path.join(model_dir, "avg_model.ckpt")
    save_checkpoint(ckpt, [variables["params"]],
                    batch_stats=[variables.get("batch_stats", {})])
    cfg_path = os.path.join(model_dir, "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump({
            "model": {"tse_model": "BSRNN"},
            "model_args": {"tse_model": margs},
            "dataset_args": {"resample_rate": 16000},
        }, f)
    export_model(cfg_path, ckpt, str(tmp_path / "export"), batch=2,
                 samples=8000, enroll_frames=48, fmt="savedmodel")

    sr, t = 16000, 8000
    rng = np.random.default_rng(5)
    rows = []
    for k in range(3):
        mix = rng.standard_normal(t).astype(np.float32) * 0.2
        e1 = rng.standard_normal(6000).astype(np.float32) * 0.2
        e2 = rng.standard_normal(6000).astype(np.float32) * 0.2
        for name, wav in ((f"m{k}", mix), (f"a{k}", e1), (f"b{k}", e2)):
            write_wav(str(tmp_path / f"{name}.wav"), wav, sr)
        rows.append(
            f"u{k} {tmp_path}/m{k}.wav {tmp_path}/a{k}.wav "
            f"{tmp_path}/b{k}.wav"
        )
    scp = str(tmp_path / "wav.scp")
    with open(scp, "w") as f:
        f.write("\n".join(rows) + "\n")

    env = dict(os.environ)
    env.pop("WESEP_PYTHONPATH", None)
    outs = {}
    for nt in (1, 2):
        out_dir = str(tmp_path / f"out{nt}")
        os.makedirs(out_dir)
        r = subprocess.run(
            [os.path.join(runtime_build, "separate_main"),
             "--model_path", str(tmp_path / "export"),
             "--wav_scp", scp, "--result_dir", out_dir,
             "--num_threads", str(nt)],
            capture_output=True, text=True, env=env, timeout=500,
        )
        assert r.returncode == 0, r.stdout + r.stderr
        if nt > 1:
            assert "2 worker(s)" in r.stdout
            assert "WALL:" in r.stdout
        outs[nt] = {
            f: read_wav(os.path.join(out_dir, f))[0]
            for f in sorted(os.listdir(out_dir)) if f.endswith(".wav")
        }
    assert sorted(outs[1]) == sorted(outs[2])
    assert len(outs[1]) == 6  # 3 utts x 2 speakers
    for name in outs[1]:
        np.testing.assert_array_equal(outs[1][name], outs[2][name])
