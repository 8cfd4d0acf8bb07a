"""Tools (shard builders, noise db, embed extraction), CLI, export, SSA."""

import os
import sys
import tarfile

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from wesep_tpu.data.wav_io import read_wav, write_wav


def _tone(freq, t=8000, sr=16000):
    return (0.4 * np.sin(2 * np.pi * freq * np.arange(t) / sr)).astype(
        np.float32
    )


def test_make_shard_tools(tmp_path):
    from wesep_tpu.tools import make_shard_list_premix, make_shard_online

    wavs = {}
    for i in range(3):
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, _tone(300 + i * 100), 16000)
        wavs[f"u{i}"] = p
    # premix: mixture + 2 sources (reuse same wavs for simplicity)
    with open(tmp_path / "wav.scp", "w") as f:
        for k, p in wavs.items():
            f.write(f"{k} {p}\n")
    with open(tmp_path / "utt2spks", "w") as f:
        for k in wavs:
            f.write(f"{k} spkA spkB\n")
    argv = sys.argv
    sys.argv = [
        "x", "--num_utts_per_shard", "2",
        str(tmp_path / "wav.scp"),
        f"{tmp_path}/wav.scp,{tmp_path}/wav.scp",
        str(tmp_path / "utt2spks"),
        str(tmp_path / "shards"), str(tmp_path / "shards.list"),
    ]
    try:
        make_shard_list_premix.main()
    finally:
        sys.argv = argv
    shards = open(tmp_path / "shards.list").read().split()
    assert len(shards) == 2  # 3 utts / 2 per shard
    names = tarfile.open(shards[0]).getnames()
    assert any(n.endswith(".spk1") for n in names)
    assert any(n.endswith("_spk1.wav") for n in names)

    # online shards
    with open(tmp_path / "utt2spk", "w") as f:
        for i, k in enumerate(wavs):
            f.write(f"{k} spk{i}\n")
    sys.argv = [
        "x", "--num_utts_per_shard", "3",
        str(tmp_path / "wav.scp"), str(tmp_path / "utt2spk"),
        str(tmp_path / "oshards"), str(tmp_path / "oshards.list"),
    ]
    try:
        make_shard_online.main()
    finally:
        sys.argv = argv
    names = tarfile.open(
        open(tmp_path / "oshards.list").read().split()[0]
    ).getnames()
    assert any(n.endswith(".spk") for n in names)


def test_make_noise_db_and_vad(tmp_path):
    from wesep_tpu.data.noise_store import NoiseStore
    from wesep_tpu.data.vad import energy_vad_segments, trim_silence
    from wesep_tpu.tools import make_noise_db

    p = str(tmp_path / "n.wav")
    write_wav(p, _tone(200), 16000)
    with open(tmp_path / "noise.scp", "w") as f:
        f.write(f"noise_a {p}\n")
    argv = sys.argv
    sys.argv = ["x", str(tmp_path / "noise.scp"), str(tmp_path / "db.pack")]
    try:
        make_noise_db.main()
    finally:
        sys.argv = argv
    store = NoiseStore(str(tmp_path / "db.pack"))
    assert store.keys == ["noise_a"]

    # VAD: silence-speech-silence
    sig = np.concatenate(
        [np.zeros(8000), _tone(440, 16000), np.zeros(8000)]
    ).astype(np.float32)
    segs = energy_vad_segments(sig, 16000)
    assert len(segs) >= 1
    a, b = segs[0][0], segs[-1][1]
    assert 6000 < a < 10000 and 22000 < b < 26000
    trimmed = trim_silence(sig, 16000)
    assert len(trimmed) < len(sig)


def test_export_roundtrip(tmp_path):
    from wesep_tpu.bin.export import export_model
    from wesep_tpu.models.bsrnn import BSRNN
    from wesep_tpu.train.checkpoint import save_checkpoint

    model = BSRNN(
        spk_emb_dim=16, feature_dim=8, num_repeat=1, joint_training=False,
        use_spk_transform=False, spk_fuse_type="multiply", multi_fuse=False,
        remat=False,
    )
    mix = jnp.zeros((1, 4000))
    emb = jnp.zeros((1, 16))
    variables = model.init(jax.random.PRNGKey(0), mix, emb, train=False)
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, [variables["params"]])
    config = {
        "model": {"tse_model": "BSRNN"},
        "model_args": {"tse_model": {
            "spk_emb_dim": 16, "feature_dim": 8, "num_repeat": 1,
            "joint_training": False, "use_spk_transform": False,
            "spk_fuse_type": "multiply", "multi_fuse": False,
            "remat": False,
        }},
        "dataset_args": {"resample_rate": 16000},
    }
    cfg = str(tmp_path / "config.yaml")
    with open(cfg, "w") as f:
        yaml.dump(config, f)
    out = export_model(cfg, ckpt, str(tmp_path / "export"),
                       batch=1, samples=4000)
    assert os.path.exists(os.path.join(out, "model.stablehlo"))
    assert os.path.exists(os.path.join(out, "export.json"))


def test_cli_extractor(tmp_path):
    from wesep_tpu.cli.extractor import Extractor
    from wesep_tpu.models.bsrnn import BSRNN
    from wesep_tpu.train.checkpoint import save_checkpoint

    # build a model dir with a joint ResNet model (speaker_feat path)
    model = BSRNN(
        spk_emb_dim=32, feature_dim=8, num_repeat=1, joint_training=True,
        use_spk_transform=False, spk_fuse_type="multiply", multi_fuse=False,
        spk_model="ResNet18",
        spk_args={"feat_dim": 80, "embed_dim": 32, "two_emb_layer": False},
        spk_feat=True, remat=False,
    )
    mix = jnp.zeros((1, 4000))
    fb = jnp.zeros((1, 50, 80))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), mix, fb, train=False
    )
    model_dir = str(tmp_path / "mdl")
    os.makedirs(model_dir)
    save_checkpoint(
        os.path.join(model_dir, "avg_model.ckpt"),
        [variables["params"]],
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

    mixp = str(tmp_path / "mix.wav")
    enrp = str(tmp_path / "enr.wav")
    write_wav(mixp, _tone(440) + _tone(1000), 16000)
    write_wav(enrp, _tone(440, 12000), 16000)
    ex = Extractor(model_dir)
    ex.set_vad(True)
    est, sr = ex.extract_speech(mixp, enrp)
    assert sr == 16000 and est.shape == (8000,)
    assert np.max(np.abs(est)) <= 0.91


def test_ssa_single_optim_train_step():
    from wesep_tpu.models.bsrnn import BSRNN
    from wesep_tpu.train.losses import si_sdr_loss
    from wesep_tpu.train.schedulers import exponential_decrease
    from wesep_tpu.train.trainer import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    model = BSRNN(
        spk_emb_dim=32, feature_dim=8, num_repeat=1, joint_training=True,
        use_spk_transform=False, spk_fuse_type="multiply", multi_fuse=False,
        spk_model="ResNet18",
        spk_args={"feat_dim": 40, "embed_dim": 32, "two_emb_layer": False},
        spk_feat=True, remat=False,
    )
    rng = np.random.default_rng(0)
    batch = {
        "wav_mix": jnp.asarray(
            rng.standard_normal((2, 4000)).astype(np.float32) * 0.1
        ),
        "wav_targets": jnp.asarray(
            rng.standard_normal((2, 4000)).astype(np.float32) * 0.1
        ),
        "spk_embeds": jnp.asarray(
            rng.standard_normal((2, 30, 40)).astype(np.float32)
        ),
        "spk_label": jnp.zeros((2,), jnp.int32),
    }
    sched = exponential_decrease(
        num_epochs=1, epoch_iter=10, initial_lr=1e-3, final_lr=1e-4,
        warm_up_epoch=0,
    )
    opt = make_optimizer(sched)
    step = jax.jit(make_train_step(
        model, opt, [si_sdr_loss],
        ssa_enroll_prob=1.0,  # force the SSA branch
        ssa_speaker_feat=True,
        fbank_args={"num_mel_bins": 40},
    ))
    state = init_train_state(model, jax.random.PRNGKey(0), batch, opt)
    state, m1 = step(state, batch)
    state, m2 = step(state, batch)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))


def test_cli_chunked_decode_overlap_add(tmp_path):
    """Long-form decode: fixed windows + cross-fade overlap-add. With an
    identity forward the reconstruction must be exact (proves the OLA
    weights sum correctly incl. edges); with the real model it must keep
    one compiled shape and produce a full-length finite output."""
    from wesep_tpu.cli.extractor import Extractor
    from wesep_tpu.models.bsrnn import BSRNN
    from wesep_tpu.train.checkpoint import save_checkpoint

    model = BSRNN(
        spk_emb_dim=32, feature_dim=8, num_repeat=1, joint_training=True,
        use_spk_transform=False, spk_fuse_type="multiply", multi_fuse=False,
        spk_model="ResNet18",
        spk_args={"feat_dim": 80, "embed_dim": 32, "two_emb_layer": False},
        spk_feat=True, remat=False,
    )
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 4000)), jnp.zeros((1, 50, 80)),
        train=False,
    )
    model_dir = str(tmp_path / "mdl")
    os.makedirs(model_dir)
    save_checkpoint(
        os.path.join(model_dir, "avg_model.ckpt"),
        [variables["params"]],
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

    ex = Extractor(model_dir)
    ex.set_chunk_decode(chunk_sec=0.25, overlap_sec=0.05)  # win 4000

    # identity forward -> OLA must reconstruct the input bit-near-exactly
    rng = np.random.default_rng(3)
    mix = rng.standard_normal(10700).astype(np.float32) * 0.3
    orig = ex._jit_forward
    ex._jit_forward = lambda v, m, e: m
    try:
        rec = ex._decode(mix, np.zeros((1, 50, 80), np.float32))
    finally:
        ex._jit_forward = orig
    assert rec.shape == mix.shape
    np.testing.assert_allclose(rec, mix, atol=1e-6)

    # real model: full-length finite output through both paths
    cue = np.zeros((1, 50, 80), np.float32)
    long_est = ex._decode(mix, cue)
    assert long_est.shape == mix.shape and np.isfinite(long_est).all()
    short_est = ex._decode(mix[:3000], cue)  # bucket path
    assert short_est.shape == (3000,) and np.isfinite(short_est).all()


def test_op_profile_tool(tmp_path):
    """Capture a tiny CPU trace and summarize it (tool never crashes on
    traces without a device plane either)."""
    import subprocess
    import sys

    from wesep_tpu.tools.op_profile import load_xspace, op_table

    logdir = str(tmp_path / "trace")
    with jax.profiler.trace(logdir):
        jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64))).block_until_ready()
    xs = load_xspace(logdir)
    if xs is None:
        pytest.skip("xplane proto unavailable")
    plane, total, rows = op_table(xs)
    # CPU traces may lack an "XLA Ops" device line; the contract is
    # graceful handling either way
    assert total >= 0.0
    proc = subprocess.run(
        [sys.executable, "-m", "wesep_tpu.tools.op_profile", logdir],
        capture_output=True, text=True,
        env=dict(os.environ, PYTHONPATH=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))),
    )
    assert proc.returncode == 0, proc.stderr[-1000:]


def test_validate_synthetic_online_corpus(tmp_path):
    """--online_mix corpus contract: single-spk shard layout, resolvable
    raw-wav enrollments, premixed dev/test with wav-path maps."""
    import argparse
    import json
    import tarfile

    from wesep_tpu.tools.validate_synthetic import build_corpus_online

    args = argparse.Namespace(
        num_spk=4, utts_per_spk=2, seed=0, work_dir=str(tmp_path)
    )
    n_train = build_corpus_online(args)
    assert n_train == 8
    with tarfile.open(tmp_path / "train.tar") as tar:
        names = tar.getnames()
    assert sum(n.endswith(".spk") for n in names) == 8
    assert sum(n.endswith(".wav") for n in names) == 8
    with open(tmp_path / "spk2enroll.json") as f:
        s2e = json.load(f)
    assert len(s2e) == 4
    enroll_wav = dict(
        line.split() for line in open(tmp_path / "enroll_wav.scp")
    )
    for s, pairs in s2e.items():
        for utt, path in pairs:
            assert os.path.exists(path) and enroll_wav[utt] == path
    for split in ("dev", "test"):
        for idx in (1, 2):
            m = dict(line.split() for line in
                     open(tmp_path / f"{split}.spk{idx}_enroll"))
            for eu in m.values():
                assert eu in enroll_wav  # resolvable at decode time
