"""End-to-end: synthetic premixed recipe -> bin.train -> bin.infer."""

import io
import os
import tarfile

import numpy as np
import pytest
import yaml

from wesep_tpu.data.wav_io import wav_bytes
from wesep_tpu.utils.file_utils import write_vec_ark_scp


def _make_premixed_shard(path, keys, sr=16000, t=6000, seed=0):
    rng = np.random.default_rng(seed)
    truth = {}
    with tarfile.open(path, "w") as tar:
        for key, (spk1, spk2) in keys.items():
            s1 = rng.standard_normal(t).astype(np.float32) * 0.2
            s2 = rng.standard_normal(t).astype(np.float32) * 0.2
            truth[key] = (s1, s2)

            def add(name, data):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))

            add(f"{key}.spk1", spk1.encode())
            add(f"{key}.spk2", spk2.encode())
            add(f"{key}.wav", wav_bytes(s1 + s2, sr))
            add(f"{key}_spk1.wav", wav_bytes(s1, sr))
            add(f"{key}_spk2.wav", wav_bytes(s2, sr))
    return truth


@pytest.fixture(scope="module")
def recipe(tmp_path_factory):
    root = tmp_path_factory.mktemp("recipe")
    spks = ["spkA", "spkB", "spkC", "spkD"]
    # embeddings: one per speaker (16-dim, distinct)
    embeds = {
        f"utt_{s}": (np.eye(4, 16)[i] + 0.01).astype(np.float32)
        for i, s in enumerate(spks)
    }
    ark_base = str(root / "embed")
    _, scp_path = write_vec_ark_scp(ark_base, embeds)
    with open(root / "single.utt2spk", "w") as f:
        for s in spks:
            f.write(f"utt_{s} {s}\n")

    train_keys = {
        f"tr{i:02d}": (spks[i % 4], spks[(i + 1) % 4]) for i in range(8)
    }
    val_keys = {f"cv{i:02d}": (spks[i % 4], spks[(i + 1) % 4])
                for i in range(2)}
    _make_premixed_shard(str(root / "train.tar"), train_keys, seed=0)
    _make_premixed_shard(str(root / "val.tar"), val_keys, seed=1)
    for name in ("train", "val"):
        with open(root / f"{name}.list", "w") as f:
            f.write(str(root / f"{name}.tar") + "\n")
    # fixed enroll maps: key -> embed utt
    for name, keys in (("val", val_keys),):
        with open(root / f"{name}.spk1_enroll", "w") as f:
            for k, (s1, _) in keys.items():
                f.write(f"{k} utt_{s1}\n")
        with open(root / f"{name}.spk2_enroll", "w") as f:
            for k, (_, s2) in keys.items():
                f.write(f"{k} utt_{s2}\n")

    config = {
        "exp_dir": str(root / "exp"),
        "data_type": "shard",
        "train_data": str(root / "train.list"),
        "val_data": str(root / "val.list"),
        "train_spk_embeds": scp_path,
        "train_utt2spk": str(root / "single.utt2spk"),
        "val_spk_embeds": scp_path,
        "val_spk1_enroll": str(root / "val.spk1_enroll"),
        "val_spk2_enroll": str(root / "val.spk2_enroll"),
        "seed": 17,
        "num_epochs": 2,
        "num_avg": 1,
        "save_epoch_interval": 1,
        "log_batch_interval": 2,
        "clip_grad": 5.0,
        "loss": "SISDR",
        "loss_args": {},
        "dataloader_args": {"batch_size": 4, "prefetch_factor": 0},
        "dataset_args": {
            "resample_rate": 16000,
            "shuffle": True,
            "shuffle_args": {"shuffle_size": 4},
            "chunk_len": 3000,
            "sample_num_per_epoch": 8,
        },
        "model": {"tse_model": "BSRNN"},
        "model_args": {
            "tse_model": {
                "sr": 16000,
                "win": 512,
                "stride": 128,
                "feature_dim": 8,
                "num_repeat": 1,
                "spk_fuse_type": "multiply",
                "use_spk_transform": False,
                "multi_fuse": False,
                "joint_training": False,
                "spk_emb_dim": 16,
            }
        },
        "model_init": {"tse_model": None},
        "optimizer": {"tse_model": "Adam"},
        "optimizer_args": {"tse_model": {"lr": 1e-3, "weight_decay": 1e-4}},
        "scheduler": {"tse_model": "ExponentialDecrease"},
        "scheduler_args": {
            "tse_model": {
                "initial_lr": 1e-3,
                "final_lr": 1e-4,
                "warm_up_epoch": 0,
                "warm_from_zero": False,
            }
        },
    }
    cfg_path = str(root / "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(config, f)
    return {"root": root, "config": cfg_path, "configs": config}


def test_train_binary_end_to_end(recipe):
    from wesep_tpu.bin.train import train

    state = train(recipe["config"])
    exp = recipe["configs"]["exp_dir"]
    models = os.path.join(exp, "models")
    assert os.path.exists(os.path.join(models, "checkpoint_2.ckpt"))
    assert os.path.exists(os.path.join(models, "final_checkpoint.ckpt"))
    assert os.path.exists(os.path.join(exp, "config.yaml"))
    assert int(state.step) == 4  # 2 epochs x 2 iters


def test_average_and_infer_binary(recipe):
    import sys

    from wesep_tpu.bin import average_model
    from wesep_tpu.bin.infer import infer

    exp = recipe["configs"]["exp_dir"]
    models = os.path.join(exp, "models")
    if not os.path.exists(os.path.join(models, "checkpoint_2.ckpt")):
        from wesep_tpu.bin.train import train

        train(recipe["config"])
    avg_path = os.path.join(exp, "avg_model.ckpt")
    argv = sys.argv
    sys.argv = [
        "average_model", "--dst_model", avg_path, "--src_path", models,
        "--num", "2",
    ]
    try:
        average_model.main()
    finally:
        sys.argv = argv
    assert os.path.exists(avg_path)

    root = recipe["root"]
    sisnr, sisnri = infer(
        recipe["config"],
        checkpoint=avg_path,
        test_data=str(root / "val.list"),
        test_spk_embeds=recipe["configs"]["val_spk_embeds"],
        test_spk1_enroll=str(root / "val.spk1_enroll"),
        test_spk2_enroll=str(root / "val.spk2_enroll"),
        length_bucket=2000,
    )
    assert np.isfinite(sisnr) and np.isfinite(sisnri)
    audio_dir = os.path.join(exp, "audio")
    wavs = [f for f in os.listdir(audio_dir) if f.endswith(".wav")]
    assert len(wavs) == 4  # 2 utts x 2 targets
    assert os.path.exists(os.path.join(audio_dir, "spk1.scp"))


def test_train_resume_continues(recipe, tmp_path):
    """Resume workflow (reference run.sh auto-resume + bin/train.py
    epoch-from-filename regex, train.py:272-280): train 2 epochs, then
    re-invoke with --checkpoint checkpoint_2 and num_epochs 3 — one more
    epoch runs, optimizer/scheduler state carries over, and the final
    symlink points at checkpoint_3."""
    import yaml as _yaml

    from wesep_tpu.bin.train import train

    with open(recipe["config"]) as f:
        cfg = _yaml.safe_load(f)
    exp = str(tmp_path / "exp_resume")
    cfg["exp_dir"] = exp
    cfg_path = str(tmp_path / "config.yaml")
    with open(cfg_path, "w") as f:
        _yaml.dump(cfg, f)

    state = train(cfg_path)
    assert int(state.step) == 4
    ckpt2 = os.path.join(exp, "models", "checkpoint_2.ckpt")
    assert os.path.exists(ckpt2)

    state = train(cfg_path, checkpoint=ckpt2,
                  overrides=["num_epochs=3"])
    # resumed at epoch 3: 2 more iters on top of the restored 4
    assert int(state.step) == 6
    models = os.path.join(exp, "models")
    assert os.path.exists(os.path.join(models, "checkpoint_3.ckpt"))
    final = os.path.join(models, "final_checkpoint.ckpt")
    assert os.readlink(final) == "checkpoint_3.ckpt"


def test_infer_sharded_parity(recipe, tmp_path):
    """Sharded decode: rows grouped per length bucket and sharded over the
    8-device mesh give bit-identical wavs regardless of rows-per-step
    (full steps vs zero-padded remainders), and the Utt/T naming contract
    survives the regrouping."""
    import yaml as _yaml

    from wesep_tpu.bin.infer import infer
    from wesep_tpu.data.wav_io import read_wav

    exp = recipe["configs"]["exp_dir"]
    ckpt = os.path.join(exp, "models", "checkpoint_2.ckpt")
    if not os.path.exists(ckpt):
        from wesep_tpu.bin.train import train

        train(recipe["config"])

    # 6 utts x 2 rows at two distinct lengths -> two compile buckets
    root = recipe["root"]
    spks = ["spkA", "spkB", "spkC", "spkD"]
    keys_long = {f"ts{i}": (spks[i % 4], spks[(i + 1) % 4])
                 for i in range(4)}
    keys_short = {f"tsS{i}": (spks[i % 4], spks[(i + 2) % 4])
                  for i in range(2)}
    _make_premixed_shard(str(tmp_path / "t_long.tar"), keys_long,
                         t=6000, seed=7)
    _make_premixed_shard(str(tmp_path / "t_short.tar"), keys_short,
                         t=3500, seed=8)
    with open(tmp_path / "test.list", "w") as f:
        f.write(str(tmp_path / "t_long.tar") + "\n")
        f.write(str(tmp_path / "t_short.tar") + "\n")
    all_keys = dict(keys_long, **keys_short)
    with open(tmp_path / "spk1_enroll", "w") as f:
        for k, (s1, _) in all_keys.items():
            f.write(f"{k} utt_{s1}\n")
    with open(tmp_path / "spk2_enroll", "w") as f:
        for k, (_, s2) in all_keys.items():
            f.write(f"{k} utt_{s2}\n")

    results = {}
    for rows_per_step in (8, 32):
        exp_i = str(tmp_path / f"exp_rows{rows_per_step}")
        with open(recipe["config"]) as f:
            cfg = _yaml.safe_load(f)
        cfg["exp_dir"] = exp_i
        cfg_path = str(tmp_path / f"cfg{rows_per_step}.yaml")
        with open(cfg_path, "w") as f:
            _yaml.dump(cfg, f)
        sisnr, sisnri = infer(
            cfg_path,
            checkpoint=ckpt,
            test_data=str(tmp_path / "test.list"),
            test_spk_embeds=recipe["configs"]["val_spk_embeds"],
            test_spk1_enroll=str(tmp_path / "spk1_enroll"),
            test_spk2_enroll=str(tmp_path / "spk2_enroll"),
            length_bucket=2000,
            infer_batch_size=rows_per_step,
        )
        audio = os.path.join(exp_i, "audio")
        wavs = sorted(
            f for f in os.listdir(audio) if f.endswith(".wav")
        )
        assert len(wavs) == 12  # 6 utts x 2 targets
        results[rows_per_step] = (
            sisnr, sisnri,
            {w: read_wav(os.path.join(audio, w))[0] for w in wavs},
        )

    a, b = results[8], results[32]
    assert np.isclose(a[0], b[0]) and np.isclose(a[1], b[1])
    assert sorted(a[2]) == sorted(b[2])
    for name in a[2]:
        # wavs are int16 PCM; batch-shape-dependent XLA fusion can move
        # float rounding by one quantization step
        np.testing.assert_allclose(a[2][name], b[2][name], atol=2 / 32768)
