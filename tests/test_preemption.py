"""Preemption-safe training: SIGTERM -> mid-epoch checkpoint -> resume.

TPU pods evict with SIGTERM and a short grace window; bin/train must
save a resumable bundle at the next batch boundary instead of losing
the run (no reference equivalent — torch DDP dies where it stands).
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_sigterm_saves_resumable_checkpoint(tmp_path):
    from test_e2e import _make_premixed_shard
    from wesep_tpu.utils.file_utils import write_vec_ark_scp

    root = tmp_path
    spks = ["spkA", "spkB", "spkC", "spkD"]
    embeds = {
        f"utt_{s}": (np.eye(4, 16)[i] + 0.01).astype(np.float32)
        for i, s in enumerate(spks)
    }
    _, scp_path = write_vec_ark_scp(str(root / "embed"), embeds)
    with open(root / "single.utt2spk", "w") as f:
        for s in spks:
            f.write(f"utt_{s} {s}\n")
    train_keys = {
        f"tr{i:02d}": (spks[i % 4], spks[(i + 1) % 4]) for i in range(8)
    }
    val_keys = {"cv00": (spks[0], spks[1])}
    _make_premixed_shard(str(root / "train.tar"), train_keys, t=4000, seed=0)
    _make_premixed_shard(str(root / "val.tar"), val_keys, t=4000, seed=1)
    for name in ("train", "val"):
        with open(root / f"{name}.list", "w") as f:
            f.write(str(root / f"{name}.tar") + "\n")
    for idx in (1, 2):
        with open(root / f"val.spk{idx}_enroll", "w") as f:
            for k, ss in val_keys.items():
                f.write(f"{k} utt_{ss[idx - 1]}\n")

    exp = str(root / "exp")
    cfg = {
        "exp_dir": exp,
        "data_type": "shard",
        "train_data": str(root / "train.list"),
        "val_data": str(root / "val.list"),
        "train_spk_embeds": scp_path,
        "train_utt2spk": str(root / "single.utt2spk"),
        "val_spk_embeds": scp_path,
        "val_spk1_enroll": str(root / "val.spk1_enroll"),
        "val_spk2_enroll": str(root / "val.spk2_enroll"),
        "seed": 3,
        "num_epochs": 500,  # far more than the grace window allows
        "loss": "SISDR",
        "loss_args": {},
        "dataloader_args": {"batch_size": 2, "prefetch_factor": 0},
        "dataset_args": {
            "resample_rate": 16000,
            "shuffle": False,
            "chunk_len": 2000,
            "sample_num_per_epoch": 8,
        },
        "model": {"tse_model": "BSRNN"},
        "model_args": {
            "tse_model": {
                "spk_emb_dim": 16, "feature_dim": 8, "num_repeat": 1,
                "joint_training": False, "use_spk_transform": False,
                "spk_fuse_type": "multiply", "multi_fuse": False,
            }
        },
        "model_init": {"tse_model": None},
        "optimizer": {"tse_model": "Adam"},
        "optimizer_args": {"tse_model": {"lr": 1e-3}},
        "scheduler": {"tse_model": "ExponentialDecrease"},
        "scheduler_args": {
            "tse_model": {
                "initial_lr": 1e-3, "final_lr": 1e-4,
                "warm_up_epoch": 0, "warm_from_zero": False,
            }
        },
    }
    cfg_path = str(root / "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)

    env = dict(
        os.environ,
        PYTHONPATH=REPO,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
    )
    proc = subprocess.Popen(
        [sys.executable, "-m", "wesep_tpu.bin.train", "--config", cfg_path],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True,
    )
    # wait until at least one epoch completed (training is mid-flight)
    log_path = os.path.join(exp, "train.log")
    deadline = time.time() + 240
    while time.time() < deadline:
        if os.path.exists(log_path) and "Epoch 1 " in open(log_path).read():
            break
        if proc.poll() is not None:
            out, err = proc.communicate()
            raise AssertionError(f"train died early: {err[-2000:]}")
        time.sleep(1)
    else:
        proc.kill()
        raise AssertionError("training never reached epoch 1")

    proc.send_signal(signal.SIGTERM)
    out, err = proc.communicate(timeout=120)
    assert proc.returncode == 0, err[-2000:]

    models = os.path.join(exp, "models")
    preempts = [f for f in os.listdir(models) if f.startswith("preempt_")]
    assert len(preempts) == 1, os.listdir(models)
    latest = os.path.join(models, "latest_checkpoint.ckpt")
    assert os.readlink(latest) == preempts[0]
    log = open(log_path).read()
    assert "preempted during epoch" in log

    # resume from the preempt bundle: the interrupted epoch restarts
    interrupted = int(preempts[0][len("preempt_epoch"):-len(".ckpt")])
    from wesep_tpu.bin.train import train

    state = train(
        cfg_path,
        checkpoint=os.path.join(models, preempts[0]),
        overrides=[f"num_epochs={interrupted}"],
    )
    assert os.path.exists(
        os.path.join(models, f"checkpoint_{interrupted}.ckpt")
    )
    assert int(state.step) > 0
