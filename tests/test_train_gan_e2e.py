"""train_gan binary end-to-end on the synthetic recipe."""

import os

import numpy as np
import pytest
import yaml


def test_train_gan_binary(tmp_path):
    # reuse the e2e fixture machinery by building a tiny recipe inline
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_e2e import _make_premixed_shard

    from wesep_tpu.utils.file_utils import write_vec_ark_scp

    root = tmp_path
    spks = ["spkA", "spkB", "spkC", "spkD"]
    embeds = {
        f"utt_{s}": (np.eye(4, 16)[i] + 0.01).astype(np.float32)
        for i, s in enumerate(spks)
    }
    _, scp = write_vec_ark_scp(str(root / "embed"), embeds)
    with open(root / "single.utt2spk", "w") as f:
        for s in spks:
            f.write(f"utt_{s} {s}\n")
    tr = {f"tr{i:02d}": (spks[i % 4], spks[(i + 1) % 4]) for i in range(8)}
    cv = {f"cv{i:02d}": (spks[i % 4], spks[(i + 1) % 4]) for i in range(2)}
    _make_premixed_shard(str(root / "train.tar"), tr, seed=0)
    _make_premixed_shard(str(root / "val.tar"), cv, seed=1)
    for name in ("train", "val"):
        with open(root / f"{name}.list", "w") as f:
            f.write(str(root / f"{name}.tar") + "\n")
    with open(root / "val.spk1_enroll", "w") as f:
        for k, (s1, _) in cv.items():
            f.write(f"{k} utt_{s1}\n")
    with open(root / "val.spk2_enroll", "w") as f:
        for k, (_, s2) in cv.items():
            f.write(f"{k} utt_{s2}\n")

    config = {
        "exp_dir": str(root / "exp_gan"),
        "data_type": "shard",
        "train_data": str(root / "train.list"),
        "val_data": str(root / "val.list"),
        "train_spk_embeds": scp,
        "train_utt2spk": str(root / "single.utt2spk"),
        "val_spk_embeds": scp,
        "val_spk1_enroll": str(root / "val.spk1_enroll"),
        "val_spk2_enroll": str(root / "val.spk2_enroll"),
        "seed": 11,
        "num_epochs": 1,
        "save_epoch_interval": 1,
        "log_batch_interval": 2,
        "clip_grad": 5.0,
        "gan_loss_weight": 0.05,
        "gan_metric": "sisdr",
        "loss": "SISDR",
        "loss_args": {},
        "dataloader_args": {"batch_size": 4},
        "dataset_args": {
            "resample_rate": 16000,
            "shuffle": True,
            "shuffle_args": {"shuffle_size": 4},
            "chunk_len": 3000,
            "sample_num_per_epoch": 8,
        },
        "model": {"tse_model": "BSRNN",
                  "discriminator": "CMGAN_Discriminator"},
        "model_args": {
            "tse_model": {
                "sr": 16000, "win": 512, "stride": 128, "feature_dim": 8,
                "num_repeat": 1, "spk_fuse_type": "multiply",
                "use_spk_transform": False, "multi_fuse": False,
                "joint_training": False, "spk_emb_dim": 16, "remat": False,
            },
            "discriminator": {"hid_chans": 4},
        },
        "model_init": {"tse_model": None},
        "optimizer": {"tse_model": "Adam"},
        "optimizer_args": {"tse_model": {"lr": 1e-3,
                                         "weight_decay": 1e-4}},
        "scheduler": {"tse_model": "ExponentialDecrease"},
        "scheduler_args": {"tse_model": {
            "initial_lr": 1e-3, "final_lr": 1e-4,
            "warm_up_epoch": 0, "warm_from_zero": False,
        }},
    }
    cfg = str(root / "gan.yaml")
    with open(cfg, "w") as f:
        yaml.dump(config, f)

    from wesep_tpu.bin.train_gan import train_gan

    states = train_gan(cfg)
    gen_state, dis_state = states
    assert int(gen_state.step) == 2  # 8 samples / batch 4 = 2 iters
    assert int(dis_state.step) == 2
    assert os.path.exists(
        os.path.join(str(root / "exp_gan"), "models", "checkpoint_1.ckpt")
    )


@pytest.mark.slow  # 44s; binary e2e + preemption tests keep fast GAN/resume coverage
def test_train_gan_resume(tmp_path):
    """GAN resume: --checkpoint restores BOTH optimizer states and the
    epoch counter (reference train_gan.py resume semantics)."""
    import yaml as _yaml

    # reuse the fixture by running the binary test body first
    test_train_gan_binary(tmp_path)
    cfg_path = str(tmp_path / "gan.yaml")
    with open(cfg_path) as f:
        cfg = _yaml.safe_load(f)
    ckpt1 = os.path.join(cfg["exp_dir"], "models", "checkpoint_1.ckpt")
    assert os.path.exists(ckpt1)

    from wesep_tpu.bin.train_gan import train_gan

    states = train_gan(cfg_path, checkpoint=ckpt1,
                       overrides=["num_epochs=2"])
    gen_state, dis_state = states
    # epoch 2 only: 2 restored iters + 2 new
    assert int(gen_state.step) == 4
    assert int(dis_state.step) == 4
    assert os.path.exists(
        os.path.join(cfg["exp_dir"], "models", "checkpoint_2.ckpt")
    )
