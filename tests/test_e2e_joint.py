"""Joint-training recipe chain e2e: prep -> shards -> bin.train -> bin.infer.

Regression test for the joint-mode enrollment contract: with
`joint_training: true`, `val_spk2utt`/`test_spk2utt` must point at a
utt -> WAV PATH map (the recipe's `enroll_wav.scp`; the reference feeds
`single.wav.scp` there, see
/root/reference/examples/librimix/tse/v2/README.md:302-303), not the
utt -> speaker `single.utt2spk`. Round 2 shipped every v2 conf with the
wrong file; this drives the actual recipe artifacts through the real
binaries so the contract cannot regress silently again.
"""

import os
import subprocess
import sys

import pytest
import yaml

from test_prepare_wsj0_2mix import REPO, _build_tree, _run_prep

CONF = os.path.join(
    REPO, "examples", "wsj0_2mix", "tse", "v2", "confs", "bsrnn.yaml"
)

TINY = [
    # XLA:CPU (test backend) lacks the bf16 dot the conf uses on TPU
    "compute_dtype=float32",
    "num_epochs=1",
    "dataloader_args.batch_size=2",
    "dataloader_args.prefetch_factor=0",
    "dataset_args.chunk_len=4000",
    "dataset_args.enroll_sec=1",
    "dataset_args.shuffle_args.shuffle_size=4",
    "dataset_args.fbank_args.num_mel_bins=20",
    "model_args.tse_model.feature_dim=8",
    "model_args.tse_model.num_repeat=1",
    "model_args.tse_model.win=256",
    "model_args.tse_model.stride=64",
    "model_args.tse_model.spk_args.feat_dim=20",
    "model_args.tse_model.spk_args.embed_dim=32",
    "model_args.tse_model.spk_emb_dim=32",
    "model_args.tse_model.spksInTrain=6",
    "log_batch_interval=1",
]


def _run(module, *args):
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, "-m", module, *args],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return proc


@pytest.mark.slow
def test_joint_recipe_chain(tmp_path):
    root = str(tmp_path / "wsj0mix")
    data = str(tmp_path / "data")
    exp = str(tmp_path / "exp")
    _build_tree(root)
    _run_prep(root, data)

    # recipe stage 2 verbatim
    for part in ("train", "dev", "test"):
        _run(
            "wesep_tpu.tools.make_shard_list_premix",
            "--num_utts_per_shard", "1000", "--num_threads", "1",
            os.path.join(data, part, "wav.scp"),
            ",".join(os.path.join(data, part, f"spk{i}.scp")
                     for i in (1, 2)),
            os.path.join(data, part, "utt2spks"),
            os.path.join(data, part, "shards"),
            os.path.join(data, part, "shards.list"),
        )

    # recipe stage 3: the shipped conf, with paths rebased and
    # tiny-shape overrides -- the enrollment-map keys come from the CONF
    # (this is exactly what run.sh executes)
    sets = [
        f"exp_dir={exp}",
        f"train_data={data}/train/shards.list",
        f"val_data={data}/dev/shards.list",
        f"train_utt2spk={data}/train/single.utt2spk",
        f"train_spk2utt={data}/train/spk2enroll.json",
        f"val_spk2utt={data}/dev/" + _conf_val_spk2utt_basename(),
        f"val_spk1_enroll={data}/dev/spk1_enroll",
        f"val_spk2_enroll={data}/dev/spk2_enroll",
        *TINY,
    ]
    args = ["--config", CONF]
    for s in sets:
        args += ["--set", s]
    _run("wesep_tpu.bin.train", *args)

    log = open(os.path.join(exp, "train.log")).read()
    assert "Epoch 1" in log or "epoch 1" in log.lower()
    models = os.path.join(exp, "models")
    assert os.path.exists(os.path.join(models, "checkpoint_1.ckpt"))

    # recipe stage 5: infer over the test split with fixed enroll maps
    infer_sets = [
        f"exp_dir={exp}",
        f"checkpoint={models}/checkpoint_1.ckpt",
        f"test_data={data}/test/shards.list",
        f"test_spk2utt={data}/test/enroll_wav.scp",
        f"test_spk1_enroll={data}/test/spk1_enroll",
        f"test_spk2_enroll={data}/test/spk2_enroll",
        *TINY,
    ]
    args = ["--config", CONF]
    for s in infer_sets:
        args += ["--set", s]
    _run("wesep_tpu.bin.infer", *args)
    audio = os.path.join(exp, "audio")
    wavs = [f for f in os.listdir(audio) if f.endswith(".wav")]
    # 1 test mixture x 2 target speakers
    assert len(wavs) == 2, wavs


def _conf_val_spk2utt_basename():
    """The conf must ship the wav-path map (NOT single.utt2spk)."""
    with open(CONF) as f:
        val = yaml.safe_load(f)["val_spk2utt"]
    base = os.path.basename(val)
    assert base != "single.utt2spk", (
        "joint-mode val_spk2utt must map utt -> wav path"
    )
    return base


def test_all_joint_confs_use_wav_path_map():
    """Every joint-training conf must feed a wav-path map to val_spk2utt."""
    import glob

    confs = glob.glob(
        os.path.join(REPO, "examples", "**", "confs", "*.yaml"),
        recursive=True,
    )
    bad = []
    for c in confs:
        with open(c) as f:
            cfg = yaml.safe_load(f)
        tse = (cfg.get("model_args") or {}).get("tse_model", {})
        if not tse.get("joint_training", False):
            continue
        val = cfg.get("val_spk2utt", "")
        if os.path.basename(str(val)) == "single.utt2spk":
            bad.append(os.path.relpath(c, REPO))
    assert not bad, f"joint confs with utt->spk map in val_spk2utt: {bad}"
