"""Golden end-to-end decode battery: reference torch checkpoint ->
converter -> bin/infer -> waveforms match the reference torch decode,
for ALL SIX model families (r4 VERDICT #5/#6; round 3 covered only the
hub BSRNN path, round 4 the four flagships; round 5 added BSRNN_Multi
and joint BSRNN_Feats incl. the tfmap_emb ECAPA frame-level path with
enrollment WAVS through the infer pipeline).

This is the turnkey quality-run path: a user with a reference-trained
.pt can convert it and decode with identical results, so Libri2Mix
SI-SNRi measured by this stack is directly comparable with the
reference toolkit's numbers.
"""

import io
import os
import sys
import tarfile

import numpy as np
import pytest
import yaml

import jax  # noqa: F401  (platform forced by conftest)

torch = pytest.importorskip("torch")

from test_bsrnn import _install_reference  # noqa: E402

from wesep_tpu.data.wav_io import read_wav, wav_bytes  # noqa: E402
from wesep_tpu.utils.file_utils import write_vec_ark_scp  # noqa: E402
from wesep_tpu.utils.score import cal_SISNR  # noqa: E402

# (family, reference module.class, shared ctor/model_args, emb_dim)
FAMILIES = {
    "BSRNN": (
        "wesep.models.bsrnn", "BSRNN",
        dict(sr=16000, win=512, stride=128, feature_dim=16, num_repeat=2,
             spk_fuse_type="multiply", use_spk_transform=False,
             multi_fuse=False, joint_training=False, spk_emb_dim=16),
        16,
    ),
    "DPCCN": (
        "wesep.models.dpccn", "DPCCN",
        dict(joint_training=False, spk_emb_dim=32,
             spk_fuse_type="multiply"),
        32,
    ),
    "TFGridNet": (
        "wesep.models.tfgridnet", "TFGridNet",
        dict(n_srcs=1, n_fft=128, stride=64, n_layers=2,
             lstm_hidden_units=32, attn_n_head=4, attn_approx_qk_dim=256,
             emb_dim=16, emb_ks=4, emb_hs=1, spk_emb_dim=24,
             spk_fuse_type="multiply", joint_training=False),
        24,
    ),
    "ConvTasNet": (  # SpEx+ layout: multi encoder/decoder
        "wesep.models.convtasnet", "ConvTasNet",
        dict(N=16, L=20, B=8, H=16, P=3, X=2, R=2, spk_emb_dim=12,
             norm="gLN", causal=False, skip_con=False,
             spk_fuse_type="concatConv", multi_fuse=True,
             use_spk_transform=False, encoder_type="Multi",
             decoder_type="Multi", joint_training=False),
        12,
    ),
    # SSA variant; its eval forward is the plain single pass
    # (bsrnn_multi_optim.py:156, r4 VERDICT #6). spk_emb_dim must be 256:
    # the reference hardcodes SpeakerTransform's input width
    "BSRNN_Multi": (
        "wesep.models.bsrnn_multi_optim", "BSRNN_Multi",
        dict(sr=16000, win=512, stride=128, feature_dim=16, num_repeat=2,
             spk_fuse_type="concat", use_spk_transform=True,
             multi_fuse=True, joint_training=False, spk_emb_dim=256),
        256,
    ),
}


def _ref_decode(name, ref, mix, emb):
    with torch.no_grad():
        out = ref(torch.from_numpy(mix[None]), torch.from_numpy(emb[None]))
    # reference output contracts differ: BSRNN-family returns (est,
    # logits); ConvTasNet returns the est LIST itself (convtasnet.py:218)
    # and infer takes [0] (reference infer.py:121-122)
    est = out[0]
    if isinstance(est, (list, tuple)):
        est = est[0]
    return est.numpy()[0]


# heavy families ride the slow suite; BSRNN + ConvTasNet (SpEx+) keep
# converter->infer->waveform coverage in the fast suite
_HEAVY = {"DPCCN", "TFGridNet", "BSRNN_Multi"}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=[pytest.mark.slow] if n in _HEAVY else [])
        for n in FAMILIES
    ],
)
def test_converted_checkpoint_decodes_like_reference(
    monkeypatch, tmp_path, name
):
    _install_reference(monkeypatch)
    import importlib

    mod_name, cls_name, model_args, emb_dim = FAMILIES[name]
    RefCls = getattr(importlib.import_module(mod_name), cls_name)

    from wesep_tpu.bin.infer import infer

    torch.manual_seed(3)
    ref = RefCls(**{**model_args, "spksInTrain": 4}).eval()
    pt_path = str(tmp_path / "avg_model.pt")
    torch.save({"models": [ref.state_dict()]}, pt_path)

    config = {
        "exp_dir": str(tmp_path / "exp"),
        "model": {"tse_model": name},
        "model_args": {"tse_model": dict(model_args)},
        "data_type": "shard",
        "dataset_args": {"resample_rate": 16000},
        "dataloader_args": {"batch_size": 1},
        "optimizer": {"tse_model": "Adam"},
        "optimizer_args": {"tse_model": {"lr": 1e-3}},
        "scheduler": {"tse_model": "ExponentialDecrease"},
        "scheduler_args": {"tse_model": {"initial_lr": 1e-3,
                                         "final_lr": 1e-4}},
    }
    cfg_path = str(tmp_path / "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(config, f)

    # convert via the actual CLI tool
    from wesep_tpu.tools import convert_torch_checkpoint

    ckpt_path = str(tmp_path / "avg_model.ckpt")
    argv = sys.argv
    sys.argv = ["convert", "--torch_ckpt", pt_path, "--config", cfg_path,
                "--out", ckpt_path]
    try:
        convert_torch_checkpoint.main()
    finally:
        sys.argv = argv
    assert os.path.exists(ckpt_path)

    # premixed 2-utterance test shard + embeddings
    rng = np.random.default_rng(0)
    t = 6000
    embeds = {
        "utt_spkA": (np.eye(2, emb_dim)[0] + 0.01).astype(np.float32),
        "utt_spkB": (np.eye(2, emb_dim)[1] + 0.01).astype(np.float32),
    }
    _, scp_path = write_vec_ark_scp(str(tmp_path / "embed"), embeds)
    mixes = {}
    with tarfile.open(tmp_path / "test.tar", "w") as tar:
        for i, key in enumerate(("g00", "g01")):
            s1 = rng.standard_normal(t).astype(np.float32) * 0.2
            s2 = rng.standard_normal(t).astype(np.float32) * 0.2
            mixes[key] = s1 + s2

            def add(nm, data):
                info = tarfile.TarInfo(nm)
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))

            add(f"{key}.spk1", b"spkA")
            add(f"{key}.spk2", b"spkB")
            add(f"{key}.wav", wav_bytes(s1 + s2, 16000))
            add(f"{key}_spk1.wav", wav_bytes(s1, 16000))
            add(f"{key}_spk2.wav", wav_bytes(s2, 16000))
    with open(tmp_path / "test.list", "w") as f:
        f.write(str(tmp_path / "test.tar") + "\n")
    with open(tmp_path / "spk1_enroll", "w") as f:
        f.write("g00 utt_spkA\ng01 utt_spkA\n")
    with open(tmp_path / "spk2_enroll", "w") as f:
        f.write("g00 utt_spkB\ng01 utt_spkB\n")

    infer(
        cfg_path,
        checkpoint=ckpt_path,
        test_data=str(tmp_path / "test.list"),
        test_spk_embeds=scp_path,
        test_spk1_enroll=str(tmp_path / "spk1_enroll"),
        test_spk2_enroll=str(tmp_path / "spk2_enroll"),
        length_bucket=2000,
    )

    audio_dir = os.path.join(config["exp_dir"], "audio")
    wavs = sorted(f for f in os.listdir(audio_dir) if f.endswith(".wav"))
    assert len(wavs) == 4  # 2 utts x 2 targets

    # reference torch decode of the same mixtures/enrollments
    for fname in wavs:
        # Utt{n}-{key}-T{slot}.wav, slot 0 -> spk1, slot 1 -> spk2
        stem = fname[:-4]
        _, key, tspk = stem.split("-")
        emb = embeds["utt_spkA" if tspk == "T0" else "utt_spkB"]
        want = _ref_decode(name, ref, mixes[key], emb)
        got, sr = read_wav(os.path.join(audio_dir, fname))
        got = np.asarray(got).reshape(-1)
        assert sr == 16000
        # infer peak-normalizes to 0.9; SI-SNR is scale invariant.
        # trim to the common length (multi-scale decoders trim to the
        # shortest scale)
        n = min(len(got), len(want))
        sisnr = cal_SISNR(got[:n], want[:n])
        assert sisnr > 30.0, f"{fname}: decode mismatch (SI-SNR {sisnr})"


@pytest.mark.parametrize("variant", ["tfmap_spec", "tfmap_emb"])
def test_converted_feats_checkpoint_decodes_like_reference(
    monkeypatch, tmp_path, variant
):
    """BSRNN_Feats golden decode (r4 VERDICT #6): frame-level-cue model,
    JOINT ECAPA branch, enrollment WAVS through the infer pipeline.
    tfmap_emb exercises the ECAPA frame-level-feature path."""
    _install_reference(monkeypatch)
    from test_bsrnn_feats import _FrameEcapa, _install
    from test_ecapa_ws import _randomize_bn_stats

    from wesep_tpu.bin.infer import infer
    from wesep_tpu.tools import convert_torch_checkpoint

    RefFeats = _install(with_ecapa=True)
    if variant == "tfmap_emb":
        import ref_compat

        ref_compat.register_speaker_model("FRAME_ECAPA_c32", _FrameEcapa)

    torch.manual_seed(7)
    n = 16
    # the reference's tfmap_emb fbank hardcodes 80 mel bins
    feat_dim = 80 if variant == "tfmap_emb" else 40
    spk_args = {"feat_dim": feat_dim, "embed_dim": 16}
    kwargs = dict(
        spk_emb_dim=16, sr=16000, win=512, stride=128, feature_dim=n,
        num_repeat=1, use_spk_transform=False,
        spectral_feat=variant,
        spk_fuse_type=(
            "cross_additive" if variant == "tfmap_emb" else "multiply"
        ),
        multi_fuse=False, joint_training=True, multi_task=False,
        spk_feat=False, feat_type="consistent",
    )
    spk_model = (
        "FRAME_ECAPA_c32" if variant == "tfmap_emb"
        else "ECAPA_TDNN_GLOB_c32"
    )
    ref = RefFeats(
        **{**kwargs, "spk_model": spk_model, "spk_args": spk_args,
           "spksInTrain": 4}
    )
    if variant == "tfmap_emb":
        # small-channel config: the reference hardcodes 3*192 here
        ref.separator.attenFuse[0] = torch.nn.Linear(3 * 32, n)
    _randomize_bn_stats(ref.spk_model, torch.Generator().manual_seed(8))
    ref.eval()
    pt_path = str(tmp_path / "avg_model.pt")
    torch.save({"models": [ref.state_dict()]}, pt_path)

    enroll_len = 8000  # == enroll wav length -> pad/trim is identity
    config = {
        "exp_dir": str(tmp_path / "exp"),
        "model": {"tse_model": "BSRNN_Feats"},
        # wesep_tpu reads ECAPA frame-level features via the encoder's
        # return_frame_feats mode, so the model name stays the plain
        # ECAPA even where the reference wraps it as FRAME_ECAPA
        "model_args": {"tse_model": {
            **kwargs, "spk_model": "ECAPA_TDNN_GLOB_c32",
            "spk_args": {**spk_args, "layout": "wespeaker"},
            "remat": False,
        }},
        "data_type": "shard",
        "dataset_args": {"resample_rate": 16000,
                         "enroll_len": enroll_len},
        "dataloader_args": {"batch_size": 1},
        "optimizer": {"tse_model": "Adam"},
        "optimizer_args": {"tse_model": {"lr": 1e-3}},
        "scheduler": {"tse_model": "ExponentialDecrease"},
        "scheduler_args": {"tse_model": {"initial_lr": 1e-3,
                                         "final_lr": 1e-4}},
    }
    cfg_path = str(tmp_path / "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(config, f)

    ckpt_path = str(tmp_path / "avg_model.ckpt")
    argv = sys.argv
    sys.argv = ["convert", "--torch_ckpt", pt_path, "--config", cfg_path,
                "--out", ckpt_path]
    try:
        convert_torch_checkpoint.main()
    finally:
        sys.argv = argv
    assert os.path.exists(ckpt_path)

    # shard + enrollment WAVS on disk + enroll scp (joint mode)
    rng = np.random.default_rng(0)
    t = 6000
    enrolls = {}
    scp_lines = []
    for spk in ("spkA", "spkB"):
        wav = rng.standard_normal(enroll_len).astype(np.float32) * 0.2
        path = str(tmp_path / f"enroll_{spk}.wav")
        with open(path, "wb") as f:
            f.write(wav_bytes(wav, 16000))
        enrolls[f"utt_{spk}"] = wav
        scp_lines.append(f"utt_{spk} {path}")
    scp_path = str(tmp_path / "enroll_wav.scp")
    with open(scp_path, "w") as f:
        f.write("\n".join(scp_lines) + "\n")

    mixes = {}
    with tarfile.open(tmp_path / "test.tar", "w") as tar:
        for key in ("g00", "g01"):
            s1 = rng.standard_normal(t).astype(np.float32) * 0.2
            s2 = rng.standard_normal(t).astype(np.float32) * 0.2
            mixes[key] = s1 + s2

            def add(nm, data):
                info = tarfile.TarInfo(nm)
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))

            add(f"{key}.spk1", b"spkA")
            add(f"{key}.spk2", b"spkB")
            add(f"{key}.wav", wav_bytes(s1 + s2, 16000))
            add(f"{key}_spk1.wav", wav_bytes(s1, 16000))
            add(f"{key}_spk2.wav", wav_bytes(s2, 16000))
    with open(tmp_path / "test.list", "w") as f:
        f.write(str(tmp_path / "test.tar") + "\n")
    with open(tmp_path / "spk1_enroll", "w") as f:
        f.write("g00 utt_spkA\ng01 utt_spkA\n")
    with open(tmp_path / "spk2_enroll", "w") as f:
        f.write("g00 utt_spkB\ng01 utt_spkB\n")

    infer(
        cfg_path,
        checkpoint=ckpt_path,
        test_data=str(tmp_path / "test.list"),
        test_spk2utt=scp_path,
        test_spk1_enroll=str(tmp_path / "spk1_enroll"),
        test_spk2_enroll=str(tmp_path / "spk2_enroll"),
        length_bucket=2000,
    )

    audio_dir = os.path.join(config["exp_dir"], "audio")
    wavs = sorted(f for f in os.listdir(audio_dir) if f.endswith(".wav"))
    assert len(wavs) == 4

    for fname in wavs:
        stem = fname[:-4]
        _, key, tspk = stem.split("-")
        enroll = enrolls["utt_spkA" if tspk == "T0" else "utt_spkB"]
        with torch.no_grad():
            want, _ = ref(
                torch.from_numpy(mixes[key][None]),
                torch.from_numpy(enroll[None]),
            )
        want = want.numpy()[0]
        got, sr = read_wav(os.path.join(audio_dir, fname))
        got = np.asarray(got).reshape(-1)
        assert sr == 16000
        nlen = min(len(got), len(want))
        sisnr = cal_SISNR(got[:nlen], want[:nlen])
        assert sisnr > 30.0, f"{fname}: decode mismatch (SI-SNR {sisnr})"
