"""Hub chain end-to-end: released-layout archive -> Hub -> converter ->
Extractor -> separation.

Validates the archive layout <-> converter <-> extractor chain for the
released-model path (reference cli/hub.py:87-123 layout: a tar.gz with a
model subdir containing config.yaml + torch avg_model.pt). The download
is served from a file:// URL (no egress here); the torch checkpoint's
separator core is auto-converted and the wespeaker speaker branch is
re-initialized with a warning (no wespeaker layout port — documented).
"""

import io
import os
import tarfile

import numpy as np
import pytest
import yaml

torch = pytest.importorskip("torch")

from test_bsrnn import _install_reference  # noqa: E402

MODEL_ARGS = dict(
    sr=16000,
    win=512,
    stride=128,
    feature_dim=16,
    num_repeat=2,
    spk_fuse_type="multiply",
    use_spk_transform=False,
    multi_fuse=False,
    joint_training=False,  # torch side: separator only
    spk_emb_dim=16,
)


def _make_release_archive(path: str):
    """tar.gz with the reference hub layout: <name>/config.yaml +
    <name>/avg_model.pt."""
    torch.manual_seed(5)
    from wesep.models.bsrnn import BSRNN as RefBSRNN

    ref = RefBSRNN(**{**MODEL_ARGS, "spksInTrain": 4}).eval()
    buf = io.BytesIO()
    torch.save({"models": [ref.state_dict()]}, buf)
    pt_bytes = buf.getvalue()

    # archive config declares the JOINT model (like the released
    # bsrnn_ecapa_vox1): raw-waveform enrollment through an in-repo
    # speaker encoder; its weights are not in the torch bundle
    config = {
        "model": {"tse_model": "BSRNN"},
        "model_args": {"tse_model": {
            **MODEL_ARGS,
            "joint_training": True,
            "spk_model": "ResNet18",
            "spk_args": {
                "feat_dim": 80,
                "embed_dim": 16,
                "pooling_func": "TSTP",
                "two_emb_layer": False,
            },
            "spk_feat": False,
            "feat_type": "consistent",
            "multi_task": False,
        }},
        "dataset_args": {"resample_rate": 16000,
                         "speaker_feat": False},
        "dataloader_args": {"batch_size": 1},
    }
    cfg_bytes = yaml.dump(config).encode()

    with tarfile.open(path, "w:gz") as tar:
        for name, data in (
            ("bsrnn_test_model/config.yaml", cfg_bytes),
            ("bsrnn_test_model/avg_model.pt", pt_bytes),
        ):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))


def test_hub_download_convert_extract(monkeypatch, tmp_path):
    _install_reference(monkeypatch)
    from wesep_tpu.cli.extractor import Extractor
    from wesep_tpu.cli.hub import Hub

    archive = tmp_path / "bsrnn_test_model.tar.gz"
    _make_release_archive(str(archive))

    home = tmp_path / "home"
    os.makedirs(home)
    monkeypatch.setenv("HOME", str(home))
    monkeypatch.setattr(Hub, "BaseURL", f"file://{tmp_path}/")
    monkeypatch.setattr(
        Hub, "Assets", {"english": "bsrnn_test_model.tar.gz"}
    )

    model_dir = Hub.get_model("english")
    assert os.path.exists(os.path.join(model_dir, "config.yaml"))
    assert os.path.exists(os.path.join(model_dir, "avg_model.ckpt"))

    # cached second call: no re-download
    assert Hub.get_model("english") == model_dir

    ext = Extractor(model_dir)
    rng = np.random.default_rng(0)
    mix = rng.standard_normal((1, 8000)).astype(np.float32) * 0.1
    enroll = rng.standard_normal((1, 6000)).astype(np.float32) * 0.1
    est, sr = ext.extract_speech_from_pcm(mix, 16000, enroll, 16000)
    assert sr == 16000
    est = np.asarray(est).reshape(-1)
    assert est.shape[0] == 8000
    assert np.isfinite(est).all()
    assert np.max(np.abs(est)) <= 0.9 + 1e-6  # output_norm


def test_hub_unknown_language():
    from wesep_tpu.cli.hub import Hub

    with pytest.raises(ValueError):
        Hub.get_model("klingon")


def test_hub_joint_wespeaker_checkpoint(monkeypatch, tmp_path, capsys):
    """A released-style JOINT checkpoint (separator + wespeaker-ECAPA
    under spk_model.*, like the hub's bsrnn_ecapa_vox1) converts
    losslessly: the speaker branch is ported (not re-initialized) and the
    extractor auto-selects the wespeaker layout from the checkpoint
    fingerprint (released config.yamls predate the layout knob)."""
    _install_reference(monkeypatch)
    from test_ecapa_ws import _TorchEcapaWS, _randomize_bn_stats

    from wesep.models.bsrnn import BSRNN as RefBSRNN

    from wesep_tpu.cli.extractor import Extractor
    from wesep_tpu.cli.hub import Hub

    torch.manual_seed(7)
    gen = torch.Generator().manual_seed(8)
    ref = RefBSRNN(**{**MODEL_ARGS, "spksInTrain": 4}).eval()
    twin = _TorchEcapaWS(channels=32, feat_dim=80, embed_dim=16,
                         global_context_att=True)
    _randomize_bn_stats(twin, gen)
    sd = dict(ref.state_dict())
    sd.update({f"spk_model.{k}": v for k, v in twin.state_dict().items()})
    buf = io.BytesIO()
    torch.save({"models": [sd]}, buf)

    config = {
        "model": {"tse_model": "BSRNN"},
        "model_args": {"tse_model": {
            **MODEL_ARGS,
            "joint_training": True,
            "spk_model": "ECAPA_TDNN_GLOB_c32",
            # NOTE: no 'layout' key — released configs don't have it;
            # the extractor must infer it from the checkpoint
            "spk_args": {"feat_dim": 80, "embed_dim": 16,
                         "pooling_func": "ASTP"},
            "spk_feat": False,
            "feat_type": "consistent",
            "multi_task": False,
        }},
        "dataset_args": {"resample_rate": 16000, "speaker_feat": False},
        "dataloader_args": {"batch_size": 1},
    }
    archive = tmp_path / "bsrnn_joint_ws.tar.gz"
    with tarfile.open(archive, "w:gz") as tar:
        for name, data in (
            ("bsrnn_joint_ws/config.yaml", yaml.dump(config).encode()),
            ("bsrnn_joint_ws/avg_model.pt", buf.getvalue()),
        ):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))

    home = tmp_path / "home"
    os.makedirs(home)
    monkeypatch.setenv("HOME", str(home))
    monkeypatch.setattr(Hub, "BaseURL", f"file://{tmp_path}/")
    monkeypatch.setattr(Hub, "Assets", {"english": "bsrnn_joint_ws.tar.gz"})

    model_dir = Hub.get_model("english")
    ext = Extractor(model_dir)
    out = capsys.readouterr().out
    assert "initializing them randomly" not in out  # branch WAS ported

    rng = np.random.default_rng(1)
    mix = rng.standard_normal((1, 8000)).astype(np.float32) * 0.1
    enroll = rng.standard_normal((1, 6000)).astype(np.float32) * 0.1
    est, sr = ext.extract_speech_from_pcm(mix, 16000, enroll, 16000)
    est = np.asarray(est).reshape(-1)
    assert est.shape[0] == 8000 and np.isfinite(est).all()

    # the ported branch is bit-faithful: running the flax encoder on the
    # same fbank features matches the torch twin
    import jax.numpy as jnp

    from wesep_tpu.models.speaker.ecapa_ws import ECAPA_TDNN_WS

    twin.eval()
    feats = torch.randn(2, 33, 80, generator=gen)
    with torch.no_grad():
        want = twin(feats).numpy()
    enc = ECAPA_TDNN_WS(channels=32, embed_dim=16, global_context_att=True)
    got = enc.apply(
        {
            "params": ext.variables["params"]["spk_model_net"],
            "batch_stats": ext.variables["batch_stats"]["spk_model_net"],
        },
        jnp.asarray(feats.numpy()),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=0)
