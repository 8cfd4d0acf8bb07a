"""Shared scaffolding for reference-model golden-parity tests.

The reference models at /root/reference import three things this
environment does not have: the `wespeaker` package (speaker encoders),
`torchaudio` (MelSpectrogram + kaldi fbank), and `lmdb`-adjacent extras
pulled in by `wesep/__init__.py`. This module installs the minimum
functional substitutes so the reference torch models can be CONSTRUCTED
AND RUN for weight-port parity tests:

  * `wespeaker.models.speaker_model.get_speaker_model` resolves through a
    per-test registry (`register_speaker_model`) so a test can hand the
    reference model a torch speaker-encoder twin (e.g. the wespeaker-exact
    ECAPA twin from test_ecapa_ws). Unregistered names resolve to None —
    the behavior the joint_training=False tests relied on.
  * `torchaudio.transforms.MelSpectrogram` is a functional torch twin
    (center/reflect STFT, htk mel scale, norm=None, power=2 — the
    torchaudio configuration the reference uses at
    /root/reference/wesep/models/bsrnn.py:233-242).
  * `torchaudio.compliance.kaldi.fbank` bridges to wesep_tpu's own
    kaldi_fbank (numpy). NOTE: this makes the reference-side fbank
    identical to ours BY CONSTRUCTION, so parity tests that cross it
    validate everything around the fbank (attention, fusion, masking),
    not the fbank itself — kaldi_fbank has its own parity suite
    (tests/test_fbank.py).

Package shells for `wesep`, `wesep.models`, `wesep.modules`,
`wesep.utils` point __path__ at the reference tree so submodules load
without executing `wesep/__init__.py` (which imports unavailable deps).
"""

import sys
import types

import numpy as np
import torch

_REGISTRY = {}


def register_speaker_model(name, cls):
    """Make get_speaker_model(name) resolve to `cls` in reference code."""
    _REGISTRY[name] = cls


def _get_speaker_model(name=None, *_a, **_k):
    return _REGISTRY.get(name)


class TorchMelSpectrogram(torch.nn.Module):
    """torchaudio.transforms.MelSpectrogram twin (htk, norm=None, power=2,
    center=True/reflect). Mirrors wesep_tpu.ops.fbank.melspectrogram so
    golden tests cross-check the flax consistent-feats frontend."""

    def __init__(self, sample_rate=16000, n_fft=400, win_length=None,
                 hop_length=None, f_min=0.0, f_max=None, n_mels=128,
                 window_fn=torch.hann_window, power=2.0):
        super().__init__()
        self.n_fft = n_fft
        self.win_length = win_length or n_fft
        self.hop_length = hop_length or self.win_length // 2
        self.power = power
        f_max = f_max or sample_rate / 2.0
        self.register_buffer("window", window_fn(self.win_length))
        bank = _htk_banks(n_fft // 2 + 1, f_min, f_max, n_mels, sample_rate)
        self.register_buffer(
            "bank_t", torch.from_numpy(bank.T.astype(np.float32))
        )

    def forward(self, x):
        spec = torch.stft(
            x,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
            window=self.window.to(x.dtype),
            center=True,
            pad_mode="reflect",
            return_complex=True,
        )
        power = spec.abs() ** 2  # [B, F, T]
        if self.power != 2.0:
            power = power.sqrt() ** self.power
        return torch.matmul(self.bank_t.to(power.dtype), power)


def _htk_banks(n_freqs, f_min, f_max, n_mels, sample_rate):
    """torchaudio melscale_fbanks(htk, norm=None): [n_freqs, n_mels]."""
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    mel = lambda hz: 2595.0 * np.log10(1.0 + np.asarray(hz) / 700.0)  # noqa: E731
    m_pts = np.linspace(mel(f_min), mel(f_max), n_mels + 2)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    return np.maximum(0.0, np.minimum(down, up))


def _kaldi_fbank_bridge(
    waveform,
    num_mel_bins=23,
    frame_length=25.0,
    frame_shift=10.0,
    dither=1.0,
    sample_frequency=16000,
    window_type="hamming",
    use_energy=False,
    **_kw,
):
    """torchaudio.compliance.kaldi.fbank signature -> wesep_tpu kaldi_fbank
    (dither forced off: reference tfmap_emb passes dither=0.0)."""
    assert window_type == "hamming" and not use_energy
    import jax.numpy as jnp

    from wesep_tpu.ops.fbank import kaldi_fbank

    x = waveform.detach().cpu().numpy()
    feats = np.asarray(
        kaldi_fbank(
            jnp.asarray(x),
            sample_rate=int(sample_frequency),
            num_mel_bins=num_mel_bins,
            frame_length_ms=float(frame_length),
            frame_shift_ms=float(frame_shift),
            dither=0.0,
        )
    )
    return torch.from_numpy(feats[0].copy())


def install_reference():
    """Install stubs + package shells; idempotent and authoritative (it
    upgrades any thin stubs installed earlier by other tests)."""
    for name in ("wespeaker", "wespeaker.models",
                 "wespeaker.models.speaker_model"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["wespeaker.models.speaker_model"].get_speaker_model = (
        _get_speaker_model
    )

    ta = sys.modules.get("torchaudio")
    if ta is None or not getattr(ta, "_ref_compat", False):
        ta = types.ModuleType("torchaudio")
        ta._ref_compat = True
        sys.modules["torchaudio"] = ta
    transforms = types.ModuleType("torchaudio.transforms")
    transforms.MelSpectrogram = TorchMelSpectrogram
    ta.transforms = transforms
    sys.modules["torchaudio.transforms"] = transforms
    compliance = types.ModuleType("torchaudio.compliance")
    kaldi = types.ModuleType("torchaudio.compliance.kaldi")
    kaldi.fbank = _kaldi_fbank_bridge
    compliance.kaldi = kaldi
    ta.compliance = compliance
    sys.modules["torchaudio.compliance"] = compliance
    sys.modules["torchaudio.compliance.kaldi"] = kaldi

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    # Bypass wesep/__init__.py (pulls silero_vad etc.): register package
    # shells whose __path__ points at the reference tree so submodules load.
    for name, path in (
        ("wesep", "/root/reference/wesep"),
        ("wesep.models", "/root/reference/wesep/models"),
        ("wesep.modules", "/root/reference/wesep/modules"),
        ("wesep.utils", "/root/reference/wesep/utils"),
    ):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [path]
            sys.modules[name] = pkg
