"""Native STOI/ESTOI/BSS-eval sanity + the score binary end-to-end."""

import os

import numpy as np
import pytest


def _speechlike(t=32000, sr=16000, seed=0):
    """Modulated multi-tone signal (STOI needs speech-band content)."""
    rng = np.random.default_rng(seed)
    ts = np.arange(t) / sr
    sig = np.zeros(t)
    for f in (220, 440, 880, 1760):
        am = 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(2, 8) * ts)
        sig += am * np.sin(2 * np.pi * f * ts + rng.uniform(0, np.pi))
    return (sig / np.abs(sig).max() * 0.7).astype(np.float32)


def test_stoi_identity_and_monotonic():
    from wesep_tpu.utils.stoi import estoi, stoi

    x = _speechlike()
    rng = np.random.default_rng(1)
    assert stoi(x, x, 16000) > 0.99
    assert estoi(x, x, 16000) > 0.99
    low = x + 0.05 * rng.standard_normal(len(x))
    high = x + 0.5 * rng.standard_normal(len(x))
    s_low, s_high = stoi(x, low, 16000), stoi(x, high, 16000)
    assert s_low > s_high
    e_low, e_high = estoi(x, low, 16000), estoi(x, high, 16000)
    assert e_low > e_high


def test_bss_eval_identity_and_permutation():
    from wesep_tpu.utils.bss_eval import bss_eval_sources

    a = _speechlike(16000, seed=2)
    b = _speechlike(16000, seed=3)
    ref = np.stack([a, b])
    # swapped, slightly noisy estimates
    rng = np.random.default_rng(4)
    est = np.stack([
        b + 0.01 * rng.standard_normal(len(b)),
        a + 0.01 * rng.standard_normal(len(a)),
    ])
    sdr, sir, sar, perm = bss_eval_sources(ref, est)
    assert list(perm) == [1, 0]  # permutation recovered
    assert np.all(sdr > 20)
    # identity: very high SDR
    sdr2, _, _, perm2 = bss_eval_sources(ref, ref.copy())
    assert list(perm2) == [0, 1]
    assert np.all(sdr2 > 80)


def test_score_binary(tmp_path):
    from wesep_tpu.bin.score import scoring
    from wesep_tpu.data.wav_io import write_wav

    rng = np.random.default_rng(0)
    keys = ["u1", "u2"]
    scps = {}
    for tag, noise in (("ref", 0.0), ("inf", 0.05)):
        for i in range(2):
            entries = []
            for k in keys:
                sig = _speechlike(
                    16000, seed=hash((k, i)) % 1000
                )
                if noise:
                    sig = sig + noise * rng.standard_normal(len(sig)).astype(
                        np.float32
                    )
                p = str(tmp_path / f"{tag}_{k}_spk{i}.wav")
                write_wav(p, sig, 16000)
                entries.append(f"{k} {p}")
            scp = str(tmp_path / f"{tag}_spk{i}.scp")
            with open(scp, "w") as f:
                f.write("\n".join(entries) + "\n")
            scps[(tag, i)] = scp
    key_file = str(tmp_path / "keys")
    with open(key_file, "w") as f:
        f.write("\n".join(keys) + "\n")
    out = str(tmp_path / "score_out")
    results = scoring(
        out, key_file,
        [scps[("ref", 0)], scps[("ref", 1)]],
        [scps[("inf", 0)], scps[("inf", 1)]],
    )
    assert os.path.exists(os.path.join(out, "RESULTS"))
    assert results["SDR"] > 10
    assert 0.3 < results["STOI"] <= 1.0
    assert os.path.exists(os.path.join(out, "SI_SNR_spk1"))
