"""Data plane: wav io, shard parsing, processors, collate, FRAM-RIR."""

import io
import os
import tarfile

import numpy as np
import pytest

from wesep_tpu.data.wav_io import read_wav, wav_bytes, write_wav


def _sine(freq, t=16000, sr=16000, amp=0.5):
    return (amp * np.sin(2 * np.pi * freq * np.arange(t) / sr)).astype(
        np.float32
    )


def test_wav_roundtrip(tmp_path):
    wav = _sine(440)
    path = str(tmp_path / "a.wav")
    write_wav(path, wav, 16000)
    back, sr = read_wav(path)
    assert sr == 16000 and back.shape == (1, 16000)
    np.testing.assert_allclose(back[0], wav, atol=1e-4)
    # bytes roundtrip
    back2, sr2 = read_wav(wav_bytes(wav, 8000))
    assert sr2 == 8000
    np.testing.assert_allclose(back2[0], wav, atol=1e-4)


def _write_premixed_shard(path, n_utts=4, sr=16000, t=8000):
    """Premixed shard layout: {key}.wav, {key}_spk{i}.wav, {key}.spk{i}
    (reference tools/make_shard_list_premix.py:37-71)."""
    rng = np.random.default_rng(0)
    with tarfile.open(path, "w") as tar:
        for u in range(n_utts):
            key = f"utt{u:03d}"
            s1 = rng.standard_normal(t).astype(np.float32) * 0.2
            s2 = rng.standard_normal(t).astype(np.float32) * 0.2
            mix = s1 + s2

            def add(name, data):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))

            add(f"{key}.spk1", f"spkA{u % 2}".encode())
            add(f"{key}.spk2", f"spkB{u % 2}".encode())
            add(f"{key}.wav", wav_bytes(mix, sr))
            add(f"{key}_spk1.wav", wav_bytes(s1, sr))
            add(f"{key}_spk2.wav", wav_bytes(s2, sr))
    return path


def _write_single_shard(path, n_utts=8, sr=16000, t=8000):
    """Online layout: {key}.wav, {key}.spk."""
    rng = np.random.default_rng(1)
    with tarfile.open(path, "w") as tar:
        for u in range(n_utts):
            key = f"sutt{u:03d}"

            def add(name, data):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))

            add(f"{key}.spk", f"spk{u % 4}".encode())
            add(
                f"{key}.wav",
                wav_bytes(rng.standard_normal(t).astype(np.float32) * 0.2, sr),
            )
    return path


def test_premixed_pipeline_and_collate(tmp_path):
    from wesep_tpu.data import BatchLoader, Dataset, tse_collate_fn

    shard = _write_premixed_shard(str(tmp_path / "shard0.tar"))
    lst = str(tmp_path / "data.list")
    with open(lst, "w") as f:
        f.write(shard + "\n")
    spk_embeds = {
        f"spk{ab}{i}": [np.ones((1, 17), np.float32) * i]
        for ab in "AB"
        for i in range(2)
    }
    configs = {
        "resample_rate": 16000,
        "shuffle": True,
        "shuffle_args": {"shuffle_size": 4},
        "chunk_len": 4000,
    }
    ds = Dataset(
        "shard",
        lst,
        configs,
        spk2embed_dict=spk_embeds,
        state="train",
        joint_training=False,
        rank=0,
        world_size=1,
    )
    loader = BatchLoader(ds, batch_size=2, collate_fn=tse_collate_fn,
                         prefetch=0)
    loader.set_epoch(0)
    batches = list(loader)
    assert len(batches) == 2  # 4 utts x 2 rows / (2 utts per batch -> 4 rows)
    b = batches[0]
    assert b["wav_mix"].shape == (4, 4000)
    assert b["wav_targets"].shape == (4, 4000)
    assert b["spk_embeds"].shape == (4, 17)
    assert len(b["key"]) == 4
    # mixture row repeated per speaker
    np.testing.assert_allclose(b["wav_mix"][0], b["wav_mix"][1])


def test_online_mix_pipeline(tmp_path):
    from wesep_tpu.data import BatchLoader, Dataset, tse_collate_fn

    shard = _write_single_shard(str(tmp_path / "sshard0.tar"))
    lst = str(tmp_path / "data.list")
    with open(lst, "w") as f:
        f.write(shard + "\n")
    # enrollment per speaker: list of (utt, path) pairs
    enroll_dir = tmp_path / "enroll"
    os.makedirs(enroll_dir)
    spk2enroll = {}
    for i in range(4):
        p = str(enroll_dir / f"spk{i}.wav")
        write_wav(p, _sine(300 + 100 * i, t=6000), 16000)
        spk2enroll[f"spk{i}"] = [(f"e{i}", p)]
    dict_spk = {f"spk{i}": i for i in range(4)}
    configs = {
        "resample_rate": 16000,
        "shuffle": True,
        "chunk_len": 4000,
        "num_speakers": 2,
        "online_buffer_size": 8,
        "use_random_snr": True,
        "speaker_feat": True,
        "fbank_args": {"num_mel_bins": 40, "dither": 0.0},
    }
    ds = Dataset(
        "shard",
        lst,
        configs,
        spk2embed_dict=spk2enroll,
        state="train",
        joint_training=True,
        dict_spk=dict_spk,
        online_mix=True,
        rank=0,
        world_size=1,
    )
    loader = BatchLoader(ds, batch_size=2, collate_fn=tse_collate_fn,
                         prefetch=0)
    loader.set_epoch(0)
    batches = list(loader)
    assert batches, "no batches produced"
    b = batches[0]
    assert b["wav_mix"].shape == (4, 4000)
    assert b["spk_embeds"].ndim == 3  # fbank [rows, T', 40]
    assert b["spk_embeds"].shape[-1] == 40
    assert b["spk_label"].shape == (4,)
    # mixture must not equal target (interference added)
    assert not np.allclose(b["wav_mix"][0], b["wav_targets"][0])


def test_snr_mixer_energy():
    from wesep_tpu.data.processor import snr_mixer

    s1 = _sine(440, t=4000)[None]
    s2 = _sine(700, t=4000)[None]
    sample = {
        "key": "k",
        "num_speaker": 2,
        "wav_spk1": s1.copy(),
        "wav_spk2": s2.copy(),
        "sample_rate": 16000,
    }
    out = next(iter(snr_mixer(iter([sample]), use_random_snr=False)))
    # 0 dB: equal energies after scaling
    e1 = (out["wav_spk1"] ** 2).sum()
    e2 = (out["wav_spk2"] ** 2).sum()
    np.testing.assert_allclose(e1, e2, rtol=1e-4)
    assert np.abs(out["wav_mix"]).max() <= 1.0 + 1e-6
    np.testing.assert_allclose(
        out["wav_mix"], out["wav_spk1"] + out["wav_spk2"], atol=1e-6
    )


def test_random_chunk_rejects_zero_and_tiles():
    from wesep_tpu.data.processor import get_random_chunk

    wav = np.zeros((1, 10000), np.float32)
    wav[0, 6000:] = 1.0
    chunks = get_random_chunk([wav], 2000)
    assert chunks[0].shape == (1, 2000)
    # tiling short input
    short = np.arange(5, dtype=np.float32)[None]
    tiled = get_random_chunk([short], 12)[0]
    np.testing.assert_allclose(tiled[0], np.tile(short[0], 3)[:12])


def test_noise_store_pack(tmp_path):
    from wesep_tpu.data.noise_store import NoiseStore, build_pack

    paths, keys = [], []
    for i in range(3):
        p = str(tmp_path / f"noise_{i}.wav")
        write_wav(p, _sine(100 + i * 50, t=3000), 16000)
        paths.append(p)
        keys.append(f"noise_{i}")
    pack = build_pack(paths, str(tmp_path / "noise.pack"), keys)
    store = NoiseStore(pack)
    assert sorted(store.keys) == keys
    k, data = store.random_one()
    wav, sr = read_wav(data)
    assert sr == 16000 and wav.shape == (1, 3000)


def test_add_noise_snr(tmp_path):
    from wesep_tpu.data.noise_store import build_pack
    from wesep_tpu.data.processor import add_noise

    p = str(tmp_path / "noise_0.wav")
    write_wav(p, np.random.default_rng(0).standard_normal(8000) * 0.3, 16000)
    pack = build_pack([p], str(tmp_path / "n.pack"), ["noise_0"])
    sample = {
        "key": "k",
        "wav_mix": _sine(440, t=4000)[None],
        "sample_rate": 16000,
    }
    out = next(iter(add_noise(iter([sample]), pack, noise_prob=1.0)))
    assert "noise" in out and "snr" in out
    # realized SNR matches the sampled snr within 0.5 dB
    sig = out["wav_mix"] - out["noise"]
    snr = 10 * np.log10((sig**2).mean() / (out["noise"] ** 2).mean())
    assert abs(snr - out["snr"]) < 0.5


def test_fram_rir_shape_and_decay():
    from wesep_tpu.data.fram_rir import single_channel

    cfg = {
        "min_max_room": [[3, 3, 2.5], [10, 6, 4]],
        "rt60": [0.1, 0.7],
        "sr": 16000,
        "mic_dist": [0.2, 5.0],
        "num_src": 2,
    }
    rng = np.random.default_rng(0)
    rir, early = single_channel(cfg, rng=rng)
    assert rir.shape[0] == 1 and rir.shape[1] == 2
    assert early.shape == rir.shape
    assert np.isfinite(rir).all()
    # energy decays: last 10% has far less energy than the peak region
    e = rir[0, 0] ** 2
    n = e.shape[0]
    assert e[: n // 4].sum() > 10 * e[-n // 10 :].sum()
    # early RIR is a masked version: subset energy
    assert (early[0, 0] ** 2).sum() <= (rir[0, 0] ** 2).sum() + 1e-9


def test_fram_rir_multi_channel():
    """multi_channel_array / multi_channel_adhoc / sample_mic_arch
    (reference FRAM_RIR.py:358-558): per-mic RIRs share the room but
    differ per channel, with direct-path arrival offsets bounded by the
    array aperture."""
    from wesep_tpu.data.fram_rir import (
        multi_channel_adhoc,
        multi_channel_array,
        sample_mic_arch,
    )

    cfg = {
        "min_max_room": [[3, 3, 2.5], [10, 6, 4]],
        "rt60": [0.1, 0.7],
        "sr": 16000,
        "mic_dist": [0.2, 5.0],
        "num_src": 2,
    }
    rng = np.random.default_rng(0)
    rir, early = multi_channel_array(dict(cfg), rng=rng)
    assert rir.shape[0] == 2 and rir.shape[1] == 2  # [n_mic, n_src, L]
    assert early.shape == rir.shape
    assert np.isfinite(rir).all()
    # channels are genuinely distinct RIRs of the same room
    assert not np.allclose(rir[0], rir[1])
    # direct-path arrival offset between the 2 mics is bounded by the
    # 10 cm aperture: |dt| <= 0.1 m / 340 m/s ~ 4.7 samples at 16 kHz
    for s in range(2):
        p0 = int(np.argmax(np.abs(early[0, s])))
        p1 = int(np.argmax(np.abs(early[1, s])))
        assert abs(p0 - p1) <= 6
        # per-channel energy decay still holds
        e = rir[0, s] ** 2
        n = e.shape[0]
        assert e[: n // 4].sum() > 10 * e[-n // 10:].sum()

    rir_a, early_a = multi_channel_adhoc(dict(cfg), rng=rng)
    assert 1 <= rir_a.shape[0] <= 3 and rir_a.shape[1] == 2
    assert early_a.shape == rir_a.shape
    assert np.isfinite(rir_a).all()

    # standalone geometry sampler honours count and pairwise spacing
    arch = sample_mic_arch([2, 4], mic_spacing=[0.02, 0.10],
                           bounding_box=[0.08, 0.12, 0], rng=rng)
    k = arch.shape[0]
    assert 2 <= k <= 4 and arch.shape[1] == 3
    for i in range(k):
        for j in range(i + 1, k):
            d = np.linalg.norm(arch[i] - arch[j])
            assert 0.02 <= d <= 0.10
    assert sample_mic_arch([1, 1], rng=rng).shape == (1, 3)


def test_resample():
    from wesep_tpu.data.processor import resample

    wav = _sine(440, t=8000, sr=8000)[None]
    sample = {"key": "k", "wav": wav, "sample_rate": 8000}
    out = next(iter(resample(iter([sample]), 16000)))
    assert out["wav"].shape == (1, 16000)
    assert out["sample_rate"] == 16000
    # 440 Hz tone preserved: correlation with ideal tone high
    ideal = _sine(440, t=16000, sr=16000)
    c = np.corrcoef(out["wav"][0][100:-100], ideal[100:-100])[0, 1]
    assert c > 0.99


def test_datalist_sharding():
    from wesep_tpu.data.datalist import DataList

    lists = [f"s{i}" for i in range(16)]
    seen = []
    for rank in range(2):
        for worker in range(2):
            dl = DataList(
                lists, shuffle=True, rank=rank, world_size=2,
                worker_id=worker, num_workers=2,
            )
            dl.set_epoch(3)
            seen.extend(d["src"] for d in dl)
    assert sorted(seen) == sorted(lists)  # exact partition
    # determinism per epoch
    dl = DataList(lists, shuffle=True, rank=0, world_size=2, worker_id=0,
                  num_workers=2)
    dl.set_epoch(3)
    a = [d["src"] for d in dl]
    dl.set_epoch(3)
    b = [d["src"] for d in dl]
    assert a == b


def test_pipeline_skips_corrupt_shard_members(tmp_path):
    """Corrupt members (truncated wav bytes, junk extension) must be
    skipped with a warning, not crash the epoch (reference
    processor.py:87-88 failure handling)."""
    import tarfile as _tarfile

    from wesep_tpu.data import BatchLoader, Dataset, tse_collate_fn

    shard = _write_premixed_shard(str(tmp_path / "shard0.tar"), n_utts=3)
    # append a corrupt utterance + an unknown-extension member
    with _tarfile.open(shard, "a") as tar:

        def add(name, data):
            info = _tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))

        add("bad000.spk1", b"spkA0")
        add("bad000.spk2", b"spkB0")
        add("bad000.wav", b"RIFFgarbage-not-a-wav")
        add("bad000_spk1.wav", b"\x00\x01")
        add("bad000_spk2.wav", b"\x00\x01")
        add("junk.xyz", b"???")

    lst = str(tmp_path / "data.list")
    with open(lst, "w") as f:
        f.write(shard + "\n")
    spk_embeds = {
        f"spk{ab}{i}": [np.ones((1, 17), np.float32) * i]
        for ab in "AB"
        for i in range(2)
    }
    ds = Dataset(
        "shard", lst,
        {"resample_rate": 16000, "shuffle": False, "chunk_len": 4000},
        spk2embed_dict=spk_embeds, state="train", joint_training=False,
        rank=0, world_size=1,
    )
    loader = BatchLoader(ds, batch_size=1, collate_fn=tse_collate_fn,
                         prefetch=0, drop_last=False)
    loader.set_epoch(0)
    keys = [k for b in loader for k in b["key"]]
    assert len(keys) == 6  # 3 good utts x 2 rows; corrupt one dropped
    assert all(not k.startswith("bad") for k in keys)


def test_prefetch_propagates_pipeline_errors():
    """An exception inside the prefetch thread must surface in the
    consuming loop, not silently end the epoch."""
    from wesep_tpu.data import BatchLoader

    class Boom:
        def set_epoch(self, e):
            pass

        def __iter__(self):
            yield {"num_speaker": 2,
                   "wav_mix": np.zeros((1, 10), np.float32),
                   "wav_spk1": np.zeros((1, 10), np.float32),
                   "wav_spk2": np.zeros((1, 10), np.float32),
                   "embed_spk1": np.zeros((1, 4), np.float32),
                   "embed_spk2": np.zeros((1, 4), np.float32),
                   "spk1": "a", "spk2": "b", "key": "k"}
            raise RuntimeError("pipeline exploded")

    loader = BatchLoader(Boom(), batch_size=1, drop_last=False, prefetch=2)
    with pytest.raises(RuntimeError, match="pipeline exploded"):
        list(loader)
