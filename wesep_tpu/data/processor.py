"""Streaming data-pipeline transforms, numpy-native.

Re-implementation of the reference generator chain
(/root/reference/wesep/dataset/processor.py) without torch/torchaudio/
soundfile/librosa/lmdb. Each transform is a generator over sample dicts;
waveforms are float32 numpy [1, T] (torchaudio.load layout) so the collate
semantics match the reference byte-for-byte.

The heavy simulation stages (reverb, SNR mix, noise) also exist as batched
jittable device fns in wesep_tpu.data.augment — this host path keeps
per-sample reference semantics for parity and for CPU-only use.
"""

import io
import json
import logging
import random
import tarfile
from typing import Iterable, Iterator
from urllib.parse import urlparse

import numpy as np
from scipy import signal as sp_signal

from wesep_tpu.data.wav_io import read_wav

AUDIO_FORMAT_SETS = {"flac", "mp3", "m4a", "ogg", "opus", "wav", "wma"}

# FRAM-RIR simulation envelope (reference processor.py:23-29)
simu_config = {
    "min_max_room": [[3, 3, 2.5], [10, 6, 4]],
    "rt60": [0.1, 0.7],
    "sr": 16000,
    "mic_dist": [0.2, 5.0],
    "num_src": 1,
}

__all__ = [
    "url_opener",
    "tar_file_and_group",
    "tar_file_and_group_single_spk",
    "parse_raw",
    "parse_raw_single_spk",
    "mix_speakers",
    "snr_mixer",
    "shuffle",
    "spk_to_id",
    "resample",
    "sample_spk_embedding",
    "sample_fix_spk_embedding",
    "sample_enrollment",
    "sample_fix_spk_enrollment",
    "compute_fbank",
    "apply_cmvn",
    "get_random_chunk",
    "filter_len",
    "random_chunk",
    "fix_chunk",
    "add_noise",
    "fetch_noise_chunk",
    "add_reverb",
    "add_noise_on_enroll",
    "add_reverb_on_enroll",
    "spec_aug",
]


def url_opener(data: Iterable[dict]) -> Iterator[dict]:
    """Open local files or network URLs into byte streams
    (processor.py:32-60)."""
    for sample in data:
        assert "src" in sample
        url = sample["src"]
        try:
            pr = urlparse(url)
            if pr.scheme in ("", "file"):
                stream = open(url, "rb")
            else:
                from subprocess import PIPE, Popen

                process = Popen(
                    f"wget -q -O - {url}", shell=True, stdout=PIPE
                )
                sample.update(process=process)
                stream = process.stdout
            sample.update(stream=stream)
            yield sample
        except Exception:
            logging.warning("Failed to open %s", url)


def _load_audio_member(file_obj) -> tuple:
    wav, sr = read_wav(file_obj.read())
    return wav.astype(np.float32), sr


def tar_file_and_group(data: Iterable[dict]) -> Iterator[dict]:
    """Premixed shards: {key}.wav + {key}_spk{i}.wav + {key}.spk{i}
    grouped per key (processor.py:63-126)."""
    for sample in data:
        assert "stream" in sample
        stream = tarfile.open(fileobj=sample["stream"], mode="r:*")
        prev_prefix = None
        example = {}
        num_speakers = 0
        valid = True
        for tarinfo in stream:
            name = tarinfo.name
            pos = name.rfind(".")
            assert pos > 0
            prefix, postfix = name[:pos], name[pos + 1 :]
            if prev_prefix is not None and prev_prefix not in prefix:
                example["key"] = prev_prefix
                # completeness gate: a group whose member failed to parse
                # (valid=False) or that never produced a mixture (stray
                # non-sample members in the tar) is dropped with a
                # warning, never yielded as a partial sample
                if valid and "wav_mix" in example and num_speakers > 0:
                    example["num_speaker"] = num_speakers
                    yield example
                elif valid:
                    logging.warning(
                        "dropping incomplete shard group %s", prev_prefix
                    )
                num_speakers = 0
                example = {}
                valid = True
            with stream.extractfile(tarinfo) as file_obj:
                try:
                    if "spk" in postfix:
                        example[postfix] = (
                            file_obj.read().decode("utf8").strip()
                        )
                        num_speakers += 1
                    elif postfix in AUDIO_FORMAT_SETS:
                        waveform, sample_rate = _load_audio_member(file_obj)
                        if prefix[-5:-1] == "_spk":
                            example["wav" + prefix[-5:]] = waveform
                            prefix = prefix[:-5]
                        else:
                            example["wav_mix"] = waveform
                            example["sample_rate"] = sample_rate
                    else:
                        example[postfix] = file_obj.read()
                except Exception:
                    valid = False
                    logging.warning("error to parse %s", name)
            prev_prefix = prefix
        if prev_prefix is not None:
            example["key"] = prev_prefix
            example["num_speaker"] = num_speakers
            if valid and "wav_mix" in example and num_speakers > 0:
                yield example
            elif valid:
                logging.warning(
                    "dropping incomplete shard group %s", prev_prefix
                )
        stream.close()
        if "process" in sample:
            sample["process"].communicate()
        sample["stream"].close()


def tar_file_and_group_single_spk(data: Iterable[dict]) -> Iterator[dict]:
    """Single-speaker shards: {key}.wav + {key}.spk (processor.py:128-178)."""
    for sample in data:
        assert "stream" in sample
        stream = tarfile.open(fileobj=sample["stream"], mode="r|*")
        prev_prefix = None
        example = {}
        valid = True
        for tarinfo in stream:
            name = tarinfo.name
            pos = name.rfind(".")
            assert pos > 0
            prefix, postfix = name[:pos], name[pos + 1 :]
            if prev_prefix is not None and prefix != prev_prefix:
                example["key"] = prev_prefix
                if valid and "wav" in example and "spk" in example:
                    yield example
                elif valid:
                    logging.warning(
                        "dropping incomplete shard group %s", prev_prefix
                    )
                example = {}
                valid = True
            with stream.extractfile(tarinfo) as file_obj:
                try:
                    if postfix == "spk":
                        example[postfix] = (
                            file_obj.read().decode("utf8").strip()
                        )
                    elif postfix in AUDIO_FORMAT_SETS:
                        waveform, sample_rate = _load_audio_member(file_obj)
                        example["wav"] = waveform
                        example["sample_rate"] = sample_rate
                    else:
                        example[postfix] = file_obj.read()
                except Exception:
                    valid = False
                    logging.warning("error to parse %s", name)
            prev_prefix = prefix
        if prev_prefix is not None:
            example["key"] = prev_prefix
            if valid and "wav" in example and "spk" in example:
                yield example
            elif valid:
                logging.warning(
                    "dropping incomplete shard group %s", prev_prefix
                )
        stream.close()
        if "process" in sample:
            sample["process"].communicate()
        sample["stream"].close()


def parse_raw(data: Iterable[dict]) -> Iterator[dict]:
    """json lines {key, wav_mix, wav_spk1.., spk1..} of file paths."""
    for sample in data:
        obj = json.loads(sample["src"])
        try:
            example = {"key": obj["key"]}
            wav, sr = read_wav(obj["wav_mix"])
            example["wav_mix"] = wav
            example["sample_rate"] = sr
            n = 0
            while f"wav_spk{n + 1}" in obj:
                n += 1
                w, _ = read_wav(obj[f"wav_spk{n}"])
                example[f"wav_spk{n}"] = w
                example[f"spk{n}"] = obj.get(f"spk{n}", "")
            example["num_speaker"] = n
            yield example
        except Exception:
            logging.warning("Failed to read %s", obj.get("key"))


def parse_raw_single_spk(data: Iterable[dict]) -> Iterator[dict]:
    """json lines {key, wav, spk} (processor.py:180-207)."""
    for sample in data:
        obj = json.loads(sample["src"])
        try:
            waveform, sample_rate = read_wav(obj["wav"])
            yield dict(
                key=obj["key"],
                spk=obj["spk"],
                wav=waveform,
                sample_rate=sample_rate,
            )
        except Exception:
            logging.warning("Failed to read %s", obj.get("wav"))


def mix_speakers(
    data: Iterable[dict], num_speaker: int = 2, shuffle_size: int = 1000
) -> Iterator[dict]:
    """Dynamic mixing: pick (num_speaker-1) interference utts with distinct
    speakers from a shuffle buffer (processor.py:210-274)."""

    def emit(buf):
        random.shuffle(buf)
        for x in buf:
            cur_spk = x["spk"]
            example = {
                "key": "mix_" + x["key"],
                "wav_spk1": x["wav"],
                "spk1": x["spk"],
                "sample_rate": x["sample_rate"],
            }
            key = example["key"]
            interference_idx = 1
            while interference_idx < num_speaker:
                interference = random.choice(buf)
                while interference["spk"] == cur_spk:
                    interference = random.choice(buf)
                key = key + "_" + interference["key"]
                interference_idx += 1
                example[f"wav_spk{interference_idx}"] = interference["wav"]
                example[f"spk{interference_idx}"] = interference["spk"]
            example["key"] = key
            example["num_speaker"] = num_speaker
            yield example

    buf = []
    for sample in data:
        buf.append(sample)
        if len(buf) >= shuffle_size:
            yield from emit(buf)
            buf = []
    if buf:
        yield from emit(buf)


def snr_mixer(data: Iterable[dict], use_random_snr: bool = False) -> Iterator[dict]:
    """Energy-scaled sum at random SNR in [-10,10] dB + joint peak renorm
    (processor.py:277-320)."""
    for sample in data:
        assert "num_speaker" in sample
        suffix = "_reverb" if "wav_spk1_reverb" in sample else ""
        num_speaker = sample["num_speaker"]
        wavs_to_mix = [sample["wav_spk1" + suffix]]
        target_energy = np.sum(wavs_to_mix[0] ** 2, axis=-1, keepdims=True)
        for i in range(1, num_speaker):
            interference = sample[f"wav_spk{i + 1}" + suffix]
            snr = random.uniform(-10, 10) if use_random_snr else 0
            energy = np.sum(interference**2, axis=-1, keepdims=True)
            interference = interference * np.sqrt(
                target_energy / np.maximum(energy, 1e-10)
            ) * 10 ** (snr / 20)
            sample[f"wav_spk{i + 1}" + suffix] = interference
            wavs_to_mix.append(interference)
        stacked = np.stack(wavs_to_mix)
        mix = np.sum(stacked, 0)
        max_amp = max(
            float(np.abs(mix).max()),
            *[float(np.abs(x).max()) for x in stacked],
        )
        mix_scaling = 1.0 / max_amp if max_amp != 0 else 1.0
        sample["wav_mix"] = mix * mix_scaling
        for i in range(num_speaker):
            sample[f"wav_spk{i + 1}" + suffix] = (
                sample[f"wav_spk{i + 1}" + suffix] * mix_scaling
            )
        yield sample


def shuffle(data: Iterable[dict], shuffle_size: int = 2500) -> Iterator[dict]:
    """Local buffer shuffle (processor.py:323-344)."""
    buf = []
    for sample in data:
        buf.append(sample)
        if len(buf) >= shuffle_size:
            random.shuffle(buf)
            yield from buf
            buf = []
    random.shuffle(buf)
    yield from buf


def spk_to_id(data: Iterable[dict], spk2id: dict) -> Iterator[dict]:
    """spk string -> integer label, -1 if unknown (processor.py:347-364)."""
    for sample in data:
        assert "spk" in sample
        sample["label"] = spk2id.get(sample["spk"], -1)
        yield sample


def _resample_wav(wav: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    g = np.gcd(int(orig_sr), int(new_sr))
    return sp_signal.resample_poly(
        wav, new_sr // g, orig_sr // g, axis=-1
    ).astype(np.float32)


def resample(data: Iterable[dict], resample_rate: int = 16000) -> Iterator[dict]:
    """Resample every wav* entry (processor.py:367-388). Polyphase kaiser
    resampling (scipy) replaces torchaudio's sinc interpolation."""
    for sample in data:
        assert "sample_rate" in sample
        sample_rate = sample["sample_rate"]
        if sample_rate != resample_rate:
            sample["sample_rate"] = resample_rate
            for key in list(sample.keys()):
                if "wav" in key:
                    sample[key] = _resample_wav(
                        sample[key], sample_rate, resample_rate
                    )
        yield sample


def sample_spk_embedding(data: Iterable[dict], spk_embeds: dict) -> Iterator[dict]:
    """Random pre-extracted embedding per speaker (processor.py:391-404)."""
    for sample in data:
        for key in list(sample.keys()):
            if key.startswith("spk"):
                sample["embed_" + key] = np.atleast_2d(
                    random.choice(spk_embeds[sample[key]])
                )
        yield sample


def sample_fix_spk_embedding(
    data: Iterable[dict], spk2embed_dict, spk1_embed, spk2_embed
) -> Iterator[dict]:
    """Deterministic embedding per utt for val/test (processor.py:407-425)."""
    for sample in data:
        for key in list(sample.keys()):
            if key.startswith("spk"):
                emap = spk1_embed if key == "spk1" else spk2_embed
                sample["embed_" + key] = np.atleast_2d(
                    spk2embed_dict[emap[sample["key"]]]
                )
        yield sample


def sample_enrollment(
    data: Iterable[dict], spk_embeds: dict, dict_spk=None
) -> Iterator[dict]:
    """Random enrollment wav per speaker + optional spk label
    (processor.py:428-447)."""
    for sample in data:
        for key in list(sample.keys()):
            if key.startswith("spk"):
                path = random.choice(spk_embeds[sample[key]])[1]
                enrollment, _ = read_wav(path)
                sample["embed_" + key] = enrollment[:1]  # [1, T]
                if dict_spk:
                    sample[key + "_label"] = dict_spk[sample[key]]
        yield sample


def sample_fix_spk_enrollment(
    data: Iterable[dict], spk2embed_dict, spk1_embed, spk2_embed, dict_spk=None
) -> Iterator[dict]:
    """Deterministic enrollment for val/test (processor.py:450-477)."""
    for sample in data:
        for key in list(sample.keys()):
            if key.startswith("spk"):
                emap = spk1_embed if key == "spk1" else spk2_embed
                enrollment, _ = read_wav(spk2embed_dict[emap[sample["key"]]])
                sample["embed_" + key] = enrollment[:1]
                if dict_spk:
                    sample[key + "_label"] = dict_spk[sample[key]]
        yield sample


def compute_fbank(
    data: Iterable[dict],
    num_mel_bins: int = 80,
    frame_length: int = 25,
    frame_shift: int = 10,
    dither: float = 1.0,
) -> Iterator[dict]:
    """Kaldi fbank on every embed_* enrollment wav (processor.py:480-512).

    Runs the jax kaldi_fbank op on CPU — identical math to the on-device
    path, including the x * 2^15 int16 scaling.
    """
    import jax

    from wesep_tpu.ops.fbank import kaldi_fbank

    cpu = jax.local_devices(backend="cpu")[0]
    seed = random.randint(0, 2**31 - 1)
    key = jax.random.PRNGKey(seed)
    for sample in data:
        assert "sample_rate" in sample
        sr = sample["sample_rate"]
        for k in list(sample.keys()):
            if k.startswith("embed"):
                wav = np.asarray(sample[k])[0]
                with jax.default_device(cpu):
                    key, sub = jax.random.split(key)
                    mat = kaldi_fbank(
                        wav,
                        sample_rate=sr,
                        num_mel_bins=num_mel_bins,
                        frame_length_ms=frame_length,
                        frame_shift_ms=frame_shift,
                        dither=dither,
                        rng=sub if dither > 0 else None,
                        input_scale=32768.0,
                    )
                sample[k] = np.asarray(mat)  # [T, n_mels]
        yield sample


def apply_cmvn(
    data: Iterable[dict], norm_mean: bool = True, norm_var: bool = False
) -> Iterator[dict]:
    """Per-utt CMVN on embed_* feats -> [1, T, F] (processor.py:515-535)."""
    for sample in data:
        for k in list(sample.keys()):
            if k.startswith("embed"):
                mat = sample[k]
                if norm_mean:
                    mat = mat - mat.mean(axis=0)
                if norm_var:
                    mat = mat / np.sqrt(mat.var(axis=0) + 1e-8)
                sample[k] = mat[None].astype(np.float32)
        yield sample


def get_random_chunk(data_list, chunk_len: int):
    """Shared random chunk across a list of [1, T] wavs; rejects all-zero
    chunks; tiles short inputs (processor.py:538-578)."""
    assert all(d.shape[-1] == data_list[0].shape[-1] for d in data_list)
    arrays = [d[0] for d in data_list]
    data_len = arrays[0].shape[0]
    if data_len >= chunk_len:
        chunk_start = random.randint(0, data_len - chunk_len)
        for i in range(len(arrays)):
            temp = arrays[i][chunk_start : chunk_start + chunk_len]
            guard = 0
            while not np.any(temp) and guard < 10:
                chunk_start = random.randint(0, data_len - chunk_len)
                temp = arrays[i][chunk_start : chunk_start + chunk_len]
                guard += 1
            arrays[i] = temp.copy()
    else:
        repeat_factor = chunk_len // data_len + 1
        for i in range(len(arrays)):
            arrays[i] = np.tile(arrays[i], repeat_factor)[:chunk_len]
    return [a[None] for a in arrays]


def filter_len(
    data: Iterable[dict],
    min_num_seconds: float = 1,
    max_num_seconds: float = 1000,
) -> Iterator[dict]:
    """Drop too-short utts, chunk too-long ones (processor.py:581-609)."""
    for sample in data:
        sample_rate = sample["sample_rate"]
        wav = sample["wav"]
        if wav.shape[1] < min_num_seconds * sample_rate:
            continue
        max_len = int(max_num_seconds * sample_rate)
        if wav.shape[1] > max_len:
            wav = get_random_chunk([wav], max_len)[0]
        sample["wav"] = wav
        yield sample


def random_chunk(data: Iterable[dict], chunk_len: int) -> Iterator[dict]:
    """Shared random chunk over all wav* entries (processor.py:612-628)."""
    for sample in data:
        wav_keys = [k for k in list(sample.keys()) if "wav" in k]
        chunks = get_random_chunk([sample[k] for k in wav_keys], chunk_len)
        sample.update(zip(wav_keys, chunks))
        yield sample


def fix_chunk(data: Iterable[dict], chunk_len: int) -> Iterator[dict]:
    """Leading fixed chunk (processor.py:631-647)."""
    for sample in data:
        for k in list(sample.keys()):
            if k.startswith("wav"):
                sample[k] = sample[k][:, :chunk_len]
        yield sample


def _fit_noise(noise_wav, noise_sr, tgt_sr, nsamples, single_channel=True):
    """Wrap-pad / random-seek noise to nsamples at tgt_sr
    (processor.py:663-731)."""
    if noise_sr != tgt_sr:
        nsamples_ = int(nsamples / tgt_sr * noise_sr) + 1
    else:
        nsamples_ = nsamples
    noise = noise_wav.T  # [T, C]
    frames = noise.shape[0]
    if frames < nsamples_:
        offset = np.random.randint(0, nsamples_ - frames) if nsamples_ > frames else 0
        noise = np.pad(
            noise, [(offset, nsamples_ - frames - offset), (0, 0)], mode="wrap"
        )
    elif frames > nsamples_:
        offset = np.random.randint(0, frames - nsamples_)
        noise = noise[offset : offset + nsamples_]
    if single_channel and noise.shape[1] > 1:
        noise = noise[:, [np.random.randint(noise.shape[1])]]
    noise = noise.T  # [C, T]
    if noise_sr != tgt_sr:
        noise = _resample_wav(noise, noise_sr, tgt_sr)
        if noise.shape[1] < nsamples:
            noise = np.pad(
                noise, [(0, 0), (0, nsamples - noise.shape[1])], mode="wrap"
            )
        else:
            noise = noise[:, :nsamples]
    return noise


def _add_noise_to(speech, noise_key, noise_data, tgt_sr, db_low, db_high,
                  single_channel=True):
    nsamples = speech.shape[1]
    power = (speech**2).mean()
    snr_range = (
        [10, 30] if noise_key.startswith("speech") else [db_low, db_high]
    )
    noise_db = np.random.uniform(snr_range[0], snr_range[1])
    noise_wav, noise_sr = read_wav(noise_data)
    noise = _fit_noise(noise_wav, noise_sr, tgt_sr, nsamples, single_channel)
    noise_power = (noise**2).mean()
    scale = 10 ** (-noise_db / 20) * np.sqrt(power) / np.sqrt(
        max(noise_power, 1e-10)
    )
    scaled = (scale * noise).astype(np.float32)
    return (speech + scaled).astype(np.float32), scaled, noise_db


def add_noise(
    data: Iterable[dict],
    noise_lmdb_file: str,
    noise_prob: float = 0.0,
    noise_db_low: int = -5,
    noise_db_high: int = 25,
    single_channel: bool = True,
) -> Iterator[dict]:
    """Additive noise on the mixture from the noise store
    (processor.py:650-743)."""
    from wesep_tpu.data.noise_store import NoiseStore

    noise_source = NoiseStore(noise_lmdb_file)
    for sample in data:
        if noise_prob > random.random():
            tgt_fs = sample["sample_rate"]
            noise_key, noise_data = noise_source.random_one()
            mixed, scaled, noise_db = _add_noise_to(
                sample["wav_mix"], noise_key, noise_data, tgt_fs,
                noise_db_low, noise_db_high, single_channel,
            )
            sample["wav_mix"] = mixed
            sample["noise"] = scaled
            sample["snr"] = noise_db
        yield sample


def fetch_noise_chunk(
    data: Iterable[dict],
    noise_lmdb_file: str,
    single_channel: bool = True,
) -> Iterator[dict]:
    """Attach a raw (unscaled) noise chunk sized to the sources for the
    DEVICE augmentation path.

    The host only decodes + wrap-pads/seeks the noise to the chunk length
    (the cheap part of reference add_noise, processor.py:663-731); SNR
    scaling and the add itself run batched on device
    (wesep_tpu.data.augment.add_noise_snr).
    """
    from wesep_tpu.data.noise_store import NoiseStore

    noise_source = NoiseStore(noise_lmdb_file)
    for sample in data:
        tgt_sr = sample["sample_rate"]
        nsamples = np.asarray(sample["wav_spk1"]).shape[-1]
        _, noise_data = noise_source.random_one()
        noise_wav, noise_sr = read_wav(noise_data)
        noise = _fit_noise(
            noise_wav, noise_sr, tgt_sr, nsamples, single_channel
        )
        sample["noise_chunk"] = noise[:1].astype(np.float32)  # [1, T]
        yield sample


def add_reverb(data: Iterable[dict], reverb_prob: float = 0) -> Iterator[dict]:
    """FRAM-RIR reverb per source; keeps dry target (joint dereverb + TSE,
    processor.py:746-782)."""
    from wesep_tpu.data.fram_rir import single_channel as RIR_sim

    for sample in data:
        assert "num_speaker" in sample and "sample_rate" in sample
        cfg = dict(simu_config)
        cfg["num_src"] = sample["num_speaker"]
        cfg["sr"] = sample["sample_rate"]
        rirs, _ = RIR_sim(cfg)  # [n_mic, nsource, rir_len]
        rirs = rirs[0]
        for i in range(sample["num_speaker"]):
            if reverb_prob > random.random():
                audio = np.asarray(sample[f"wav_spk{i + 1}"])
                rir = rirs[i : i + 1, :]
                rir_audio = sp_signal.convolve(audio, rir, mode="full")[
                    :, : audio.shape[1]
                ]
                max_scale = np.max(np.abs(rir_audio))
                sample[f"wav_spk{i + 1}"] = (
                    rir_audio / max(max_scale, 1e-10) * 0.9
                ).astype(np.float32)
        yield sample


def add_noise_on_enroll(
    data: Iterable[dict],
    noise_lmdb_file: str,
    noise_enroll_prob: float = 0.0,
    noise_db_low: int = 0,
    noise_db_high: int = 25,
    single_channel: bool = True,
) -> Iterator[dict]:
    """Additive noise on enrollment wavs (processor.py:785-889)."""
    from wesep_tpu.data.noise_store import NoiseStore

    noise_source = NoiseStore(noise_lmdb_file)
    for sample in data:
        tgt_fs = sample["sample_rate"]
        for key in list(sample.keys()):
            if key.startswith("spk") and "label" not in key:
                if noise_enroll_prob > random.random():
                    noise_key, noise_data = noise_source.random_one()
                    mixed, _, _ = _add_noise_to(
                        sample["embed_" + key], noise_key, noise_data,
                        tgt_fs, noise_db_low, noise_db_high, single_channel,
                    )
                    sample["embed_" + key] = mixed
        yield sample


def add_reverb_on_enroll(
    data: Iterable[dict], reverb_enroll_prob: float = 0
) -> Iterator[dict]:
    """FRAM-RIR reverb on enrollment wavs (processor.py:892-925)."""
    from wesep_tpu.data.fram_rir import single_channel as RIR_sim

    for sample in data:
        for i in range(sample["num_speaker"]):
            if reverb_enroll_prob > random.random():
                cfg = dict(simu_config)
                cfg["sr"] = sample["sample_rate"]
                cfg["num_src"] = 1
                rirs, _ = RIR_sim(cfg)
                rir = rirs[0]
                audio = np.asarray(sample[f"embed_spk{i + 1}"])
                rir_audio = sp_signal.convolve(audio, rir, mode="full")[
                    :, : audio.shape[1]
                ]
                max_scale = np.max(np.abs(rir_audio))
                sample[f"embed_spk{i + 1}"] = (
                    rir_audio / max(max_scale, 1e-10) * 0.9
                ).astype(np.float32)
        yield sample


def spec_aug(
    data: Iterable[dict],
    num_t_mask: int = 1,
    num_f_mask: int = 1,
    max_t: int = 10,
    max_f: int = 8,
    prob: float = 0,
) -> Iterator[dict]:
    """Time/freq masks on enrollment fbank [1, T, F]
    (processor.py:928-964)."""
    for sample in data:
        if random.random() < prob:
            for key in list(sample.keys()):
                if key.startswith("embed"):
                    y = np.array(sample[key])
                    max_frames, max_freq = y.shape[1], y.shape[2]
                    for _ in range(num_t_mask):
                        start = random.randint(0, max_frames - 1)
                        length = random.randint(1, max_t)
                        y[:, start : min(max_frames, start + length), :] = 0
                    for _ in range(num_f_mask):
                        start = random.randint(0, max_freq - 1)
                        length = random.randint(1, max_f)
                        y[:, :, start : min(max_freq, start + length)] = 0
                    sample[key] = y
        yield sample
