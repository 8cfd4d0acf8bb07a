"""File/embedding I/O: kaldi scp/ark vectors, spk2enroll maps, scp text.

Equivalents of /root/reference/wesep/utils/file_utils.py without kaldiio:
a minimal native reader/writer for kaldi binary float vectors/matrices
(enough for wespeaker embed.scp/ark interchange), read_lists, speaker
embedding loading/normalization, 2-column scp text.
"""

import json
import struct
from typing import Dict, List, Tuple

import numpy as np

__all__ = [
    "read_lists",
    "read_scp",
    "read_vec_scp_file",
    "write_vec_ark_scp",
    "norm_embeddings",
    "read_label_file",
    "load_speaker_embeddings",
    "read_2columns_text",
    "read_spk2enroll_json",
]


def read_lists(path: str) -> List[str]:
    with open(path, "r", encoding="utf8") as f:
        return [line.strip() for line in f if line.strip()]


def read_2columns_text(path: str) -> Dict[str, str]:
    """'key value' lines (reference file_utils.py:86-118)."""
    out = {}
    with open(path, "r", encoding="utf8") as f:
        for line in f:
            sps = line.rstrip().split(maxsplit=1)
            if len(sps) == 1:
                k, v = sps[0], ""
            else:
                k, v = sps
            out[k] = v
    return out


read_scp = read_2columns_text


def _read_kaldi_binary(f) -> np.ndarray:
    """Parse one kaldi binary object ('\\0B' + FV/FM/DV/DM)."""
    binary = f.read(2)
    assert binary == b"\x00B", f"not kaldi binary: {binary!r}"
    token = b""
    while True:
        c = f.read(1)
        if c == b" ":
            break
        token += c
    token = token.decode()
    if token in ("FV", "DV"):
        dtype = np.float32 if token == "FV" else np.float64
        assert f.read(1) == b"\x04"
        (dim,) = struct.unpack("<i", f.read(4))
        return np.frombuffer(f.read(dim * dtype().itemsize), dtype).copy()
    if token in ("FM", "DM"):
        dtype = np.float32 if token == "FM" else np.float64
        assert f.read(1) == b"\x04"
        (rows,) = struct.unpack("<i", f.read(4))
        assert f.read(1) == b"\x04"
        (cols,) = struct.unpack("<i", f.read(4))
        data = np.frombuffer(
            f.read(rows * cols * dtype().itemsize), dtype
        )
        return data.reshape(rows, cols).copy()
    raise ValueError(f"unsupported kaldi token {token!r}")


def read_vec_scp_file(scp_file: str) -> Dict[str, np.ndarray]:
    """'utt ark_path:offset' scp -> {utt: vector}
    (reference file_utils.py:20-32 via kaldiio)."""
    out = {}
    for utt, rxspec in read_2columns_text(scp_file).items():
        path, _, offset = rxspec.rpartition(":")
        with open(path, "rb") as f:
            f.seek(int(offset))
            out[utt] = _read_kaldi_binary(f)
    return out


def write_vec_ark_scp(base_path: str, vectors: Dict[str, np.ndarray]):
    """Write {utt: vec} to base.ark + base.scp (kaldi binary FV)."""
    ark_path = base_path + ".ark"
    scp_path = base_path + ".scp"
    with open(ark_path, "wb") as ark, open(scp_path, "w") as scp:
        for utt, vec in vectors.items():
            vec = np.asarray(vec, np.float32).reshape(-1)
            ark.write(utt.encode() + b" ")
            offset = ark.tell()
            ark.write(b"\x00BFV \x04")
            ark.write(struct.pack("<i", vec.shape[0]))
            ark.write(vec.tobytes())
            scp.write(f"{utt} {ark_path}:{offset}\n")
    return ark_path, scp_path


def norm_embeddings(embeddings: np.ndarray, kaldi_style: bool = True):
    """L2-ish normalization (reference file_utils.py:35-47)."""
    scale = np.sqrt(embeddings.shape[-1]) if kaldi_style else 1.0
    norm = np.linalg.norm(embeddings, axis=-1, keepdims=True)
    return scale * embeddings / np.maximum(norm, 1e-12)


def read_label_file(path: str) -> Dict[str, str]:
    """utt2spk mapping (reference file_utils.py:50-61)."""
    return read_2columns_text(path)


def load_speaker_embeddings(
    scp_file: str, utt2spk_file: str
) -> Dict[str, List[np.ndarray]]:
    """spk -> [embeddings...] (reference file_utils.py:64-81)."""
    utt_to_embed = read_vec_scp_file(scp_file)
    utt_to_spk = read_label_file(utt2spk_file)
    out: Dict[str, List[np.ndarray]] = {}
    for utt, embed in utt_to_embed.items():
        spk = utt_to_spk[utt]
        out.setdefault(spk, []).append(embed[None, :])
    return out


def read_spk2enroll_json(path: str) -> Tuple[Dict, Dict]:
    """spk2enroll.json: {spk: [(utt, wav_path), ...]} + spk->id dict
    (reference bin/train.py:129-147)."""
    with open(path, "r", encoding="utf8") as f:
        spk2enroll = json.load(f)
    dict_spk = {spk: i for i, spk in enumerate(sorted(spk2enroll.keys()))}
    return spk2enroll, dict_spk
