"""DNSMOS P.835/P.808 perceptual quality prediction.

Equivalent of /root/reference/wesep/utils/dnsmos.py: Microsoft DNSMOS via
local ONNX models (sig_bak_ovr.onnx + model_v8.onnx) or the Web API.
onnxruntime is an optional dependency (absent in this image) — construction
raises a clear error when unavailable; the scoring binary only imports this
module when --use_dnsmos is passed.
"""

import os
from typing import Dict, Optional

import numpy as np

__all__ = ["DNSMOS_local", "DNSMOS_web"]

SAMPLERATE = 16000
INPUT_LENGTH = 9.01


class DNSMOS_local:
    """Local ONNX DNSMOS (reference dnsmos.py DNSMOS_local)."""

    def __init__(self, primary_model_path: str, p808_model_path: str,
                 use_gpu: bool = False, **_ignored):
        try:
            import onnxruntime as ort
        except ImportError as e:
            raise ImportError(
                "DNSMOS requires onnxruntime (pip install onnxruntime); "
                "it is not available in this environment"
            ) from e
        providers = (
            ["CUDAExecutionProvider"] if use_gpu
            else ["CPUExecutionProvider"]
        )
        self.onnx_sess = ort.InferenceSession(
            primary_model_path, providers=providers
        )
        self.p808_onnx_sess = ort.InferenceSession(
            p808_model_path, providers=providers
        )

    def _audio_melspec(self, audio, n_mels=120, frame_size=320,
                       hop_length=160, to_db=True):
        from wesep_tpu.ops.fbank import htk_mel_banks
        from wesep_tpu.ops.stft import hann_window, stft

        import jax.numpy as jnp

        re, im = stft(
            jnp.asarray(audio[None], jnp.float32), frame_size, hop_length,
            window=hann_window(frame_size),
        )
        power = np.asarray(re[0] ** 2 + im[0] ** 2)
        bank = np.asarray(
            htk_mel_banks(frame_size // 2 + 1, 0.0, SAMPLERATE / 2,
                          n_mels, SAMPLERATE)
        )
        mel = power @ bank
        if to_db:
            mel = 20.0 * np.log10(np.maximum(mel, 1e-10) ** 0.5)
        return mel.astype(np.float32)

    def _polyfit(self, sig, bak, ovr, is_personalized: bool):
        if is_personalized:
            p_ovr = np.poly1d([-0.00533021, 0.005101, 1.18058466,
                               -0.11236046])
            p_sig = np.poly1d([-0.01019296, 0.02751166, 1.19576786,
                               -0.24348726])
            p_bak = np.poly1d([-0.04976499, 0.44276479, -0.1644611,
                               0.96883132])
        else:
            p_ovr = np.poly1d([-0.06766283, 1.11546468, 0.04602535])
            p_sig = np.poly1d([-0.08397278, 1.22083953, 0.0052439])
            p_bak = np.poly1d([-0.13166888, 1.60915514, -0.39604546])
        return p_sig(sig), p_bak(bak), p_ovr(ovr)

    def __call__(self, audio: np.ndarray, fs: int = SAMPLERATE,
                 is_personalized: bool = False) -> Dict[str, float]:
        if fs != SAMPLERATE:
            from scipy import signal as sp

            g = np.gcd(fs, SAMPLERATE)
            audio = sp.resample_poly(audio, SAMPLERATE // g, fs // g)
        len_samples = int(INPUT_LENGTH * SAMPLERATE)
        while len(audio) < len_samples:
            audio = np.append(audio, audio)
        num_hops = int(np.floor(len(audio) / SAMPLERATE) - INPUT_LENGTH) + 1
        moss = {"OVRL": [], "SIG": [], "BAK": [], "P808_MOS": []}
        for i in range(num_hops):
            seg = audio[
                int(i * SAMPLERATE) : int((i + INPUT_LENGTH) * SAMPLERATE)
            ]
            if len(seg) < len_samples:
                break
            input_feat = np.array(seg, np.float32)[np.newaxis, :]
            p808_in = self._audio_melspec(seg[:-160])[np.newaxis, :, :]
            oi = {"input_1": input_feat}
            p808 = float(
                self.p808_onnx_sess.run(None, {"input_1": p808_in})[0][0][0]
            )
            sig_raw, bak_raw, ovr_raw = self.onnx_sess.run(None, oi)[0][0]
            sig, bak, ovr = self._polyfit(
                sig_raw, bak_raw, ovr_raw, is_personalized
            )
            moss["OVRL"].append(ovr)
            moss["SIG"].append(sig)
            moss["BAK"].append(bak)
            moss["P808_MOS"].append(p808)
        return {k: float(np.mean(v)) for k, v in moss.items()}


class DNSMOS_web:
    """DNSMOS Web-API client (reference dnsmos.py DNSMOS_web)."""

    def __init__(self, auth_key: str):
        if not auth_key:
            raise ValueError("DNSMOS web API requires an auth key")
        self.auth_key = auth_key

    def __call__(self, audio: np.ndarray, fs: int = SAMPLERATE,
                 score_file: Optional[str] = None) -> Dict[str, float]:
        import base64
        import json
        import urllib.request

        data = {
            "data": base64.b64encode(
                np.asarray(audio, np.float32).tobytes()
            ).decode("ascii"),
            "filename": os.path.basename(score_file or "audio.wav"),
        }
        req = urllib.request.Request(
            "https://dnsmos.azurewebsites.net/score",
            data=json.dumps(data).encode(),
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Basic {self.auth_key}",
            },
        )
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())
