"""`wesep` CLI: extract the target speaker from a mixture.

Equivalent of /root/reference/wesep/cli/extractor.py:18-199 on the TPU
stack: loads config.yaml + avg_model.ckpt from a model dir (or the Hub),
optional energy-VAD trimming of the enrollment, resampling, fbank when the
model expects speaker features, jitted forward, peak normalization, wav
output.

  wesep-tpu mixture.wav enrollment.wav -o out.wav [--model_dir DIR]
"""

import os

import numpy as np
import yaml

__all__ = ["Extractor", "main"]


class Extractor:
    def __init__(self, model_dir: str):
        import jax

        from wesep_tpu.models import get_model
        from wesep_tpu.train.checkpoint import load_checkpoint
        from wesep_tpu.utils import setup_compilation_cache
        from wesep_tpu.utils.config import set_seed

        setup_compilation_cache()
        set_seed()
        config_path = os.path.join(model_dir, "config.yaml")
        model_path = os.path.join(model_dir, "avg_model.ckpt")
        with open(config_path) as fin:
            configs = yaml.safe_load(fin)
        model_args = dict(configs["model_args"]["tse_model"])
        model_args.pop("spk_model_init", None)
        bundle = load_checkpoint(model_path)
        loaded = bundle["models"][0]
        # converted joint reference checkpoints carry a wespeaker-layout
        # ECAPA branch (fingerprint: per-split Res2 BNs) — the released
        # config.yaml predates our layout knob, so inject it
        for scope in ("spk_model_net", "spk_model"):
            sub = loaded.get(scope)
            if (
                isinstance(sub, dict)
                and "bns_0" in sub.get("layer2", {}).get("res2", {})
            ):
                spk_args = dict(model_args.get("spk_args") or {})
                spk_args["layout"] = "wespeaker"
                model_args["spk_args"] = spk_args
        self.model = get_model(configs["model"]["tse_model"])(**model_args)
        self.variables = {"params": loaded}
        if bundle.get("batch_stats") and bundle["batch_stats"][0]:
            self.variables["batch_stats"] = bundle["batch_stats"][0]
        missing = self._missing_subtrees(configs, loaded)
        if missing:
            # partial checkpoint (e.g. converter output without the
            # wespeaker speaker branch): merge over a fresh init — the
            # reference's load_pretrained_model(strict=False) semantics
            # (wesep/utils/checkpoint.py:8-27)
            print(
                "WARNING: checkpoint missing param subtrees "
                f"{sorted(missing)}; initializing them randomly "
                "(quality degraded until those weights are trained or "
                "converted)"
            )
            self.variables = self._merge_with_init(configs, loaded)

        self.resample_rate = configs["dataset_args"].get(
            "resample_rate", 16000
        )
        self.apply_vad = False
        self.wavform_norm = True
        self.output_norm = True
        # decode shape policy: short mixtures pad to a length bucket
        # (one XLA compile per bucket, not per length); mixtures longer
        # than chunk_sec decode in fixed windows with cross-fade
        # overlap-add (bounded memory + a single compiled shape — the
        # Python mirror of the C++ TF-engine windowing,
        # runtime/separate/tf_engine.cc)
        self.length_bucket = 16000
        self.chunk_sec = 30.0
        self.chunk_overlap_sec = 2.0
        self.speaker_feat = model_args.get("spk_feat", False)
        self.joint_training = model_args.get("joint_training", False)
        def _fwd(v, m, e):
            est = self.model.apply(v, m, e, train=False)[0]
            # SpEx+ multi-scale decoders return [est1, est2, est3];
            # decode with the short-window estimate like the reference
            # (/root/reference/wesep/bin/infer.py:121-122)
            if isinstance(est, (list, tuple)):
                est = est[0]
            return est

        self._jit_forward = jax.jit(_fwd)

    def _missing_subtrees(self, configs, loaded):
        import jax
        import jax.numpy as jnp

        sr = configs["dataset_args"].get("resample_rate", 16000)
        margs = configs["model_args"]["tse_model"]
        if margs.get("spk_feat") and margs.get("joint_training"):
            cue = jnp.zeros((1, 98, margs.get(
                "spk_args", {}).get("feat_dim", 80)))
        elif margs.get("joint_training"):
            cue = jnp.zeros((1, sr))
        else:
            cue = jnp.zeros((1, margs.get("spk_emb_dim", 256)))
        self._init_args = (jnp.zeros((1, sr)), cue)
        init_vars = jax.jit(
            self.model.init, static_argnames=("train",)
        )(jax.random.PRNGKey(0), *self._init_args, train=False)
        self._init_vars = init_vars
        return set(init_vars["params"]) - set(loaded)

    def _merge_with_init(self, configs, loaded):
        variables = dict(self._init_vars)
        params = dict(variables["params"])
        params.update(loaded)
        variables["params"] = params
        return variables

    def set_wavform_norm(self, wavform_norm: bool):
        self.wavform_norm = wavform_norm

    def set_resample_rate(self, resample_rate: int):
        self.resample_rate = resample_rate

    def set_vad(self, apply_vad: bool):
        self.apply_vad = apply_vad

    def set_output_norm(self, output_norm: bool):
        self.output_norm = output_norm

    def set_chunk_decode(self, chunk_sec: float, overlap_sec: float = 2.0):
        self.chunk_sec = float(chunk_sec)
        self.chunk_overlap_sec = float(overlap_sec)

    def _decode(self, mix: np.ndarray, cue: np.ndarray) -> np.ndarray:
        """Run the jitted forward with a stable compile footprint."""
        import jax.numpy as jnp

        sr = self.resample_rate
        t = mix.shape[-1]
        win = int(self.chunk_sec * sr)
        if t <= win:
            bucket = int(self.length_bucket)
            pad_len = max((t + bucket - 1) // bucket * bucket, bucket)
            mix_p = np.zeros((1, pad_len), np.float32)
            mix_p[0, :t] = mix
            est = np.asarray(
                self._jit_forward(
                    self.variables, jnp.asarray(mix_p), jnp.asarray(cue)
                )
            )[0]
            return est[:t]

        # overlap-add: every window is full-length real audio (the last
        # one is anchored at t - win), cross-faded with strictly
        # positive trapezoid weights and normalized by the weight sum
        hop = max(win - int(self.chunk_overlap_sec * sr), 1)
        ov = win - hop
        window = np.ones(win, np.float32)
        if ov > 0:
            ramp = (np.arange(1, ov + 1, dtype=np.float32)) / (ov + 1)
            window[:ov] = ramp
            window[win - ov:] = ramp[::-1]
        out = np.zeros(t, np.float32)
        wsum = np.zeros(t, np.float32)
        starts = list(range(0, max(t - win, 0), hop)) + [t - win]
        for s in starts:
            est = np.asarray(
                self._jit_forward(
                    self.variables,
                    jnp.asarray(mix[None, s:s + win]),
                    jnp.asarray(cue),
                )
            )[0]
            out[s:s + win] += est * window
            wsum[s:s + win] += window
        return out / np.maximum(wsum, 1e-12)

    def compute_fbank(self, wav: np.ndarray, sample_rate: int = 16000):
        import jax.numpy as jnp

        from wesep_tpu.ops.fbank import apply_cmvn, kaldi_fbank

        feats = kaldi_fbank(
            jnp.asarray(wav), sample_rate=sample_rate,
            input_scale=32768.0,
        )
        return np.asarray(apply_cmvn(feats))

    def extract_speech(self, audio_path: str, audio_path_2: str):
        from wesep_tpu.data.wav_io import read_wav

        pcm_mix, sr_mix = read_wav(audio_path)
        pcm_enroll, sr_enroll = read_wav(audio_path_2)
        return self.extract_speech_from_pcm(
            pcm_mix, sr_mix, pcm_enroll, sr_enroll
        )

    def extract_speech_from_pcm(
        self, pcm_mix, sr_mix, pcm_enroll, sr_enroll
    ):
        from wesep_tpu.data.processor import _resample_wav
        from wesep_tpu.data.vad import trim_silence

        mix = np.asarray(pcm_mix)[0]
        enroll = np.asarray(pcm_enroll)[0]
        if self.apply_vad:
            enroll = trim_silence(enroll, sr_enroll)
        if sr_mix != self.resample_rate:
            mix = _resample_wav(mix[None], sr_mix, self.resample_rate)[0]
        if sr_enroll != self.resample_rate:
            enroll = _resample_wav(
                enroll[None], sr_enroll, self.resample_rate
            )[0]

        if self.joint_training and self.speaker_feat:
            cue = self.compute_fbank(enroll, self.resample_rate)[None]
        elif self.joint_training:
            cue = enroll[None]
        else:
            raise ValueError(
                "pre-extracted-embedding models need an embedding input; "
                "use a joint-training model with the CLI"
            )
        est = self._decode(mix, np.asarray(cue))
        if self.output_norm:
            est = est / np.max(np.abs(est)) * 0.9
        return est, self.resample_rate


def load_model(language: str) -> Extractor:
    """Hub-download + construct (reference cli/extractor.py:162-168)."""
    from wesep_tpu.cli.hub import Hub

    return Extractor(Hub.get_model(language))


def load_model_local(model_dir: str) -> Extractor:
    return Extractor(model_dir)


def main():
    from wesep_tpu.cli.utils import get_args

    args = get_args()
    if args.pretrain == "":
        from wesep_tpu.cli.hub import Hub

        model_dir = Hub.get_model(args.language)
    else:
        model_dir = args.pretrain
    extractor = Extractor(model_dir)
    extractor.set_vad(args.vad)
    extractor.set_output_norm(args.output_norm)
    if args.resample_rate:
        extractor.set_resample_rate(args.resample_rate)
    est, sr = extractor.extract_speech(args.audio_file, args.audio_file2)
    from wesep_tpu.data.wav_io import write_wav

    write_wav(args.output_file, est, sr)
    print(f"wrote {args.output_file}")


if __name__ == "__main__":
    main()
