"""BSRNN_Feats: BSRNN with frame-level enrollment cues.

Equivalent of /root/reference/wesep/models/bsrnn_feats.py:200-612. Two
frame-level mechanisms, combinable:

  * spectral_feat='tfmap_spec' (bsrnn_feats.py:386-409): a cosine-attention
    TF map — per mixture frame, attend over enrollment frames by normalized
    magnitude similarity, reconstruct an enrollment-magnitude map, rescale
    to mixture energy — appended as a third per-band input channel.
  * spectral_feat='tfmap_emb' (bsrnn_feats.py:411-491): same attention but
    scored with the speaker encoder's frame-level features (ECAPA) computed
    on fbanks of mixture/enrollment (no-grad).
  * spk_fuse_type='cross_<t>' (bsrnn_feats.py:87-108,167-187): enrollment
    frame-level features projected to feature_dim and fused into every band
    via multihead cross-attention (2 heads), re-attended after each BSNet
    repeat; <t> is the per-position fuse type (multiply/additive/concat).

forward: (mix [B,T], enroll wav/fbank) -> (est [B,T], spk_logits).
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from wesep_tpu.models.bsrnn import BSRNN
from wesep_tpu.models.common import Dense, SpeakerFuse
from wesep_tpu.ops.stft import hann_window, magnitude, stft

__all__ = ["BSRNN_Feats"]


class CrossAtt(nn.Module):
    """Multihead cross-attention (torch nn.MultiheadAttention parity):
    query [B, T, D], key/value [B, S, D] -> [B, T, D]."""

    embed_dim: int
    num_heads: int = 2

    @nn.compact
    def __call__(self, q, k, v):
        d = self.embed_dim
        h = self.num_heads
        dh = d // h
        # torch in_proj: one [3D, D] matrix; out_proj [D, D]
        wq = Dense(d, name="q_proj")
        wk = Dense(d, name="k_proj")
        wv = Dense(d, name="v_proj")
        out = Dense(d, name="out_proj")

        def split(x):
            b, t, _ = x.shape
            return jnp.transpose(
                x.reshape(b, t, h, dh), (0, 2, 1, 3)
            )  # [B, H, T, dh]

        qh, kh, vh = split(wq(q)), split(wk(k)), split(wv(v))
        attn = jnp.einsum(
            "bhtd,bhsd->bhts", qh, kh, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.asarray(dh, jnp.float32))
        attn = jax.nn.softmax(attn, axis=-1).astype(vh.dtype)
        y = jnp.einsum(
            "bhts,bhsd->bhtd", attn, vh, preferred_element_type=jnp.float32
        ).astype(vh.dtype)
        b, _, t, _ = y.shape
        y = jnp.transpose(y, (0, 2, 1, 3)).reshape(b, t, d)
        return out(y)


def _tfmap(mix_mag, enroll_mag, scores_q=None, scores_k=None):
    """Attention TF map (bsrnn_feats.py:386-409 / :466-491).

    mix_mag/enroll_mag: [B, T, F] magnitudes. When scores_q/k are given
    ([B, T, D] frame features) they produce the attention scores
    (tfmap_emb); otherwise normalized magnitudes do (tfmap_spec).
    Returns [B, T, F].
    """
    eps = 1e-12
    if scores_q is None:
        qn = mix_mag / jnp.maximum(
            jnp.linalg.norm(mix_mag, axis=-1, keepdims=True), eps
        )
        kn = enroll_mag / jnp.maximum(
            jnp.linalg.norm(enroll_mag, axis=-1, keepdims=True), eps
        )
        att = jnp.einsum("btf,bsf->bts", qn, kn,
                         preferred_element_type=jnp.float32)
        value = kn
    else:
        qn = scores_q / jnp.maximum(
            jnp.linalg.norm(scores_q, axis=-1, keepdims=True), eps
        )
        kn = scores_k / jnp.maximum(
            jnp.linalg.norm(scores_k, axis=-1, keepdims=True), eps
        )
        att = jnp.einsum("btd,bsd->bts", qn, kn,
                         preferred_element_type=jnp.float32)
        value = enroll_mag
    w = jax.nn.softmax(att, axis=-1).astype(mix_mag.dtype)
    tf_map = jnp.einsum("bts,bsf->btf", w, value,
                        preferred_element_type=jnp.float32
                        ).astype(mix_mag.dtype)
    tf_map = tf_map / jnp.maximum(
        jnp.linalg.norm(tf_map, axis=-1, keepdims=True), eps
    )
    # recover mixture energy (bsrnn_feats.py:402-406)
    tf_map = jnp.sum(mix_mag * tf_map, axis=-1, keepdims=True) * tf_map
    return tf_map


class BSRNN_Feats(BSRNN):
    """Reference ctor parity (bsrnn_feats.py:203-225); extra fields below."""

    spectral_feat: Optional[str] = None  # False | 'tfmap_spec' | 'tfmap_emb'
    spk_emb_frame_dim: int = 512  # ECAPA frame-feature dim (:134)

    def _spec_map(self) -> int:
        return 3 if self.spectral_feat else 2

    def _is_cross(self) -> bool:
        return bool(self.spk_fuse_type) and self.spk_fuse_type.startswith(
            "cross_"
        )

    def setup(self):
        super().setup()
        if self._is_cross():
            self.cross_proj = Dense(self.feature_dim)
            self.cross_att = CrossAtt(self.feature_dim, 2)
            n_fuse = self.num_repeat if self.multi_fuse else 1
            base = self.spk_fuse_type[len("cross_"):]
            self.cross_fuse = [
                SpeakerFuse(self.feature_dim, base) for _ in range(n_fuse)
            ]

    def _frame_feats(self, wav, train):
        """fbank (win-length frames, no dither) -> CMVN -> speaker-model
        frame-level features, no-grad (bsrnn_feats.py:411-465).

        NB: the reference calls compute_fbank WITHOUT num_mel_bins here
        (bsrnn_feats.py:439-452), i.e. always 80 mels — its tfmap_emb
        path is only runnable with feat_dim=80 encoders. This
        generalization uses spk_args feat_dim, which agrees with the
        reference at every config the reference can run
        (tests/test_bsrnn_feats.py::test_tfmap_emb_cross_matches_reference).
        """
        from wesep_tpu.ops.fbank import apply_cmvn, kaldi_fbank

        def feats(x):
            # reference reflect-pads by win//2 before fbank
            pad = self.win // 2
            xp = jnp.concatenate(
                [x[..., 1 : pad + 1][..., ::-1], x,
                 x[..., -pad - 1 : -1][..., ::-1]],
                axis=-1,
            )
            f = kaldi_fbank(
                xp,
                sample_rate=self.sr,
                num_mel_bins=(self.spk_args or {}).get("feat_dim", 80),
                frame_length_ms=self.win * 1e3 / self.sr,
                frame_shift_ms=self.stride * 1e3 / self.sr,
                dither=0.0,
                input_scale=32768.0,
            )
            return apply_cmvn(f)

        wav_feats = jax.lax.stop_gradient(feats(wav))
        return self.spk_model_net(
            wav_feats, train=train, return_frame_feats=True
        )

    def _cross_embedding(self, feats_4d, frame_feats):
        """Project frame feats and cross-attend per band
        (attenFuse, bsrnn_feats.py:167-187). feats_4d: [B, nband, T, N]."""
        spk = self.cross_proj(frame_feats)  # [B, S, N]
        b, nband, t, n = feats_4d.shape
        q = feats_4d.reshape(b * nband, t, n)
        kv = jnp.broadcast_to(
            spk[:, None], (b, nband) + spk.shape[1:]
        ).reshape(b * nband, spk.shape[1], n)
        y = self.cross_att(q, kv, kv)
        return y.reshape(b, nband, t, n)

    def __call__(self, mix, enroll, train: bool = True):
        b, nsample = mix.shape
        window = hann_window(self.win)
        re, im = stft(mix, self.win, self.stride, window=window)

        tf_map = None
        frame_feats = None
        if self.spectral_feat:
            enroll_wavlike = enroll.ndim == 2
            assert enroll_wavlike, (
                "spectral_feat requires a raw enrollment waveform"
            )
            ere, eim = stft(enroll, self.win, self.stride, window=window)
            mix_mag = magnitude(re, im)
            enroll_mag = magnitude(ere, eim)
            if self.spectral_feat == "tfmap_spec":
                tf_map = _tfmap(mix_mag, enroll_mag)
            elif self.spectral_feat == "tfmap_emb":
                mix_frame = self._frame_feats(mix, train)
                enr_frame = self._frame_feats(enroll, train)
                frame_feats = enr_frame
                s_len = min(enroll_mag.shape[1], enr_frame.shape[1])
                q_len = min(mix_mag.shape[1], mix_frame.shape[1])
                tf_map = _tfmap(
                    mix_mag[:, :q_len],
                    enroll_mag[:, :s_len],
                    mix_frame[:, :q_len],
                    enr_frame[:, :s_len],
                )
                if tf_map.shape[1] < re.shape[1]:
                    tf_map = jnp.pad(
                        tf_map,
                        ((0, 0), (0, re.shape[1] - tf_map.shape[1]), (0, 0)),
                    )
            else:
                raise ValueError(self.spectral_feat)

        feats, sub_specs = self._band_split(re, im, extra=tf_map)

        spk_logits = None
        if self._is_cross():
            if frame_feats is None:
                # enrollment frame-level features through the speaker model
                if self.joint_training:
                    feats_in = enroll
                    if not self.spk_feat and self.feat_type == "consistent":
                        feats_in = jax.lax.stop_gradient(
                            self._consistent_feats(enroll)
                        )
                    frame_feats = self.spk_model_net(
                        feats_in, train=train, return_frame_feats=True
                    )
                else:
                    frame_feats = enroll  # already frame-level [B, S, D]
            s = self._separate_cross(
                feats, sub_specs, frame_feats, nsample, window
            )
            return s, spk_logits

        embed, spk_logits = self._spk_embedding(enroll, train)
        s = self._separate(feats, sub_specs, embed, nsample, window)
        return s, spk_logits

    def _separate_cross(self, feats, sub_specs, frame_feats, nsample, window):
        """Separator with per-repeat cross-attention re-fusion
        (FuseSeparation cross path, bsrnn_feats.py:167-187)."""
        x = feats
        spk = self._cross_embedding(x, frame_feats)
        if self.multi_fuse:
            for r in range(self.num_repeat):
                x = self.cross_fuse[r](x, spk)
                x = self.bsnet[r](x)
                if r + 1 < self.num_repeat:
                    spk = self._cross_embedding(x, frame_feats)
        else:
            x = self.cross_fuse[0](x, spk)
            for r in range(self.num_repeat):
                x = self.bsnet[r](x)
        return self._mask_reconstruct(x, sub_specs, nsample, window)
