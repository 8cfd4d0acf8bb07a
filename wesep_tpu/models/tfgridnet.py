"""TF-GridNet(V2) target-speaker extraction, channels-last TPU layout.

Functional redesign of /root/reference/wesep/models/tfgridnet.py and
/root/reference/wesep/modules/tfgridnet/gridnet_block.py (ESPnet
TFGridNetV2 port). Feature maps are [B, T, Q, C] (channels last); the
intra/inter BiLSTMs run as fused lax.scan kernels over folded batches
([B*T, Q-frames] and [B*Q, T-frames]); the frame-level self-attention is a
plain batched matmul softmax (T x T) on the MXU.

This is the model the reference flags "extremely slow" (README.md:41) and
the designated multi-chip sharding target (SURVEY §5): the folded LSTM
batch and the attention batch dims shard cleanly over a model axis.
"""

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from wesep_tpu.models.common import Dense, LSTM, SpeakerFuse, SpeakerTransform
from wesep_tpu.ops.init import torch_linear_init
from wesep_tpu.ops.stft import hamming_window, hann_window, istft, stft

__all__ = ["TFGridNet"]


def _shard_folded(x, enable: bool):
    """Sequence-parallel sharding hint: the folded batch dim (B*T or B*Q
    or B*heads) spreads over ('data', 'model'). Intra-frame LSTMs carry no
    cross-frame state and inter-frame LSTMs no cross-frequency state, so
    the model axis shards them with zero intra-op communication; XLA
    inserts the reshard collectives at fold boundaries (SURVEY §5: the
    TF-GridNet multi-chip target)."""
    if not enable:
        return x
    from jax.sharding import PartitionSpec as P

    try:
        return jax.lax.with_sharding_constraint(
            x, P(("data", "model"), *([None] * (x.ndim - 1)))
        )
    except (ValueError, RuntimeError):
        return x  # no mesh in scope (single-device run)


class GridNetBlock(nn.Module):
    """Intra-freq BiLSTM + inter-time BiLSTM + full-band self-attention
    (gridnet_block.py:26-227). x: [B, T, Q, C]."""

    emb_dim: int
    emb_ks: int
    emb_hs: int
    n_freqs: int
    hidden: int
    n_head: int = 4
    approx_qk_dim: int = 512
    eps: float = 1e-5
    shard_model_axis: bool = False

    def _rnn_branch(self, x, name):
        """LayerNorm -> unfold -> BiLSTM -> deconv1d -> residual over the
        middle axis of [B', L, C]."""
        inp = x
        # cast back: flax LayerNorm promotes bf16 x against its f32
        # params and returns f32, which would put the unfold, BOTH Pallas
        # LSTM kernels (they cast weights to x.dtype) and the deconv in
        # f32 — the r4 SpEx+ silent-promotion bug pattern (r5 xplane:
        # every stream around the rnn branches was f32)
        y = nn.LayerNorm(epsilon=self.eps, name=f"{name}_norm")(x).astype(
            x.dtype
        )
        if self.emb_ks == self.emb_hs:
            bsz, length, c = y.shape
            y = y.reshape(bsz, length // self.emb_ks, self.emb_ks * c)
            y = LSTM(self.hidden, name=f"{name}_rnn")(y)
            y = Dense(self.emb_ks * c, name=f"{name}_linear")(y)
            y = y.reshape(bsz, length, c)
        else:
            # unfold fused into the LSTM module (raw [B', L, C] in; the
            # Pallas path never materializes the ks-times-wider stream)
            y = LSTM(
                self.hidden,
                unfold_ks=self.emb_ks,
                unfold_hs=self.emb_hs,
                name=f"{name}_rnn",
            )(y)
            init = torch_linear_init(self.emb_dim * self.emb_ks)
            y = nn.ConvTranspose(
                self.emb_dim,
                (self.emb_ks,),
                strides=(self.emb_hs,),
                padding="VALID",
                transpose_kernel=True,
                kernel_init=init,
                bias_init=init,
                name=f"{name}_linear",
                dtype=y.dtype,  # avoid f32 promotion against f32 params
            )(y)  # [B', L, C]
        return y + inp

    @nn.compact
    def __call__(self, x):
        b, old_t, old_q, c = x.shape
        olp = self.emb_ks - self.emb_hs
        T = (
            math.ceil((old_t + 2 * olp - self.emb_ks) / self.emb_hs)
            * self.emb_hs
            + self.emb_ks
        )
        Q = (
            math.ceil((old_q + 2 * olp - self.emb_ks) / self.emb_hs)
            * self.emb_hs
            + self.emb_ks
        )
        x = jnp.pad(
            x,
            ((0, 0), (olp, T - old_t - olp), (olp, Q - old_q - olp), (0, 0)),
        )

        # intra (frequency) RNN: fold B*T, sequence-sharded over the mesh
        y = x.reshape(b * T, Q, c)
        y = _shard_folded(y, self.shard_model_axis)
        y = self._rnn_branch(y, "intra")
        y = y.reshape(b, T, Q, c)

        # inter (time) RNN: fold B*Q
        z = jnp.swapaxes(y, 1, 2).reshape(b * Q, T, c)
        z = _shard_folded(z, self.shard_model_axis)
        z = self._rnn_branch(z, "inter")
        z = jnp.swapaxes(z.reshape(b, Q, T, c), 1, 2)  # [B, T, Q, C]

        z = z[:, olp : olp + old_t, olp : olp + old_q]  # crop padding

        # --- full-band frame-level self-attention ------------------------
        e_dim = math.ceil(self.approx_qk_dim / self.n_freqs)
        h, v_dim = self.n_head, self.emb_dim // self.n_head

        def qkv(inp, out_per_head, tag):
            y = Dense(self.n_head * out_per_head, name=f"attn_conv_{tag}")(
                inp
            )  # [B, T, Q, H*E] (1x1 conv)
            y = y.reshape(b, old_t, old_q, self.n_head, out_per_head)
            # -> [B, H, E, T, Q] (torch norm layout)
            y = jnp.transpose(y, (0, 3, 4, 1, 2))
            # AllHeadPReLULayerNormalization4DCF: per-head PReLU then
            # normalize over (E, Q) per (B, H, T), affine [H, E, Q]
            alpha = self.param(
                f"attn_norm_{tag}_prelu",
                lambda k, s: jnp.full(s, 0.25),
                (self.n_head,),
            )
            a = alpha[None, :, None, None, None]
            y = jnp.where(y >= 0, y, a * y)
            gamma = self.param(
                f"attn_norm_{tag}_scale",
                nn.initializers.ones,
                (self.n_head, out_per_head, self.n_freqs),
            )
            beta = self.param(
                f"attn_norm_{tag}_bias",
                nn.initializers.zeros,
                (self.n_head, out_per_head, self.n_freqs),
            )
            y32 = y.astype(jnp.float32)
            # single-pass stats (E[x^2]-E[x]^2): one read of y, not two
            mu = jnp.mean(y32, axis=(2, 4), keepdims=True)
            m2 = jnp.mean(jnp.square(y32), axis=(2, 4), keepdims=True)
            std = jnp.sqrt(
                jnp.maximum(m2 - jnp.square(mu), 0.0) + self.eps
            )
            y = ((y32 - mu) / std) * gamma[None, :, :, None, :] + beta[
                None, :, :, None, :
            ]
            return y.astype(inp.dtype)  # [B, H, E, T, Q]

        q = qkv(z, e_dim, "Q")
        k = qkv(z, e_dim, "K")
        v = qkv(z, v_dim, "V")

        # [B,H,E,T,Q] -> [B*H, T, E*Q]
        def flat(t5, d):
            y = jnp.transpose(t5, (0, 1, 3, 2, 4))  # [B,H,T,E,Q]
            return y.reshape(b * h, old_t, d * old_q)

        # heads fold into the batch dim -> head-parallel attention
        q2 = _shard_folded(flat(q, e_dim), self.shard_model_axis)
        k2 = _shard_folded(flat(k, e_dim), self.shard_model_axis)
        v2 = _shard_folded(flat(v, v_dim), self.shard_model_axis)
        scale = 1.0 / jnp.sqrt(jnp.asarray(q2.shape[-1], jnp.float32))
        attn = jnp.einsum(
            "btd,bsd->bts", q2, k2, preferred_element_type=jnp.float32
        ) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(v2.dtype)
        out = jnp.einsum(
            "bts,bsd->btd", attn, v2, preferred_element_type=jnp.float32
        ).astype(v2.dtype)  # [B*H, T, V*Q]

        out = out.reshape(b, h, old_t, v_dim, old_q)
        # concat heads back to channel dim: [B, T, Q, H*V] with head-major
        # channel order (matches torch view([B, H*V, T, Q]))
        out = jnp.transpose(out, (0, 2, 4, 1, 3)).reshape(
            b, old_t, old_q, h * v_dim
        )

        # attn_concat_proj: 1x1 conv -> PReLU -> LayerNormalization4DCF
        out = Dense(self.emb_dim, name="attn_proj")(out)
        alpha = self.param(
            "attn_proj_prelu", lambda k, s: jnp.full(s, 0.25), (1,)
        )
        out = jnp.where(out >= 0, out, alpha * out)
        gamma = self.param(
            "attn_proj_norm_scale",
            nn.initializers.ones,
            (self.emb_dim, self.n_freqs),
        )
        beta = self.param(
            "attn_proj_norm_bias",
            nn.initializers.zeros,
            (self.emb_dim, self.n_freqs),
        )
        # normalize over (C, Q) per (B, T); x layout [B, T, Q, C],
        # affine [C, Q] -> broadcast as [1, 1, Q, C]
        o32 = out.astype(jnp.float32)
        mu = jnp.mean(o32, axis=(2, 3), keepdims=True)
        m2 = jnp.mean(jnp.square(o32), axis=(2, 3), keepdims=True)
        std = jnp.sqrt(jnp.maximum(m2 - jnp.square(mu), 0.0) + self.eps)
        out = ((o32 - mu) / std) * gamma.T[None, None] + beta.T[None, None]
        out = out.astype(z.dtype)

        return out + z


class _FuseScanBlock(nn.Module):
    """One scan iteration: elementwise speaker fuse (precomputed affine)
    + GridNetBlock. Scanned with per-layer params (nn.scan
    variable_axes={'params': 0}) so the n_layers identical blocks compile
    as ONE loop body instead of an unrolled graph."""

    emb_dim: int
    emb_ks: int
    emb_hs: int
    n_freqs: int
    hidden: int
    n_head: int
    approx_qk_dim: int
    eps: float
    shard_model_axis: bool
    fuse: bool

    @nn.compact
    def __call__(self, carry, _):
        y, scale, shift = carry
        if self.fuse:
            # fuse acts on [B, T, C, Q] (freq-last), like the unrolled path
            yp = jnp.swapaxes(y, 2, 3)
            yp = yp * scale + shift
            y = jnp.swapaxes(yp, 2, 3)
        y = GridNetBlock(
            self.emb_dim,
            self.emb_ks,
            self.emb_hs,
            self.n_freqs,
            self.hidden,
            self.n_head,
            self.approx_qk_dim,
            self.eps,
            self.shard_model_axis,
            name="block",
        )(y)
        return (y, scale, shift), None


class TFGridNet(nn.Module):
    """Reference constructor parity (tfgridnet.py:79-196)."""

    n_srcs: int = 1
    sr: int = 16000
    n_fft: int = 128
    stride: int = 64
    window: str = "hann"
    n_imics: int = 1
    n_layers: int = 6
    lstm_hidden_units: int = 192
    attn_n_head: int = 4
    attn_approx_qk_dim: int = 512
    emb_dim: int = 48
    emb_ks: int = 4
    emb_hs: int = 1
    activation: str = "prelu"
    eps: float = 1e-5
    spk_emb_dim: int = 256
    use_spk_transform: bool = False
    spk_fuse_type: str = "multiply"
    joint_training: bool = True
    multi_task: bool = False
    spksInTrain: int = 251
    spk_model: Optional[str] = None
    spk_model_init: Optional[str] = None
    spk_model_freeze: bool = False
    spk_args: Optional[dict] = None
    spk_feat: bool = False
    feat_type: str = "consistent"
    # remat each block in backward (same HBM rationale as BSRNN.remat)
    remat: bool = True
    # shard the folded LSTM/attention batch dims over a mesh 'model' axis
    shard_model_axis: bool = False
    # compile the n_layers identical blocks as ONE lax.scan body instead
    # of unrolling: ~n_layers-x smaller HLO, so large-batch remat-free
    # graphs fit through compile-size limits (BASELINE.md TF-GridNet
    # batch-4/8 notes). Param layout changes to stacked [n_layers, ...]
    # leaves under 'blocks/block'; convert an unrolled tree with
    # utils.torch_port.stack_gridnet_blocks. Supported for elementwise
    # fuse types (multiply/additive/FiLM/None); 'concat' mixes channels
    # and needs the unrolled path.
    scan_layers: bool = False

    def _spk_embedding(self, enroll, train: bool):
        spk_logits = None
        if self.joint_training:
            feats = enroll
            if not self.spk_feat and self.feat_type == "consistent":
                from wesep_tpu.ops.fbank import speaker_feat

                n_mels = (self.spk_args or {}).get("feat_dim", 80)
                feats = jax.lax.stop_gradient(
                    speaker_feat(
                        enroll,
                        sample_rate=self.sr,
                        n_fft=self.n_fft,
                        hop_length=self.stride,
                        n_mels=n_mels,
                    )
                )
            from wesep_tpu.models.speaker import get_speaker_model

            args = dict(self.spk_args or {})
            args.pop("feat_dim", None)
            embed = get_speaker_model(self.spk_model)(
                name="spk_model", **args
            )(feats, train=train)
            if isinstance(embed, (tuple, list)):
                embed = embed[-1]
            if self.multi_task:
                spk_logits = Dense(self.spksInTrain, name="pred_linear")(embed)
        else:
            embed = enroll
        return embed, spk_logits

    @nn.compact
    def __call__(self, mix, enroll, train: bool = True):
        b, nsample = mix.shape
        n_freqs = self.n_fft // 2 + 1

        # RMS normalization (torch.std is Bessel-corrected, tfgridnet.py:220)
        mix_std = jnp.std(
            mix.astype(jnp.float32), axis=1, keepdims=True, ddof=1
        ).astype(mix.dtype)
        x = mix / mix_std

        window = (
            hann_window(self.n_fft)
            if self.window == "hann"
            else hamming_window(self.n_fft)
        )
        re, im = stft(x, self.n_fft, self.stride, window=window)  # [B,T,F]
        feat = jnp.stack([re, im], axis=-1)  # [B, T, F, 2]

        init0 = torch_linear_init(2 * 3 * 3)
        y = nn.Conv(
            self.emb_dim, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=init0, bias_init=init0, name="conv",
            dtype=feat.dtype,
        )(feat)
        # GroupNorm(1, emb): over (T, F, C) per sample, per-channel affine
        gamma = self.param(
            "conv_norm_scale", nn.initializers.ones, (self.emb_dim,)
        )
        beta = self.param(
            "conv_norm_bias", nn.initializers.zeros, (self.emb_dim,)
        )
        y32 = y.astype(jnp.float32)
        mu = jnp.mean(y32, axis=(1, 2, 3), keepdims=True)
        m2 = jnp.mean(jnp.square(y32), axis=(1, 2, 3), keepdims=True)
        var = jnp.maximum(m2 - jnp.square(mu), 0.0)
        y = ((y32 - mu) * jax.lax.rsqrt(var + self.eps) * gamma + beta
             ).astype(y.dtype)

        embed, spk_logits = self._spk_embedding(enroll, train)
        if self.use_spk_transform:
            embed = SpeakerTransform(self.spk_emb_dim, name="spk_transform")(
                embed
            )

        fuse = SpeakerFuse(n_freqs, self.spk_fuse_type, name="spk_fuse")
        if self.scan_layers:
            do_fuse = self.spk_fuse_type != "None"
            if do_fuse:
                if self.spk_fuse_type == "concat":
                    raise NotImplementedError(
                        "scan_layers supports elementwise fuse types "
                        "(multiply/additive/FiLM/None); 'concat' mixes "
                        "channels — use the unrolled path"
                    )
                # all elementwise fuse types are affine in x with
                # embed-only coefficients: shift = fuse(0, e),
                # scale = fuse(1, e) - shift. Probing with 0/1 inputs
                # reuses the exact 'spk_fuse' params of the unrolled path.
                probe = jnp.zeros((b, 1, 1, n_freqs), y.dtype)
                shift = fuse(probe, embed)
                scale = fuse(jnp.ones_like(probe), embed) - shift
            else:
                scale = jnp.ones((b, 1, 1, n_freqs), y.dtype)
                shift = jnp.zeros((b, 1, 1, n_freqs), y.dtype)
            body_cls = (
                nn.remat(_FuseScanBlock, prevent_cse=False)
                if self.remat
                else _FuseScanBlock
            )
            scan_cls = nn.scan(
                body_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.n_layers,
            )
            (y, _, _), _ = scan_cls(
                self.emb_dim,
                self.emb_ks,
                self.emb_hs,
                n_freqs,
                self.lstm_hidden_units,
                self.attn_n_head,
                self.attn_approx_qk_dim,
                self.eps,
                self.shard_model_axis,
                do_fuse,
                name="blocks",
            )((y, scale, shift), None)
        else:
            block_cls = (
                nn.remat(GridNetBlock) if self.remat else GridNetBlock
            )
            for i in range(self.n_layers):
                # fuse over the freq dim: [B,T,Q,C] -> [B,T,C,Q] -> back
                yp = jnp.swapaxes(y, 2, 3)
                yp = fuse(yp, embed)
                y = jnp.swapaxes(yp, 2, 3)
                y = block_cls(
                    self.emb_dim,
                    self.emb_ks,
                    self.emb_hs,
                    n_freqs,
                    self.lstm_hidden_units,
                    self.attn_n_head,
                    self.attn_approx_qk_dim,
                    self.eps,
                    self.shard_model_axis,
                    name=f"block_{i}",
                )(y)

        init_d = torch_linear_init(self.n_srcs * 2 * 3 * 3)
        y = nn.ConvTranspose(
            self.n_srcs * 2, (3, 3), padding="VALID", transpose_kernel=True,
            kernel_init=init_d, bias_init=init_d, name="deconv",
            dtype=y.dtype,
        )(y)
        t_frames = feat.shape[1]
        y = y[:, 1 : 1 + t_frames, 1 : 1 + n_freqs]  # torch padding (1,1)

        y = y.reshape(b, t_frames, n_freqs, self.n_srcs, 2)
        est_re = jnp.transpose(y[..., 0], (0, 3, 1, 2)).reshape(
            b * self.n_srcs, t_frames, n_freqs
        )
        est_im = jnp.transpose(y[..., 1], (0, 3, 1, 2)).reshape(
            b * self.n_srcs, t_frames, n_freqs
        )
        s = istft(
            est_re, est_im, self.n_fft, self.stride, window=window,
            length=nsample,
        )
        s = s.reshape(b, self.n_srcs, nsample) * mix_std[:, None]
        if self.n_srcs == 1:
            s = s[:, 0]
        return s, spk_logits
