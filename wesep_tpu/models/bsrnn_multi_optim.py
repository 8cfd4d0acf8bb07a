"""BSRNN_Multi: BSRNN + Self-estimated Speech Augmentation (SSA, multi-optim).

Equivalent of /root/reference/wesep/models/bsrnn_multi_optim.py:156-474
(SLT paper arXiv:2409.09589): in training mode the model runs a SECOND
separation pass (shared parameters) whose enrollment is its own DETACHED
first-pass estimate, and returns (s, self_s, spk_logits, self_spk_logits)
for the (loss_posi, loss_weight) table — e.g. SISDR at positions [0,1]
weighted [0.4, 0.6] (confs/bsrnn_multi_optim.yaml:loss_args).

Under jit this is a single graph with both passes — no python-level
grad-mode branching; `train=True` selects the two-pass variant (the
reference keys on torch.is_grad_enabled(), :407).
"""

import jax

from wesep_tpu.ops.stft import hann_window, stft
from wesep_tpu.models.bsrnn import BSRNN

__all__ = ["BSRNN_Multi"]


class BSRNN_Multi(BSRNN):
    def __call__(self, mix, enroll, train: bool = True):
        b, nsample = mix.shape
        window = hann_window(self.win)
        re, im = stft(mix, self.win, self.stride, window=window)
        feats, sub_specs = self._band_split(re, im)
        embed, spk_logits = self._spk_embedding(enroll, train)
        s = self._separate(feats, sub_specs, embed, nsample, window)
        if not train:
            return s, spk_logits
        # SSA second pass: own detached estimate as enrollment waveform
        self_enroll = jax.lax.stop_gradient(s)
        self_embed, self_logits = self._spk_embedding(
            self_enroll, train, from_waveform=True
        )
        self_s = self._separate(
            feats, sub_specs, self_embed, nsample, window
        )
        return [s, self_s, spk_logits, self_logits], None
