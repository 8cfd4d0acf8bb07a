"""Numerical parity of the TPU ConvTasNet/SpEx+ vs the reference model
(weight port, joint_training=False)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from test_bsrnn import _install_reference  # noqa: E402


def test_convtasnet_matches_reference(monkeypatch):
    _install_reference(monkeypatch)
    from wesep.models.convtasnet import ConvTasNet as RefConvTasNet

    from wesep_tpu.models.convtasnet import ConvTasNet

    torch.manual_seed(0)
    kwargs = dict(
        N=16, L=20, B=8, H=16, P=3, X=2, R=2,
        spk_emb_dim=12, norm="gLN", causal=False, skip_con=False,
        spk_fuse_type="concatConv", multi_fuse=True,
        use_spk_transform=False, encoder_type="Multi",
        decoder_type="Multi", joint_training=False,
    )
    ref = RefConvTasNet(**{**kwargs, "spksInTrain": 7}).eval()
    model = ConvTasNet(**{**kwargs, "spks_in_train": 7})

    from wesep_tpu.utils.torch_port import port_convtasnet_state_dict

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, port_convtasnet_state_dict(sd, num_repeat=kwargs["R"])
    )

    rng = np.random.default_rng(0)
    mix = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
    emb = rng.standard_normal((2, 12)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(mix), torch.from_numpy(emb))
    ref_ests = ref_out[0] if isinstance(ref_out[0], list) else ref_out[:3]
    ests, logits = model.apply(
        {"params": params}, jnp.asarray(mix), jnp.asarray(emb), train=False
    )
    assert logits is None
    assert len(ests) == 3
    for i, (got, want) in enumerate(zip(ests, ref_ests)):
        w = want.numpy() if hasattr(want, "numpy") else np.asarray(want)
        t = min(got.shape[-1], w.shape[-1])
        np.testing.assert_allclose(
            np.asarray(got)[:, :t], w[:, :t], atol=2e-3, rtol=1e-2,
            err_msg=f"est{i + 1}",
        )
