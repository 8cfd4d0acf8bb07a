"""Numerical parity of the TPU ConvTasNet/SpEx+ vs the reference model
(weight port, joint_training=False)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from test_bsrnn import _install_reference, _t  # noqa: E402


def _conv1d(m):
    """torch Conv1d [out, in, k] -> flax Conv {kernel [k, in, out]}."""
    return {"kernel": _t(m.weight).transpose(2, 1, 0), "bias": _t(m.bias)}


def _dwconv(m):
    """Depthwise conv -> custom Conv1d params (kernel [k, 1, C])."""
    return {"kernel": _t(m.weight).transpose(2, 1, 0), "bias": _t(m.bias)}


def _convtrans1d(m):
    """torch ConvTranspose1d [in, out, k] -> flax ConvTranspose
    (transpose_kernel=False) kernel [k, in, out], spatially FLIPPED."""
    return {
        "kernel": np.ascontiguousarray(
            _t(m.weight).transpose(2, 0, 1)[::-1]
        ),
        "bias": _t(m.bias),
    }


def _gln(m):
    return {"weight": _t(m.weight).reshape(-1),
            "bias": _t(m.bias).reshape(-1)}


def _prelu(m):
    return {"alpha": _t(m.weight).reshape(-1)}


def _fuse_block(blk):
    """Conv1DBlock4Fuse -> FuseTCNBlock params."""
    return {
        "Conv1d_0": {"Conv_0": _conv1d(blk.conv1x1)},
        "PReLU_0": _prelu(blk.prelu1),
        "GlobalLayerNorm_0": _gln(blk.lnorm1),
        "Conv1d_1": _dwconv(blk.dconv),
        "PReLU_1": _prelu(blk.prelu2),
        "GlobalLayerNorm_1": _gln(blk.lnorm2),
        "Conv1d_2": {"Conv_0": _conv1d(blk.sconv)},
    }


def _tcn_block(blk):
    """Conv1DBlock -> TCNBlock params."""
    return {
        "Conv1d_0": {"Conv_0": _conv1d(blk.conv1x1)},
        "PReLU_0": _prelu(blk.PReLU_1),
        "GlobalLayerNorm_0": _gln(blk.norm_1),
        "Conv1d_1": _dwconv(blk.dwconv),
        "PReLU_1": _prelu(blk.PReLU_2),
        "GlobalLayerNorm_1": _gln(blk.norm_2),
        "Conv1d_2": {"Conv_0": _conv1d(blk.Output)},
    }


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

    p = {}
    p["encoder"] = {
        "enc_short": {"Conv_0": _conv1d(ref.encoder.encoder_1d_short)},
        "enc_middle": {"Conv_0": _conv1d(ref.encoder.encoder_1d_middle)},
        "enc_long": {"Conv_0": _conv1d(ref.encoder.encoder_1d_long)},
        "ChannelLayerNorm_0": {"LayerNorm_0": {
            "scale": _t(ref.encoder.ln.weight),
            "bias": _t(ref.encoder.ln.bias),
        }},
        "proj": {"Conv_0": _conv1d(ref.encoder.proj)},
    }
    sep = list(ref.separation.separation)
    for r in range(kwargs["R"]):
        p[f"fuse_{r}"] = _fuse_block(sep[2 * r])
        inner = list(sep[2 * r + 1].separation)
        p[f"tcn_{r}"] = {
            f"TCNBlock_{i}": _tcn_block(b) for i, b in enumerate(inner)
        }
    for i in range(3):
        p[f"mask_{i}"] = {
            "Conv_0": _conv1d(getattr(ref.decoder, f"mask{i + 1}"))
        }
        p[f"dec_{i}"] = {
            "ConvTranspose_0": _convtrans1d(
                getattr(ref.decoder, f"decoder_1d_{i + 1}")
            )
        }
    params = jax.tree_util.tree_map(jnp.asarray, p)

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
