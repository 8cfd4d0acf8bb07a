"""Numerical parity of the TPU-native TF-GridNet vs the reference model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from test_bsrnn import _install_reference, _lstm_params, _t  # noqa: E402


def _conv2d(m):
    return {"kernel": _t(m.weight).transpose(2, 3, 1, 0), "bias": _t(m.bias)}


def _convtrans2d(m):
    return {"kernel": _t(m.weight).transpose(2, 3, 1, 0), "bias": _t(m.bias)}


def _conv1x1_2d_dense(m):
    return {"kernel": _t(m.weight)[:, :, 0, 0].T, "bias": _t(m.bias)}


def _port_block(blk):
    p = {}
    for name in ("intra", "inter"):
        p[f"{name}_norm"] = {
            "scale": _t(getattr(blk, f"{name}_norm").weight),
            "bias": _t(getattr(blk, f"{name}_norm").bias),
        }
        p[f"{name}_rnn"] = _lstm_params(getattr(blk, f"{name}_rnn"))
        lin = getattr(blk, f"{name}_linear")
        if isinstance(lin, torch.nn.ConvTranspose1d):
            # torch [in, out, k] -> flax transpose_kernel=True [k, out, in]
            p[f"{name}_linear"] = {
                "kernel": _t(lin.weight).transpose(2, 1, 0),
                "bias": _t(lin.bias),
            }
        else:
            p[f"{name}_linear"] = {
                "kernel": _t(lin.weight).T,
                "bias": _t(lin.bias),
            }
    for tag in ("Q", "K", "V"):
        conv = getattr(blk, f"attn_conv_{tag}")
        norm = getattr(blk, f"attn_norm_{tag}")
        p[f"attn_conv_{tag}"] = _conv1x1_2d_dense(conv)
        p[f"attn_norm_{tag}_prelu"] = _t(norm.act.weight)
        p[f"attn_norm_{tag}_scale"] = _t(norm.gamma)[0, :, :, 0, :]  # [H,E,F]
        p[f"attn_norm_{tag}_bias"] = _t(norm.beta)[0, :, :, 0, :]
    proj = blk.attn_concat_proj
    p["attn_proj"] = _conv1x1_2d_dense(proj[0])
    p["attn_proj_prelu"] = _t(proj[1].weight)
    p["attn_proj_norm_scale"] = _t(proj[2].gamma)[0, :, 0, :]  # [C, F]
    p["attn_proj_norm_bias"] = _t(proj[2].beta)[0, :, 0, :]
    return p


def test_tfgridnet_matches_reference(monkeypatch):
    _install_reference(monkeypatch)
    from wesep.models.tfgridnet import TFGridNet as RefTFGridNet

    from wesep_tpu.models.tfgridnet import TFGridNet

    torch.manual_seed(0)
    kwargs = dict(
        n_srcs=1,
        n_fft=128,
        stride=64,
        n_layers=2,
        lstm_hidden_units=32,
        attn_n_head=4,
        attn_approx_qk_dim=256,
        emb_dim=16,
        emb_ks=4,
        emb_hs=1,
        spk_emb_dim=24,
        spk_fuse_type="multiply",
        joint_training=False,
    )
    ref = RefTFGridNet(**kwargs).eval()
    model = TFGridNet(**{**kwargs, "remat": False})

    p = {}
    p["conv"] = _conv2d(ref.conv[0])
    p["conv_norm_scale"] = _t(ref.conv[1].weight)
    p["conv_norm_bias"] = _t(ref.conv[1].bias)
    p["spk_fuse"] = {
        "Dense_0": {
            "kernel": _t(ref.spk_fuse.fc.linear.weight).T,
            "bias": _t(ref.spk_fuse.fc.linear.bias),
        }
    }
    for i, blk in enumerate(ref.blocks):
        p[f"block_{i}"] = _port_block(blk)
    p["deconv"] = _convtrans2d(ref.deconv)
    params = jax.tree_util.tree_map(jnp.asarray, p)

    rng = np.random.default_rng(0)
    mix = rng.standard_normal((2, 4000)).astype(np.float32) * 0.1
    emb = rng.standard_normal((2, 24)).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(mix), torch.from_numpy(emb))
    est, logits = model.apply(
        {"params": params}, jnp.asarray(mix), jnp.asarray(emb), train=False
    )
    assert logits is None
    assert est.shape == (2, 4000)
    np.testing.assert_allclose(
        np.asarray(est), ref_out.numpy(), atol=2e-3, rtol=1e-2
    )


def test_tfgridnet_grad_finite():
    from wesep_tpu.models.tfgridnet import TFGridNet
    from wesep_tpu.train.losses import si_sdr_loss

    model = TFGridNet(
        n_layers=1, lstm_hidden_units=16, emb_dim=8, attn_n_head=2,
        attn_approx_qk_dim=64, spk_emb_dim=16, joint_training=False,
    )
    mix = jnp.ones((1, 2000)) * 0.01 + jnp.sin(
        jnp.arange(2000) * 0.1
    )[None] * 0.1
    emb = jnp.ones((1, 16))
    params = model.init(jax.random.PRNGKey(0), mix, emb, train=True)["params"]

    def loss_fn(p):
        est, _ = model.apply({"params": p}, mix, emb, train=True)
        return jnp.mean(si_sdr_loss(est, mix * 0.5))

    g = jax.grad(loss_fn)(params)
    assert all(
        bool(jnp.all(jnp.isfinite(l)))
        for l in jax.tree_util.tree_leaves(g)
    )
