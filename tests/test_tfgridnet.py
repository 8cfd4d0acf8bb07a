"""Numerical parity of the TPU-native TF-GridNet vs the reference model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from test_bsrnn import _install_reference  # noqa: E402


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

    from wesep_tpu.utils.torch_port import port_tfgridnet_state_dict

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, port_tfgridnet_state_dict(sd)
    )

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
