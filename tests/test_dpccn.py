"""Numerical parity of the TPU-native DPCCN vs the reference torch model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from test_bsrnn import _install_reference  # noqa: E402


def test_dpccn_matches_reference(monkeypatch):
    _install_reference(monkeypatch)
    from wesep.models.dpccn import DPCCN as RefDPCCN

    from wesep_tpu.models.dpccn import DPCCN

    torch.manual_seed(0)
    ref = RefDPCCN(joint_training=False, spk_emb_dim=32,
                   spk_fuse_type="multiply").eval()
    model = DPCCN(joint_training=False, spk_emb_dim=32,
                  spk_fuse_type="multiply")
    from wesep_tpu.utils.torch_port import port_dpccn_state_dict

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = jax.tree_util.tree_map(jnp.asarray, port_dpccn_state_dict(sd))

    rng = np.random.default_rng(0)
    mix = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    emb = rng.standard_normal((2, 32)).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(mix), torch.from_numpy(emb))
    est, logits = model.apply(
        {"params": params}, jnp.asarray(mix), jnp.asarray(emb), train=False
    )
    assert logits is None
    assert est.shape == (2, 16000)
    np.testing.assert_allclose(
        np.asarray(est), ref_out.numpy(), atol=2e-3, rtol=1e-2
    )


def test_dpccn_grad_finite():
    from wesep_tpu.models.dpccn import DPCCN
    from wesep_tpu.train.losses import si_sdr_loss

    model = DPCCN(joint_training=False, spk_emb_dim=16,
                  tcn_layers=1, tcn_blocks=2)
    mix = jnp.ones((1, 8000)) * 0.01
    emb = jnp.ones((1, 16))
    params = model.init(jax.random.PRNGKey(0), mix, emb, train=True)["params"]

    def loss_fn(p):
        est, _ = model.apply({"params": p}, mix, emb, train=True)
        return jnp.mean(si_sdr_loss(est, mix * 0.5))

    # jitted: eager grad dispatches the whole U-Net op-by-op on the
    # CPU harness (~2 min); compiled it is seconds and persistently cached
    g = jax.jit(jax.grad(loss_fn))(params)
    assert all(
        bool(jnp.all(jnp.isfinite(l)))
        for l in jax.tree_util.tree_leaves(g)
    )
