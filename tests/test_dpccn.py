"""Numerical parity of the TPU-native DPCCN vs the reference torch model."""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from test_bsrnn import _install_reference, _t  # noqa: E402


def _conv2d(m):
    """torch Conv2d -> flax NHWC {kernel [kh,kw,in,out], bias}."""
    return {
        "kernel": _t(m.weight).transpose(2, 3, 1, 0),
        "bias": _t(m.bias),
    }


def _convtrans2d(m):
    """torch ConvTranspose2d [in,out,kh,kw] -> flax transpose_kernel=True
    kernel [kh,kw,out,in]."""
    return {
        "kernel": _t(m.weight).transpose(2, 3, 1, 0),
        "bias": _t(m.bias),
    }


def _conv1x1_2d(m):
    return {
        "kernel": _t(m.weight)[:, :, 0, 0].T,
        "bias": _t(m.bias),
    }


def _dense_block(db):
    return {
        f"conv{i}": {"conv": _conv2d(getattr(db, f"conv{i}").conv2d)}
        for i in range(1, 6)
    }


def _port_dpccn(ref):
    p = {}
    p["conv2d"] = _conv2d(ref.conv2d)
    enc = list(ref.encoder)
    p["enc0"] = _dense_block(enc[0])
    for i in range(4):
        seq = enc[1 + i]
        p[f"enc{i + 1}_conv"] = {"conv": _conv2d(seq[0].conv2d)}
        p[f"enc{i + 1}_dense"] = _dense_block(seq[1])
    for j in range(3):
        p[f"enc{5 + j}"] = {"conv": _conv2d(enc[5 + j].conv2d)}

    p["spk_fuse"] = {
        "Dense_0": {
            "kernel": _t(ref.spk_fuse.fc.linear.weight).T,
            "bias": _t(ref.spk_fuse.fc.linear.bias),
        }
    }

    # tcn: Sequential of 2 layers x Sequential of 10 blocks
    for li, layer in enumerate(ref.tcn_layers):
        for bi, blk in enumerate(layer):
            p[f"tcn_{li}_{bi}"] = {
                "dconv1": {
                    "kernel": _t(blk.dconv1.weight).transpose(2, 1, 0),
                    "bias": _t(blk.dconv1.bias),
                },
                "dconv2": {
                    "kernel": _t(blk.dconv2.weight)[:, :, 0].T,
                    "bias": _t(blk.dconv2.bias),
                },
            }

    dec = list(ref.decoder)
    for j in range(3):
        p[f"dec{j}"] = {"conv": _convtrans2d(dec[j].convtrans2d)}
    for i in range(4):
        seq = dec[3 + i]
        p[f"dec{3 + i}_dense"] = _dense_block(seq[0])
        p[f"dec{3 + i}_conv"] = {"conv": _convtrans2d(seq[1].convtrans2d)}
    p["dec7"] = _dense_block(dec[7])

    for pi, seq in enumerate(ref.avg_pool):
        p[f"avg_pool_{pi}"] = _conv1x1_2d(seq[1])
    p["avg_proj"] = _conv1x1_2d(ref.avg_proj)
    p["deconv2d"] = _convtrans2d(ref.deconv2d)
    return jax.tree_util.tree_map(jnp.asarray, p)


def test_dpccn_matches_reference(monkeypatch):
    _install_reference(monkeypatch)
    from wesep.models.dpccn import DPCCN as RefDPCCN

    from wesep_tpu.models.dpccn import DPCCN

    torch.manual_seed(0)
    ref = RefDPCCN(joint_training=False, spk_emb_dim=32,
                   spk_fuse_type="multiply").eval()
    model = DPCCN(joint_training=False, spk_emb_dim=32,
                  spk_fuse_type="multiply")
    params = _port_dpccn(ref)

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

    g = jax.grad(loss_fn)(params)
    assert all(
        bool(jnp.all(jnp.isfinite(l)))
        for l in jax.tree_util.tree_leaves(g)
    )
