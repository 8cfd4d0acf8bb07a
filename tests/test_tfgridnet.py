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

    g = jax.jit(jax.grad(loss_fn))(params)
    assert all(
        bool(jnp.all(jnp.isfinite(l)))
        for l in jax.tree_util.tree_leaves(g)
    )


@pytest.mark.parametrize(
    "fuse_type",
    ["multiply",
     # the FiLM/None variants cover the same scan-vs-unrolled machinery
     # with a different (cheap) fuse affine — slow-suite only
     pytest.param("FiLM", marks=pytest.mark.slow),
     pytest.param("None", marks=pytest.mark.slow)],
)
def test_scan_layers_matches_unrolled(fuse_type):
    """scan_layers=True (one lax.scan body over stacked per-layer params)
    reproduces the unrolled model exactly after stack_gridnet_blocks."""
    from wesep_tpu.models.tfgridnet import TFGridNet
    from wesep_tpu.utils.torch_port import stack_gridnet_blocks

    kwargs = dict(
        n_srcs=1, n_fft=128, stride=64, n_layers=3,
        lstm_hidden_units=16, attn_n_head=2, attn_approx_qk_dim=128,
        emb_dim=8, emb_ks=4, emb_hs=1, spk_emb_dim=12,
        spk_fuse_type=fuse_type, joint_training=False, remat=False,
    )
    unrolled = TFGridNet(**kwargs)
    scanned = TFGridNet(**{**kwargs, "scan_layers": True})

    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((2, 12)).astype(np.float32))
    variables = unrolled.init(jax.random.PRNGKey(0), mix, emb, train=False)
    if fuse_type == "FiLM":
        # FiLM starts at identity; randomize so the fuse is non-trivial
        film = variables["params"]["spk_fuse"]["FiLM_0"]
        variables = jax.tree_util.tree_map(lambda x: x, variables)
        for k in film:
            film[k]["kernel"] = jnp.asarray(
                rng.standard_normal(film[k]["kernel"].shape) * 0.2,
                jnp.float32,
            )
    want = unrolled.apply(variables, mix, emb, train=False)[0]

    sparams = stack_gridnet_blocks(dict(variables["params"]))
    got = scanned.apply({"params": sparams}, mix, emb, train=False)[0]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )

    # param-count parity: stacked leaves hold exactly the per-block trees
    sizes = lambda t: sum(  # noqa: E731
        np.asarray(x).size for x in jax.tree_util.tree_leaves(t)
    )
    init_scan = scanned.init(jax.random.PRNGKey(1), mix, emb, train=False)
    assert sizes(init_scan["params"]) == sizes(variables["params"])


def test_scan_layers_grad_and_remat():
    """The scanned model trains: remat+scan composes, grads finite."""
    from wesep_tpu.models.tfgridnet import TFGridNet

    model = TFGridNet(
        n_srcs=1, n_fft=128, stride=64, n_layers=2,
        lstm_hidden_units=16, attn_n_head=2, attn_approx_qk_dim=128,
        emb_dim=8, emb_ks=4, emb_hs=1, spk_emb_dim=12,
        spk_fuse_type="multiply", joint_training=False,
        remat=True, scan_layers=True,
    )
    rng = np.random.default_rng(1)
    mix = jnp.asarray(rng.standard_normal((1, 4000)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((1, 12)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), mix, emb, train=False)

    def loss(p):
        out = model.apply({"params": p}, mix, emb, train=False)[0]
        return jnp.mean(jnp.square(out))

    g = jax.jit(jax.grad(loss))(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)
    # per-layer params got distinct gradients (scan really is layered)
    blk = g["blocks"]["block"]
    any_leaf = jax.tree_util.tree_leaves(blk)[0]
    assert any_leaf.shape[0] == 2
