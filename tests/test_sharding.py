"""Multi-chip sharding: TF-GridNet model-axis parity + graft dryrun."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@pytest.fixture(scope="module")
def mesh2d():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.asarray(devs).reshape(4, 2), ("data", "model"))


def test_tfgridnet_sharded_matches_unsharded(mesh2d):
    from wesep_tpu.models.tfgridnet import TFGridNet

    kwargs = dict(
        n_layers=1, lstm_hidden_units=16, emb_dim=8, attn_n_head=2,
        attn_approx_qk_dim=64, emb_ks=1, emb_hs=1, spk_emb_dim=16,
        joint_training=False, remat=False,
    )
    plain = TFGridNet(**kwargs)
    sharded_model = TFGridNet(**kwargs, shard_model_axis=True)

    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((8, 2048)).astype(np.float32) * 0.1)
    emb = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    variables = plain.init(jax.random.PRNGKey(0), mix, emb, train=False)

    ref, _ = jax.jit(
        lambda v, m, e: plain.apply(v, m, e, train=False)
    )(variables, mix, emb)

    repl = NamedSharding(mesh2d, P())
    bsh = NamedSharding(mesh2d, P("data"))
    with mesh2d:
        out, _ = jax.jit(
            lambda v, m, e: sharded_model.apply(v, m, e, train=False),
            in_shardings=(repl, bsh, bsh),
        )(
            jax.device_put(variables, repl),
            jax.device_put(mix, bsh),
            jax.device_put(emb, bsh),
        )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3
    )


def test_graft_dryrun_multichip():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry_test",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"),
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.dryrun_multichip(len(jax.devices()))
