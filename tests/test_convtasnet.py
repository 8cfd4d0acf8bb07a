"""Shape/sanity tests for ConvTasNet/SpEx+ (reference test_convtasnet,
/root/reference/wesep/models/convtasnet.py:230-240)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wesep_tpu.models.convtasnet import ConvTasNet

B, T, TE = 2, 8000, 4000


def _init_and_run(model, enroll_shape, train=True):
    rng = jax.random.PRNGKey(0)
    mix = jax.random.normal(rng, (B, T))
    enroll = jax.random.normal(rng, enroll_shape)
    variables = model.init(rng, mix, enroll, train=False)
    out, updates = model.apply(
        variables, mix, enroll, train=train, mutable=["batch_stats"]
    )
    return out


def test_spexplus_multi_decoder():
    """SpEx+ config: multi-scale enc/dec, joint speaker encoder, CE head."""
    model = ConvTasNet(
        N=64, B=64, H=128, L=20, R=2, X=4,
        spk_emb_dim=64, multi_task=True, spks_in_train=17,
        spk_fuse_type="concatConv", encoder_type="Multi", decoder_type="Multi",
    )
    (ests, logits) = _init_and_run(model, (B, TE))
    assert isinstance(ests, list) and len(ests) == 3
    for e in ests:
        assert e.shape[0] == B and e.shape[1] <= T
        assert np.isfinite(np.asarray(e)).all()
    assert logits.shape == (B, 17)


def test_film_fuse_with_embedding_input():
    """Pre-extracted embedding path (joint_training=False) + FiLM fusion."""
    model = ConvTasNet(
        N=64, B=64, H=128, L=20, R=1, X=4,
        spk_emb_dim=32, joint_training=False, spk_fuse_type="FiLM",
        use_spk_transform=True, encoder_type="Multi", decoder_type="Multi",
    )
    ests, logits = _init_and_run(model, (B, 32))
    assert logits is None
    assert len(ests) == 3


def test_single_scale_path():
    model = ConvTasNet(
        N=64, B=64, H=128, L=16, R=1, X=3,
        spk_emb_dim=32, joint_training=False, spk_fuse_type="multiply",
        encoder_type=None, decoder_type=None,
    )
    est, _ = _init_and_run(model, (B, 32))
    assert est.shape[0] == B and est.shape[1] <= T


def test_jit_forward():
    model = ConvTasNet(
        N=64, B=64, H=128, L=20, R=1, X=3,
        spk_emb_dim=32, joint_training=False, spk_fuse_type="concatConv",
    )
    rng = jax.random.PRNGKey(1)
    mix = jax.random.normal(rng, (B, T))
    emb = jax.random.normal(rng, (B, 32))
    variables = model.init(rng, mix, emb, train=False)

    @jax.jit
    def fwd(v, m, e):
        return model.apply(v, m, e, train=False)

    ests, _ = fwd(variables, mix, emb)
    assert len(ests) == 3


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(),
        dict(causal=True),
        dict(skip_con=True),
    ],
)
def test_fuse_gln_exact(kwargs):
    """fuse_gln commutes gLN past the depthwise conv (and corrects the
    zero-padding edge taps): same params, same outputs, same grads as
    the plain path, up to fp reassociation."""
    from wesep_tpu.models.convtasnet import FuseTCNBlock, TCNBlock

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 311, 64), jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 32), jnp.float32)
    for cls, inputs in ((TCNBlock, (x,)), (FuseTCNBlock, (x, emb))):
        if cls is FuseTCNBlock and "skip_con" in kwargs:
            continue  # FuseTCNBlock has no skip_con
        args = dict(conv_channels=128, kernel_size=3, dilation=4,
                    norm="gLN", **kwargs)
        plain = cls(fuse_gln=False, **args)
        fused = cls(fuse_gln=True, **args)
        params = plain.init(rng, *inputs)
        # identical param tree: fuse_gln never shifts checkpoints
        assert jax.tree_util.tree_structure(params) == \
            jax.tree_util.tree_structure(fused.init(rng, *inputs))

        def scalar(model):
            def f(p):
                out = model.apply(p, *inputs)
                if isinstance(out, tuple):
                    out = jnp.concatenate(out, -1)
                return jnp.sum(out * out), out
            return f

        (s1, o1), g1 = jax.value_and_grad(scalar(plain), has_aux=True)(params)
        (s2, o2), g2 = jax.value_and_grad(scalar(fused), has_aux=True)(params)
        scale = float(jnp.max(jnp.abs(o1)))
        np.testing.assert_allclose(
            np.asarray(o2), np.asarray(o1), atol=3e-4 * scale, rtol=0)
        chex = jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(b), np.asarray(a),
                atol=3e-4 * max(1.0, float(jnp.max(jnp.abs(a)))), rtol=0),
            g1, g2)
        del chex


def test_fuse_gln_default_matches_plain_model():
    """Whole-model check at the SpEx+ shape: the default (fused) model
    reproduces the plain model's separation output on shared params."""
    kwargs = dict(N=64, B=64, H=128, L=20, R=1, X=4, norm="gLN",
                  spk_emb_dim=32, joint_training=False,
                  spk_fuse_type="concatConv", encoder_type="Multi",
                  decoder_type="Multi")
    plain = ConvTasNet(fuse_gln=False, **kwargs)
    fused = ConvTasNet(fuse_gln=True, **kwargs)
    rng = jax.random.PRNGKey(0)
    mix = jax.random.normal(rng, (B, T))
    emb = jax.random.normal(rng, (B, 32))
    params = plain.init(rng, mix, emb, train=False)
    o1, _ = plain.apply(params, mix, emb, train=False)
    o2, _ = fused.apply(params, mix, emb, train=False)
    for a, b in zip(o1, o2):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4 * scale, rtol=0)
