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
