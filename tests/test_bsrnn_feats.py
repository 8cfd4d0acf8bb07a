"""BSRNN_Feats: tfmap_spec / tfmap_emb / cross-attention fusion paths."""

import numpy as np

import jax
import jax.numpy as jnp


def _run(model, b=2, t=4000, enroll_t=3200, seed=0):
    rng = np.random.default_rng(seed)
    mix = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32) * 0.1)
    enroll = jnp.asarray(
        rng.standard_normal((b, enroll_t)).astype(np.float32) * 0.1
    )
    variables = model.init(jax.random.PRNGKey(0), mix, enroll, train=False)
    if "batch_stats" in variables:
        out, _ = model.apply(
            variables, mix, enroll, train=True, mutable=["batch_stats"]
        )
    else:
        out = model.apply(variables, mix, enroll, train=True)
    return out


def test_tfmap_spec():
    from wesep_tpu.models import get_model

    model = get_model("BSRNN_Feats")(
        spk_emb_dim=32,
        feature_dim=8,
        num_repeat=1,
        use_spk_transform=False,
        spk_fuse_type="multiply",
        multi_fuse=False,
        joint_training=False,
        spectral_feat="tfmap_spec",
        remat=False,
    )
    est, logits = _run(model)
    assert est.shape == (2, 4000)
    assert bool(jnp.all(jnp.isfinite(est)))


def test_cross_attention_fuse_with_ecapa():
    from wesep_tpu.models import get_model

    model = get_model("BSRNN_Feats")(
        spk_emb_dim=32,
        feature_dim=16,
        num_repeat=2,
        use_spk_transform=False,
        spk_fuse_type="cross_multiply",
        multi_fuse=True,
        joint_training=True,
        spk_model="ECAPA_TDNN_GLOB_c512",
        spk_args={"feat_dim": 80, "embed_dim": 32},
        spectral_feat=None,
        remat=False,
    )
    est, logits = _run(model)
    assert est.shape == (2, 4000)
    assert bool(jnp.all(jnp.isfinite(est)))


def test_tfmap_emb_with_ecapa():
    from wesep_tpu.models import get_model

    model = get_model("BSRNN_Feats")(
        spk_emb_dim=32,
        feature_dim=8,
        num_repeat=1,
        use_spk_transform=False,
        spk_fuse_type="cross_additive",
        multi_fuse=False,
        joint_training=True,
        spk_model="ECAPA_TDNN_GLOB_c512",
        spk_args={"feat_dim": 80, "embed_dim": 32},
        spectral_feat="tfmap_emb",
        remat=False,
    )
    est, logits = _run(model)
    assert est.shape == (2, 4000)
    assert bool(jnp.all(jnp.isfinite(est)))
