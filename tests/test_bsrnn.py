"""Numerical parity of the TPU-native BSRNN vs the reference torch model.

Ports the reference model's weights (joint_training=False) into the flax
param tree and asserts the separated waveforms match. The reference model
is loaded from /root/reference with wespeaker/torchaudio stubbed out (they
are only needed for the joint speaker-encoder path).
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _install_reference(monkeypatch):
    for name in ("wespeaker", "wespeaker.models", "wespeaker.models.speaker_model"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
    sys.modules["wespeaker.models.speaker_model"].get_speaker_model = (
        lambda *_a, **_k: None
    )
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        ta.transforms = types.SimpleNamespace(MelSpectrogram=lambda **_k: None)
        sys.modules["torchaudio"] = ta
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    # Bypass wesep/__init__.py (pulls silero_vad etc.): register package
    # shells whose __path__ points at the reference tree so submodules load.
    for name, path in (
        ("wesep", "/root/reference/wesep"),
        ("wesep.models", "/root/reference/wesep/models"),
    ):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [path]
            sys.modules[name] = pkg


def _t(x):
    return np.asarray(x.detach().numpy())


def _lstm_params(rnn, prefix=""):
    """torch nn.LSTM (1 layer, bidirectional) -> fused-scan param dict."""
    out = {}
    for suffix, tag in (("", "f"), ("_reverse", "b")):
        wi = _t(getattr(rnn, f"weight_ih_l0{suffix}")).T  # [D, 4H]
        wh = _t(getattr(rnn, f"weight_hh_l0{suffix}")).T  # [H, 4H]
        b = _t(getattr(rnn, f"bias_ih_l0{suffix}")) + _t(
            getattr(rnn, f"bias_hh_l0{suffix}")
        )
        out[f"wx_{tag}"] = wi
        out[f"wh_{tag}"] = wh
        out[f"b_{tag}"] = b
    return out


def _resrnn_params(m):
    return {
        "norm_scale": _t(m.norm.weight),
        "norm_bias": _t(m.norm.bias),
        "rnn": _lstm_params(m.rnn),
        "proj": {"kernel": _t(m.proj.weight).T, "bias": _t(m.proj.bias)},
    }


def _conv1x1(m):
    """torch Conv1d(k=1) -> Dense kernel [in, out] + bias."""
    return {"kernel": _t(m.weight)[:, :, 0].T, "bias": _t(m.bias)}


def _grouped(stacks):
    """list of per-band dicts -> stacked arrays along a new band axis."""
    keys = stacks[0].keys()
    return {k: np.stack([s[k] for s in stacks]) for k in keys}


def _port_bsrnn(ref, groups, num_repeat, multi_fuse):
    params = {}
    # band norm + bottleneck, grouped by width
    band = 0
    for gi, (n, bw) in enumerate(groups):
        norms, projs = [], []
        for i in range(band, band + n):
            gn, conv = ref.BN[i][0], ref.BN[i][1]
            norms.append({"scale": _t(gn.weight), "bias": _t(gn.bias)})
            projs.append(_conv1x1(conv))
        params[f"bn_norm_{gi}"] = _grouped(norms)
        params[f"bn_proj_{gi}"] = _grouped(projs)
        band += n

    # speaker transform (Identity unless use_spk_transform)
    if hasattr(ref.spk_transform, "transforms"):
        convs = [m for m in ref.spk_transform.transforms
                 if isinstance(m, torch.nn.Conv1d)]
        params["spk_transform"] = {
            f"Dense_{i}": _conv1x1(c) for i, c in enumerate(convs)
        }

    # separator
    sep = list(ref.separator.separation)
    if multi_fuse:
        fuses = sep[0::2]
        bsnets = sep[1::2]
        for r, f in enumerate(fuses):
            params[f"fuse_{r}"] = {
                "Dense_0": {
                    "kernel": _t(f.fc.linear.weight).T,
                    "bias": _t(f.fc.linear.bias),
                }
            }
    else:
        params["fuse_0"] = {
            "Dense_0": {
                "kernel": _t(sep[0].fc.linear.weight).T,
                "bias": _t(sep[0].fc.linear.bias),
            }
        }
        bsnets = sep[1:]
    for r, bs in enumerate(bsnets):
        params[f"bsnet_{r}"] = {
            "band_rnn": _resrnn_params(bs.band_rnn),
            "band_comm": _resrnn_params(bs.band_comm),
        }

    # mask MLPs, grouped
    band = 0
    for gi, (n, bw) in enumerate(groups):
        norms, fc1, fc2, out = [], [], [], []
        for i in range(band, band + n):
            seq = ref.mask[i]
            norms.append({"scale": _t(seq[0].weight), "bias": _t(seq[0].bias)})
            fc1.append(_conv1x1(seq[1]))
            fc2.append(_conv1x1(seq[3]))
            out.append(_conv1x1(seq[5]))
        params[f"mask_norm_{gi}"] = _grouped(norms)
        params[f"mask_fc1_{gi}"] = _grouped(fc1)
        params[f"mask_fc2_{gi}"] = _grouped(fc2)
        params[f"mask_out_{gi}"] = _grouped(out)
        band += n
    return jax.tree_util.tree_map(jnp.asarray, params)


@pytest.mark.parametrize("multi_fuse,fuse_type", [(False, "multiply"),
                                                  (True, "concat")])
def test_bsrnn_matches_reference(monkeypatch, multi_fuse, fuse_type):
    _install_reference(monkeypatch)
    from wesep.models.bsrnn import BSRNN as RefBSRNN

    from wesep_tpu.models.bsrnn import BSRNN, band_layout

    torch.manual_seed(0)
    # the reference hardcodes SpeakerTransform() at embed_dim=256
    # (bsrnn.py:211-214), so only exercise it with spk_emb_dim=256
    use_spk_transform = multi_fuse
    kwargs = dict(
        spk_emb_dim=256 if use_spk_transform else 32,
        sr=16000,
        win=512,
        stride=128,
        feature_dim=16,
        num_repeat=2,
        use_spk_transform=use_spk_transform,
        spk_fuse_type=fuse_type,
        multi_fuse=multi_fuse,
        joint_training=False,
    )
    ref = RefBSRNN(**{**kwargs, "spksInTrain": 251}).eval()
    model = BSRNN(**kwargs)

    groups = band_layout(16000, 512 // 2 + 1)
    params = _port_bsrnn(ref, groups, 2, multi_fuse)

    rng = np.random.default_rng(0)
    mix = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
    emb = rng.standard_normal((2, kwargs["spk_emb_dim"])).astype(np.float32)

    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(mix), torch.from_numpy(emb))
    est, logits = model.apply(
        {"params": params}, jnp.asarray(mix), jnp.asarray(emb), train=False
    )
    assert logits is None
    assert est.shape == (2, 8000)
    np.testing.assert_allclose(
        np.asarray(est), ref_out.numpy(), atol=5e-4, rtol=1e-3
    )


def test_bsrnn_init_and_grad():
    """Init from scratch, run fwd+bwd jitted, check gradients are finite."""
    from wesep_tpu.models.bsrnn import BSRNN
    from wesep_tpu.train.losses import si_sdr_loss

    model = BSRNN(
        spk_emb_dim=16,
        feature_dim=8,
        num_repeat=1,
        joint_training=False,
        use_spk_transform=False,
        spk_fuse_type="multiply",
        multi_fuse=False,
    )
    mix = jnp.zeros((1, 4000)) + 0.01
    emb = jnp.ones((1, 16))
    params = model.init(jax.random.PRNGKey(0), mix, emb, train=True)["params"]

    @jax.jit
    def loss_fn(p, mix, emb):
        est, _ = model.apply({"params": p}, mix, emb, train=True)
        return jnp.mean(si_sdr_loss(est, mix * 0.5))

    g = jax.jit(jax.grad(loss_fn))(params, mix, emb)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert any(bool(jnp.any(l != 0)) for l in leaves)
