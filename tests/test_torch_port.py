"""State-dict-based torch->flax conversion parity (BSRNN)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from test_bsrnn import _install_reference  # noqa: E402


@pytest.mark.parametrize(
    "multi_fuse,fuse_type",
    [(False, "multiply"), (True, "multiply"),
     # FiLM re-exercises the same port mapping with a different fuse
     # module; slow-suite only
     pytest.param(False, "FiLM", marks=pytest.mark.slow),
     pytest.param(True, "FiLM", marks=pytest.mark.slow)],
)
def test_port_bsrnn_state_dict_matches_reference(monkeypatch, multi_fuse,
                                                 fuse_type):
    _install_reference(monkeypatch)
    from wesep.models.bsrnn import BSRNN as RefBSRNN

    from wesep_tpu.models.bsrnn import BSRNN
    from wesep_tpu.utils.torch_port import port_bsrnn_state_dict

    torch.manual_seed(1)
    kwargs = dict(
        spk_emb_dim=32,
        sr=16000,
        win=512,
        stride=128,
        feature_dim=16,
        num_repeat=2,
        use_spk_transform=False,
        spk_fuse_type=fuse_type,
        multi_fuse=multi_fuse,
        joint_training=False,
    )
    ref = RefBSRNN(**{**kwargs, "spksInTrain": 11}).eval()
    if fuse_type == "FiLM":
        # FiLM is zero-initialized (identity); randomize so the port is
        # exercised non-trivially (as after training)
        with torch.no_grad():
            for name, p in ref.named_parameters():
                if "gamma_fcs" in name or "beta_fcs" in name:
                    p.normal_(0.0, 0.2)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = port_bsrnn_state_dict(
        sd,
        sr=16000,
        win=512,
        num_repeat=2,
        multi_fuse=multi_fuse,
        use_spk_transform=False,
        spk_fuse_type=fuse_type,
    )
    model = BSRNN(**kwargs)
    rng = np.random.default_rng(0)
    mix = rng.standard_normal((1, 6000)).astype(np.float32) * 0.1
    emb = rng.standard_normal((1, 32)).astype(np.float32)
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(mix), torch.from_numpy(emb))
    import jax

    got, _ = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(mix), jnp.asarray(emb), train=False,
    )
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), atol=5e-4, rtol=1e-3
    )


def test_load_torch_state_dict_bundle(tmp_path):
    from wesep_tpu.utils.torch_port import load_torch_state_dict

    lin = torch.nn.Linear(4, 3)
    # reference-style bundle {'models': [state_dict]}
    path = str(tmp_path / "b.pt")
    torch.save({"models": [lin.state_dict()]}, path)
    sd = load_torch_state_dict(path)
    assert set(sd) == {"weight", "bias"}
    assert sd["weight"].shape == (3, 4)
