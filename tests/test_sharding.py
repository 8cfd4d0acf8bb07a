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


def test_train_model_axis_parity(tmp_path):
    """bin/train `model_axis: 2` (2-D data x model mesh, the recipe-level
    switch for TF-GridNet sequence-parallel sharding) trains to the same
    parameters as the pure data-parallel run on the same batches."""
    import os

    import yaml

    from test_e2e import _make_premixed_shard
    from wesep_tpu.bin.train import train
    from wesep_tpu.utils.file_utils import write_vec_ark_scp

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    root = tmp_path
    spks = ["spkA", "spkB", "spkC", "spkD"]
    embeds = {
        f"utt_{s}": (np.eye(4, 16)[i] + 0.01).astype(np.float32)
        for i, s in enumerate(spks)
    }
    _, scp_path = write_vec_ark_scp(str(root / "embed"), embeds)
    with open(root / "single.utt2spk", "w") as f:
        for s in spks:
            f.write(f"utt_{s} {s}\n")
    train_keys = {
        f"tr{i:02d}": (spks[i % 4], spks[(i + 1) % 4]) for i in range(8)
    }
    val_keys = {"cv00": (spks[0], spks[1]), "cv01": (spks[2], spks[3])}
    _make_premixed_shard(str(root / "train.tar"), train_keys, t=4000, seed=0)
    _make_premixed_shard(str(root / "val.tar"), val_keys, t=4000, seed=1)
    for name in ("train", "val"):
        with open(root / f"{name}.list", "w") as f:
            f.write(str(root / f"{name}.tar") + "\n")
    for idx in (1, 2):
        with open(root / f"val.spk{idx}_enroll", "w") as f:
            for k, ss in val_keys.items():
                f.write(f"{k} utt_{ss[idx - 1]}\n")

    base = {
        "data_type": "shard",
        "train_data": str(root / "train.list"),
        "val_data": str(root / "val.list"),
        "train_spk_embeds": scp_path,
        "train_utt2spk": str(root / "single.utt2spk"),
        "val_spk_embeds": scp_path,
        "val_spk1_enroll": str(root / "val.spk1_enroll"),
        "val_spk2_enroll": str(root / "val.spk2_enroll"),
        "seed": 5,
        "num_epochs": 1,
        "loss": "SISDR",
        "loss_args": {},
        "dataloader_args": {"batch_size": 4, "prefetch_factor": 0},
        "dataset_args": {
            "resample_rate": 16000,
            "shuffle": False,
            "chunk_len": 2000,
            "sample_num_per_epoch": 8,
        },
        "model": {"tse_model": "TFGridNet"},
        "model_args": {
            "tse_model": {
                "n_layers": 1, "lstm_hidden_units": 16, "emb_dim": 8,
                "attn_n_head": 2, "attn_approx_qk_dim": 64,
                "emb_ks": 1, "emb_hs": 1, "spk_emb_dim": 16,
                "joint_training": False, "remat": False,
            }
        },
        "model_init": {"tse_model": None},
        "optimizer": {"tse_model": "Adam"},
        "optimizer_args": {"tse_model": {"lr": 1e-3}},
        "scheduler": {"tse_model": "ExponentialDecrease"},
        "scheduler_args": {
            "tse_model": {
                "initial_lr": 1e-3, "final_lr": 1e-4,
                "warm_up_epoch": 0, "warm_from_zero": False,
            }
        },
    }

    params = {}
    for ax in (1, 2):
        cfg = dict(base, exp_dir=str(root / f"exp_ax{ax}"), model_axis=ax)
        cfg_path = str(root / f"cfg_ax{ax}.yaml")
        with open(cfg_path, "w") as f:
            yaml.dump(cfg, f)
        state = train(cfg_path)
        assert int(state.step) == 2
        params[ax] = jax.tree_util.tree_map(np.asarray, state.params)
        assert os.path.exists(
            os.path.join(root / f"exp_ax{ax}", "models", "checkpoint_1.ckpt")
        )

    flat1 = jax.tree_util.tree_leaves_with_path(params[1])
    flat2 = dict(jax.tree_util.tree_leaves_with_path(params[2]))
    hit = False
    for path, leaf in flat1:
        np.testing.assert_allclose(
            leaf, flat2[path], atol=1e-5, rtol=1e-4,
            err_msg=str(path),
        )
        hit = True
    assert hit


def test_train_accum_grad_mesh_parity(tmp_path):
    """accum_grad=2 through bin/train on the 8-device mesh: microbatch
    rows (not batch rows) drive the data-axis fit, the in-step reshape
    works on sharded arrays, and the final parameters match accum=1."""
    import os

    import yaml

    from test_e2e import _make_premixed_shard
    from wesep_tpu.bin.train import train
    from wesep_tpu.utils.file_utils import write_vec_ark_scp

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    root = tmp_path
    spks = ["spkA", "spkB", "spkC", "spkD"]
    embeds = {
        f"utt_{s}": (np.eye(4, 16)[i] + 0.01).astype(np.float32)
        for i, s in enumerate(spks)
    }
    _, scp_path = write_vec_ark_scp(str(root / "embed"), embeds)
    with open(root / "single.utt2spk", "w") as f:
        for s in spks:
            f.write(f"utt_{s} {s}\n")
    train_keys = {
        f"tr{i:02d}": (spks[i % 4], spks[(i + 1) % 4]) for i in range(8)
    }
    val_keys = {"cv00": (spks[0], spks[1])}
    _make_premixed_shard(str(root / "train.tar"), train_keys, t=4000, seed=0)
    _make_premixed_shard(str(root / "val.tar"), val_keys, t=4000, seed=1)
    for name in ("train", "val"):
        with open(root / f"{name}.list", "w") as f:
            f.write(str(root / f"{name}.tar") + "\n")
    for idx in (1, 2):
        with open(root / f"val.spk{idx}_enroll", "w") as f:
            for k, ss in val_keys.items():
                f.write(f"{k} utt_{ss[idx - 1]}\n")

    base = {
        "data_type": "shard",
        "train_data": str(root / "train.list"),
        "val_data": str(root / "val.list"),
        "train_spk_embeds": scp_path,
        "train_utt2spk": str(root / "single.utt2spk"),
        "val_spk_embeds": scp_path,
        "val_spk1_enroll": str(root / "val.spk1_enroll"),
        "val_spk2_enroll": str(root / "val.spk2_enroll"),
        "seed": 9,
        "num_epochs": 1,
        "loss": "SISDR",
        "loss_args": {},
        "dataloader_args": {"batch_size": 4, "prefetch_factor": 0},
        "dataset_args": {
            "resample_rate": 16000,
            "shuffle": False,
            "chunk_len": 2000,
            "sample_num_per_epoch": 8,
        },
        "model": {"tse_model": "BSRNN"},
        "model_args": {
            "tse_model": {
                "spk_emb_dim": 16, "feature_dim": 8, "num_repeat": 1,
                "joint_training": False, "use_spk_transform": False,
                "spk_fuse_type": "multiply", "multi_fuse": False,
            }
        },
        "model_init": {"tse_model": None},
        "optimizer": {"tse_model": "Adam"},
        "optimizer_args": {"tse_model": {"lr": 1e-3}},
        "scheduler": {"tse_model": "ExponentialDecrease"},
        "scheduler_args": {
            "tse_model": {
                "initial_lr": 1e-3, "final_lr": 1e-4,
                "warm_up_epoch": 0, "warm_from_zero": False,
            }
        },
    }

    params = {}
    for accum in (1, 2):
        cfg = dict(base, exp_dir=str(root / f"exp_ac{accum}"),
                   accum_grad=accum)
        cfg_path = str(root / f"cfg_ac{accum}.yaml")
        with open(cfg_path, "w") as f:
            yaml.dump(cfg, f)
        state = train(cfg_path)
        assert int(state.step) == 2
        params[accum] = jax.tree_util.tree_map(np.asarray, state.params)
        assert os.path.exists(
            os.path.join(root / f"exp_ac{accum}", "models",
                         "checkpoint_1.ckpt")
        )

    for a, b in zip(
        jax.tree_util.tree_leaves(params[1]),
        jax.tree_util.tree_leaves(params[2]),
    ):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("n", [16, 32])
def test_graft_dryrun_compile_scales(n):
    """dryrun_multichip at 16/32 virtual devices (r4 VERDICT #8: catch
    compile-scaling surprises beyond the driver's 8-device run). Needs a
    fresh process: the virtual device count is fixed at backend init."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n}"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import __graft_entry__ as g;"
        f"g.dryrun_multichip({n});"
        "print('DRYRUN_OK')"
    )
    res = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=repo,
        capture_output=True, text=True, timeout=1500,
    )
    assert res.returncode == 0 and "DRYRUN_OK" in res.stdout, (
        res.stdout[-2000:] + res.stderr[-2000:]
    )
