"""Training entry point: YAML-config driven, data-parallel over the mesh.

Equivalent of /root/reference/wesep/bin/train.py (call stack SURVEY §3.1),
TPU-native: one process per HOST drives all local devices through a
jax.sharding.Mesh 'data' axis (replacing torchrun one-proc-per-GPU + DDP);
multi-host via jax.distributed.initialize when WESEP_DIST=1.

Usage:
  python -m wesep_tpu.bin.train --config confs/bsrnn.yaml \
      [--set key.sub=value ...] [--checkpoint path]
"""

import argparse
import os
from pprint import pformat

import numpy as np


def get_args():
    parser = argparse.ArgumentParser(description="wesep-tpu train")
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", default=None,
                        help="resume from checkpoint_<N>.ckpt")
    parser.add_argument(
        "--set", dest="overrides", action="append", default=[],
        metavar="KEY=VALUE", help="config overrides (dot paths)",
    )
    return parser.parse_args()


def build_model(configs):
    from wesep_tpu.models import get_model

    model_name = configs["model"]["tse_model"]
    model_args = dict(configs["model_args"]["tse_model"])
    model_cls = get_model(model_name)
    # 'model_axis: N' shards model-axis-capable models (TF-GridNet's
    # folded LSTM/attention batch) over a 2-D (data, model) mesh
    if int(configs.get("model_axis", 1)) > 1 and hasattr(
        model_cls, "shard_model_axis"
    ):
        model_args.setdefault("shard_model_axis", True)
    return model_cls(**model_args), model_name, model_args


def load_enroll_maps(configs, joint_training, multi_task):
    """Embeds/enrollment dict loading (reference train.py:113-147)."""
    from wesep_tpu.utils.file_utils import (
        load_speaker_embeddings,
        read_label_file,
        read_spk2enroll_json,
        read_vec_scp_file,
    )

    dict_spk = {}
    tr_spk_embeds = configs.get("train_spk_embeds", None)
    tr_utt2spk = configs["train_utt2spk"]
    if not joint_training and tr_spk_embeds:
        tr_spk2embed_dict = load_speaker_embeddings(tr_spk_embeds, tr_utt2spk)
    else:
        tr_spk2embed_dict, dict_spk_all = read_spk2enroll_json(
            configs["train_spk2utt"]
        )
        if multi_task:
            dict_spk = dict_spk_all

    with open(tr_utt2spk) as f:
        n_train_utts = sum(1 for _ in f)

    val_spk_embeds = configs.get("val_spk_embeds", None)
    if not joint_training and val_spk_embeds:
        val_spk2embed_dict = read_vec_scp_file(val_spk_embeds)
    else:
        val_spk2embed_dict = read_label_file(configs["val_spk2utt"])
    val_spk1_embed = read_label_file(configs["val_spk1_enroll"])
    val_spk2_embed = read_label_file(configs["val_spk2_enroll"])
    return (tr_spk2embed_dict, dict_spk, n_train_utts, val_spk2embed_dict,
            val_spk1_embed, val_spk2_embed)


def train(config: str, checkpoint=None, overrides=None, **kwargs):
    import jax
    from jax.sharding import Mesh

    from wesep_tpu.data import BatchLoader, Dataset, tse_collate_fn
    from wesep_tpu.train.checkpoint import (
        load_pretrained_model,
        restore_train_state,
        save_checkpoint,
    )
    from wesep_tpu.train.executor import Executor
    from wesep_tpu.train.losses import parse_loss
    from wesep_tpu.train.schedulers import get_scheduler
    from wesep_tpu.train.trainer import (
        init_train_state,
        make_data_parallel,
        make_eval_step,
        make_optimizer,
        make_train_step,
        shard_batch,
    )
    from wesep_tpu.utils import setup_compilation_cache
    from wesep_tpu.utils.config import (
        deep_update,
        parse_config_or_kwargs,
        parse_override_args,
        set_seed,
        setup_logger,
        table_row,
    )

    if os.environ.get("WESEP_DIST"):
        # On TPU pods / SLURM / k8s, bare initialize() auto-detects the
        # cluster. For manual launches (the torchrun-replacement path)
        # the coordinator/world can be given explicitly via env:
        #   WESEP_COORDINATOR=host:port WESEP_NUM_PROCESSES=N
        #   WESEP_PROCESS_ID=i
        coord = os.environ.get("WESEP_COORDINATOR")
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=(
                int(os.environ["WESEP_NUM_PROCESSES"])
                if coord else None
            ),
            process_id=(
                int(os.environ["WESEP_PROCESS_ID"]) if coord else None
            ),
        )
        # establish the cross-host collective context while the
        # processes are still in lockstep: the context rendezvous is
        # bounded (~30 s for gloo / the TPU launch barrier) and the
        # train-step compile below can skew hosts past it (one host
        # hitting a warm compilation cache while another compiles cold)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("wesep-train-startup")
    setup_compilation_cache()

    configs = parse_config_or_kwargs(config, **kwargs)
    deep_update(configs, parse_override_args(overrides))
    rank = jax.process_index()
    world_size = jax.process_count()
    n_local = jax.local_device_count()
    n_devices = world_size * n_local

    exp_dir = configs["exp_dir"]
    model_dir = os.path.join(exp_dir, "models")
    os.makedirs(model_dir, exist_ok=True)
    logger = setup_logger(exp_dir, rank)
    if rank == 0:
        logger.info("exp_dir is: %s", exp_dir)
        for line in pformat(configs).split("\n"):
            logger.info(line)
    set_seed(configs.get("seed", 42) + rank)

    # loss
    criterion = parse_loss(configs.get("loss", "SISDR"))
    loss_args = configs.get("loss_args") or {}
    loss_posi = loss_args.get("loss_posi", [[0]])
    loss_weight = loss_args.get("loss_weight", [[1.0]])

    joint_training = configs["model_args"]["tse_model"].get(
        "joint_training", False
    )
    multi_task = configs["model_args"]["tse_model"].get("multi_task", False)

    (tr_spk2embed_dict, dict_spk, n_train_utts, val_spk2embed_dict,
     val_spk1_embed, val_spk2_embed) = load_enroll_maps(
        configs, joint_training, multi_task
    )

    dataset_args = configs["dataset_args"]
    online_mix = dataset_args.get("online_mix", False)
    # TPU-first default: with online mixing, the simulation (FRAM-RIR +
    # SNR mix + noise) runs batched on device inside the compiled train
    # step instead of per-sample in host workers (data/augment.py).
    # Set dataset_args.device_augment: false to force the reference-
    # semantics host path (data/processor.py:233-330,571-640).
    device_augment = online_mix and dataset_args.get("device_augment", True)
    train_dataset = Dataset(
        configs["data_type"],
        configs["train_data"],
        dataset_args,
        tr_spk2embed_dict,
        None,
        None,
        state="train",
        joint_training=joint_training,
        dict_spk=dict_spk,
        whole_utt=configs.get("whole_utt", False),
        repeat_dataset=configs.get("repeat_dataset", True),
        noise_prob=dataset_args.get("noise_prob", 0),
        reverb_prob=dataset_args.get("reverb_prob", 0),
        noise_enroll_prob=dataset_args.get("noise_enroll_prob", 0),
        reverb_enroll_prob=dataset_args.get("reverb_enroll_prob", 0),
        specaug_enroll_prob=dataset_args.get("specaug_enroll_prob", 0),
        online_mix=online_mix,
        device_augment=device_augment,
        noise_lmdb_file=dataset_args.get("noise_lmdb_file", None),
        rank=rank,
        world_size=world_size,
    )
    val_dataset = Dataset(
        configs["data_type"],
        configs["val_data"],
        dataset_args,
        val_spk2embed_dict,
        val_spk1_embed,
        val_spk2_embed,
        state="val",
        joint_training=joint_training,
        whole_utt=configs.get("whole_utt", False),
        repeat_dataset=True,
        online_mix=False,
        rank=rank,
        world_size=world_size,
    )

    dataloader_args = dict(configs.get("dataloader_args", {}))
    batch_size = dataloader_args.get("batch_size", 8)
    # enrollment length fixed for static XLA shapes
    enroll_len = dataset_args.get("enroll_len", None)
    if enroll_len is None and joint_training:
        sr = dataset_args.get("resample_rate", 16000)
        if dataset_args.get("speaker_feat", False):
            shift = dataset_args.get("fbank_args", {}).get("frame_shift", 10)
            enroll_len = int(
                dataset_args.get("enroll_sec", 6) * 1000 / shift
            ) - 2
        else:
            enroll_len = int(dataset_args.get("enroll_sec", 6) * sr)

    import functools

    # functools.partial over the module-level collate: picklable for
    # spawn-based multiprocess workers
    if device_augment:
        from wesep_tpu.data import tse_collate_fn_device

        collate = functools.partial(
            tse_collate_fn_device, fixed_enroll_len=enroll_len
        )
    else:
        collate = functools.partial(
            tse_collate_fn, fixed_enroll_len=enroll_len
        )
    val_collate = functools.partial(
        tse_collate_fn, fixed_enroll_len=enroll_len
    )

    num_workers = dataloader_args.get("num_workers", 0)
    if num_workers and num_workers > 1:
        # multiprocess workers for host-heavy chains (online mixing,
        # host-side FRAM-RIR); each worker owns a shard partition
        from wesep_tpu.data import MultiWorkerLoader

        def _build_train_ds(worker_id):
            return Dataset(
                configs["data_type"], configs["train_data"], dataset_args,
                tr_spk2embed_dict, None, None, state="train",
                joint_training=joint_training, dict_spk=dict_spk,
                whole_utt=configs.get("whole_utt", False),
                repeat_dataset=configs.get("repeat_dataset", True),
                noise_prob=dataset_args.get("noise_prob", 0),
                reverb_prob=dataset_args.get("reverb_prob", 0),
                noise_enroll_prob=dataset_args.get("noise_enroll_prob", 0),
                reverb_enroll_prob=dataset_args.get(
                    "reverb_enroll_prob", 0
                ),
                specaug_enroll_prob=dataset_args.get(
                    "specaug_enroll_prob", 0
                ),
                online_mix=online_mix,
                device_augment=device_augment,
                noise_lmdb_file=dataset_args.get("noise_lmdb_file", None),
                rank=rank, world_size=world_size,
                worker_id=worker_id, num_workers=num_workers,
            )

        train_loader = MultiWorkerLoader(
            [_build_train_ds(w) for w in range(num_workers)],
            batch_size=batch_size, collate_fn=collate, drop_last=True,
        )
    else:
        train_loader = BatchLoader(
            train_dataset, batch_size=batch_size, collate_fn=collate,
            drop_last=True,
            prefetch=dataloader_args.get("prefetch_factor", 4),
        )
    val_loader = BatchLoader(
        val_dataset, batch_size=batch_size, collate_fn=val_collate,
        drop_last=True, prefetch=2,
    )

    sample_num = dataset_args.get("sample_num_per_epoch", 0) or (
        n_train_utts // 2
    )
    epoch_iter = max(sample_num // world_size // batch_size, 1)
    val_iter = max(len(val_spk2embed_dict) // 2 // world_size // batch_size, 1)
    if rank == 0:
        logger.info("epoch iteration number: %d", epoch_iter)
        logger.info("val iteration number: %d", val_iter)

    # model / optimizer / scheduler
    model, model_name, model_args = build_model(configs)
    sched_args = dict(configs["scheduler_args"]["tse_model"])
    sched_args["num_epochs"] = configs["num_epochs"]
    sched_args["epoch_iter"] = epoch_iter
    schedule = get_scheduler(configs["scheduler"]["tse_model"], **sched_args)
    opt_args = configs.get("optimizer_args", {}).get("tse_model", {})
    freeze = (
        ("spk_model_net",)
        if model_args.get("spk_model_freeze", False)
        else ()
    )
    optimizer = make_optimizer(
        schedule,
        weight_decay=opt_args.get("weight_decay", 0.0),
        clip_grad=configs.get("clip_grad", 5.0),
        freeze_prefixes=freeze,
    )

    # mixed precision: 'compute_dtype: bfloat16' (or the reference's
    # enable_amp flag) runs fwd/bwd in bf16 with f32 params/accumulation
    import jax.numpy as jnp

    dtype_name = configs.get(
        "compute_dtype",
        "bfloat16" if configs.get("enable_amp") else None,
    )
    compute_dtype = jnp.dtype(dtype_name) if dtype_name else None
    aug_cfg = None
    if device_augment:
        aug_cfg = {
            "reverb_prob": dataset_args.get("reverb_prob", 0),
            "use_random_snr": dataset_args.get("use_random_snr", False),
            "noise_prob": dataset_args.get("noise_prob", 0),
            "noise_snr": dataset_args.get("noise_snr", (-5.0, 25.0)),
            "sample_rate": dataset_args.get("resample_rate", 16000),
        }
    # gradient accumulation (wenet-style 'accum_grad'): split each batch
    # into N sequential microbatches inside the compiled step
    accum_steps = int(
        configs.get("accum_grad", configs.get("accum_steps", 1)) or 1
    )
    train_step = make_train_step(
        model, optimizer, criterion, loss_posi, loss_weight, multi_task,
        compute_dtype=compute_dtype,
        accum_steps=accum_steps,
        ssa_enroll_prob=dataset_args.get("SSA_enroll_prob", 0),
        ssa_speaker_feat=dataset_args.get("speaker_feat", True),
        fbank_args=dataset_args.get("fbank_args"),
        sample_rate=dataset_args.get("resample_rate", 16000),
        seed=configs.get("seed", 42),
        device_augment=aug_cfg,
    )
    eval_step = make_eval_step(model, criterion)

    # peek one batch for init shapes
    train_loader.set_epoch(0)
    example_batch = next(iter(BatchLoader(
        train_dataset, batch_size=batch_size, collate_fn=collate,
        prefetch=0,
    )))
    example_batch = {
        k: v for k, v in example_batch.items()
        if isinstance(v, np.ndarray) and v.dtype != object
    }
    if device_augment:
        # device-path batches carry dry sources; synthesize the shapes the
        # model init needs (the step derives wav_mix/wav_targets on device)
        srcs = example_batch["wav_srcs"]
        n_spk = srcs.shape[1]
        example_batch["wav_mix"] = np.repeat(
            srcs.sum(axis=1), n_spk, axis=0
        )
        example_batch["wav_targets"] = srcs.reshape(-1, srcs.shape[-1])
    state = init_train_state(
        model, jax.random.PRNGKey(configs.get("seed", 42)), example_batch,
        optimizer,
    )
    if rank == 0:
        n_params = sum(
            int(np.prod(x.shape))
            for x in jax.tree_util.tree_leaves(state.params)
        )
        logger.info("tse_model size: %.2f M", n_params / 1e6)

    model_init = configs.get("model_init", {}).get("tse_model")
    if model_init:
        logger.info("Load initial model from %s", model_init)
        state = state.replace(
            params=load_pretrained_model(state.params, model_init)
        )
    start_epoch = 1
    if checkpoint:
        import re

        state = restore_train_state(state, checkpoint)
        m = re.findall(r"(?<=checkpoint_)\d+(?=\.ckpt)", checkpoint)
        start_epoch = int(m[0]) + 1 if m else 1
        mp = re.findall(r"(?<=preempt_epoch)\d+(?=\.ckpt)", checkpoint)
        if mp:  # redo the interrupted epoch with the saved optimizer state
            start_epoch = int(mp[0])
        logger.info("Load checkpoint: %s", checkpoint)
    logger.info("start_epoch: %d", start_epoch)

    if rank == 0:
        import yaml

        with open(os.path.join(exp_dir, "config.yaml"), "w") as fout:
            fout.write(yaml.dump(configs))

    # mesh + compiled steps; batch rows must divide over the data axis
    # (device-augment batches shard on the mixture dim B; rows = B * S)
    n_rows = (
        example_batch["wav_srcs"].shape[0]
        if device_augment
        else example_batch["wav_mix"].shape[0]
    )
    if n_rows % accum_steps:
        raise ValueError(
            f"accum_grad={accum_steps} must divide batch rows {n_rows}"
        )
    micro_rows = n_rows // accum_steps
    model_axis = int(configs.get("model_axis", 1))
    if n_devices % model_axis:
        raise ValueError(
            f"model_axis={model_axis} must divide device count {n_devices}"
        )
    if model_axis > 1 and not getattr(model, "shard_model_axis", False):
        if not hasattr(type(model), "shard_model_axis"):
            raise ValueError(
                f"model_axis={model_axis} requested but model "
                f"'{model_name}' has no model-axis sharding support — "
                "the model axis would run fully redundant compute"
            )
        if rank == 0:  # explicitly disabled in the config: allow, warn
            logger.warning(
                "model_axis=%d with shard_model_axis=false: the model "
                "axis runs redundant replicated compute (benchmark "
                "mode)", model_axis,
            )
    if model_axis > 1:
        data_devices = n_devices // model_axis
        while micro_rows % data_devices:
            data_devices -= 1
        mesh = Mesh(
            np.asarray(
                jax.devices()[: data_devices * model_axis]
            ).reshape(data_devices, model_axis),
            ("data", "model"),
        )
        if rank == 0:
            logger.info(
                "mesh: %d data x %d model devices", data_devices, model_axis
            )
    elif world_size > 1:
        # multi-host: every process's devices MUST participate (a
        # computation cannot span a subset of another host's devices),
        # so the mesh is all devices and the GLOBAL rows (local x world)
        # must divide it
        if (micro_rows * world_size) % n_devices:
            raise SystemExit(
                f"global microbatch rows {micro_rows * world_size} "
                f"(local {micro_rows} x {world_size} hosts) must divide "
                f"the {n_devices}-device data mesh; adjust batch_size"
            )
        mesh = Mesh(np.asarray(jax.devices()).reshape(n_devices), ("data",))
        data_devices = n_devices
    else:
        from wesep_tpu.train.trainer import fit_data_mesh

        mesh = fit_data_mesh(micro_rows)
        data_devices = mesh.size
    if data_devices * model_axis != n_devices and rank == 0:
        logger.warning(
            "microbatch rows %d (batch rows %d / accum_grad %d) not "
            "divisible by %d data devices; using %d",
            micro_rows, n_rows, accum_steps,
            n_devices // model_axis, data_devices,
        )
    p_train = make_data_parallel(train_step, mesh, donate_state=True)
    p_eval = jax.jit(eval_step)

    def device_put_train(batch):
        arrays = {
            k: v for k, v in batch.items()
            if isinstance(v, np.ndarray) and v.dtype.kind in "fiu"
        }
        return shard_batch(arrays, mesh)

    executor = Executor()
    train_losses, val_losses = [], []

    # preemption safety: SIGTERM (the TPU-pod eviction signal) requests a
    # clean stop at the next batch boundary; the loop then writes a
    # resumable mid-epoch checkpoint instead of losing the epoch
    stop_requested = {"flag": False}

    def _on_term(signum, frame):
        stop_requested["flag"] = True

    try:
        import signal

        signal.signal(signal.SIGTERM, _on_term)
    except ValueError:
        pass  # not the main thread (in-process callers/tests)

    if rank == 0:
        logger.info(table_row(("Train/Val", "Epoch", "iter", "Loss", "rate")))
    for epoch in range(start_epoch, configs["num_epochs"] + 1):
        train_loader.set_epoch(epoch)
        # the mesh context scopes the bare-PartitionSpec sharding hints
        # inside model code (e.g. TF-GridNet _shard_folded) at trace time
        with mesh:
            state, train_loss = executor.train(
                train_loader, p_train, state, epoch_iter, epoch, logger,
                configs.get("log_batch_interval", 100), device_put_train,
                should_stop=lambda: stop_requested["flag"],
            )
            if executor.stopped:
                if rank == 0:
                    ckpt_name = f"preempt_epoch{epoch}.ckpt"
                    save_checkpoint(
                        os.path.join(model_dir, ckpt_name),
                        [state.params],
                        [state.opt_state],
                        [state.batch_stats],
                        step=int(state.step),
                    )
                    latest = os.path.join(
                        model_dir, "latest_checkpoint.ckpt"
                    )
                    if os.path.islink(latest) or os.path.exists(latest):
                        os.remove(latest)
                    os.symlink(ckpt_name, latest)
                    logger.warning(
                        "preempted during epoch %d: saved %s; resume with "
                        "--checkpoint (epoch %d restarts with this "
                        "optimizer state)", epoch, ckpt_name, epoch,
                    )
                break
            val_loss = executor.cv(
                val_loader, p_eval, state, val_iter, epoch, logger,
                configs.get("log_batch_interval", 100), device_put_train,
            )
        train_losses.append(train_loss)
        val_losses.append(val_loss)
        if rank == 0:
            logger.info(
                "Epoch %d train_loss %.4f val_loss %.4f",
                epoch, train_loss, val_loss,
            )
            try:
                import matplotlib

                matplotlib.use("Agg")
                import matplotlib.pyplot as plt

                plt.figure()
                plt.title("Loss of Train and Validation")
                x = list(range(start_epoch, epoch + 1))
                plt.plot(x, train_losses, "b-", label="Train Loss",
                         linewidth=0.8)
                plt.plot(x, val_losses, "c-", label="Validation Loss",
                         linewidth=0.8)
                plt.legend()
                plt.xlabel("Epoch")
                plt.ylabel("Loss")
                plt.savefig(os.path.join(exp_dir, f"{model_name}.png"))
                plt.close()
            except Exception:
                pass
            if (
                epoch % configs.get("save_epoch_interval", 1) == 0
                or epoch >= configs["num_epochs"] - configs.get("num_avg", 2)
            ):
                ckpt_name = f"checkpoint_{epoch}.ckpt"
                save_checkpoint(
                    os.path.join(model_dir, ckpt_name),
                    [state.params],
                    [state.opt_state],
                    [state.batch_stats],
                    step=int(state.step),
                )
                latest = os.path.join(model_dir, "latest_checkpoint.ckpt")
                if os.path.islink(latest) or os.path.exists(latest):
                    os.remove(latest)
                os.symlink(ckpt_name, latest)
    if rank == 0 and not executor.stopped:
        final = os.path.join(model_dir, "final_checkpoint.ckpt")
        if os.path.islink(final) or os.path.exists(final):
            os.remove(final)
        os.symlink(f"checkpoint_{configs['num_epochs']}.ckpt", final)
    return state


def main():
    args = get_args()
    train(args.config, checkpoint=args.checkpoint, overrides=args.overrides)


if __name__ == "__main__":
    main()
