"""MetricGAN training entry point (generator + CMGAN discriminator).

Equivalent of /root/reference/wesep/bin/train_gan.py: same setup as
bin/train.py plus a discriminator model/optimizer/scheduler pair and the
ExecutorGAN step (gan_loss_weight default 0.05, train_gan.py:63).

Usage:
  python -m wesep_tpu.bin.train_gan --config confs/dpcc_init_gan.yaml ...
"""

import argparse
import os
from pprint import pformat

import numpy as np


def get_args():
    parser = argparse.ArgumentParser(description="wesep-tpu train_gan")
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--set", dest="overrides", action="append",
                        default=[], metavar="KEY=VALUE")
    return parser.parse_args()


def train_gan(config: str, checkpoint=None, overrides=None, **kwargs):
    import jax
    import jax.numpy as jnp

    from wesep_tpu.bin.train import build_model, load_enroll_maps
    from wesep_tpu.data import BatchLoader, Dataset, tse_collate_fn
    from wesep_tpu.models import get_model
    from wesep_tpu.train.checkpoint import save_checkpoint
    from wesep_tpu.train.losses import parse_loss
    from wesep_tpu.train.schedulers import get_scheduler
    from wesep_tpu.train.trainer import (
        TrainState,
        init_train_state,
        make_eval_step,
        make_optimizer,
    )
    from wesep_tpu.train.trainer_gan import (
        make_gan_train_step,
        metric_pesq,
        metric_pesq_callback,
        metric_sisdr_norm,
    )
    from wesep_tpu.utils import setup_compilation_cache
    from wesep_tpu.utils.config import (
        deep_update,
        parse_config_or_kwargs,
        parse_override_args,
        set_seed,
        setup_logger,
    )

    setup_compilation_cache()
    configs = parse_config_or_kwargs(config, **kwargs)
    deep_update(configs, parse_override_args(overrides))
    rank = jax.process_index()
    world_size = jax.process_count()

    exp_dir = configs["exp_dir"]
    model_dir = os.path.join(exp_dir, "models")
    os.makedirs(model_dir, exist_ok=True)
    logger = setup_logger(exp_dir, rank)
    for line in pformat(configs).split("\n"):
        logger.info(line)
    set_seed(configs.get("seed", 42) + rank)

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
    train_dataset = Dataset(
        configs["data_type"], configs["train_data"], dataset_args,
        tr_spk2embed_dict, None, None, state="train",
        joint_training=joint_training, dict_spk=dict_spk,
        repeat_dataset=configs.get("repeat_dataset", True),
        noise_prob=dataset_args.get("noise_prob", 0),
        reverb_prob=dataset_args.get("reverb_prob", 0),
        online_mix=dataset_args.get("online_mix", False),
        noise_lmdb_file=dataset_args.get("noise_lmdb_file", None),
        rank=rank, world_size=world_size,
    )
    val_dataset = Dataset(
        configs["data_type"], configs["val_data"], dataset_args,
        val_spk2embed_dict, val_spk1_embed, val_spk2_embed, state="val",
        joint_training=joint_training, repeat_dataset=True,
        rank=rank, world_size=world_size,
    )
    batch_size = configs.get("dataloader_args", {}).get("batch_size", 8)
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
    collate = functools.partial(
        tse_collate_fn, fixed_enroll_len=enroll_len
    )

    train_loader = BatchLoader(train_dataset, batch_size=batch_size,
                               collate_fn=collate, prefetch=4)
    val_loader = BatchLoader(val_dataset, batch_size=batch_size,
                             collate_fn=collate, prefetch=2)
    sample_num = dataset_args.get("sample_num_per_epoch", 0) or (
        n_train_utts // 2
    )
    epoch_iter = max(sample_num // world_size // batch_size, 1)
    val_iter = max(len(val_spk2embed_dict) // 2 // world_size // batch_size, 1)

    # generator + discriminator
    model, model_name, model_args = build_model(configs)
    disc_name = configs["model"].get("discriminator", "CMGAN_Discriminator")
    disc_args = configs.get("model_args", {}).get("discriminator", {}) or {}
    discriminator = get_model(disc_name)(**disc_args)

    sched_args = dict(configs["scheduler_args"]["tse_model"])
    sched_args["num_epochs"] = configs["num_epochs"]
    sched_args["epoch_iter"] = epoch_iter
    g_sched = get_scheduler(configs["scheduler"]["tse_model"], **sched_args)
    d_sched_args = dict(
        configs["scheduler_args"].get("discriminator", sched_args)
    )
    d_sched_args.setdefault("num_epochs", configs["num_epochs"])
    d_sched_args.setdefault("epoch_iter", epoch_iter)
    d_sched = get_scheduler(
        configs["scheduler"].get("discriminator",
                                 configs["scheduler"]["tse_model"]),
        **d_sched_args,
    )
    g_opt_args = configs.get("optimizer_args", {}).get("tse_model", {})
    d_opt_args = configs.get("optimizer_args", {}).get(
        "discriminator", g_opt_args
    )
    clip = configs.get("clip_grad", 5.0)
    g_opt = make_optimizer(g_sched,
                           weight_decay=g_opt_args.get("weight_decay", 0.0),
                           clip_grad=clip)
    d_opt = make_optimizer(d_sched,
                           weight_decay=d_opt_args.get("weight_decay", 0.0),
                           clip_grad=clip)

    # 'pesq' (default): real P.862 on device (ops/pesq.py, no host stall);
    # 'pesq_host': external `pesq` package via callback; 'sisdr': fast proxy
    metric_name = configs.get("gan_metric", "pesq")
    sr = configs["dataset_args"].get("resample_rate", 16000)
    metric = {
        "pesq": functools.partial(metric_pesq, fs=sr),
        "pesq_host": metric_pesq_callback,
        "sisdr": metric_sisdr_norm,
    }[metric_name]
    gan_step = make_gan_train_step(
        model, discriminator, g_opt, d_opt, criterion,
        loss_posi, loss_weight, multi_task,
        gan_loss_weight=configs.get("gan_loss_weight", 0.05),
        metric_fn=metric,
        seed=configs.get("seed", 42),
    )
    eval_step = jax.jit(make_eval_step(model, criterion))

    train_loader.set_epoch(0)
    example_batch = next(iter(BatchLoader(
        train_dataset, batch_size=batch_size, collate_fn=collate, prefetch=0,
    )))
    example_batch = {
        k: v for k, v in example_batch.items()
        if isinstance(v, np.ndarray) and v.dtype.kind in "fiu"
    }
    g_state = init_train_state(
        model, jax.random.PRNGKey(configs.get("seed", 42)), example_batch,
        g_opt,
    )
    d_vars = discriminator.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        example_batch["wav_targets"], example_batch["wav_mix"], train=True,
    )
    d_state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=d_vars["params"],
        batch_stats=d_vars.get("batch_stats", {}),
        opt_state=d_opt.init(d_vars["params"]),
    )

    def to_arrays(batch):
        return {
            k: v for k, v in batch.items()
            if isinstance(v, np.ndarray) and v.dtype.kind in "fiu"
        }

    # data parallelism over the device mesh (replaces the reference's
    # DDP in train_gan.py:66-70,227-229): both G and D states replicated,
    # batch rows sharded on the 'data' axis; XLA inserts the gradient
    # all-reduces for both optimizers
    from wesep_tpu.train.trainer import (
        fit_data_mesh,
        make_data_parallel,
        shard_batch,
    )

    n_rows = example_batch["wav_mix"].shape[0]
    mesh = fit_data_mesh(n_rows)
    if mesh.size != jax.device_count():
        logger.warning(
            "batch rows %d not divisible by %d devices; using %d",
            n_rows, jax.device_count(), mesh.size,
        )
    step = make_data_parallel(gan_step, mesh, donate_state=False)

    def put(batch):
        return shard_batch(to_arrays(batch), mesh)

    start_epoch = 1
    if checkpoint:
        import re

        from wesep_tpu.train.checkpoint import restore_train_state

        g_state = restore_train_state(g_state, checkpoint, model_index=0)
        d_state = restore_train_state(d_state, checkpoint, model_index=1)
        m = re.findall(r"(?<=checkpoint_)\d+(?=\.ckpt)", checkpoint)
        start_epoch = int(m[0]) + 1 if m else 1
        mp = re.findall(r"(?<=preempt_epoch)\d+(?=\.ckpt)", checkpoint)
        if mp:  # redo the interrupted epoch with the saved optimizers
            start_epoch = int(mp[0])
        logger.info("Load checkpoint: %s (start_epoch %d)", checkpoint,
                    start_epoch)

    states = (g_state, d_state)
    g_curve, v_curve = [], []

    # preemption safety (same contract as bin/train): SIGTERM saves a
    # resumable mid-epoch bundle for BOTH optimizers and exits cleanly
    stop_requested = {"flag": False}

    def _on_term(signum, frame):
        stop_requested["flag"] = True

    try:
        import signal

        signal.signal(signal.SIGTERM, _on_term)
    except ValueError:
        pass

    for epoch in range(start_epoch, configs["num_epochs"] + 1):
        train_loader.set_epoch(epoch)
        losses = []
        for i, batch in enumerate(train_loader):
            if stop_requested["flag"]:
                break
            states, m = step(states, put(batch))
            losses.append(m)
            if (i + 1) == epoch_iter:
                break
        if stop_requested["flag"]:
            if rank == 0:
                ckpt_name = f"preempt_epoch{epoch}.ckpt"
                save_checkpoint(
                    os.path.join(model_dir, ckpt_name),
                    [states[0].params, states[1].params],
                    [states[0].opt_state, states[1].opt_state],
                    [states[0].batch_stats, states[1].batch_stats],
                    step=int(states[0].step),
                )
                logger.warning(
                    "preempted during epoch %d: saved %s; resume with "
                    "--checkpoint", epoch, ckpt_name,
                )
            break
        avg = {
            k: float(np.mean([float(mm[k]) for mm in losses]))
            for k in losses[0]
        }
        val_losses = []
        for i, batch in enumerate(val_loader):
            vm = eval_step(states[0], to_arrays(batch))
            val_losses.append(float(vm["loss"]))
            if (i + 1) == val_iter:
                break
        logger.info(
            "Epoch %d g_loss %.4f se_loss %.4f d_loss %.4f val %.4f",
            epoch, avg["loss"], avg["se_loss"], avg["d_loss"],
            float(np.mean(val_losses)),
        )
        g_curve.append(avg["loss"])
        v_curve.append(float(np.mean(val_losses)))
        if rank == 0:
            # per-epoch loss curve (reference bin/train_gan.py plots the
            # same figure each epoch)
            try:
                import matplotlib

                matplotlib.use("Agg")
                import matplotlib.pyplot as plt

                plt.figure()
                plt.title("Loss of Train and Validation")
                x = list(range(start_epoch, epoch + 1))
                plt.plot(x, g_curve, "b-", label="Train Loss",
                         linewidth=0.8)
                plt.plot(x, v_curve, "c-", label="Validation Loss",
                         linewidth=0.8)
                plt.legend()
                plt.xlabel("Epoch")
                plt.ylabel("Loss")
                plt.savefig(os.path.join(
                    exp_dir, f"{configs['model']['tse_model']}_gan.png"
                ))
                plt.close()
            except Exception:
                pass
        if rank == 0 and epoch % configs.get("save_epoch_interval", 1) == 0:
            ckpt_name = f"checkpoint_{epoch}.ckpt"
            save_checkpoint(
                os.path.join(model_dir, ckpt_name),
                [states[0].params, states[1].params],
                [states[0].opt_state, states[1].opt_state],
                [states[0].batch_stats, states[1].batch_stats],
                step=int(states[0].step),
            )
            latest = os.path.join(model_dir, "latest_checkpoint.ckpt")
            if os.path.islink(latest) or os.path.exists(latest):
                os.remove(latest)
            os.symlink(ckpt_name, latest)
    if rank == 0:
        # final symlink, same contract as bin/train (reference
        # train_gan.py mirrors train.py's latest/final links)
        final = os.path.join(model_dir, "final_checkpoint.ckpt")
        if os.path.islink(final) or os.path.exists(final):
            os.remove(final)
        os.symlink(f"checkpoint_{configs['num_epochs']}.ckpt", final)
    return states


def main():
    args = get_args()
    train_gan(args.config, checkpoint=args.checkpoint,
              overrides=args.overrides)


if __name__ == "__main__":
    main()
