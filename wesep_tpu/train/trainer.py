"""Compiled training/eval steps + optimizer, data-parallel over a Mesh.

TPU-native redesign of the reference Executor hot loop
(/root/reference/wesep/utils/executor.py:27-203) and optimizer setup
(/root/reference/wesep/bin/train.py:237-269):

  * the whole batch step — forward, multi-loss weighting, backward,
    per-parameter grad clip, Adam(+L2), LR schedule — is ONE jitted pure
    function; nothing escapes to the host between batches;
  * data parallelism is a `jax.sharding.Mesh` 'data' axis: the batch is
    sharded, params/opt-state are replicated, and XLA inserts the gradient
    all-reduce over ICI (replacing DDP/NCCL, reference train.py:66-70,226-229);
  * the LR schedule is a pure fn of the step carried in the opt state
    (replacing scheduler.step(cur_iter) per batch, executor.py:80-81);
  * per-parameter clip matches reference clip_gradients
    (/root/reference/wesep/utils/funcs.py:79-88): each tensor is clipped to
    norm `clip` independently (NOT global-norm).

Loss weighting follows the reference (loss_posi, loss_weight) 2-D table
(executor.py:107-122): loss = sum_i sum_j w[i][j] * L_i(outputs[posi[i][j]],
target-or-spk_label), with CE routed to spk_label when multi_task.
"""

from typing import Any, Callable, Optional, Sequence

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wesep_tpu.train.losses import is_ce

__all__ = [
    "TrainState",
    "per_param_clip",
    "make_optimizer",
    "make_train_step",
    "make_eval_step",
    "make_data_parallel",
    "weighted_loss",
]


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def per_param_clip(clip: float) -> optax.GradientTransformation:
    """Clip every parameter's gradient to L2 norm `clip` independently."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def _clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
            coef = jnp.minimum(clip / (norm + 1e-6), 1.0)
            return (g * coef).astype(g.dtype)

        return jax.tree_util.tree_map(_clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    schedule: Callable,
    weight_decay: float = 1e-4,
    clip_grad: float = 5.0,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    freeze_prefixes: Sequence[str] = (),
) -> optax.GradientTransformation:
    """Adam with torch-style coupled L2 + reference per-param clip.

    torch.optim.Adam(weight_decay=wd) adds wd*param to the RAW grad before
    the moment updates; the reference clips before optimizer.step()
    (executor.py:130-134), so the chain order is clip -> +wd*p -> adam -> lr.

    freeze_prefixes: top-level param-tree keys to freeze (zero updates) —
    the spk_model_freeze path (reference bsrnn.py:228-230).
    """
    chain = []
    if clip_grad and clip_grad > 0:
        chain.append(per_param_clip(clip_grad))
    if weight_decay and weight_decay > 0:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_adam(b1=beta1, b2=beta2, eps=eps))
    chain.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*chain)
    if freeze_prefixes:
        def label_fn(params):
            return {
                k: ("frozen" if k in freeze_prefixes else "train")
                for k in params.keys()
            }

        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label_fn
        )
    return tx


def init_train_state(model, rng, example_batch, optimizer, train: bool = True):
    """Initialize params/batch_stats/opt_state from an example batch.

    init is jitted: un-compiled tracing dispatches thousands of tiny ops
    (catastrophic through a remote-TPU relay).
    """
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, example_batch["wav_mix"], example_batch["spk_embeds"], train=train
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", flax.core.FrozenDict())
    opt_state = optimizer.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )


def _flatten_outputs(outputs):
    """Model returns (ests, spk_logits); flatten to an indexable list.

    Multi-decoder models (SpEx+) return ests as a list [est1, est2, est3] so
    positions 0..2 index the scales and 3 the spk logits, matching the
    reference flat tuple + loss_posi tables (confs/spexplus.yaml:27-30).
    """
    ests, spk_logits = outputs
    flat = list(ests) if isinstance(ests, (list, tuple)) else [ests]
    flat.append(spk_logits)
    return flat


def weighted_loss(
    outputs,
    targets,
    spk_label,
    criterion: Sequence[Callable],
    loss_posi: Sequence[Sequence[int]],
    loss_weight: Sequence[Sequence[float]],
    multi_task: bool = False,
):
    """The (loss_posi, loss_weight) double loop of executor.py:107-122."""
    flat = _flatten_outputs(outputs)
    total = 0.0
    for i, crit in enumerate(criterion):
        for j in range(len(loss_posi[i])):
            out = flat[loss_posi[i][j]]
            if multi_task and is_ce(crit):
                total = total + loss_weight[i][j] * jnp.mean(
                    crit(out, spk_label)
                )
            else:
                total = total + loss_weight[i][j] * jnp.mean(
                    crit(out, targets)
                )
    return total


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    criterion: Sequence[Callable],
    loss_posi: Sequence[Sequence[int]] = ((0,),),
    loss_weight: Sequence[Sequence[float]] = ((1.0,),),
    multi_task: bool = False,
    compute_dtype: Optional[jnp.dtype] = None,
    ssa_enroll_prob: float = 0.0,
    ssa_speaker_feat: bool = True,
    fbank_args: Optional[dict] = None,
    sample_rate: int = 16000,
    seed: int = 42,
    device_augment: Optional[dict] = None,
    accum_steps: int = 1,
):
    """Build the pure (state, batch) -> (state, metrics) train step.

    accum_steps > 1 enables gradient accumulation (no reference
    equivalent; wenet's `accum_grad` semantics): the batch's row axis is
    split into accum_steps equal microbatches, a lax.scan accumulates
    the mean gradient (and threads BatchNorm stats sequentially), and
    the optimizer applies ONE update. Row counts must divide evenly.
    For plain losses this reproduces the full-batch numbers exactly;
    stochastic per-batch features become per-MICRObatch under
    accumulation (the SSA coin flips and device-augmentation RNG draws
    are independent per microbatch, and BatchNorm running stats update
    accum_steps times per optimizer step) — a different but equally
    valid randomization, not a silent no-op.

    ssa_enroll_prob > 0 enables single-optimization Self-estimated Speech
    Augmentation (reference executor.py:89-102): with that probability per
    batch, a no-grad forward produces an estimate which (optionally
    fbank'd) replaces the enrollment for the grad forward; lowered as a
    lax.cond so only the selected branch executes on device.

    All step randomness (SSA coin, device augmentation) derives from
    `seed` folded with the step counter, so runs are reproducible per
    config seed (reference set_seed, utils/utils.py:103-112).

    device_augment (the TPU-first online-mix path): a dict
    {reverb_prob, use_random_snr, noise_prob, noise_snr, sample_rate}
    that makes the step consume `wav_srcs` [B, S, T] (+ optional
    `wav_noise` [B, T]) batches and run FRAM-RIR reverb + SNR mixing +
    additive noise batched ON DEVICE (data/augment.py), then expand the
    mixture into per-target rows — replacing the reference's per-sample
    host simulation (processor.py:210-320,650-782, SURVEY §3.4). The whole
    simulation fuses into the compiled train step.
    """

    def _apply_device_augment(rng, batch):
        from wesep_tpu.data.augment import RirConfig, augment_batch

        cfg = device_augment
        srcs = batch["wav_srcs"]  # [B, S, T]
        n_spk = srcs.shape[1]
        noise = batch.get("wav_noise")
        mix, scaled = augment_batch(
            rng,
            srcs,
            noise=noise,
            cfg=RirConfig(
                sr=cfg.get("sample_rate", sample_rate), num_src=n_spk
            ),
            reverb_prob=cfg.get("reverb_prob", 0.0),
            use_random_snr=cfg.get("use_random_snr", True),
            noise_prob=cfg.get("noise_prob", 0.0) if noise is not None
            else 0.0,
            noise_snr=tuple(cfg.get("noise_snr", (-5.0, 25.0))),
        )
        out = dict(batch)
        # row expansion matches tse_collate_fn (sample-major,
        # speaker-minor): mixture repeated per target speaker
        out["wav_mix"] = jnp.repeat(mix, n_spk, axis=0)
        out["wav_targets"] = scaled.reshape(-1, scaled.shape[-1])
        return out

    def _grads_one(params, stats, mb, rng):
        """((loss, new_stats), grads) for one (micro)batch."""
        if device_augment is not None:
            mb = _apply_device_augment(jax.random.fold_in(rng, 1), mb)

        def _forward(params, enroll, keep_stats=True):
            """keep_stats=False discards BN-stat updates (the SSA no-grad
            pre-pass; torch would update them, we keep the grad pass
            authoritative)."""
            variables = {"params": params}
            # NB: mutable=[] (empty list) would still make flax return a
            # (outputs, {}) tuple; only mutable=False returns outputs alone
            mutable = False
            if stats:
                variables["batch_stats"] = stats
                mutable = ["batch_stats"]
            mix = mb["wav_mix"]
            if compute_dtype is not None:
                mix = mix.astype(compute_dtype)
                enroll = enroll.astype(compute_dtype)
            out = model.apply(
                variables, mix, enroll, train=True, mutable=mutable
            )
            if mutable:
                outputs, new_model_state = out
                new_stats = (
                    new_model_state["batch_stats"] if keep_stats else stats
                )
                return outputs, new_stats
            return out, stats

        def _ssa_enroll(params):
            """No-grad estimate -> (fbank'd) enrollment
            (executor.py:91-99)."""
            outputs, _ = _forward(params, mb["spk_embeds"],
                                  keep_stats=False)
            est = outputs[0]
            if isinstance(est, (list, tuple)):
                est = est[0]
            est = jax.lax.stop_gradient(est)
            if ssa_speaker_feat:
                from wesep_tpu.ops.fbank import apply_cmvn, kaldi_fbank

                fa = fbank_args or {}
                feats = kaldi_fbank(
                    est,
                    sample_rate=sample_rate,
                    num_mel_bins=fa.get("num_mel_bins", 80),
                    frame_length_ms=fa.get("frame_length", 25),
                    frame_shift_ms=fa.get("frame_shift", 10),
                    dither=0.0,
                    input_scale=32768.0,
                )
                return apply_cmvn(feats)
            return est

        def loss_fn(params):
            def _loss_with(enroll):
                outputs, new_stats = _forward(params, enroll)
                loss = weighted_loss(
                    outputs,
                    mb["wav_targets"],
                    mb.get("spk_label"),
                    criterion,
                    loss_posi,
                    loss_weight,
                    multi_task,
                )
                return loss, new_stats

            if ssa_enroll_prob <= 0:
                return _loss_with(mb["spk_embeds"])
            do_ssa = jax.random.uniform(
                jax.random.fold_in(rng, 2)
            ) < ssa_enroll_prob
            return jax.lax.cond(
                do_ssa,
                lambda: _loss_with(_ssa_enroll(params)),
                lambda: _loss_with(mb["spk_embeds"]),
            )

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def train_step(state: TrainState, batch):
        base_rng = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)
        if accum_steps <= 1:
            (loss, new_stats), grads = _grads_one(
                state.params, state.batch_stats, batch, base_rng
            )
        else:
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape(
                    (accum_steps, x.shape[0] // accum_steps) + x.shape[1:]
                ),
                batch,
            )
            zero_grads = jax.tree_util.tree_map(
                jnp.zeros_like, state.params
            )

            def body(carry, xs):
                g_acc, stats, l_acc = carry
                mb, i = xs
                (l, new_stats), g = _grads_one(
                    state.params, stats, mb, jax.random.fold_in(base_rng, i)
                )
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                return (g_acc, new_stats, l_acc + l), None

            (g_sum, new_stats, l_sum), _ = jax.lax.scan(
                body,
                (zero_grads, state.batch_stats, jnp.zeros((), jnp.float32)),
                (micro, jnp.arange(accum_steps)),
            )
            grads = jax.tree_util.tree_map(
                lambda g: g / accum_steps, g_sum
            )
            loss = l_sum / accum_steps

        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        metrics = {"loss": loss}
        return new_state, metrics

    return train_step


def make_eval_step(model, criterion: Sequence[Callable]):
    """Validation step: criterion[0] on the primary output
    (executor.py:154-203)."""

    def eval_step(state: TrainState, batch):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        outputs = model.apply(
            variables, batch["wav_mix"], batch["spk_embeds"], train=False
        )
        flat = _flatten_outputs(outputs)
        loss = jnp.mean(criterion[0](flat[0], batch["wav_targets"]))
        return {"loss": loss}

    return eval_step


def fit_data_mesh(n_rows: int, devices=None) -> Mesh:
    """Largest 1-D 'data' mesh whose size divides the batch row count."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    while n_rows % n:
        n -= 1
    return Mesh(np.asarray(devices[:n]).reshape(n), ("data",))


def make_data_parallel(step_fn, mesh: Mesh, donate_state: bool = True):
    """jit a (state, batch) step over the mesh 'data' axis.

    Params/opt-state replicated, batch sharded on axis 0; XLA inserts the
    gradient all-reduce over ICI (the DDP replacement).
    """
    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(replicated, sharded),
        out_shardings=None,
        donate_argnums=(0,) if donate_state else (),
    )


def shard_batch(batch, mesh: Mesh):
    """Place a host batch onto the mesh, sharded along axis 0.

    Multi-host: each process passes its LOCAL batch (its own loader's
    rows — DataList already partitions the shard lists by rank); the
    global array is assembled from the per-process slices, global rows =
    local rows x process_count. device_put would instead require every
    process to hold an identical global batch — r4 multihost drill
    finding."""
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() > 1:
        n_proc = jax.process_count()

        def put(x):
            global_shape = (x.shape[0] * n_proc,) + x.shape[1:]
            return jax.make_array_from_process_local_data(
                sharding, np.ascontiguousarray(x), global_shape
            )

        return jax.tree_util.tree_map(put, batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
