"""MetricGAN training step: generator + metric discriminator.

Equivalent of /root/reference/wesep/utils/executor_gan.py:28-339. Per batch:

  1. D-step: predict the normalized perceptual metric for
     (clean, clean) -> 1, (clean, noisy) -> m(noisy), (clean, est_k) ->
     m(est_k) (estimates detached); MSE to the metric targets; Adam update.
  2. G-step: weighted SE loss + gan_w * MSE(D_new(clean, est_k), 1)
     through the UPDATED discriminator (matching the reference's
     step ordering, executor_gan.py:93-154).

Metric targets: the reference computes ACTUAL PESQ per batch on the host
(executor_gan.py:309-337) — a device-stalling CPU round trip. Here the
metric fn is pluggable:
  * 'pesq'  — DEFAULT: real P.862 scores from the jittable on-device
    perceptual model (wesep_tpu.ops.pesq) — the whole MetricGAN step
    stays compiled, no host round trip (the TPU-first answer to the
    reference's CPU PESQ stall); silent pairs are masked out of the
    loss, matching the reference's None -> skip behavior;
  * 'pesq_host' — host callback via jax.pure_callback through the
    external `pesq` package when bit-exact ITU scores are required;
  * 'sisdr' — a cheap on-device proxy sigmoid(SI-SDR/10) in (0,1),
    kept as a documented fast mode.
"""

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from wesep_tpu.train.losses import si_sdr
from wesep_tpu.train.trainer import TrainState, weighted_loss

__all__ = [
    "make_gan_train_step",
    "metric_sisdr_norm",
    "metric_pesq",
    "metric_pesq_callback",
]


def metric_sisdr_norm(est, ref):
    """(values [B], valid [B]) on-device metric proxy in (0, 1)."""
    vals = jax.nn.sigmoid(si_sdr(est, ref) / 10.0)
    return vals, jnp.ones_like(vals, dtype=bool)


def metric_pesq(est, ref, fs: int = 16000):
    """Real normalized PESQ on device (jittable P.862 model, ops/pesq.py).

    Same (0,1) normalization as the reference (score.py:52-55); silent
    pairs are masked invalid instead of returning None.
    """
    from wesep_tpu.ops.pesq import pesq_norm_batch

    return pesq_norm_batch(est, ref, fs)


def metric_pesq_callback(est, ref, fs: int = 16000):
    """Actual normalized PESQ via host callback (None -> masked)."""

    def host(est_np, ref_np):
        from wesep_tpu.utils.score import cal_PESQ_norm

        vals = np.zeros(est_np.shape[0], np.float32)
        valid = np.zeros(est_np.shape[0], bool)
        for i in range(est_np.shape[0]):
            p = cal_PESQ_norm(est_np[i], ref_np[i], fs)
            if p is not None:
                vals[i] = p
                valid[i] = True
        return vals, valid

    return jax.pure_callback(
        host,
        (
            jax.ShapeDtypeStruct((est.shape[0],), jnp.float32),
            jax.ShapeDtypeStruct((est.shape[0],), jnp.bool_),
        ),
        est,
        ref,
    )


def _masked_mse(pred, target, valid):
    pred = pred.reshape(-1)
    err = jnp.square(pred - target) * valid
    return jnp.sum(err) / jnp.maximum(jnp.sum(valid), 1.0)


def make_gan_train_step(
    generator,
    discriminator,
    gen_optimizer: optax.GradientTransformation,
    dis_optimizer: optax.GradientTransformation,
    criterion: Sequence[Callable],
    loss_posi=((0,),),
    loss_weight=((1.0,),),
    multi_task: bool = False,
    gan_loss_weight: float = 0.05,
    metric_fn: Callable = metric_sisdr_norm,
    seed: int = 42,
):
    """-> step((gen_state, dis_state), batch) -> (states, metrics).

    `seed` drives the discriminator's dropout schedule (folded with the
    step counter), mirroring make_train_step(seed=...) — so two config
    seeds produce different GAN runs (reference set_seed semantics,
    utils/utils.py:103-112).
    """

    def _gen_outputs(params, batch_stats, batch, train=True):
        variables = {"params": params}
        # mutable=[] would still return a (outputs, {}) tuple; False
        # returns outputs alone
        mutable = False
        if batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        out = generator.apply(
            variables, batch["wav_mix"], batch["spk_embeds"],
            train=train, mutable=mutable,
        )
        if mutable:
            outputs, new_state = out
            return outputs, new_state["batch_stats"]
        return out, batch_stats

    def _disc_apply(params, batch_stats, ref, est, update=False, rng=None):
        variables = {"params": params}
        rngs = {"dropout": rng} if rng is not None else None
        if batch_stats:
            variables["batch_stats"] = batch_stats
            if update:
                score, new_state = discriminator.apply(
                    variables, ref, est, train=True,
                    mutable=["batch_stats"], rngs=rngs,
                )
                return score, new_state["batch_stats"]
            score = discriminator.apply(variables, ref, est, train=False)
            return score, batch_stats
        return discriminator.apply(variables, ref, est, train=False), {}

    def _est_list(outputs):
        ests, _ = outputs
        if isinstance(ests, (list, tuple)):
            return [e for e in ests if e is not None and e.ndim == 2]
        return [ests]

    def step(states, batch, rng=None):
        gen_state, dis_state = states
        if rng is None:
            rng = jax.random.fold_in(
                jax.random.PRNGKey(seed), dis_state.step
            )
        targets = batch["wav_targets"]
        mix = batch["wav_mix"]

        # generator forward (reused detached for D)
        outputs, new_gen_stats = _gen_outputs(
            gen_state.params, gen_state.batch_stats, batch
        )
        ests = [jax.lax.stop_gradient(e) for e in _est_list(outputs)]

        noisy_m, noisy_valid = metric_fn(mix, targets)
        est_metrics = [metric_fn(e, targets) for e in ests]

        def d_loss_fn(d_params):
            stats = dis_state.batch_stats
            clean_score, stats = _disc_apply(
                d_params, stats, targets, targets, update=True, rng=rng
            )
            noisy_score, stats = _disc_apply(
                d_params, stats, targets, mix, update=True, rng=rng
            )
            ones = jnp.ones(targets.shape[0])
            loss = _masked_mse(clean_score, ones, jnp.ones_like(ones)) + \
                _masked_mse(noisy_score, noisy_m, noisy_valid.astype(
                    jnp.float32))
            for e, (m, valid) in zip(ests, est_metrics):
                s, stats = _disc_apply(
                    d_params, stats, targets, e, update=True, rng=rng
                )
                loss = loss + _masked_mse(s, m, valid.astype(jnp.float32))
            return loss, stats

        (d_loss, new_dis_stats), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(dis_state.params)
        d_updates, new_d_opt = dis_optimizer.update(
            d_grads, dis_state.opt_state, dis_state.params
        )
        new_d_params = optax.apply_updates(dis_state.params, d_updates)
        dis_state = TrainState(
            step=dis_state.step + 1,
            params=new_d_params,
            batch_stats=new_dis_stats,
            opt_state=new_d_opt,
        )

        # generator step against the UPDATED discriminator
        def g_loss_fn(g_params):
            outputs, new_stats = _gen_outputs(
                g_params, gen_state.batch_stats, batch
            )
            se_loss = weighted_loss(
                outputs,
                targets,
                batch.get("spk_label"),
                criterion,
                loss_posi,
                loss_weight,
                multi_task,
            )
            gan_loss = 0.0
            ones = jnp.ones(targets.shape[0])
            for e in _est_list(outputs):
                score, _ = _disc_apply(
                    new_d_params, new_dis_stats, targets, e
                )
                gan_loss = gan_loss + jnp.mean(
                    jnp.square(score.reshape(-1) - ones)
                )
            return se_loss + gan_loss_weight * gan_loss, (se_loss, new_stats)

        (g_loss, (se_loss, new_gen_stats)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(gen_state.params)
        g_updates, new_g_opt = gen_optimizer.update(
            g_grads, gen_state.opt_state, gen_state.params
        )
        new_g_params = optax.apply_updates(gen_state.params, g_updates)
        gen_state = TrainState(
            step=gen_state.step + 1,
            params=new_g_params,
            batch_stats=new_gen_stats,
            opt_state=new_g_opt,
        )
        metrics = {
            "loss": g_loss,
            "se_loss": se_loss,
            "d_loss": d_loss,
        }
        return (gen_state, dis_state), metrics

    return step
