"""Epoch-level train/validation driver around the compiled steps.

Equivalent of the reference Executor (/root/reference/wesep/utils/
executor.py:27-203) with the TPU-native split: the per-batch math lives in
the jitted step (trainer.py); this class only feeds batches, paces logging,
and aggregates losses. Loss scalars are fetched lazily (only at log
points) so the device pipeline never stalls on the host.
"""

from typing import Callable, Optional

import numpy as np

from wesep_tpu.utils.config import table_row

__all__ = ["Executor"]


def _make_stop_vote(should_stop):
    """Wrap a per-process stop predicate into a GLOBALLY consistent one.

    Preemption (SIGTERM) lands on each host at slightly different batch
    boundaries; if rank A stops after batch k while rank B enters batch
    k+1, B's gradient psum waits on A forever (the DDP `model.join()`
    analogue, reference executor.py:64-69). Every rank therefore
    all-gathers its local flag at the SAME batch indices and stops iff
    any rank voted stop.

    The vote is a host-synchronized collective, so it is throttled to
    every `stop_vote_interval` batches (ADVICE r4): ranks only check at
    batch indices i % interval == 0, which bounds the added per-step
    latency to 1/interval of a per-batch vote while keeping the vote
    points globally consistent. A locally tripped flag therefore takes
    effect up to interval-1 batches later — preemption grace periods
    are minutes, steps are ~100 ms, so this is immaterial.

    Requirement: all ranks must iterate the SAME number of batches per
    epoch (infinite shard repeat + a fixed epoch_iter guarantee this in
    bin/train). If dataloaders could end unequally, both this vote and
    the gradient psum it protects would deadlock.
    """
    if should_stop is None:
        return None
    try:
        import jax

        n_proc = jax.process_count()
    except Exception:
        n_proc = 1
    if n_proc == 1:
        return should_stop

    def vote():
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray([bool(should_stop())], np.int32)
        )
        return bool(np.any(flags))

    vote.collective = True  # throttled by stop_vote_interval in train()
    return vote


class Executor:
    def __init__(self):
        self.step = 0
        self.stopped = False

    def train(
        self,
        dataloader,
        train_step: Callable,
        state,
        epoch_iter: int,
        epoch: int,
        logger=None,
        log_batch_interval: int = 100,
        device_put: Optional[Callable] = None,
        sample_rate: int = 16000,
        should_stop: Optional[Callable[[], bool]] = None,
        stop_vote_interval: int = 8,
    ):
        """One training epoch -> (state, avg_loss).

        should_stop (checked between batches) requests a clean early
        exit — the preemption hook; `self.stopped` reports whether the
        epoch ended early so the caller can checkpoint and shut down.
        """
        from wesep_tpu.utils.profiling import ThroughputMeter

        self.stopped = False
        losses = []
        meter = ThroughputMeter(sample_rate=sample_rate)
        vote_stop = _make_stop_vote(should_stop)
        # only the multi-host collective vote is throttled; a local-only
        # predicate is free and checked every batch
        vote_every = (
            stop_vote_interval
            if getattr(vote_stop, "collective", False) else 1
        )
        for i, batch in enumerate(dataloader):
            if (vote_stop is not None and i % vote_every == 0
                    and vote_stop()):
                self.stopped = True
                if logger:
                    logger.warning(
                        "stop requested: ending epoch %d after %d batches",
                        epoch, i,
                    )
                break
            meter.update(batch)
            if device_put is not None:
                batch = device_put(batch)
            state, metrics = train_step(state, batch)
            losses.append(metrics["loss"])
            self.step += 1
            if logger and (i + 1) % log_batch_interval == 0:
                avg = float(np.mean([float(l) for l in losses]))
                logger.info(
                    table_row((
                        "TRAIN", epoch, i + 1, avg,
                        f"{meter.audio_sec_per_sec():.0f}as/s",
                    ))
                )
            if (i + 1) == epoch_iter:
                break
        avg = float(np.mean([float(l) for l in losses])) if losses else 0.0
        if logger:
            logger.info("epoch %d throughput: %s", epoch, meter.summary())
        return state, avg

    def cv(
        self,
        dataloader,
        eval_step: Callable,
        state,
        val_iter: int,
        epoch: int,
        logger=None,
        log_batch_interval: int = 100,
        device_put: Optional[Callable] = None,
    ):
        """Validation epoch -> avg loss on criterion[0]
        (executor.py:154-203)."""
        losses = []
        for i, batch in enumerate(dataloader):
            if device_put is not None:
                batch = device_put(batch)
            metrics = eval_step(state, batch)
            losses.append(metrics["loss"])
            if logger and (i + 1) % log_batch_interval == 0:
                avg = float(np.mean([float(l) for l in losses]))
                logger.info(table_row(("VAL", epoch, i + 1, avg, "-")))
            if (i + 1) == val_iter:
                break
        return float(np.mean([float(l) for l in losses])) if losses else 0.0
