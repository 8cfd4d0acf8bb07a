"""Dataset factory + collators: the full processing chain as generators.

Equivalent of /root/reference/wesep/dataset/dataset.py:267-409 (factory)
and :139-264 (collators), torch-free. The factory returns a plain iterable
of sample dicts; `collate` / `collate_2spk` turn lists of samples into
fixed-shape numpy batches {wav_mix, wav_targets, spk_embeds, spk_label,
key, spk} with each mixture expanded into one row per target speaker.
"""

from typing import Iterator, List, Optional

import numpy as np

from wesep_tpu.data import processor
from wesep_tpu.data.datalist import DataList, read_lists

__all__ = [
    "Dataset",
    "tse_collate_fn",
    "tse_collate_fn_2spk",
    "tse_collate_fn_device",
    "BatchLoader",
]


class _Chain:
    """Composable generator chain with set_epoch plumbed to the DataList."""

    def __init__(self, source, fn=None, *args, **kw):
        self.source = source
        self.fn = fn
        self.args = args
        self.kw = kw

    def set_epoch(self, epoch: int):
        if isinstance(self.source, _Chain):
            self.source.set_epoch(epoch)
        else:
            self.source.set_epoch(epoch)

    def __iter__(self):
        if self.fn is None:
            return iter(self.source)
        return self.fn(iter(self.source), *self.args, **self.kw)

    def apply(self, fn, *args, **kw):
        return _Chain(self, fn, *args, **kw)


def Dataset(
    data_type: str,
    data_list_file: str,
    configs: dict,
    spk2embed_dict=None,
    spk1_embed=None,
    spk2_embed=None,
    state: str = "train",
    joint_training: bool = False,
    dict_spk=None,
    whole_utt: bool = False,
    repeat_dataset: bool = False,
    noise_prob: float = 0,
    reverb_prob: float = 0,
    noise_enroll_prob: float = 0,
    reverb_enroll_prob: float = 0,
    specaug_enroll_prob: float = 0,
    noise_lmdb_file: Optional[str] = None,
    online_mix: bool = False,
    device_augment: bool = False,
    rank: Optional[int] = None,
    world_size: Optional[int] = None,
    worker_id: int = 0,
    num_workers: int = 1,
):
    """Build the streaming pipeline (chain order mirrors the reference
    factory, dataset.py:267-409).

    device_augment=True (online_mix training only) moves the simulation
    stages (FRAM-RIR reverb, SNR mixing, additive noise) off the host: the
    chain stops after speaker pairing and the batched jittable fns in
    wesep_tpu.data.augment run them inside the compiled train step. The
    host then only decodes/chunks audio and fetches raw noise chunks —
    the TPU-first replacement for the reference's per-sample python
    simulation bottleneck (SURVEY §3.4)."""
    assert data_type in ["shard", "raw"]
    lists = read_lists(data_list_file)
    shuffle = configs.get("shuffle", False)
    dataset = DataList(
        lists,
        shuffle=shuffle,
        repeat_dataset=repeat_dataset,
        rank=rank,
        world_size=world_size,
        worker_id=worker_id,
        num_workers=num_workers,
    )
    chain = _Chain(dataset)
    if data_type == "shard":
        chain = chain.apply(processor.url_opener)
        if not online_mix:
            chain = chain.apply(processor.tar_file_and_group)
        else:
            chain = chain.apply(processor.tar_file_and_group_single_spk)
    else:
        if online_mix:
            chain = chain.apply(processor.parse_raw_single_spk)
        else:
            chain = chain.apply(processor.parse_raw)

    if configs.get("filter_len", False) and state == "train":
        chain = chain.apply(
            processor.filter_len, **configs.get("filter_args", {})
        )
    if shuffle and not online_mix:
        chain = chain.apply(
            processor.shuffle, **configs.get("shuffle_args", {})
        )

    resample_rate = configs.get("resample_rate", 16000)
    chain = chain.apply(processor.resample, resample_rate)

    if not whole_utt:
        chunk_len = configs.get("chunk_len", resample_rate * 3)
        chain = chain.apply(processor.random_chunk, chunk_len)

    if online_mix:
        chain = chain.apply(
            processor.mix_speakers,
            configs.get("num_speakers", 2),
            configs.get("online_buffer_size", 1000),
        )
        if device_augment and state == "train":
            # reverb/SNR-mix/noise run batched on device inside the train
            # step (data/augment.py); host only fetches raw noise chunks
            if noise_prob > 0:
                assert noise_lmdb_file is not None
                chain = chain.apply(
                    processor.fetch_noise_chunk, noise_lmdb_file
                )
        else:
            if reverb_prob > 0:
                chain = chain.apply(processor.add_reverb, reverb_prob)
            chain = chain.apply(
                processor.snr_mixer, configs.get("use_random_snr", False)
            )
            if noise_prob > 0:
                assert noise_lmdb_file is not None
                chain = chain.apply(
                    processor.add_noise, noise_lmdb_file, noise_prob
                )
    elif noise_prob > 0:
        assert noise_lmdb_file is not None
        chain = chain.apply(
            processor.add_noise, noise_lmdb_file, noise_prob
        )

    speaker_feat = configs.get("speaker_feat", False)
    if state == "train":
        if not joint_training:
            chain = chain.apply(
                processor.sample_spk_embedding, spk2embed_dict
            )
        else:
            chain = chain.apply(
                processor.sample_enrollment, spk2embed_dict, dict_spk
            )
            if reverb_enroll_prob > 0:
                chain = chain.apply(
                    processor.add_reverb_on_enroll, reverb_enroll_prob
                )
            if noise_enroll_prob > 0:
                assert noise_lmdb_file is not None
                chain = chain.apply(
                    processor.add_noise_on_enroll,
                    noise_lmdb_file,
                    noise_enroll_prob,
                )
            if speaker_feat:
                chain = chain.apply(
                    processor.compute_fbank, **configs.get("fbank_args", {})
                )
                chain = chain.apply(processor.apply_cmvn)
                if specaug_enroll_prob > 0:
                    chain = chain.apply(
                        processor.spec_aug, prob=specaug_enroll_prob
                    )
    else:
        if not joint_training:
            chain = chain.apply(
                processor.sample_fix_spk_embedding,
                spk2embed_dict,
                spk1_embed,
                spk2_embed,
            )
        else:
            chain = chain.apply(
                processor.sample_fix_spk_enrollment,
                spk2embed_dict,
                spk1_embed,
                spk2_embed,
                dict_spk,
            )
            if speaker_feat:
                chain = chain.apply(
                    processor.compute_fbank, **configs.get("fbank_args", {})
                )
                chain = chain.apply(processor.apply_cmvn)
    return chain


def _pad_or_trim_embeds(spk_embeds: List[np.ndarray], mode: str,
                        fixed_len: Optional[int] = None):
    lengths = [e.shape[1] for e in spk_embeds]
    if fixed_len is not None:
        # static-shape mode for XLA: wrap-pad/trim every enrollment (wav or
        # fbank) along axis 1 to exactly fixed_len — avoids per-batch
        # recompiles that the reference's min/max modes would cause on TPU
        out = []
        for e in spk_embeds:
            if e.shape[1] >= fixed_len:
                out.append(e[:, :fixed_len])
            else:
                width = [(0, 0), (0, fixed_len - e.shape[1])] + [(0, 0)] * (
                    e.ndim - 2
                )
                out.append(np.pad(e, width, mode="wrap"))
        return out, lengths
    if len(set(lengths)) == 1:
        return spk_embeds, lengths
    if mode == "max":
        max_len = max(lengths)
        out = []
        for e in spk_embeds:
            pad = max_len - e.shape[1]
            width = [(0, 0), (0, pad)] + [(0, 0)] * (e.ndim - 2)
            out.append(np.pad(e, width))
        return out, lengths
    min_len = min(lengths)
    return [e[:, :min_len] for e in spk_embeds], lengths


def tse_collate_fn(batch: List[dict], mode: str = "min",
                   fixed_enroll_len: Optional[int] = None) -> dict:
    """Expand each mixture into num_speaker rows (reference
    tse_collate_fn, dataset.py:206-264)."""
    wav_mix, wav_targets, spk_embeds = [], [], []
    spk, key, spk_label = [], [], []
    for s in batch:
        for i in range(s["num_speaker"]):
            wav_mix.append(s["wav_mix"])
            wav_targets.append(s[f"wav_spk{i + 1}"])
            spk.append(s[f"spk{i + 1}"])
            key.append(s["key"])
            spk_embeds.append(np.asarray(s[f"embed_spk{i + 1}"]))
            if f"spk{i + 1}_label" in s:
                spk_label.append(s[f"spk{i + 1}_label"])
    spk_embeds, lengths = _pad_or_trim_embeds(spk_embeds, mode,
                                              fixed_enroll_len)
    return {
        "wav_mix": np.concatenate(wav_mix).astype(np.float32),
        "wav_targets": np.concatenate(wav_targets).astype(np.float32),
        "spk_embeds": np.concatenate(spk_embeds).astype(np.float32),
        "length_spk_embeds": lengths,
        "spk": spk,
        "key": key,
        "spk_label": np.asarray(spk_label, np.int32),
    }


def tse_collate_fn_device(batch: List[dict], mode: str = "min",
                          fixed_enroll_len: Optional[int] = None) -> dict:
    """Collate for the DEVICE augmentation path (online_mix training).

    Emits the dry stacked sources + raw noise chunks instead of a host-
    mixed wav_mix; the compiled train step runs reverb/SNR-mix/noise
    batched on device (wesep_tpu.data.augment.augment_batch) and expands
    the mixture into per-target rows there. Enrollments/labels are already
    expanded per target row here (same row order as tse_collate_fn:
    sample-major, speaker-minor).
    """
    srcs, noise, spk_embeds = [], [], []
    spk, key, spk_label = [], [], []
    for s in batch:
        ns = s["num_speaker"]
        srcs.append(
            np.concatenate([s[f"wav_spk{i + 1}"] for i in range(ns)])
        )
        if "noise_chunk" in s:
            noise.append(s["noise_chunk"])
        for i in range(ns):
            spk.append(s[f"spk{i + 1}"])
            key.append(s["key"])
            spk_embeds.append(np.asarray(s[f"embed_spk{i + 1}"]))
            if f"spk{i + 1}_label" in s:
                spk_label.append(s[f"spk{i + 1}_label"])
    spk_embeds, lengths = _pad_or_trim_embeds(spk_embeds, mode,
                                              fixed_enroll_len)
    out = {
        "wav_srcs": np.stack(srcs).astype(np.float32),  # [B, S, T]
        "spk_embeds": np.concatenate(spk_embeds).astype(np.float32),
        "length_spk_embeds": lengths,
        "spk": spk,
        "key": key,
        "spk_label": np.asarray(spk_label, np.int32),
    }
    if noise:
        out["wav_noise"] = np.concatenate(noise).astype(np.float32)  # [B,T]
    return out


def tse_collate_fn_2spk(batch: List[dict], mode: str = "min",
                        fixed_enroll_len: Optional[int] = None) -> dict:
    """2-speaker variant (reference dataset.py:139-203)."""
    for s in batch:
        s.setdefault("num_speaker", 2)
    return tse_collate_fn(batch, mode, fixed_enroll_len)


class BatchLoader:
    """Minimal DataLoader: batches an iterable dataset with a collate fn,
    optional background-thread prefetch (replaces torch DataLoader,
    reference bin/train.py:188-195)."""

    def __init__(
        self,
        dataset,
        batch_size: int = 8,
        collate_fn=tse_collate_fn,
        drop_last: bool = True,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.drop_last = drop_last
        self.prefetch = prefetch

    def set_epoch(self, epoch: int):
        self.dataset.set_epoch(epoch)

    def _batches(self) -> Iterator[dict]:
        buf = []
        for sample in self.dataset:
            buf.append(sample)
            if len(buf) == self.batch_size:
                yield self.collate_fn(buf)
                buf = []
        if buf and not self.drop_last:
            yield self.collate_fn(buf)

    def __iter__(self) -> Iterator[dict]:
        if self.prefetch <= 0:
            yield from self._batches()
            return
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        _END = object()

        def producer():
            # an exception in the pipeline must surface in the consumer,
            # not die silently with the prefetch thread
            try:
                for b in self._batches():
                    q.put(b)
                q.put(_END)
            except BaseException as e:  # noqa: BLE001
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            yield item


def _worker_main(dataset, collate_fn, batch_size, drop_last, epoch, queue):
    """Worker-process body: build batches from this worker's dataset shard
    and push them to the shared queue (top-level fn: spawn-picklable)."""
    import os

    # children must never touch the TPU (single-client tunnel)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("WESEP_JAX_PLATFORMS", "cpu")
    try:
        dataset.set_epoch(epoch)
        buf = []
        for sample in dataset:
            buf.append(sample)
            if len(buf) == batch_size:
                queue.put(collate_fn(buf))
                buf = []
        if buf and not drop_last:
            queue.put(collate_fn(buf))
    finally:
        queue.put(None)  # end-of-worker sentinel


class MultiWorkerLoader:
    """Multi-process batch loader (torch DataLoader num_workers analogue).

    Takes one Dataset per worker (built with worker_id/num_workers so the
    shard partition matches the reference DistributedSampler semantics,
    dataset.py:84-103) and runs each in a spawned process; batches
    interleave through a shared queue. Worker processes force
    JAX_PLATFORMS=cpu so they never contend for the TPU. Use for
    host-heavy chains (online mixing, host FRAM-RIR); the thread-prefetch
    BatchLoader is enough for plain decode+chunk pipelines.
    """

    def __init__(
        self,
        worker_datasets,
        batch_size: int = 8,
        collate_fn=tse_collate_fn,
        drop_last: bool = True,
        queue_size: int = 8,
    ):
        self.worker_datasets = list(worker_datasets)
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.drop_last = drop_last
        self.queue_size = queue_size
        self.epoch = -1

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[dict]:
        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        queue = ctx.Queue(maxsize=self.queue_size)
        procs = [
            ctx.Process(
                target=_worker_main,
                args=(ds, self.collate_fn, self.batch_size,
                      self.drop_last, self.epoch, queue),
                daemon=True,
            )
            for ds in self.worker_datasets
        ]
        for p in procs:
            p.start()
        import logging
        import queue as queue_mod

        finished = 0
        killed = set()
        try:
            while finished < len(procs):
                try:
                    item = queue.get(timeout=10.0)
                except queue_mod.Empty:
                    # a hard-killed worker (OOM killer, SIGKILL) exits on
                    # a signal and its `finally` sentinel never arrives;
                    # count it as finished instead of blocking forever
                    for i, p in enumerate(procs):
                        if (i not in killed and not p.is_alive()
                                and p.exitcode is not None
                                and p.exitcode < 0):
                            logging.warning(
                                "data worker %d killed (exit %s); "
                                "continuing without it", i, p.exitcode,
                            )
                            killed.add(i)
                            finished += 1
                    continue
                if item is None:
                    finished += 1
                    continue
                yield item
        finally:
            for p in procs:
                p.join(timeout=5)
                if p.is_alive():
                    p.terminate()
