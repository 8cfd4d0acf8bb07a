"""MultiWorkerLoader: spawn-process workers partition and batch the data."""

import io
import tarfile

import numpy as np
import pytest

from wesep_tpu.data.wav_io import wav_bytes


# run all subprocess-spawning tests on ONE xdist worker: under -n 4
# they oversubscribe the 4-core harness and the gloo workers time out
pytestmark = pytest.mark.xdist_group("subproc")

def _shard(path, prefix, n=8):
    rng = np.random.default_rng(0)
    with tarfile.open(path, "w") as tar:
        for u in range(n):
            key = f"{prefix}utt{u:02d}"

            def add(name, data):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))

            s1 = rng.standard_normal(4000).astype(np.float32) * 0.2
            s2 = rng.standard_normal(4000).astype(np.float32) * 0.2
            add(f"{key}.spk1", b"spkA")
            add(f"{key}.spk2", b"spkB")
            add(f"{key}.wav", wav_bytes(s1 + s2, 16000))
            add(f"{key}_spk1.wav", wav_bytes(s1, 16000))
            add(f"{key}_spk2.wav", wav_bytes(s2, 16000))


def test_multiworker_loader(tmp_path):
    from wesep_tpu.data import Dataset, MultiWorkerLoader, tse_collate_fn

    # 4 shards over 2 workers (partition kicks in when shards > workers,
    # matching the reference DistributedSampler semantics)
    for i in range(4):
        _shard(str(tmp_path / f"s{i}.tar"), prefix=f"s{i}_")
    lst = str(tmp_path / "l.list")
    with open(lst, "w") as f:
        for i in range(4):
            f.write(str(tmp_path / f"s{i}.tar") + "\n")
    embeds = {
        "spkA": [np.ones((1, 8), np.float32)],
        "spkB": [np.full((1, 8), 2.0, np.float32)],
    }
    configs = {"resample_rate": 16000, "shuffle": True,
               "shuffle_args": {"shuffle_size": 4}, "chunk_len": 2000}
    workers = [
        Dataset("shard", lst, configs, spk2embed_dict=embeds,
                state="train", rank=0, world_size=1,
                worker_id=w, num_workers=2)
        for w in range(2)
    ]
    loader = MultiWorkerLoader(workers, batch_size=2,
                               collate_fn=tse_collate_fn)
    loader.set_epoch(0)
    batches = list(loader)
    # 32 utts -> 16 sample-batches of 2 (of 4 rows each)
    assert len(batches) == 16
    keys = [k for b in batches for k in b["key"]]
    assert len(set(keys)) == 32  # full partition, no duplicates
    for b in batches:
        assert b["wav_mix"].shape == (4, 2000)
        assert b["spk_embeds"].shape == (4, 8)


class _SuicidalDataset:
    """Yields one good sample then SIGKILLs its own worker process —
    simulates the host OOM killer taking a loader worker down (no
    sentinel is ever sent)."""

    def __init__(self, die: bool):
        self.die = die

    def set_epoch(self, epoch):
        pass

    def __iter__(self):
        import os
        import signal

        yield {
            "key": "k", "spk1": "a", "spk2": "b", "num_speaker": 2,
            "wav_mix": np.zeros((1, 100), np.float32),
            "wav_spk1": np.zeros((1, 100), np.float32),
            "wav_spk2": np.zeros((1, 100), np.float32),
            "embed_spk1": np.zeros((1, 4), np.float32),
            "embed_spk2": np.zeros((1, 4), np.float32),
        }
        if self.die:
            os.kill(os.getpid(), signal.SIGKILL)
        yield {
            "key": "k2", "spk1": "a", "spk2": "b", "num_speaker": 2,
            "wav_mix": np.zeros((1, 100), np.float32),
            "wav_spk1": np.zeros((1, 100), np.float32),
            "wav_spk2": np.zeros((1, 100), np.float32),
            "embed_spk1": np.zeros((1, 4), np.float32),
            "embed_spk2": np.zeros((1, 4), np.float32),
        }


def test_killed_worker_does_not_hang():
    """A SIGKILL'd worker must not hang the batch loop (its sentinel is
    lost); the surviving worker's batches still arrive."""
    from wesep_tpu.data.dataset import MultiWorkerLoader, tse_collate_fn

    loader = MultiWorkerLoader(
        [_SuicidalDataset(die=True), _SuicidalDataset(die=False)],
        batch_size=1, collate_fn=tse_collate_fn, drop_last=False,
    )
    loader.set_epoch(0)
    batches = list(loader)  # must terminate
    # survivor contributes 2 batches; the killed worker 1 (pre-kill)
    assert 2 <= len(batches) <= 3
