"""Shard-list iteration with deterministic (epoch, rank, worker) sharding.

Equivalent of the reference DataList/DistributedSampler
(/root/reference/wesep/dataset/dataset.py:51-136) without torch: rank/world
come from jax.process_index()/process_count() (or explicit args), workers
from the loader. Same slicing semantics: epoch-seeded global shuffle, then
data[rank::world][worker::num_workers].
"""

import random
from typing import Iterator, List, Optional

__all__ = ["DataList", "read_lists"]


def read_lists(path: str) -> List[str]:
    """One entry per non-empty line (reference file_utils.read_lists)."""
    out = []
    with open(path, "r", encoding="utf8") as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(line)
    return out


class DataList:
    """Iterable over {src, rank, world_size, worker_id, num_workers} dicts."""

    def __init__(
        self,
        lists: List[str],
        shuffle: bool = True,
        partition: bool = True,
        repeat_dataset: bool = False,
        rank: Optional[int] = None,
        world_size: Optional[int] = None,
        worker_id: int = 0,
        num_workers: int = 1,
    ):
        self.lists = lists
        self.shuffle = shuffle
        self.partition = partition
        self.repeat_dataset = repeat_dataset
        if rank is None or world_size is None:
            try:
                import jax

                rank = jax.process_index() if rank is None else rank
                world_size = (
                    jax.process_count() if world_size is None else world_size
                )
            except Exception:
                rank, world_size = rank or 0, world_size or 1
        self.rank = rank
        self.world_size = world_size
        self.worker_id = worker_id
        self.num_workers = num_workers
        self.epoch = -1

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _sample(self) -> List[int]:
        data = list(range(len(self.lists)))
        if len(data) <= self.num_workers:
            if self.shuffle:
                random.Random(self.epoch).shuffle(data)
        else:
            if self.partition:
                if self.shuffle:
                    random.Random(self.epoch).shuffle(data)
                data = data[self.rank :: self.world_size]
            data = data[self.worker_id :: self.num_workers]
        return data

    def __iter__(self) -> Iterator[dict]:
        info = dict(
            rank=self.rank,
            world_size=self.world_size,
            worker_id=self.worker_id,
            num_workers=self.num_workers,
        )
        indexes = self._sample()
        if not self.repeat_dataset:
            for index in indexes:
                yield dict(src=self.lists[index], **info)
        else:
            counter = 0
            while True:
                index = indexes[counter % len(indexes)]
                counter += 1
                yield dict(src=self.lists[index], **info)
