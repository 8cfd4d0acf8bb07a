from wesep_tpu.data.dataset import (
    BatchLoader,
    Dataset,
    MultiWorkerLoader,
    tse_collate_fn,
    tse_collate_fn_2spk,
    tse_collate_fn_device,
)
from wesep_tpu.data.datalist import DataList, read_lists

__all__ = [
    "BatchLoader",
    "MultiWorkerLoader",
    "Dataset",
    "tse_collate_fn",
    "tse_collate_fn_2spk",
    "tse_collate_fn_device",
    "DataList",
    "read_lists",
]
