"""Config + logging utilities.

Equivalents of /root/reference/wesep/utils/utils.py: parse_config_or_kwargs
(:73-90, YAML + CLI override merge), set_seed (:103-112), get_logger/
setup_logger (:35-70, rank-0 rotation of old train.log.N files).
"""

import logging
import os
import random

import numpy as np
import yaml

__all__ = ["parse_config_or_kwargs", "set_seed", "setup_logger",
           "parse_override_args"]


def parse_config_or_kwargs(config_file: str, **kwargs) -> dict:
    """YAML + kwargs override merge (kwargs win)."""
    with open(config_file) as f:
        yaml_config = yaml.safe_load(f)
    return dict(yaml_config, **kwargs)


def parse_override_args(pairs):
    """['a.b=1', 'c=x'] -> nested dict overrides with YAML-typed values."""
    out = {}
    for pair in pairs or []:
        key, _, value = pair.partition("=")
        value = yaml.safe_load(value)
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out


def deep_update(base: dict, override: dict) -> dict:
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            deep_update(base[k], v)
        else:
            base[k] = v
    return base


def set_seed(seed: int = 42):
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def setup_logger(exp_dir: str, rank: int = 0, name: str = "train.log"):
    """File+console logger; rank 0 rotates old logs to name.N
    (reference utils.py:50-70)."""
    os.makedirs(exp_dir, exist_ok=True)
    log_path = os.path.join(exp_dir, name)
    if rank == 0 and os.path.exists(log_path):
        for n in range(100, 0, -1):
            src = log_path if n == 1 else f"{log_path}.{n - 1}"
            if os.path.exists(src):
                os.replace(src, f"{log_path}.{n}")
    logger = logging.getLogger(f"wesep_tpu.{name}.{rank}")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter(
        "%(asctime)s [%(levelname)s] %(message)s", "%Y-%m-%d %H:%M:%S"
    )
    fh = logging.FileHandler(log_path if rank == 0
                             else f"{log_path}.rank{rank}")
    fh.setFormatter(fmt)
    logger.addHandler(fh)
    ch = logging.StreamHandler()
    ch.setFormatter(fmt)
    logger.addHandler(ch)
    return logger


def table_row(values, width: int = 10) -> str:
    """tableprint-style grid row (reference executor.py:136-148)."""
    cells = []
    for v in values:
        s = f"{v:.4g}" if isinstance(v, float) else str(v)
        cells.append(s[:width].center(width))
    return "| " + " | ".join(cells) + " |"
