from wesep_tpu.train.losses import get_loss, parse_loss
from wesep_tpu.train.schedulers import get_scheduler

__all__ = ["get_loss", "parse_loss", "get_scheduler"]
