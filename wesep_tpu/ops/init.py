"""Initializers matching torch defaults, for training-dynamics parity.

torch nn.Linear / nn.Conv1d default-init weights and biases from
U(-sqrt(k), sqrt(k)) with k = 1 / fan_in; nn.LSTM uses U(-1/sqrt(H), 1/sqrt(H))
for every weight. flax defaults (lecun_normal, zeros bias) differ; these
helpers let the model zoo reproduce the reference's init distributions so the
training envelopes (lr schedules etc., e.g.
/root/reference/examples/librimix/tse/v2/confs/bsrnn.yaml:95-114) transfer.
"""

import jax
import jax.numpy as jnp
import numpy as np


def torch_linear_init(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch Linear/Conv weight & bias."""
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_lstm_init(hidden: int):
    """U(-1/sqrt(H), 1/sqrt(H)) — torch LSTM weights/biases."""
    return torch_linear_init(hidden)


def conv_kernel_fan_in(kernel_size: int, in_features: int, groups: int = 1) -> int:
    return kernel_size * (in_features // groups)
