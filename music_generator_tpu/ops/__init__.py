from music_generator_tpu.ops.lstm import (
    LSTMParams,
    lstm_init,
    lstm_scan,
    lstm_step,
)
from music_generator_tpu.ops.nadam import nadam
from music_generator_tpu.ops.sampling import apply_temperature, bernoulli

__all__ = [
    "LSTMParams",
    "lstm_init",
    "lstm_scan",
    "lstm_step",
    "nadam",
    "apply_temperature",
    "bernoulli",
]
