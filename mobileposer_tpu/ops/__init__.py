"""Pallas TPU kernels for the hot compute paths."""

from mobileposer_tpu.ops.lstm_pallas import (  # noqa: F401
    lstm_forward_pallas,
    lstm_layer_pallas,
    rnn_apply_pallas,
)
