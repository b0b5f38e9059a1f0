"""Scan-based neural-network primitives for TPU (no framework dependency)."""

from mobileposer_tpu.nn.lstm import (  # noqa: F401
    LSTMConfig,
    init_linear,
    init_lstm_layer,
    init_rnn,
    lstm_forward,
    rnn_apply,
    rnn_zero_state,
)
from mobileposer_tpu.nn.rnn_with_init import (  # noqa: F401
    RNNWithInitConfig,
    init_rnn_with_init,
    rnn_with_init_apply,
)
from mobileposer_tpu.nn.torch_convert import (  # noqa: F401
    COMBINED_PREFIXES,
    cast_params,
    convert_mobileposer_checkpoint,
    convert_rnn_state_dict,
    export_rnn_state_dict,
    export_to_npz,
    export_to_torch_state_dict,
    load_from_npz,
    load_torch_state_dict,
    save_torch_checkpoint,
)
