"""Cross-cutting utilities: precision control, IO, profiling, env flags."""

from mobileposer_tpu.utils.helpers import getenv_flag  # noqa: F401
from mobileposer_tpu.utils.io import (  # noqa: F401
    get_datestring,
    load_txt_mat,
    make_dir,
    save_txt_mat,
)
from mobileposer_tpu.utils.precision import f32_matmuls  # noqa: F401
from mobileposer_tpu.utils.profiling import (  # noqa: F401
    StepTimer,
    device_memory_stats,
    trace,
)
from mobileposer_tpu.utils.testing import (  # noqa: F401
    evaluate_next_batch,
    evaluate_over_dataset,
)
