"""Data layer: on-device virtual-IMU synthesis + windowed combo datasets."""

from mobileposer_tpu.data.synthesis import (  # noqa: F401
    AMASS_ROT,
    IMUPOSER_ROT,
    JI_MASK,
    VI_MASK,
    align_amass_to_dip,
    align_imuposer_to_dip,
    downsample_step,
    foot_ground_probs,
    nan_fill_nearest,
    remove_acceleration_bias,
    synthesize_acceleration,
    synthesize_virtual_imu,
)
from mobileposer_tpu.data.prefetch import BatchPrefetcher  # noqa: F401
from mobileposer_tpu.data.dataset import (  # noqa: F401
    COMBO_MASKS,
    COMBO_NAMES,
    EvalSequence,
    PoseDataset,
    load_processed_file,
    make_combo_imu,
)
