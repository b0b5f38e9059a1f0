"""Model layer: the four estimation modules + the MobilePoserNet composite."""

from mobileposer_tpu.models.modules import (  # noqa: F401
    MODULE_CONFIGS,
    NOISE_STD,
    bce_with_logits,
    footcontact_loss,
    init_all_modules,
    joints_loss,
    masked_mse,
    module_apply,
    multiscale_velocity_loss,
    poser_loss,
    temporal_smoothness_loss,
    velocity_loss,
)
from mobileposer_tpu.models.net import (  # noqa: F401
    MobilePoserNet,
    forward,
    prob_to_weight,
    reduced_global_to_full,
    reduced_global_to_full_soa,
)
