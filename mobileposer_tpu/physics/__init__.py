"""Physics layer: refinement hook (reference's PHYSICS path, made
functional) + full rigid-body dynamics (the RBDL-wrapper surface,
reference articulate/utils/rbdl/model.py, rebuilt in JAX)."""

from mobileposer_tpu.physics.debug_params import DebugParams  # noqa: F401
from mobileposer_tpu.physics.dynamics import (  # noqa: F401
    BodyParams,
    DynamicsModel,
)
from mobileposer_tpu.physics.optimizer import (  # noqa: F401
    PhysicsOptimizer,
    PhysicsState,
    physics_enabled,
)
