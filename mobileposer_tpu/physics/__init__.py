"""Physics refinement hook (reference's PHYSICS path, made functional)."""

from mobileposer_tpu.physics.optimizer import (  # noqa: F401
    PhysicsOptimizer,
    PhysicsState,
    physics_enabled,
)
