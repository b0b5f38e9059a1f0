"""mobileposer_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
real-time full-body pose estimation and 3D human translation from sparse
consumer-device IMUs.

Re-designed from scratch for TPU hardware with the capabilities of the
reference PyTorch implementation (SPICExLAB/MobilePoser, UIST'24):
  - `kinematics/`: rotation math, tree FK/IK, SMPL body model (pure jnp)
  - `nn/`:         scan-based LSTM core with explicit carries + converters
  - `models/`:     Joints / Poser / FootContact / Velocity + MobilePoserNet
  - `ops/`:        Pallas TPU kernels (fused LSTM layer scans)
  - `data/`:       virtual-IMU synthesis, dataset processors, windowed
                   combo-masked datasets, prefetching
  - `train/`:      optax training loops, sharded train steps, checkpoints
  - `evaluation/`: FullMotionEvaluator metric suite + eval protocol
  - `stream/`:     sensor ingest, calibration, live runtime, pose server
  - `physics/`:    gated per-frame refinement hook
  - `viz/`:        headless motion exports + orientation monitor
  - `parallel/`:   device-mesh / sharding / multi-host helpers
  - `native/`:     C++ sensor ingest (ctypes)
  - `cli/`:        the command-line surface
"""

__version__ = "0.1.0"
