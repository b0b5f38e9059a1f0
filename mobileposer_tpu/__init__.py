"""mobileposer_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
real-time full-body pose estimation and 3D human translation from sparse
consumer-device IMUs.

Re-designed from scratch for TPU hardware with the capabilities of the
reference PyTorch implementation (SPICExLAB/MobilePoser, UIST'24):
  - `kinematics/`: rotation math, tree FK/IK, SMPL body model (pure jnp)
  - `nn/`:         scan-based LSTM core with explicit carries
  - `models/`:     Joints / Poser / FootContact / Velocity + MobilePoserNet
  - `ops/`:        Pallas TPU kernels for the streaming hot path
  - `data/`:       virtual-IMU synthesis + windowed/combo-masked datasets
  - `train/`:      optax training loops, pjit data-parallel sharding
  - `eval/`:       FullMotionEvaluator metric suite
  - `stream/`:     sensor ingest, calibration, live streaming runtime
  - `parallel/`:   device-mesh / sharding helpers
"""

__version__ = "0.1.0"
