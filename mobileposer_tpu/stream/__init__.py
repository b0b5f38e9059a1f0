"""Streaming layer: sensor ingest, calibration, live inference runtime."""

from mobileposer_tpu.stream.sensor import (  # noqa: F401
    BUFFER_SIZE,
    KEYS,
    MIN_TIME_DIFF,
    OUT_UDP_IP,
    OUT_UDP_PORT,
    PORTS,
    SensorData,
    encode_packet,
    process_message,
    sensor2global,
)
from mobileposer_tpu.stream.calibration import (  # noqa: F401
    Calibration,
    calibrate_frames,
    compute_device_calibration,
    compute_smpl2imu,
    identity_calibration,
    normalize_frames,
)
from mobileposer_tpu.stream.receiver import (  # noqa: F401
    DataReceiver,
    PerformanceLogger,
    SensorFrontend,
    encode_rebroadcast,
    init_sockets,
)
from mobileposer_tpu.stream.imuset import Clock, IMUSet, decode_frame_packet  # noqa: F401
from mobileposer_tpu.stream.replayer import (  # noqa: F401
    DeviceReplayer,
    FrameReplayer,
    synthetic_device_stream,
)
from mobileposer_tpu.stream.live import LivePoser, UnityExporter, save_session  # noqa: F401
from mobileposer_tpu.stream.server import PoseClient, PoseServer  # noqa: F401
