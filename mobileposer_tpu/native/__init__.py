"""Native (C++) runtime components, loaded via ctypes.

`NativeIngest` wraps libsensor_ingest.so — a GIL-free UDP receive loop with
per-device lock-free ring buffers and the device wire-format parser
(byte-compatible with stream/sensor.py::process_message). The library is
built on demand with the checked-in Makefile (g++); when no compiler or
build is available, callers fall back to the Python frontend
(stream/receiver.py), which is sufficient at real phone rates.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libsensor_ingest.so"


def build_library(force: bool = False) -> Optional[Path]:
    """Build libsensor_ingest.so with make/g++. Returns the path or None.

    Always invokes make: it is dependency-checked (a fresh .so is a
    no-op), and skipping it when the .so exists left STALE builds in
    place after sensor_ingest.cpp grew new symbols (the .so is
    gitignored, so every checkout builds its own)."""
    if force:
        try:
            subprocess.run(["make", "-C", str(_DIR), "clean"], check=True,
                           capture_output=True, timeout=30)
        except Exception:
            pass
    try:
        subprocess.run(["make", "-C", str(_DIR)], check=True,
                       capture_output=True, timeout=120)
    except Exception as e:
        if _LIB_PATH.exists():
            return _LIB_PATH          # no toolchain, but a prior build
        print(f"native ingest build failed: {e}")
        return None
    return _LIB_PATH if _LIB_PATH.exists() else None


def load_library() -> Optional[ctypes.CDLL]:
    path = build_library()
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    lib.ingest_create.restype = ctypes.c_void_p
    lib.ingest_create.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    lib.ingest_start.argtypes = [ctypes.c_void_p]
    lib.ingest_stop.argtypes = [ctypes.c_void_p]
    lib.ingest_destroy.argtypes = [ctypes.c_void_p]
    lib.ingest_packet_count.restype = ctypes.c_uint64
    lib.ingest_packet_count.argtypes = [ctypes.c_void_p]
    lib.ingest_reject_count.restype = ctypes.c_uint64
    lib.ingest_reject_count.argtypes = [ctypes.c_void_p]
    lib.ingest_latest.restype = ctypes.c_uint64
    lib.ingest_latest.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                  ctypes.POINTER(ctypes.c_double)]
    lib.ingest_read_since.restype = ctypes.c_int
    lib.ingest_read_since.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64)]
    lib.ingest_parse.restype = ctypes.c_int
    lib.ingest_parse.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                 ctypes.POINTER(ctypes.c_double)]
    if hasattr(lib, "udp_drain_requests"):
        lib.udp_drain_requests.restype = ctypes.c_int
        lib.udp_drain_requests.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        lib.udp_send_batch.restype = ctypes.c_int
        lib.udp_send_batch.argtypes = [
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64)]
        lib.udp_drain_count.restype = ctypes.c_int
        lib.udp_drain_count.argtypes = [ctypes.c_int, ctypes.c_int]
    return lib


class NativeIngest:
    """GIL-free multi-port UDP sensor ingest (see sensor_ingest.cpp)."""

    NUM_SLOTS = 5
    FRAME_DIM = 9  # [unix_ts, sensor_ts, acc xyz, quat xyzw]

    def __init__(self, host: str = "0.0.0.0",
                 ports: Sequence[int] = (8001, 8002, 8003, 8004, 8005),
                 lib: Optional[ctypes.CDLL] = None):
        self.lib = lib or load_library()
        if self.lib is None:
            raise RuntimeError("native ingest library unavailable")
        arr = (ctypes.c_int * len(ports))(*ports)
        self.handle = self.lib.ingest_create(host.encode(), arr, len(ports))
        if not self.handle:
            raise OSError(f"failed to bind UDP ports {list(ports)}")
        self._started = False

    def start(self) -> None:
        if not self._started:
            self.lib.ingest_start(self.handle)
            self._started = True

    def stop(self) -> None:
        if self._started:
            self.lib.ingest_stop(self.handle)
            self._started = False

    def close(self) -> None:
        if self.handle:
            self.lib.ingest_destroy(self.handle)
            self.handle = None

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()
        self.close()

    @property
    def packet_count(self) -> int:
        return int(self.lib.ingest_packet_count(self.handle))

    @property
    def reject_count(self) -> int:
        return int(self.lib.ingest_reject_count(self.handle))

    def latest(self, slot: int) -> Optional[Tuple[int, np.ndarray]]:
        """Newest frame of a device slot: (seq, [ts, ts, acc3, quat4])."""
        buf = (ctypes.c_double * self.FRAME_DIM)()
        seq = self.lib.ingest_latest(self.handle, slot, buf)
        if seq == 0:
            return None
        return int(seq), np.frombuffer(buf, np.float64).copy()

    def read_since(self, slot: int, after_seq: int,
                   max_frames: int = 64) -> Tuple[np.ndarray, int]:
        """Frames of `slot` newer than after_seq: ([n, 9], last_seq)."""
        buf = (ctypes.c_double * (self.FRAME_DIM * max_frames))()
        last = ctypes.c_uint64()
        n = self.lib.ingest_read_since(self.handle, slot, after_seq, buf,
                                       max_frames, ctypes.byref(last))
        frames = np.frombuffer(buf, np.float64)[:n * self.FRAME_DIM]
        return frames.reshape(n, self.FRAME_DIM).copy(), int(last.value)


class ServingUDP:
    """Batched UDP syscalls for the serving tick (recvmmsg/sendmmsg,
    GIL-free; sensor_ingest.cpp `udp_*`).

    One `drain` call replaces S recvfrom + struct.unpack + isfinite
    Python iterations; one `send` call replaces S sendto calls. At
    512-1024 streams x 30 Hz those loops were the measured serving
    capacity ceiling (docs/deploy.md §2) on a 1-core host. Addresses are
    opaque uint64 tokens ((ipv4_be << 16) | port_be) round-tripped from
    drain to send; Python never parses them."""

    REQ_DIM = 60

    def __init__(self, lib: Optional[ctypes.CDLL] = None):
        self.lib = lib or load_library()
        if self.lib is None:
            raise RuntimeError("native library unavailable")
        if not hasattr(self.lib, "udp_drain_requests"):
            # stale .so from before the serving helpers: rebuild once
            if build_library(force=True) is None:
                raise RuntimeError("native serving UDP unavailable")
            self.lib = load_library()
            if self.lib is None or not hasattr(self.lib,
                                               "udp_drain_requests"):
                raise RuntimeError("native serving UDP unavailable")

    def drain(self, fd: int, max_n: int, max_total: Optional[int] = None
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
        """Drain up to max_n valid requests from the non-blocking socket
        `fd`: (ids uint32[n], frames float32[n,60], addr_tokens
        uint64[n], rejected). Wrong-size and non-finite datagrams are
        rejected in C, matching PoseServer._drain_requests — and like it,
        `max_total` (default 2*max_n) bounds total datagrams PROCESSED so
        a garbage flood cannot spin the drain."""
        ids = np.empty(max_n, np.uint32)
        frames = np.empty((max_n, self.REQ_DIM), np.float32)
        addrs = np.empty(max_n, np.uint64)
        rej = ctypes.c_int(0)
        n = self.lib.udp_drain_requests(
            fd, ids.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            frames.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            addrs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            max_n, max_total if max_total is not None else 2 * max_n,
            ctypes.byref(rej))
        return ids[:n], frames[:n], addrs[:n], rej.value

    def send(self, fd: int, payload: bytes, n: int, size: int,
             addr_tokens: np.ndarray) -> int:
        """Send n contiguous `size`-byte payloads to per-row addresses.
        Returns the number sent (a full send buffer drops the rest, like
        the Python path's per-datagram OSError drop)."""
        addr_tokens = np.ascontiguousarray(addr_tokens, np.uint64)
        return self.lib.udp_send_batch(
            fd, payload, n, size,
            addr_tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))

    def drain_count(self, fd: int, max_n: int) -> int:
        """Drain and count datagrams of any size (benchmark drivers)."""
        return self.lib.udp_drain_count(fd, max_n)

    @staticmethod
    def addr_token(host: str, port: int) -> int:
        """Build the uint64 address token for a known destination (the
        same encoding udp_drain_requests emits: C reads sin_addr.s_addr /
        sin_port — network-byte-order fields — as host integers)."""
        import socket as _socket
        import sys as _sys
        ip = int.from_bytes(_socket.inet_aton(host), _sys.byteorder)
        pt = int.from_bytes(port.to_bytes(2, "big"), _sys.byteorder)
        return (ip << 16) | pt


def parse_packet(data: bytes, lib: Optional[ctypes.CDLL] = None
                 ) -> Optional[Tuple[int, np.ndarray]]:
    """Parse one wire packet with the native parser (unit-test hook)."""
    lib = lib or load_library()
    if lib is None:
        return None
    buf = (ctypes.c_double * NativeIngest.FRAME_DIM)()
    slot = lib.ingest_parse(data, len(data), buf)
    if slot < 0:
        return None
    return slot, np.frombuffer(buf, np.float64).copy()
