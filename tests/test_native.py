"""Native C++ sensor ingest: build, parse parity with the Python parser,
and a live UDP throughput check."""

import socket
import time

import numpy as np
import pytest

from mobileposer_tpu.native import NativeIngest, build_library, load_library, parse_packet
from mobileposer_tpu.stream import encode_packet, process_message

lib = load_library()
pytestmark = pytest.mark.skipif(lib is None, reason="no C++ toolchain")


def test_parse_parity_with_python():
    rng = np.random.RandomState(0)
    for device, dtype in [("left", "phone"), ("right", "watch"),
                          ("left", "headphone")]:
        acc = rng.randn(3)
        quat = rng.randn(4)
        quat /= np.linalg.norm(quat)
        pkt = encode_packet(device, dtype, [123.5, 4.25], acc, quat)
        py = process_message(pkt)
        nat = parse_packet(pkt, lib)
        assert (py is None) == (nat is None)
        if py is None:
            continue
        _, py_slot, py_acc, py_ori, py_ts = py
        nat_slot, frame = nat
        assert nat_slot == py_slot, (device, dtype)
        np.testing.assert_allclose(frame[:2], py_ts, atol=1e-9)
        np.testing.assert_allclose(frame[2:5], py_acc[0], atol=1e-5,
                                   err_msg=f"{device}_{dtype} acc")
        # quaternions are sign-ambiguous
        q_n, q_p = frame[5:9], py_ori[0]
        if np.dot(q_n, q_p) < 0:
            q_n = -q_n
        np.testing.assert_allclose(q_n, q_p, atol=1e-5,
                                   err_msg=f"{device}_{dtype} quat")


def test_parse_rejects_garbage():
    assert parse_packet(b"", lib) is None
    assert parse_packet(b"stop", lib) is None
    assert parse_packet(b"left;phone:1 2 3", lib) is None
    assert parse_packet(b"middle;phone:" + b"1 " * 12, lib) is None


def _free_ports(n):
    socks, ports = [], []
    for _ in range(n):
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.bind(("127.0.0.1", 0))
        socks.append(s)
        ports.append(s.getsockname()[1])
    for s in socks:
        s.close()
    return ports


def test_udp_ingest_end_to_end():
    ports = _free_ports(5)
    ing = NativeIngest(host="127.0.0.1", ports=ports, lib=lib)
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rng = np.random.RandomState(1)
    try:
        ing.start()
        names = [("left", "phone", 0), ("left", "watch", 1),
                 ("right", "phone", 3), ("right", "watch", 4)]
        n_per = 50
        for i in range(n_per):
            for j, (dev, typ, slot) in enumerate(names):
                q = rng.randn(4)
                q /= np.linalg.norm(q)
                pkt = encode_packet(dev, typ, [100.0 + i, i * 0.03],
                                    rng.randn(3), q)
                sock.sendto(pkt, ("127.0.0.1", ports[j]))
        deadline = time.time() + 5.0
        while ing.packet_count < n_per * len(names) and time.time() < deadline:
            time.sleep(0.01)
        assert ing.packet_count == n_per * len(names)
        assert ing.reject_count == 0
        # latest frame of each slot is the last one sent
        for dev, typ, slot in names:
            res = ing.latest(slot)
            assert res is not None
            seq, frame = res
            assert seq == n_per
            np.testing.assert_allclose(frame[1], (n_per - 1) * 0.03, atol=1e-9)
        # incremental drain
        frames, last = ing.read_since(0, after_seq=0, max_frames=256)
        assert frames.shape == (n_per, 9)
        assert last == n_per
        np.testing.assert_allclose(frames[:, 1], np.arange(n_per) * 0.03,
                                   atol=1e-9)
        frames2, last2 = ing.read_since(0, after_seq=last)
        assert frames2.shape[0] == 0
    finally:
        ing.stop()
        ing.close()
        sock.close()


def test_ingest_throughput():
    """The native path should sustain well beyond phone rates (>=50k pkt/s
    on loopback)."""
    ports = _free_ports(1)
    ing = NativeIngest(host="127.0.0.1", ports=ports, lib=lib)
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    pkt = encode_packet("left", "phone", [1.0, 2.0],
                        np.zeros(3), np.array([0, 0, 0, 1.0]))
    n = 20000
    try:
        ing.start()
        t0 = time.perf_counter()
        for _ in range(n):
            sock.sendto(pkt, ("127.0.0.1", ports[0]))
        send_dt = time.perf_counter() - t0
        deadline = time.time() + 5.0
        last = -1
        while time.time() < deadline:
            cur = ing.packet_count
            if cur == last and cur > 0:
                break                      # drained
            last = cur
            time.sleep(0.05)
        dt = time.perf_counter() - t0
        received = ing.packet_count
    finally:
        ing.stop()
        ing.close()
        sock.close()
    rate = received / dt
    # this host has one CPU core: the sender competes with the rx thread and
    # the kernel may still drop under burst — require volume and a rate far
    # beyond real sensor rates (5 devices x 150 Hz = 750 pkt/s)
    assert received >= n * 0.5, f"only {received}/{n} received"
    assert rate > 20_000, f"native ingest too slow: {rate:.0f} pkt/s"


def test_native_frontend_pipeline():
    """Raw packets -> SensorFrontend(native=True) -> rebroadcast frames."""
    from mobileposer_tpu.stream import IMUSet, SensorFrontend
    from mobileposer_tpu.stream.replayer import DeviceReplayer, synthetic_device_stream
    ports = _free_ports(6)
    in_ports, out_port = ports[:5], ports[5]
    fe = SensorFrontend(host="127.0.0.1", ports=in_ports,
                        out_addr=("127.0.0.1", out_port), native=True)
    assert fe.native is not None
    imu_set = IMUSet(imu_host="127.0.0.1", imu_port=out_port, buffer_len=8)
    imu_set.start_reading()
    fe.native.start()
    rep = DeviceReplayer(ports=in_ports)
    try:
        for slot, pkt in synthetic_device_stream(n_frames=30):
            rep.send(slot, pkt)
        deadline = time.time() + 5.0
        got = False
        while time.time() < deadline:
            fe.step(timeout=0.01)
            q, a = imu_set.get_current_buffer()
            if q.shape[0] >= 1:
                got = True
                break
        assert got, "no frames made it through the native pipeline"
        assert q.shape[1:] == (5, 4)
    finally:
        fe.native.stop()
        fe.native.close()
        imu_set.stop_reading()


def test_serving_udp_batch_roundtrip():
    """ServingUDP.drain validates wire size + finiteness in C and returns
    ids/frames/addr-tokens; send() round-trips the tokens back to the
    source sockets (stream/server.py native serving path)."""
    import struct

    from mobileposer_tpu.native import ServingUDP
    try:
        u = ServingUDP()
    except RuntimeError:
        pytest.skip("native serving UDP unavailable")
    req = struct.Struct("<I60f")
    a = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    b = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        a.bind(("127.0.0.1", 0))
        a.setblocking(False)
        b.bind(("127.0.0.1", 0))
        b.setblocking(False)
        f1 = np.arange(60, dtype=np.float32)
        f2 = f1 * 2
        bad = f1.copy()
        bad[7] = np.nan
        b.sendto(req.pack(7, *f1.tolist()), a.getsockname())
        b.sendto(b"short", a.getsockname())               # wrong size
        b.sendto(req.pack(9, *bad.tolist()), a.getsockname())  # non-finite
        b.sendto(req.pack(8, *f2.tolist()), a.getsockname())
        time.sleep(0.05)
        ids, frames, addrs, rej = u.drain(a.fileno(), 64)
        assert ids.tolist() == [7, 8]
        assert rej == 2
        np.testing.assert_array_equal(frames[0], f1)
        np.testing.assert_array_equal(frames[1], f2)
        # both tokens point at socket b; send two 312-byte replies back
        raw = b"x" * 312 + b"y" * 312
        assert u.send(a.fileno(), raw, 2, 312, addrs) == 2
        time.sleep(0.05)
        got = []
        while True:
            try:
                got.append(b.recvfrom(2048)[0])
            except BlockingIOError:
                break
        assert sorted(g[:1] for g in got) == [b"x", b"y"]
        assert all(len(g) == 312 for g in got)
    finally:
        a.close()
        b.close()
