"""Multi-client pose inference server over loopback UDP."""

import socket
import threading
import time

import numpy as np
import pytest

import jax

from mobileposer_tpu.kinematics import ParametricModel
from mobileposer_tpu.models import MobilePoserNet, init_all_modules
from mobileposer_tpu.stream import PoseClient, PoseServer


@pytest.fixture(scope="module")
def server():
    body = ParametricModel.synthetic(num_vertices=240)
    net = MobilePoserNet(body)
    params = init_all_modules(jax.random.PRNGKey(0))
    srv = PoseServer(net, params, host="127.0.0.1", port=0, max_streams=8,
                     tick_hz=120.0)
    thread = threading.Thread(target=srv.run, daemon=True)
    thread.start()
    yield srv
    srv.stop()
    thread.join(timeout=5)
    srv.close()


def test_multi_client_round_trip(server):
    rng = np.random.RandomState(0)
    clients = [PoseClient(stream_id=100 + i, port=server.port)
               for i in range(3)]
    try:
        replies = {c.stream_id: 0 for c in clients}
        for step in range(5):
            for c in clients:
                c.send_frame(rng.randn(60).astype(np.float32) * 0.1)
            for c in clients:
                out = c.recv_pose()
                if out is None:
                    continue
                pose_aa, tran, contact = out
                assert pose_aa.shape == (72,)
                assert np.all(np.isfinite(pose_aa))
                assert np.all(np.isfinite(tran))
                replies[c.stream_id] += 1
        # every client must have gotten most replies back
        assert all(v >= 3 for v in replies.values()), replies
        assert server.frames_served >= 9
    finally:
        for c in clients:
            c.close()


def test_stream_state_isolation(server):
    """Two streams fed different data must produce different outputs; the
    same stream fed twice advances its own state."""
    a = PoseClient(stream_id=200, port=server.port)
    b = PoseClient(stream_id=201, port=server.port)
    try:
        rng = np.random.RandomState(1)
        fa = rng.randn(60).astype(np.float32) * 0.1
        fb = rng.randn(60).astype(np.float32) * 0.1
        a.send_frame(fa)
        b.send_frame(fb)
        pa = a.recv_pose()
        pb = b.recv_pose()
        assert pa is not None and pb is not None
        assert not np.allclose(pa[0], pb[0])
    finally:
        a.close()
        b.close()


def test_server_full_rejects_gracefully(server):
    """Streams beyond capacity are ignored; admitted streams keep working.

    The module server has 8 slots; earlier tests used 5 (ids 100-102,
    200-201). Fill the remaining 3, then a 9th stream must get no slot
    while an existing stream still gets replies."""
    extras = [PoseClient(stream_id=300 + i, port=server.port, timeout=0.5)
              for i in range(4)]                      # 3 fit, 1 over capacity
    try:
        for c in extras:
            c.send_frame(np.zeros(60, np.float32))
        got = sum(1 for c in extras if c.recv_pose() is not None)
        assert got <= 3
        probe = PoseClient(stream_id=200, port=server.port)
        probe.send_frame(np.zeros(60, np.float32))
        assert probe.recv_pose() is not None
        probe.close()
    finally:
        for c in extras:
            c.close()


def test_late_join_gets_fresh_state():
    """A stream claiming a slot after the server has been ticking must see
    a freshly-initialized state (first frame broadcast into the window),
    not state accumulated by idle ticks."""
    import jax.numpy as jnp
    body = ParametricModel.synthetic(num_vertices=240)
    net = MobilePoserNet(body)
    params = init_all_modules(jax.random.PRNGKey(1))
    server = PoseServer(net, params, host="127.0.0.1", port=0,
                        max_streams=2, tick_hz=120.0)
    thread = threading.Thread(target=server.run, daemon=True)
    thread.start()
    # let the server tick a while with other streams active
    warm = PoseClient(stream_id=400, port=server.port)
    try:
        for _ in range(8):
            warm.send_frame(np.zeros(60, np.float32))
            warm.recv_pose()
        late = PoseClient(stream_id=401, port=server.port)
        try:
            frame = np.random.RandomState(5).randn(60).astype(np.float32) * 0.1
            late.send_frame(frame)
            out = late.recv_pose()
            assert out is not None
            pose_aa, tran, contact = out
            # reference behavior for a fresh stream's first frame
            state = server.net.init_online_state()
            (pose_ref, _, root_ref, _), _ = server.net.forward_online(
                server.params, state, jnp.asarray(frame))
            from mobileposer_tpu.kinematics import rotation as R
            ref_aa = np.asarray(R.rotation_matrix_to_axis_angle(
                pose_ref)).reshape(72)
            np.testing.assert_allclose(pose_aa, ref_aa, atol=1e-3)
            np.testing.assert_allclose(tran, np.asarray(root_ref), atol=1e-3)
        finally:
            late.close()
    finally:
        warm.close()
        server.stop()
        thread.join(timeout=5)
        server.close()


def test_carry_mode_server_round_trip():
    """Carry-mode serving (mode='carry'): round trips + slot recycling."""
    body = ParametricModel.synthetic(num_vertices=240)
    net = MobilePoserNet(body)
    params = init_all_modules(jax.random.PRNGKey(0))
    srv = PoseServer(net, params, host="127.0.0.1", port=0, max_streams=4,
                     tick_hz=120.0, mode="carry")
    thread = threading.Thread(target=srv.run, daemon=True)
    thread.start()
    rng = np.random.RandomState(1)
    client = PoseClient(stream_id=7, port=srv.port)
    try:
        # deadline-based: the first ticks can lag by seconds of jit compile
        # on a contended 1-core host, so count successes until we have
        # enough rather than expecting a fixed hit rate
        got = 0
        deadline = time.time() + 30.0
        while got < 3 and time.time() < deadline:
            client.send_frame(rng.randn(60).astype(np.float32) * 0.1)
            out = client.recv_pose()
            if out is not None:
                pose_aa, tran, contact = out
                assert np.all(np.isfinite(pose_aa))
                assert np.all(np.isfinite(tran))
                got += 1
        assert got >= 3
        # slot reset path: claim a fresh stream id, must also round-trip
        c2 = PoseClient(stream_id=8, port=srv.port)
        c2.send_frame(rng.randn(60).astype(np.float32) * 0.1)
        assert c2.recv_pose() is not None
        c2.close()
        # SLO snapshot: latency percentiles over the measured ticks
        stats = srv.stats()
        assert stats["frames_served"] >= got
        assert stats["ticks_measured"] > 0
        assert 0 < stats["tick_ms_p50"] <= stats["tick_ms_p99"]
    finally:
        client.close()
        srv.stop()
        thread.join(timeout=5)
        srv.close()


def test_server_rejects_unknown_mode():
    body = ParametricModel.synthetic(num_vertices=48)
    net = MobilePoserNet(body)
    params = init_all_modules(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        PoseServer(net, params, host="127.0.0.1", port=0, mode="bogus")


def test_bf16_carry_server_round_trip():
    """--carry --bf16 composition: bf16 weights imply bf16 state/frames
    (the throughput configuration); replies stay finite f32."""
    import jax.numpy as jnp
    from mobileposer_tpu.nn import cast_params
    body = ParametricModel.synthetic(num_vertices=240)
    net = MobilePoserNet(body)
    params = cast_params(init_all_modules(jax.random.PRNGKey(0)),
                         jnp.bfloat16)
    srv = PoseServer(net, params, host="127.0.0.1", port=0, max_streams=2,
                     tick_hz=120.0, mode="carry")
    assert srv.dtype == jnp.bfloat16
    thread = threading.Thread(target=srv.run, daemon=True)
    thread.start()
    # generous timeout: the first tick compiles the bf16 program
    client = PoseClient(stream_id=3, port=srv.port, timeout=60.0)
    try:
        got = 0
        rng = np.random.RandomState(2)
        for _ in range(5):
            client.send_frame(rng.randn(60).astype(np.float32) * 0.1)
            out = client.recv_pose()
            if out is not None:
                assert np.all(np.isfinite(out[0]))
                got += 1
        assert got >= 3
    finally:
        client.close()
        srv.stop()
        thread.join(timeout=5)
        srv.close()


def test_nonfinite_frames_dropped():
    """A NaN/inf payload must be dropped at ingestion (it would poison the
    slot's carried LSTM state until the idle-timeout reset); the healthy
    stream keeps getting finite replies."""
    body = ParametricModel.synthetic(num_vertices=240)
    net = MobilePoserNet(body)
    params = init_all_modules(jax.random.PRNGKey(0))
    srv = PoseServer(net, params, host="127.0.0.1", port=0, max_streams=4,
                     tick_hz=120.0)
    thread = threading.Thread(target=srv.run, daemon=True)
    thread.start()
    rng = np.random.RandomState(7)
    good = PoseClient(stream_id=700, port=srv.port)
    bad = PoseClient(stream_id=701, port=srv.port)
    try:
        # compile-tolerant warmup (the other server tests all have one):
        # the first tick's jit can take many seconds on a loaded 1-core
        # host, which would eat every 2 s recv timeout below
        good.send_frame(rng.randn(60).astype(np.float32) * 0.1)
        r = None
        deadline = time.time() + 120
        while r is None and time.time() < deadline:
            r = good.recv_pose()
        assert r is not None, "no reply after warmup/compile window"
        nan_frame = np.full(60, np.nan, np.float32)
        good_replies = 0
        for _ in range(6):
            bad.send_frame(nan_frame)
            good.send_frame(rng.randn(60).astype(np.float32) * 0.1)
            r = good.recv_pose()
            if r is not None:
                good_replies += 1
                pose_aa, tran, contact = r
                assert np.isfinite(pose_aa).all()
                assert np.isfinite(tran).all()
        assert good_replies >= 3
        # the NaN sender's frames were dropped: no reply ever goes out
        bad.sock.settimeout(0.2)
        assert bad.recv_pose() is None
    finally:
        good.close()
        bad.close()
        srv.stop()
        thread.join(timeout=5)
        srv.close()


def test_sharded_server_matches_unsharded():
    """A serving fleet sharded over the 8-device mesh (PoseServer(mesh=...))
    replies identically to the single-device server: the per-stream forward
    has no cross-stream ops, so GSPMD only spreads the slots."""
    from mobileposer_tpu.parallel import make_mesh
    body = ParametricModel.synthetic(num_vertices=240)
    net = MobilePoserNet(body)
    params = init_all_modules(jax.random.PRNGKey(0))
    mesh = make_mesh()
    assert mesh.devices.size == 8
    rng = np.random.RandomState(3)
    frames = [rng.randn(60).astype(np.float32) * 0.1 for _ in range(4)]
    replies = {}
    for name, m in [("single", None), ("sharded", mesh)]:
        srv = PoseServer(net, params, host="127.0.0.1", port=0,
                         max_streams=8, tick_hz=240.0, mesh=m)
        thread = threading.Thread(target=srv.run, daemon=True)
        thread.start()
        client = PoseClient(stream_id=7, port=srv.port)
        try:
            out = []
            for f in frames:
                client.send_frame(f)
                r = None
                deadline = time.time() + 120          # first tick compiles
                while r is None and time.time() < deadline:
                    r = client.recv_pose()
                assert r is not None, f"{name}: no reply"
                out.append(np.concatenate(r))
            replies[name] = np.stack(out)
        finally:
            client.close()
            srv.stop()
            thread.join(timeout=10)
            srv.close()
    np.testing.assert_allclose(replies["sharded"], replies["single"],
                               atol=1e-4)


def test_sharded_int8_exact_server_matches_unsharded():
    """exact + int8 + mesh: the shard_map exact step runs the int8 path
    per-device on local slots, so a sharded int8 fleet replies identically
    to the single-device int8 server (on CPU both route through the XLA
    int8 scan; on TPU the per-device program is the int8 Pallas kernels,
    which agree bit-for-bit — tests/test_quant.py)."""
    from mobileposer_tpu.parallel import make_mesh
    body = ParametricModel.synthetic(num_vertices=240)
    net = MobilePoserNet(body)
    params = init_all_modules(jax.random.PRNGKey(0))
    mesh = make_mesh()
    assert mesh.devices.size == 8
    rng = np.random.RandomState(5)
    frames = [rng.randn(60).astype(np.float32) * 0.1 for _ in range(3)]
    replies = {}
    for name, m in [("single", None), ("sharded", mesh)]:
        srv = PoseServer(net, params, host="127.0.0.1", port=0,
                         max_streams=8, tick_hz=240.0, mode="exact",
                         quantize="int8", mesh=m)
        thread = threading.Thread(target=srv.run, daemon=True)
        thread.start()
        client = PoseClient(stream_id=4, port=srv.port)
        try:
            out = []
            for f in frames:
                client.send_frame(f)
                r = None
                deadline = time.time() + 120          # first tick compiles
                while r is None and time.time() < deadline:
                    r = client.recv_pose()
                assert r is not None, f"{name}: no reply"
                out.append(np.concatenate(r))
            replies[name] = np.stack(out)
        finally:
            client.close()
            srv.stop()
            thread.join(timeout=10)
            srv.close()
    np.testing.assert_allclose(replies["sharded"], replies["single"],
                               atol=1e-4)


def test_pipelined_replies_match_synchronous():
    """pipelined=True must change WHEN replies arrive, never WHAT they
    contain: the device program and state chaining are identical, so a
    lockstep client (send frame k, wait for its reply, send k+1) gets
    bitwise-identical replies from both servers."""
    body = ParametricModel.synthetic(num_vertices=240)
    net = MobilePoserNet(body)
    params = init_all_modules(jax.random.PRNGKey(0))
    rng = np.random.RandomState(11)
    frames = [rng.randn(60).astype(np.float32) * 0.1 for _ in range(6)]
    replies = {}
    for name, pipelined in [("sync", False), ("pipelined", True)]:
        srv = PoseServer(net, params, host="127.0.0.1", port=0,
                         max_streams=4, tick_hz=240.0, pipelined=pipelined)
        thread = threading.Thread(target=srv.run, daemon=True)
        thread.start()
        client = PoseClient(stream_id=9, port=srv.port)
        try:
            out = []
            for f in frames:
                client.send_frame(f)
                r = None
                deadline = time.time() + 60           # first tick compiles
                while r is None and time.time() < deadline:
                    r = client.recv_pose()
                assert r is not None, f"{name}: no reply"
                out.append(np.concatenate(r))
            replies[name] = np.stack(out)
            if pipelined:
                stats = srv.stats()
                assert stats["pipelined"] is True
                assert stats["dropped_replies"] == 0
                assert stats["fetch_ms_p50"] >= 0
                # end-to-end reply lag (dispatch -> send) is observable
                assert stats["reply_lag_ms_p99"] >= stats["reply_lag_ms_p50"] >= 0
        finally:
            client.close()
            srv.stop()
            thread.join(timeout=10)
            srv.close()
    np.testing.assert_array_equal(replies["pipelined"], replies["sync"])


def test_pipelined_fetcher_survives_fetch_errors(monkeypatch):
    """A transient device_get failure (e.g. a tunnel hiccup) must not kill
    the fetcher thread: the failed tick's replies are dropped and counted,
    and the NEXT tick's replies still go out."""
    body = ParametricModel.synthetic(num_vertices=240)
    net = MobilePoserNet(body)
    params = init_all_modules(jax.random.PRNGKey(0))
    srv = PoseServer(net, params, host="127.0.0.1", port=0, max_streams=2,
                     tick_hz=240.0, pipelined=True)
    client = PoseClient(stream_id=4, port=srv.port, timeout=30.0)
    try:
        # first tick: fetch blows up inside the fetcher thread
        import mobileposer_tpu.stream.server as server_mod
        real_get = server_mod.jax.device_get
        calls = {"n": 0}

        def flaky_get(x):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("simulated transport failure")
            return real_get(x)

        monkeypatch.setattr(server_mod.jax, "device_get", flaky_get)
        client.send_frame(np.zeros(60, np.float32))
        srv.tick()
        deadline = time.time() + 30
        while srv.fetch_errors == 0 and time.time() < deadline:
            time.sleep(0.01)
        assert srv.fetch_errors == 1
        assert any(t.is_alive() for t in srv._fetchers)
        # second tick: delivery works again
        client.sock.settimeout(0.5)
        assert client.recv_pose() is None          # first reply was dropped
        client.sock.settimeout(30.0)
        client.send_frame(np.zeros(60, np.float32))
        srv.tick()
        assert client.recv_pose() is not None
        stats = srv.stats()
        assert stats["fetch_errors"] == 1
        assert "simulated transport failure" in stats["last_fetch_error"]
        assert stats["dropped_replies"] >= 1
    finally:
        client.close()
        srv.stop()
        srv.close()


def test_pipelined_flushes_on_close():
    """Replies dispatched but not yet fetched must still go out when the
    server shuts down (close() joins the fetcher after it drains)."""
    body = ParametricModel.synthetic(num_vertices=240)
    net = MobilePoserNet(body)
    params = init_all_modules(jax.random.PRNGKey(0))
    srv = PoseServer(net, params, host="127.0.0.1", port=0, max_streams=2,
                     tick_hz=240.0, pipelined=True)
    client = PoseClient(stream_id=5, port=srv.port, timeout=60.0)
    try:
        client.send_frame(np.zeros(60, np.float32))
        # drain + dispatch happen on this thread; the reply is queued for
        # the fetcher which may not have run yet when we stop
        srv.tick()
        srv.stop()
        srv.close()
        assert client.recv_pose() is not None
    finally:
        client.close()


def test_sharded_server_rejects_uneven_slots():
    from mobileposer_tpu.parallel import make_mesh
    body = ParametricModel.synthetic(num_vertices=240)
    net = MobilePoserNet(body)
    params = init_all_modules(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="divide"):
        PoseServer(net, params, host="127.0.0.1", port=0, max_streams=5,
                   mesh=make_mesh())


def test_native_udp_replies_match_python(monkeypatch):
    """The batched recvmmsg/sendmmsg serving path (native/sensor_ingest
    udp_*) must change only HOW datagrams move, never reply content: a
    lockstep client gets bitwise-identical replies from a native-UDP
    server and a MP_NATIVE_UDP=0 pure-Python server."""
    body = ParametricModel.synthetic(num_vertices=240)
    net = MobilePoserNet(body)
    params = init_all_modules(jax.random.PRNGKey(0))
    rng = np.random.RandomState(17)
    frames = [rng.randn(60).astype(np.float32) * 0.1 for _ in range(5)]
    replies = {}
    for name, env in [("python", "0"), ("native", "1")]:
        monkeypatch.setenv("MP_NATIVE_UDP", env)
        srv = PoseServer(net, params, host="127.0.0.1", port=0,
                         max_streams=4, tick_hz=240.0)
        if name == "native" and srv._native_udp is None:
            srv.close()
            pytest.skip("native serving UDP unavailable")
        assert (srv._native_udp is not None) == (name == "native")
        thread = threading.Thread(target=srv.run, daemon=True)
        thread.start()
        client = PoseClient(stream_id=3, port=srv.port)
        try:
            out = []
            for f in frames:
                client.send_frame(f)
                r = None
                deadline = time.time() + 60           # first tick compiles
                while r is None and time.time() < deadline:
                    r = client.recv_pose()
                assert r is not None, f"{name}: no reply"
                out.append(np.concatenate(r))
            replies[name] = np.stack(out)
        finally:
            client.close()
            srv.stop()
            thread.join(timeout=10)
            srv.close()
    np.testing.assert_array_equal(replies["native"], replies["python"])


def test_native_udp_rejects_malformed_and_nonfinite():
    """The C-side validation must reject exactly what the Python drain
    rejects — wrong-size datagrams and non-finite frames — and count them
    in stats()['rejected_frames'] without poisoning any stream slot."""
    body = ParametricModel.synthetic(num_vertices=240)
    net = MobilePoserNet(body)
    params = init_all_modules(jax.random.PRNGKey(0))
    srv = PoseServer(net, params, host="127.0.0.1", port=0, max_streams=4,
                     tick_hz=240.0)
    if srv._native_udp is None:
        srv.close()
        pytest.skip("native serving UDP unavailable")
    client = PoseClient(stream_id=21, port=srv.port, timeout=60.0)
    raw = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        addr = ("127.0.0.1", srv.port)
        raw.sendto(b"garbage", addr)
        bad = np.zeros(60, np.float32)
        bad[0] = np.inf
        from mobileposer_tpu.stream.server import REQUEST_STRUCT
        raw.sendto(REQUEST_STRUCT.pack(21, *bad.tolist()), addr)
        client.send_frame(np.zeros(60, np.float32))   # the one valid frame
        time.sleep(0.05)
        srv.tick()
        r = client.recv_pose()
        assert r is not None
        assert np.all(np.isfinite(np.concatenate(r)))
        assert srv.stats()["rejected_frames"] == 2
        assert srv.stats()["native_udp"] is True
    finally:
        raw.close()
        client.close()
        srv.stop()
        srv.close()


def test_f16_wire_replies_match_f32_within_half_precision():
    """wire='f16' must change the reply ENCODING, never the computation:
    a lockstep client sees the same poses as the f32-wire server to
    within one half-float ulp (pose/contact), and the translation —
    deliberately kept f32 on the wire because f16 quantizes 1.5 cm past
    16 m — must match bitwise. Also pins the 164-byte compact layout
    (REPLY_STRUCT_F16 vs the structured dtype the send path packs with)."""
    from mobileposer_tpu.stream.server import REPLY_STRUCT_F16, PoseServer as S

    assert REPLY_STRUCT_F16.size == 164
    assert S._REPLY_DTYPE_F16.itemsize == REPLY_STRUCT_F16.size

    body = ParametricModel.synthetic(num_vertices=240)
    net = MobilePoserNet(body)
    params = init_all_modules(jax.random.PRNGKey(0))
    rng = np.random.RandomState(17)
    frames = [rng.randn(60).astype(np.float32) * 0.1 for _ in range(5)]
    replies = {}
    for wire in ("f32", "f16"):
        srv = PoseServer(net, params, host="127.0.0.1", port=0,
                         max_streams=4, tick_hz=240.0, wire=wire)
        thread = threading.Thread(target=srv.run, daemon=True)
        thread.start()
        client = PoseClient(stream_id=5, port=srv.port, wire=wire)
        try:
            out = []
            for f in frames:
                client.send_frame(f)
                r = None
                deadline = time.time() + 60           # first tick compiles
                while r is None and time.time() < deadline:
                    r = client.recv_pose()
                assert r is not None, f"wire={wire}: no reply"
                out.append(r)
            replies[wire] = out
            assert srv.stats()["wire"] == wire
        finally:
            client.close()
            srv.stop()
            thread.join(timeout=10)
            srv.close()
    for (p32, t32, c32), (p16, t16, c16) in zip(replies["f32"],
                                                replies["f16"]):
        # axis-angle components are bounded by pi: one f16 ulp there is
        # pi * 2^-11 ~ 1.5e-3 (~0.09 deg worst case)
        np.testing.assert_allclose(p16, p32, atol=2e-3)
        np.testing.assert_array_equal(t16, t32)       # tran stays f32
        np.testing.assert_allclose(c16, c32, atol=1e-3)


def test_wire_format_validation():
    body = ParametricModel.synthetic(num_vertices=240)
    net = MobilePoserNet(body)
    params = init_all_modules(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="wire"):
        PoseServer(net, params, host="127.0.0.1", port=0, wire="f8")
    with pytest.raises(ValueError, match="wire"):
        PoseClient(stream_id=1, wire="f64")


def test_fetch_worker_pool_replies_match_synchronous():
    """A fetcher POOL must preserve reply content and per-stream freshness:
    a lockstep client (send, wait, send) gets bitwise-identical replies
    from a 4-worker pipelined server and a synchronous one — lockstep
    means ticks can never complete out of order, so the freshness gate
    must not fire and nothing may be dropped."""
    body = ParametricModel.synthetic(num_vertices=240)
    net = MobilePoserNet(body)
    params = init_all_modules(jax.random.PRNGKey(0))
    rng = np.random.RandomState(23)
    frames = [rng.randn(60).astype(np.float32) * 0.1 for _ in range(6)]
    replies = {}
    for name, kwargs in [("sync", dict(pipelined=False)),
                         ("pool", dict(pipelined=True, fetch_workers=4))]:
        srv = PoseServer(net, params, host="127.0.0.1", port=0,
                         max_streams=4, tick_hz=240.0, **kwargs)
        thread = threading.Thread(target=srv.run, daemon=True)
        thread.start()
        client = PoseClient(stream_id=7, port=srv.port)
        try:
            out = []
            for f in frames:
                client.send_frame(f)
                r = None
                deadline = time.time() + 60           # first tick compiles
                while r is None and time.time() < deadline:
                    r = client.recv_pose()
                assert r is not None, f"{name}: no reply"
                out.append(np.concatenate(r))
            replies[name] = np.stack(out)
            if kwargs.get("pipelined"):
                stats = srv.stats()
                assert stats["fetch_workers"] == 4
                assert stats["dropped_replies"] == 0
                assert len(srv._fetchers) == 4
                assert all(t.is_alive() for t in srv._fetchers)
        finally:
            client.close()
            srv.stop()
            thread.join(timeout=10)
            srv.close()
    np.testing.assert_array_equal(replies["pool"], replies["sync"])


def test_fetch_freshness_gate_drops_stale_tick():
    """If a tick's fetch completes AFTER a newer tick's replies were
    already sent, the stale tick must be dropped whole (clients never see
    a pose regress). Simulated by stalling the first tick's device_get."""
    import mobileposer_tpu.stream.server as server_mod

    body = ParametricModel.synthetic(num_vertices=240)
    net = MobilePoserNet(body)
    params = init_all_modules(jax.random.PRNGKey(0))
    srv = PoseServer(net, params, host="127.0.0.1", port=0, max_streams=2,
                     tick_hz=240.0, pipelined=True, fetch_workers=2)
    client = PoseClient(stream_id=2, port=srv.port, timeout=60.0)
    real_get = server_mod.jax.device_get
    first_entered = threading.Event()
    release_first = threading.Event()
    calls = {"n": 0}

    def stalling_get(x):
        calls["n"] += 1
        if calls["n"] == 1:
            first_entered.set()
            release_first.wait(timeout=30)
        return real_get(x)

    try:
        # compile path first (device_get untouched): one clean round trip
        client.send_frame(np.zeros(60, np.float32))
        srv.tick()
        assert client.recv_pose() is not None

        server_mod.jax.device_get = stalling_get
        # tick A: its fetch stalls inside worker 1
        client.send_frame(np.ones(60, np.float32) * 0.01)
        srv.tick()
        assert first_entered.wait(timeout=30)
        # tick B: worker 2 fetches and sends while A is still stalled
        client.send_frame(np.ones(60, np.float32) * 0.02)
        srv.tick()
        rB = client.recv_pose()
        assert rB is not None
        dropped_before = srv.dropped_replies
        release_first.set()                        # A completes late
        deadline = time.time() + 30
        while srv.dropped_replies == dropped_before and time.time() < deadline:
            time.sleep(0.01)
        assert srv.dropped_replies == dropped_before + 1
        client.sock.settimeout(0.5)
        assert client.recv_pose() is None          # A was never delivered
    finally:
        server_mod.jax.device_get = real_get
        release_first.set()
        client.close()
        srv.stop()
        srv.close()


def test_fetch_workers_validation():
    body = ParametricModel.synthetic(num_vertices=240)
    net = MobilePoserNet(body)
    params = init_all_modules(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="fetch_workers"):
        PoseServer(net, params, host="127.0.0.1", port=0, fetch_workers=0)
