"""Multi-stream pose inference server.

Serves many concurrent IMU streams from one chip: clients send
`(stream_id, imu60)` datagrams; the server assembles one batch per tick,
advances all streams with a single `forward_online_batched` step (the
batch-major fast path — ~350k frames/s/chip for 256 streams on v5e-1), and
replies to each client with the frame's pose (axis-angle), translation and
contact.

This is the serving-scale counterpart of the single-user live demo
(stream/live.py); the reference has no equivalent (it is a single-user
research pipeline). Wire format (little-endian):

  request:  stream_id:uint32 | imu60:float32[60]            (244 bytes)
  reply:    stream_id:uint32 | pose_aa:float32[72] |
            tran:float32[3] | contact:float32[2]            (312 bytes)

With `wire="f16"` (opt-in) the reply's pose and contact fields are IEEE
half floats and translation stays float32:

  reply16:  stream_id:uint32 | pose_aa:float16[72] |
            tran:float32[3] | contact:float16[2]            (164 bytes)

The cast runs ON DEVICE, so it halves the device->host reply fetch as
well as the UDP egress (1.9x fewer bytes end to end) — the resource
that caps stream count once the serving host's downlink saturates
(measured: 2048 streams x 30 Hz of f32 replies = ~19 MB/s of D2H
against the dev tunnel's ~9.6 MB/s ceiling -> reply_rate 0.29; see
deploy.md §2). Precision: axis-angle components are |x| <= pi, where
f16 rounding is <= 2^-11 relative ~ 0.03 deg — two orders below the
model's accuracy label; contacts are probabilities in [0,1]; the
translation accumulator keeps full f32 because 1.5 cm f16 quantization
past 16 m WOULD be visible (same reason the fusion state is f32).

Streams are slots: the first `max_streams` distinct ids are admitted;
idle slots recycle after `idle_timeout` seconds.
"""

from __future__ import annotations

import os
import queue
import socket
import struct
import threading
import time
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from mobileposer_tpu.kinematics import rotation as R
from mobileposer_tpu.models import MobilePoserNet
from mobileposer_tpu.stream.pacing import Pacer

REQUEST_STRUCT = struct.Struct("<I60f")
REPLY_STRUCT = struct.Struct("<I72f3f2f")
REPLY_STRUCT_F16 = struct.Struct("<I72e3f2e")


class PoseServer:
    """UDP batched-inference server over `forward_online_batched`."""

    def __init__(self, net: MobilePoserNet, params: dict,
                 host: str = "0.0.0.0", port: int = 9000,
                 max_streams: int = 64, tick_hz: float = 30.0,
                 idle_timeout: float = 30.0, mode: str = "exact",
                 mesh=None, pipelined: bool = False,
                 quantize: Optional[str] = None, wire: str = "f32",
                 fetch_workers: int = 1):
        """mode='exact' serves the reference window semantics
        (forward_online_batched); mode='carry' serves the opt-in
        approximation (models/streaming.py) at ~4.5x the throughput —
        validate accuracy on real checkpoints first (docs/parity.md).

        quantize='int8' runs the LSTM matmuls as dynamic-activation W8A8
        on the MXU's double-rate int8 path (ops/quant.py) — in carry mode
        through the quantized cell steps, in exact mode through the int8
        input projections + int8 Pallas window kernels. Opt-in and ships
        with a measured accuracy label (tests/test_quant.py bounds both
        modes on the trained fixture). Applied AFTER any bf16 cast of the
        params (the caller controls that), so dequant scales stay f32.

        pipelined=True overlaps reply transport with the next tick's
        compute: tick() only drains requests and dispatches the device
        step (jax dispatch is asynchronous), while a dedicated fetcher
        thread performs the blocking device->host fetch and sends the UDP
        replies. On tunneled hosts the fetch round trip (~30 ms) is the
        whole tick budget (33.3 ms at 30 Hz) — the synchronous tick pays
        it inline and misses 30 Hz (measured p50 35.5 ms); the pipelined
        tick is a few ms and the server sustains the tick rate as long as
        one fetch round trip fits in a tick period. Reply CONTENT is
        identical to synchronous serving (same device program, same state
        chaining — test-pinned); replies arrive roughly one tick later.
        If the fetcher falls behind, the oldest undelivered tick is
        dropped (real-time poses go stale, counted in stats()).

        mesh: optional 1-D `jax.sharding.Mesh` — the stream slots are
        sharded over its data axis and the parameters replicated, so one
        server scales a serving fleet across every local chip. Carry mode
        partitions via GSPMD (pure XLA); exact mode uses an explicitly-
        partitioned `jax.shard_map` step so the Pallas window kernels
        (float AND int8 — pallas_call has no GSPMD partitioning rule) run
        per-device on local slots, the same pattern as the trainer's
        shard_map DP step. The per-stream forward has no cross-stream ops,
        so neither path inserts collectives; replies agree with
        single-device to <=1e-4, test-pinned — per-shard tiling can move
        low-order bits.

        wire='f16' switches replies to the compact half-float format
        (REPLY_STRUCT_F16, 164 vs 312 bytes; module docstring has the
        precision analysis). The cast runs on device so the reply FETCH
        halves too — choose it when reply bandwidth (host downlink or
        D2H) is the capacity ceiling rather than chip compute.

        fetch_workers (pipelined mode): number of fetcher threads. A
        single fetcher pays one device->host round trip PER TICK
        serially — over a ~30 ms-RTT tunnel that caps the reply pipeline
        at ~1/RTT ticks/s regardless of bandwidth (measured: 1536
        streams at 30 Hz had fetch p50 40 ms > the 33.3 ms budget ->
        reply_rate 0.60 with the D2H link only 77% utilized). Workers
        overlap those round trips (device_get releases the GIL during
        the transfer). Replies stay per-stream FRESH under reordering:
        a tick whose fetch completes after a newer tick has already
        been sent is dropped whole and counted in dropped_replies —
        clients never observe a pose regress. With one worker the
        behavior (and reply order) is exactly the pre-pool serial
        fetcher."""
        self.net = net
        self.mesh = mesh
        if wire not in ("f32", "f16"):
            raise ValueError(f"unknown wire format {wire!r}")
        self.wire = wire
        if quantize not in (None, "int8"):
            raise ValueError(f"unknown quantize {quantize!r}")
        if quantize == "int8":
            from mobileposer_tpu.ops.quant import quantize_params_int8
            params = quantize_params_int8(params)
        self.quantize = quantize
        if mesh is not None and max_streams % mesh.devices.size:
            raise ValueError(
                f"max_streams={max_streams} must divide evenly over the "
                f"{mesh.devices.size}-device mesh")
        if mesh is not None:
            from mobileposer_tpu.parallel import replicate_params
            params = replicate_params(params, mesh)
        else:
            # ONE batched placement: weights loaded from disk are numpy,
            # and a numpy pytree passed to the jitted step re-uploads
            # every leaf on every tick (CLAUDE.md transfer-batching rule)
            params = jax.device_put(params)
        self.params = params
        self.max_streams = max_streams
        self.tick_period = 1.0 / tick_hz
        self.idle_timeout = idle_timeout
        if mode not in ("exact", "carry"):
            raise ValueError(f"unknown serving mode {mode!r}")
        self.mode = mode
        # serve in the weights' dtype: bf16 params with f32 activations
        # would silently promote every op back to f32 — the bf16 win comes
        # from bf16 ACTIVATIONS/LSTM state (2x VPU rate + half the HBM
        # traffic; measured ~1.5x on carry mode, v5e). The state factories
        # keep the fusion accumulators f32 regardless (bf16 translation
        # accumulators quantize then freeze past ~16 m — see
        # init_online_state_batched).
        # first FLOAT leaf: quantized params interleave int8 kernels with
        # float linears/scales, and the streaming state must be float
        self.dtype = next(
            (jnp.dtype(getattr(leaf, "dtype", np.float32))
             for leaf in jax.tree_util.tree_leaves(params)
             if jnp.issubdtype(jnp.dtype(getattr(leaf, "dtype", np.float32)),
                               jnp.floating)), jnp.dtype(jnp.float32))

        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        # the default ~212 KB rcvbuf holds barely ONE 256-stream request
        # burst once the kernel's per-skb truesize (~3x the 244-byte
        # payload) is charged — any tick where the GIL delays the drain
        # drops the next burst wholesale (measured reply_rate 0.65 at
        # 256 streams x 30 Hz). Size both buffers for several bursts.
        for opt in (socket.SO_RCVBUF, socket.SO_SNDBUF):
            try:
                self.sock.setsockopt(socket.SOL_SOCKET, opt, 4 << 20)
            except OSError:
                pass                        # platform cap; keep default
        self.sock.bind((host, port))
        # non-blocking: the drain loop must never stall the serving tick
        self.sock.setblocking(False)
        self.port = self.sock.getsockname()[1]

        # Batched GIL-free UDP syscalls (native/sensor_ingest.cpp
        # udp_drain_requests/udp_send_batch via recvmmsg/sendmmsg): the
        # capacity study (deploy.md §2) measured the per-datagram Python
        # drain/send loops — 2*S syscalls + S struct.unpacks per tick —
        # as the serving ceiling on a 1-core host, NOT device compute.
        # Reply content is identical either way (test-pinned); set
        # MP_NATIVE_UDP=0 to force the pure-Python path. Addresses are
        # opaque uint64 tokens in native mode, tuples in Python mode —
        # never mixed, since the mode is fixed per server.
        self._native_udp = None
        if os.environ.get("MP_NATIVE_UDP", "1") != "0":
            try:
                from mobileposer_tpu.native import ServingUDP
                self._native_udp = ServingUDP()
            except Exception:
                self._native_udp = None
        self.rejected_frames = 0

        # slot state (host side)
        self.slot_of: Dict[int, int] = {}           # stream_id -> slot
        self.id_of: Dict[int, int] = {}             # slot -> stream_id
        self.addr_of: Dict[int, Tuple] = {}         # slot -> last client addr
        self.last_seen = np.zeros(max_streams)
        self.pending = np.zeros((max_streams, 60), np.float32)
        self.has_frame = np.zeros(max_streams, bool)

        # numpy state: no eager device math in the constructor; the first
        # jitted step moves it to the device
        feet = np.asarray(net.feet_pos, np.float32)
        lf = jnp.asarray(feet[0])
        rf = jnp.asarray(feet[1])
        # reply postprocess, one fused jit dispatch: rotation-matrix ->
        # axis-angle, plus the on-device wire casts for wire='f16' (the
        # cast must happen BEFORE the fetch — that is where the bytes are)
        wire_t = jnp.float16 if wire == "f16" else None

        def post(pose, root, contact):
            aa = R.rotation_matrix_to_axis_angle(
                pose.reshape(-1, 3, 3)).reshape(pose.shape[0], 72)
            if wire_t is None:
                return aa, root, contact
            return (aa.astype(wire_t), root.astype(jnp.float32),
                    contact.astype(wire_t))

        self._post = jax.jit(post)
        self._reply_struct = (REPLY_STRUCT if wire == "f32"
                              else REPLY_STRUCT_F16)
        self._reply_dtype = (self._REPLY_DTYPE if wire == "f32"
                             else self._REPLY_DTYPE_F16)
        # device-resident per-slot reset: explicit per-field indexed updates
        # (tick() advances EVERY slot each step, so a claimed slot must be
        # cleared whether it was virgin or recycled; shape heuristics or
        # host round-trips here would corrupt carries / stall ticks)
        if mode == "carry":
            self.states = net.init_carry_state_batched(max_streams,
                                                       dtype=self.dtype)
            self._step = jax.jit(net.forward_carry_batched)

            # carry steps re-derive rings/LSTM carries from scratch while
            # initialized=False, so resetting the flag + fusion anchors
            # (the only un-gated fields) is sufficient; the rest is cleared
            # anyway for hygiene via the gated warm-up.
            def reset(st, slot):
                return st._replace(
                    initialized=st.initialized.at[slot].set(False),
                    last_lfoot=st.last_lfoot.at[slot].set(lf),
                    last_rfoot=st.last_rfoot.at[slot].set(rf),
                    current_root_y=st.current_root_y.at[slot].set(0.0),
                    last_root_pos=st.last_root_pos.at[slot].set(0.0))

            self._reset_fn = jax.jit(reset)
        else:
            self.states = net.init_online_state_batched(max_streams,
                                                        dtype=self.dtype)
            if mesh is not None and mesh.devices.size > 1:
                # Explicitly-partitioned step (jax.shard_map): each device
                # runs the WHOLE per-shard forward on its local slots, so
                # the Pallas window kernels (float and int8 — pallas_call
                # has no GSPMD partitioning rule) compose with multi-chip
                # exact serving exactly like the trainer's
                # make_shard_map_train_step composes them with DP training.
                # The per-stream forward has no cross-stream ops, so there
                # are no collectives and replies match single-device.
                from jax.sharding import PartitionSpec

                from mobileposer_tpu.parallel.mesh import DATA_AXIS
                axes = type(self.states).STREAM_AXES
                state_spec = jax.tree_util.tree_map(
                    lambda ax: PartitionSpec(*([None] * ax + [DATA_AXIS])),
                    axes)
                out_spec = ((PartitionSpec(DATA_AXIS),) * 4, state_spec)
                self._step = jax.jit(jax.shard_map(
                    net.forward_online_batched, mesh=mesh,
                    in_specs=(PartitionSpec(), state_spec,
                              PartitionSpec(DATA_AXIS)),
                    out_specs=out_spec, check_vma=False))
            else:
                self._step = jax.jit(net.forward_online_batched)
            self._reset_fn = jax.jit(lambda st, slot: st._replace(
                imu=st.imu.at[slot].set(0.0),
                initialized=st.initialized.at[slot].set(False),
                vel_h=st.vel_h.at[:, slot].set(0.0),
                vel_c=st.vel_c.at[:, slot].set(0.0),
                last_lfoot=st.last_lfoot.at[slot].set(lf),
                last_rfoot=st.last_rfoot.at[slot].set(rf),
                current_root_y=st.current_root_y.at[slot].set(0.0),
                last_root_pos=st.last_root_pos.at[slot].set(0.0)))

        if mesh is not None:
            # stream axis sharded, fusion scalars replicated; ONE placement
            from jax.sharding import NamedSharding, PartitionSpec

            from mobileposer_tpu.parallel import (DATA_AXIS,
                                                  shard_stream_state)
            self.states = shard_stream_state(self.states, max_streams, mesh)
            self._frame_sharding = NamedSharding(mesh,
                                                 PartitionSpec(DATA_AXIS))
        else:
            self._frame_sharding = None

        self._stop = threading.Event()
        self.frames_served = 0
        # tick-latency ring for SLO observability (stats()); fixed-size so
        # a long-running server never grows host memory
        self._tick_ms = np.zeros(1024, np.float32)
        self._tick_n = 0

        # reply pipeline (pipelined=True): tick() enqueues device arrays +
        # a slot/addr snapshot; fetcher thread(s) device_get and reply
        self.pipelined = pipelined
        if fetch_workers < 1:
            raise ValueError(f"fetch_workers must be >= 1, got {fetch_workers}")
        self.fetch_workers = fetch_workers
        self._drain_deadline = 2.0       # s of post-stop reply flushing
        self._fetch_q: queue.Queue = queue.Queue(maxsize=8)
        self._fetch_ms = np.zeros(1024, np.float32)
        self._fetch_n = 0
        # end-to-end reply lag: tick dispatch -> reply send (the latency a
        # client actually experiences on top of its network path)
        self._lag_ms = np.zeros(1024, np.float32)
        self._lag_n = 0
        self.dropped_replies = 0
        self.fetch_errors = 0
        self._last_fetch_error: Optional[str] = None
        # freshness gate for the worker pool: fetches can complete out of
        # order; only the newest tick may be sent (see class docstring)
        self._dispatch_seq = 0
        self._max_sent_seq = -1
        self._send_lock = threading.Lock()
        self._fetchers: list = []
        if pipelined:
            self._start_fetcher()

    def _start_fetcher(self) -> None:
        self._fetchers = [t for t in self._fetchers if t.is_alive()]
        for _ in range(self.fetch_workers - len(self._fetchers)):
            t = threading.Thread(target=self._fetch_loop, daemon=True)
            t.start()
            self._fetchers.append(t)

    def _fetch_loop(self) -> None:
        """Fetcher thread: one batched device->host fetch per dispatched
        tick, then the UDP replies. Exits only once stopped AND drained,
        so trailing replies are flushed on shutdown.

        The loop must survive transient fetch failures: in synchronous
        mode a device_get error crashes run() visibly, but here a single
        unhandled exception would kill the thread and convert every
        future reply into a silent drop while tick stats stay green. A
        failed tick's replies are dropped and counted; the loop keeps
        serving.

        Shutdown: after stop() the loop flushes queued replies, but only
        for a bounded drain window — with a slow device program the queue
        can hold several seconds of blocking fetches, and a daemon thread
        still inside device_get when the interpreter tears down PJRT
        aborts the process (observed: 'terminate called after throwing an
        instance of' at exit of the int8-exact SLO run). Past the
        deadline the remainder is dropped and counted."""
        stop_seen = None
        while True:
            if self._stop.is_set():
                if stop_seen is None:
                    stop_seen = time.perf_counter()
                if self._fetch_q.empty():
                    break
                if time.perf_counter() - stop_seen > self._drain_deadline:
                    while True:
                        try:
                            self._fetch_q.get_nowait()
                            self.dropped_replies += 1
                        except queue.Empty:
                            break
                    break
            try:
                seq, outs, snapshot = self._fetch_q.get(timeout=0.05)
            except queue.Empty:
                continue
            try:
                t0 = time.perf_counter()
                host = jax.device_get(outs)
                self._fetch_ms[self._fetch_n % self._fetch_ms.size] = (
                    (time.perf_counter() - t0) * 1e3)
                self._fetch_n += 1
                # freshness gate (worker pools): if a NEWER tick's replies
                # already went out while this fetch was in flight, sending
                # now would regress every client's pose — drop it whole.
                # With one worker the queue is FIFO and the gate never
                # fires. The fetch itself runs OUTSIDE the lock (it is the
                # part workers exist to overlap); only gate+send serialize.
                with self._send_lock:
                    if seq <= self._max_sent_seq:
                        self.dropped_replies += 1
                        continue
                    self._max_sent_seq = seq
                    self._send_replies(host, snapshot)
            except Exception as e:           # noqa: BLE001 — must not die
                self.dropped_replies += 1
                self.fetch_errors += 1
                self._last_fetch_error = repr(e)

    def _enqueue_replies(self, outs, snapshot) -> None:
        """Hand a tick's device outputs to the fetcher; if it has fallen
        behind, drop the OLDEST queued tick (a stale real-time pose is
        useless) and count it."""
        seq, self._dispatch_seq = self._dispatch_seq, self._dispatch_seq + 1
        while True:
            try:
                self._fetch_q.put_nowait((seq, outs, snapshot))
                return
            except queue.Full:
                try:
                    self._fetch_q.get_nowait()
                    self.dropped_replies += 1
                except queue.Empty:
                    pass

    # wire-identical to REPLY_STRUCT ("<I72f3f2f", 312 bytes/row): all
    # fields are 4-byte so the packed structured dtype has no padding
    _REPLY_DTYPE = np.dtype([("id", "<u4"), ("pose", "<f4", (72,)),
                             ("tran", "<f4", (3,)), ("contact", "<f4", (2,))])
    assert _REPLY_DTYPE.itemsize == REPLY_STRUCT.size
    # wire-identical to REPLY_STRUCT_F16 ("<I72e3f2e", 164 bytes/row);
    # np.dtype(list-of-fields) is PACKED, and struct '<' is unaligned, so
    # the mixed 2/4-byte fields still line up byte for byte
    _REPLY_DTYPE_F16 = np.dtype([("id", "<u4"), ("pose", "<f2", (72,)),
                                 ("tran", "<f4", (3,)),
                                 ("contact", "<f2", (2,))])
    assert _REPLY_DTYPE_F16.itemsize == REPLY_STRUCT_F16.size

    def _send_replies(self, host_outs, snapshot) -> int:
        """Pack + send one tick's replies. snapshot is ([(slot, stream_id,
        addr)], dispatch_time) captured at dispatch time (slot ownership
        may have changed by fetch time in pipelined mode).

        Packing is one vectorized structured-array assembly, not a
        per-slot struct.pack of 77 python floats: at 256 streams the
        python pack loop cost milliseconds of the 33 ms budget on a
        1-core host (and also casts bf16 outputs to f32 wire floats for
        free via numpy)."""
        entries, t_dispatch = snapshot
        if not entries:
            return 0
        pose_aa, root_np, contact_np = (np.asarray(a) for a in host_outs)
        slots = np.fromiter((e[0] for e in entries), np.int64, len(entries))
        rec = np.empty(len(entries), dtype=self._reply_dtype)
        rec["id"] = np.fromiter((e[1] for e in entries), np.uint32,
                                len(entries))
        rec["pose"] = pose_aa[slots]
        rec["tran"] = root_np[slots]
        rec["contact"] = contact_np[slots]
        raw = rec.tobytes()
        sz = self._reply_struct.size
        if self._native_udp is not None:
            # one GIL-free sendmmsg batch; addrs are the drain's tokens
            tokens = np.fromiter((e[2] for e in entries), np.uint64,
                                 len(entries))
            sent = self._native_udp.send(self.sock.fileno(), raw,
                                         len(entries), sz, tokens)
        else:
            sent = 0
            for i, (_, _, addr) in enumerate(entries):
                try:
                    self.sock.sendto(raw[i * sz:(i + 1) * sz], addr)
                    sent += 1
                except OSError:
                    pass
        self.frames_served += sent
        self._lag_ms[self._lag_n % self._lag_ms.size] = (
            (time.perf_counter() - t_dispatch) * 1e3)
        self._lag_n += 1
        return sent

    # -- slot management ----------------------------------------------------
    def _slot_for(self, stream_id: int) -> Optional[int]:
        slot = self.slot_of.get(stream_id)
        if slot is not None:
            return slot
        now = time.time()
        for s in range(self.max_streams):
            owner = self.id_of.get(s)
            if owner is None or now - self.last_seen[s] > self.idle_timeout:
                if owner is not None:
                    del self.slot_of[owner]
                self.slot_of[stream_id] = s
                self.id_of[s] = stream_id
                # always reset: tick() advances every slot each step, so
                # even a never-owned slot has accumulated state
                self._reset_slot(s)
                return s
        return None                                  # server full

    def _reset_slot(self, slot: int) -> None:
        """Fresh streaming state for a claimed slot (device-resident)."""
        # one batched put on the first claim (numpy init state); a no-op
        # for already-device leaves on later claims
        states = jax.device_put(self.states)
        self.states = self._reset_fn(states, slot)

    # -- main loop ----------------------------------------------------------
    def _drain_requests_native(self) -> int:
        """One GIL-free recvmmsg drain (validation + finite check in C),
        then vectorized slot assembly. Semantics match the Python drain:
        wrong-size / non-finite datagrams rejected, later duplicates of a
        stream win (numpy fancy assignment is in index order), unknown
        streams claim slots via the same _slot_for admission."""
        ids, frames, addrs, rej = self._native_udp.drain(
            self.sock.fileno(), self.max_streams * 4)
        self.rejected_frames += rej
        if ids.size == 0:
            return 0
        now = time.time()
        slots = np.empty(ids.size, np.int64)
        keep = np.zeros(ids.size, bool)
        n = 0
        for i, sid in enumerate(ids.tolist()):
            slot = self._slot_for(sid)
            if slot is None:                         # server full
                continue
            slots[i] = slot
            keep[i] = True
            self.addr_of[slot] = int(addrs[i])       # opaque token
            # stamp immediately: _slot_for's idle recycling reads
            # last_seen, so a slot claimed earlier in THIS loop must not
            # look idle to a later datagram's admission
            self.last_seen[slot] = now
            n += 1
        if n:
            sl = slots[keep]
            self.pending[sl] = frames[keep]
            self.has_frame[sl] = True
        return n

    def _drain_requests(self) -> int:
        if self._native_udp is not None:
            return self._drain_requests_native()
        n = 0
        # hard iteration cap: dropped (malformed/non-finite) datagrams must
        # also count toward the per-tick budget, or a garbage flood could
        # keep this loop spinning and stall tick() for healthy streams
        for _ in range(self.max_streams * 8):
            try:
                data, addr = self.sock.recvfrom(REQUEST_STRUCT.size)
            except (BlockingIOError, socket.timeout):
                break
            except OSError:
                break
            if len(data) != REQUEST_STRUCT.size:
                self.rejected_frames += 1
                continue
            unpacked = REQUEST_STRUCT.unpack(data)
            stream_id = unpacked[0]
            frame = np.asarray(unpacked[1:], np.float32)
            if not np.isfinite(frame).all():
                # a single NaN/inf frame would poison the slot's carried
                # LSTM state until the idle-timeout reset — drop it here
                self.rejected_frames += 1
                continue
            slot = self._slot_for(stream_id)
            if slot is None:
                continue
            self.pending[slot] = frame
            self.has_frame[slot] = True
            self.addr_of[slot] = addr
            self.last_seen[slot] = time.time()
            n += 1
            if n >= self.max_streams * 4:            # bound per tick
                break
        return n

    def tick(self) -> int:
        """One batch step: drain requests, advance all streams, reply.

        Slots without a new frame repeat their last frame (the model's
        sliding window absorbs it); replies only go to slots that sent one.
        Returns the number of replies sent (synchronous) or dispatched
        (pipelined — the fetcher thread sends them after its fetch).
        """
        t0 = time.perf_counter()
        self._drain_requests()
        active = np.nonzero(self.has_frame)[0]
        if active.size == 0:
            return 0
        frames = np.asarray(self.pending, self.dtype)
        if self._frame_sharding is not None:
            frames = jax.device_put(frames, self._frame_sharding)
        (pose, joints, root, contact), self.states = self._step(
            self.params, self.states, jnp.asarray(frames))
        # dispatch-time snapshot: slot ownership can change before the
        # (possibly deferred) fetch completes
        snapshot = ([(int(s), self.id_of[int(s)], self.addr_of[int(s)])
                     for s in active
                     if self.addr_of.get(int(s)) is not None],
                    time.perf_counter())
        # ONE batched fetch for all reply fields: three sequential
        # np.asarray calls cost two extra transport round trips per tick
        # (~60 ms against a 33 ms budget on tunneled devices)
        outs = self._post(pose, root, contact)
        if self.pipelined:
            # jax dispatch is async: `outs` are futures; the fetcher thread
            # pays the transport round trip while this thread starts the
            # next tick. Start the D2H copy NOW (non-blocking): the
            # fetcher's device_get then consumes an already-issued
            # transfer instead of paying a fresh request round trip per
            # tick — with a serial fetcher over a ~30 ms-RTT tunnel that
            # request RTT alone exceeded the 33 ms tick budget (measured
            # fetch p50 47.6 ms -> sustained 25.6 Hz at 256 streams);
            # async-issued copies from successive ticks overlap in flight.
            # ... but ONLY while the fetch pipeline keeps up: when reply
            # bandwidth saturates (measured: 1024 streams x 30 Hz =
            # ~9.5 MB/s of replies = the dev tunnel's whole D2H rate),
            # issuing the copy for EVERY dispatched tick floods the
            # transport with transfers for ticks the drop-oldest policy
            # will discard anyway — fetch latency then grows unboundedly
            # (measured p50 2.9 s, reply_rate 0.01). With the copy gated
            # on backlog, only ticks that will actually be fetched spend
            # transport bandwidth, so overload degrades to a LOWER REPLY
            # RATE of FRESH poses instead of seconds-stale everything.
            # The gate engages at HALF the queue (true saturation), not
            # on the first queued tick: a transient RTT spike briefly
            # queues 1-2 ticks, and skipping their copies turns the blip
            # into a longer episode (an ungated fetch pays the full
            # ~47 ms sync round trip, measured r4).
            if self._fetch_q.qsize() < 4:
                for a in outs:
                    try:
                        a.copy_to_host_async()
                    except (AttributeError, RuntimeError):
                        break                # backend without async copy
            self._enqueue_replies(outs, snapshot)
            sent = len(snapshot[0])
        else:
            sent = self._send_replies(jax.device_get(outs), snapshot)
        self.has_frame[active] = False
        self._tick_ms[self._tick_n % self._tick_ms.size] = (
            (time.perf_counter() - t0) * 1e3)
        self._tick_n += 1
        return sent

    def stats(self) -> dict:
        """Serving SLO snapshot: tick-latency percentiles over the last
        <=1024 active ticks (drain + batch step + replies, end to end;
        the reference's analogue is the PerformanceLogger Hz printout,
        calibration.py:24-58) plus cumulative counters."""
        # The ring is written by the serving thread without a lock: snapshot
        # the count first, then copy the window. The GIL makes each slot
        # write atomic, so at worst ONE in-flight sample is stale — fine
        # for percentile observability, and no lock on the hot tick path.
        n = min(self._tick_n, self._tick_ms.size)
        lat = self._tick_ms[:n].copy() if n else np.zeros(1)
        p50, p90, p99 = np.percentile(lat, [50, 90, 99])
        now = time.time()
        active = sum(1 for slot in self.slot_of.values()
                     if now - self.last_seen[slot] <= self.idle_timeout)
        out = {
            "frames_served": self.frames_served,
            "wire": self.wire,
            "native_udp": self._native_udp is not None,
            "rejected_frames": self.rejected_frames,
            "active_streams": active,
            "ticks_measured": int(n),
            "tick_ms_p50": round(float(p50), 3),
            "tick_ms_p90": round(float(p90), 3),
            "tick_ms_p99": round(float(p99), 3),
            "tick_budget_ms": round(self.tick_period * 1e3, 3),
        }
        if self.pipelined:
            # fetch (reply-transport) latency runs on the fetcher thread;
            # it bounds reply LAG, while tick_ms bounds the serving RATE
            m = min(self._fetch_n, self._fetch_ms.size)
            fl = self._fetch_ms[:m].copy() if m else np.zeros(1)
            f50, f99 = np.percentile(fl, [50, 99])
            k = min(self._lag_n, self._lag_ms.size)
            ll = self._lag_ms[:k].copy() if k else np.zeros(1)
            l50, l99 = np.percentile(ll, [50, 99])
            out.update({
                "pipelined": True,
                "fetch_workers": self.fetch_workers,
                "fetch_ms_p50": round(float(f50), 3),
                "fetch_ms_p99": round(float(f99), 3),
                "reply_lag_ms_p50": round(float(l50), 3),
                "reply_lag_ms_p99": round(float(l99), 3),
                "reply_queue_depth": self._fetch_q.qsize(),
                "dropped_replies": self.dropped_replies,
                "fetch_errors": self.fetch_errors,
                **({"last_fetch_error": self._last_fetch_error}
                   if self._last_fetch_error else {}),
            })
        return out

    def run(self, duration: Optional[float] = None) -> None:
        if self.pipelined:
            self._start_fetcher()
        t0 = time.time()
        # absolute-deadline pacing: relative sleep(period - work) adds
        # every sleep overshoot (timer granularity + GIL contention with
        # the fetcher thread) to the period — measured 27.65 Hz sustained
        # at a 30 Hz target with 25 ms/tick of slack (stream/pacing.py)
        pacer = Pacer(self.tick_period)
        while not self._stop.is_set():
            self.tick()
            if duration is not None and time.time() - t0 > duration:
                break
            pacer.wait()

    def stop(self) -> None:
        self._stop.set()

    def close(self) -> None:
        self._stop.set()
        for t in self._fetchers:
            if t.is_alive():
                # drain deadline + one in-flight fetch; must outlast the
                # fetcher's own exit so no thread is left inside PJRT at
                # interpreter teardown
                t.join(timeout=self._drain_deadline + 8)
        self.sock.close()


class PoseClient:
    """Minimal client for PoseServer (also the test fixture)."""

    def __init__(self, stream_id: int, host: str = "127.0.0.1",
                 port: int = 9000, timeout: float = 2.0, wire: str = "f32"):
        """wire must match the server's reply format ('f32' or 'f16');
        requests are always float32."""
        self.stream_id = stream_id
        self.addr = (host, port)
        if wire not in ("f32", "f16"):
            raise ValueError(f"unknown wire format {wire!r}")
        self._reply_struct = (REPLY_STRUCT if wire == "f32"
                              else REPLY_STRUCT_F16)
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.settimeout(timeout)

    def send_frame(self, imu60: np.ndarray) -> None:
        self.sock.sendto(REQUEST_STRUCT.pack(
            self.stream_id, *np.asarray(imu60, np.float32).tolist()),
            self.addr)

    def recv_pose(self):
        """(pose_aa [72], tran [3], contact [2]) or None on timeout."""
        try:
            data, _ = self.sock.recvfrom(self._reply_struct.size)
        except socket.timeout:
            return None
        u = self._reply_struct.unpack(data)
        assert u[0] == self.stream_id
        vals = np.asarray(u[1:], np.float32)
        return vals[:72], vals[72:75], vals[75:77]

    def close(self) -> None:
        self.sock.close()
