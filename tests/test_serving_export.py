"""AOT serving bundles (mobileposer_tpu/serving.py): export, reload, and
numerical agreement with the live (traced) step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mobileposer_tpu.kinematics import ParametricModel
from mobileposer_tpu.models import MobilePoserNet, init_all_modules
from mobileposer_tpu.serving import (export_streaming_step, load_bundle,
                                     save_bundle)


@pytest.fixture(scope="module")
def net():
    return MobilePoserNet(ParametricModel.synthetic(num_vertices=240))


@pytest.fixture(scope="module")
def params():
    return init_all_modules(jax.random.PRNGKey(0))


def _tree_allclose(a, b, atol):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32), atol=atol)


@pytest.mark.parametrize("mode", ["carry", "exact"])
def test_exported_step_matches_live(net, params, mode):
    S = 3
    exported = export_streaming_step(net, params, S, mode=mode,
                                     platforms=("cpu",))
    if mode == "carry":
        state = jax.tree_util.tree_map(jnp.asarray,
                                       net.init_carry_state_batched(S))
        live = jax.jit(net.forward_carry_batched)
    else:
        state = jax.tree_util.tree_map(jnp.asarray,
                                       net.init_online_state_batched(S))
        live = jax.jit(net.forward_online_batched)
    frames = jax.random.normal(jax.random.PRNGKey(1), (S, 60)) * 0.1

    out_live, st_live = live(params, state, frames)
    out_aot, st_aot = exported.call(params, state, frames)
    _tree_allclose(out_aot, out_live, atol=1e-6)
    _tree_allclose(st_aot, st_live, atol=1e-6)


def test_bundle_round_trip(net, params, tmp_path):
    """serialize -> bytes on disk -> deserialize -> multi-step streaming
    agrees with the live path, including state threading."""
    S, N = 2, 5
    save_bundle(tmp_path / "b", net, params, n_streams=S, mode="carry",
                platforms=("cpu",))
    step, p, st, meta = load_bundle(tmp_path / "b")
    assert meta["mode"] == "carry" and meta["n_streams"] == S

    live = jax.jit(net.forward_carry_batched)
    st_live = jax.tree_util.tree_map(jnp.asarray,
                                     net.init_carry_state_batched(S))
    rng = np.random.RandomState(0)
    for _ in range(N):
        frames = rng.randn(S, 60).astype(np.float32) * 0.1
        out_aot, st = step(p, st, frames)
        out_live, st_live = live(params, st_live, jnp.asarray(frames))
        _tree_allclose(out_aot, out_live, atol=1e-6)


@pytest.mark.parametrize("mode", ["carry", "exact"])
def test_bf16_bundle_round_trip(net, params, tmp_path, mode):
    """bf16 bundles must survive the npz round trip: numpy saves ml_dtypes
    bfloat16 as raw void arrays, so leaves ride as uint16 bit patterns
    with a dtype manifest."""
    from mobileposer_tpu.nn import cast_params
    S = 2
    params_bf = cast_params(params, jnp.bfloat16)
    save_bundle(tmp_path / "b16", net, params_bf, n_streams=S, mode=mode,
                dtype=jnp.bfloat16, platforms=("cpu",))
    step, p, st, meta = load_bundle(tmp_path / "b16")
    assert meta["dtype"] == "bfloat16"
    assert jnp.dtype(p["joints"]["linear1"]["w"].dtype) == jnp.bfloat16
    window = st.imu_ring if mode == "carry" else st.imu
    assert jnp.dtype(window.dtype) == jnp.bfloat16
    assert jnp.dtype(st.last_root_pos.dtype) == jnp.float32  # accumulators
    frames = np.zeros((S, 60), np.dtype(str(jnp.dtype(jnp.bfloat16))))
    (pose, joints, root, contact), st2 = step(p, st, frames)
    assert np.isfinite(np.asarray(pose, np.float32)).all()
    # and the reloaded weights equal the originals bit-for-bit
    for a, b in zip(jax.tree_util.tree_leaves(p),
                    jax.tree_util.tree_leaves(params_bf)):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_int8_bundle_round_trip(net, params, tmp_path):
    """quantize='int8' bakes the W8A8 carry program (ops/quant.py) into
    the artifact: int8 kernels survive the npz round trip, the StableHLO
    contains the quantized matmuls, and the reloaded step agrees with the
    live quantized step including state threading."""
    from mobileposer_tpu.ops.quant import quantize_params_int8
    S, N = 2, 4
    save_bundle(tmp_path / "b8", net, params, n_streams=S, mode="carry",
                platforms=("cpu",), quantize="int8")
    step, p, st, meta = load_bundle(tmp_path / "b8")
    assert meta["quantize"] == "int8"
    d = p["joints"]["lstm"][0]["fwd"]
    assert np.asarray(d["w_ih"]).dtype == np.int8
    assert np.asarray(d["w_ih_scale"]).dtype == np.float32

    params_q = quantize_params_int8(params)
    live = jax.jit(net.forward_carry_batched)
    st_live = jax.tree_util.tree_map(jnp.asarray,
                                     net.init_carry_state_batched(S))
    rng = np.random.RandomState(3)
    for _ in range(N):
        frames = rng.randn(S, 60).astype(np.float32) * 0.1
        out_aot, st = step(p, st, frames)
        out_live, st_live = live(params_q, st_live, jnp.asarray(frames))
        _tree_allclose(out_aot, out_live, atol=1e-6)
    # int8 kernels ship ~4x smaller than f32 (scales are a rounding error)
    from mobileposer_tpu.serving import _WEIGHTS_FILE
    import os
    q_size = os.path.getsize(tmp_path / "b8" / _WEIGHTS_FILE)
    save_bundle(tmp_path / "bf", net, params, n_streams=S, mode="carry",
                platforms=("cpu",))
    f_size = os.path.getsize(tmp_path / "bf" / _WEIGHTS_FILE)
    assert q_size < 0.45 * f_size, (q_size, f_size)


def test_int8_exact_bundle_round_trip(net, params, tmp_path):
    """quantize='int8' also bakes the W8A8 EXACT windowed program (the
    int8 projections + recurrent scans, nn/lstm.py): the reloaded step
    agrees with the live quantized exact step including state threading.
    (On the cpu export platform the scans are the XLA int8 path; TPU
    artifacts embed the int8 Pallas kernels.)"""
    from mobileposer_tpu.ops.quant import quantize_params_int8
    S, N = 2, 3
    save_bundle(tmp_path / "bx8", net, params, n_streams=S, mode="exact",
                platforms=("cpu",), quantize="int8")
    step, p, st, meta = load_bundle(tmp_path / "bx8")
    assert meta["quantize"] == "int8" and meta["mode"] == "exact"

    params_q = quantize_params_int8(params)
    live = jax.jit(net.forward_online_batched)
    st_live = jax.tree_util.tree_map(jnp.asarray,
                                     net.init_online_state_batched(S))
    rng = np.random.RandomState(4)
    for _ in range(N):
        frames = rng.randn(S, 60).astype(np.float32) * 0.1
        out_aot, st = step(p, st, frames)
        out_live, st_live = live(params_q, st_live, jnp.asarray(frames))
        _tree_allclose(out_aot, out_live, atol=1e-6)


def test_bundle_rejects_unknown_quantize(net, params, tmp_path):
    with pytest.raises(ValueError, match="quantize"):
        save_bundle(tmp_path / "x", net, params, n_streams=2, mode="carry",
                    platforms=("cpu",), quantize="fp4")


def test_legacy_plain_npz_bundle_still_loads(net, params, tmp_path):
    """Bundles written before the dtype manifest existed used plain
    np.savez; loadz_typed must fall back transparently for them."""
    save_bundle(tmp_path / "b", net, params, n_streams=2, mode="carry",
                platforms=("cpu",))
    # rewrite both archives the pre-manifest way (f32 leaves round-trip
    # fine through plain npz)
    for name in ("weights.npz", "state.npz"):
        p = tmp_path / "b" / name
        z = dict(np.load(p))
        z.pop("__dtypes__", None)
        np.savez(p, **z)
    step, p, st, meta = load_bundle(tmp_path / "b")
    frames = np.zeros((2, 60), np.float32)
    (pose, joints, root, contact), _ = step(p, st, frames)
    assert np.isfinite(np.asarray(pose)).all()


def test_export_cli_smoke(tmp_path):
    from mobileposer_tpu.cli.export_serving import main
    main(["--out", str(tmp_path / "bundle"), "--streams", "2",
          "--mode", "exact", "--platforms", "cpu", "--smoke-test"])
    assert (tmp_path / "bundle" / "step.jaxexport").exists()
    assert (tmp_path / "bundle" / "weights.npz").exists()
    assert (tmp_path / "bundle" / "meta.json").exists()


def test_bundle_rejects_bad_mode(net, params, tmp_path):
    with pytest.raises(ValueError, match="mode"):
        save_bundle(tmp_path / "x", net, params, 2, mode="bogus",
                    platforms=("cpu",))


def test_offline_bundle_round_trip(net, params, tmp_path):
    """mode='offline': the stateless batched forward exports, reloads, and
    matches the live forward_offline_batched program."""
    from mobileposer_tpu.evaluation.pose_eval import forward_offline_batched
    B, T = 2, 64
    save_bundle(tmp_path / "off", net, params, n_streams=B, mode="offline",
                seq_len=T, platforms=("cpu",))
    assert not (tmp_path / "off" / "state.npz").exists()
    step, p, state, meta = load_bundle(tmp_path / "off")
    assert state is None
    assert meta["mode"] == "offline" and meta["seq_len"] == T

    rng = np.random.RandomState(3)
    imu = rng.randn(B, T, 60).astype(np.float32) * 0.1
    lengths = np.asarray([T, T // 2], np.int32)
    pose_b, joints_b, tran_b, contact_b = step(p, imu, lengths)
    pose_l, joints_l, tran_l, contact_l = jax.jit(
        lambda pp, x, l: forward_offline_batched(net, pp, x, l))(
        params, jnp.asarray(imu), jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(pose_b), np.asarray(pose_l),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(tran_b), np.asarray(tran_l),
                               atol=2e-5)
    assert np.isfinite(np.asarray(contact_b)).all()
