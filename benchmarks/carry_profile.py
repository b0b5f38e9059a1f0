"""Component-level timing of the carry-mode frame step (diagnostic).

Times each piece of `forward_carry_batched` in isolation with the same
device-resident N-step serialization the headline harness uses, so the
per-frame budget (≈190 us at S=256 bf16) can be attributed: module tails
vs per-frame IK (reduced_global_to_full) vs the fusion math.

Run: python benchmarks/carry_profile.py [--streams 256] [--dtype bf16]
Prints one JSON line per component.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from benchmarks.timing import rtt_seconds, timed_fetch


def _chain(step_fn, carry0, n_steps):
    """Serialize n_steps executions of step_fn via a data dependency and
    return a jitted fn producing one scalar."""

    @jax.jit
    def run(args):
        def body(_, carry):
            return step_fn(carry)
        out = jax.lax.fori_loop(0, n_steps, body, carry0(args))
        return sum(jnp.sum(leaf.astype(jnp.float32))
                   for leaf in jax.tree_util.tree_leaves(out))

    return run


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--streams", type=int, default=256)
    parser.add_argument("--frames", type=int, default=100)
    parser.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    args = parser.parse_args(argv)

    from mobileposer_tpu.kinematics import ParametricModel
    from mobileposer_tpu.models import MobilePoserNet, init_all_modules
    from mobileposer_tpu.models import streaming as CS
    from mobileposer_tpu.models.net import (reduced_global_to_full,
                                            reduced_global_to_full_soa)
    from mobileposer_tpu.nn import cast_params

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    S, N = args.streams, args.frames
    net = MobilePoserNet(ParametricModel.from_file_or_synthetic(None))
    params = init_all_modules(jax.random.PRNGKey(0))
    if dtype == jnp.bfloat16:
        params = cast_params(params, dtype)
    rtt = rtt_seconds()
    rng = np.random.RandomState(0)
    results = {}

    def report(name, wall):
        us = max(wall - rtt, 1e-9) / N * 1e6
        results[name] = round(us, 1)
        print(json.dumps({"component": name, "us_per_frame": round(us, 1),
                          "streams": S, "dtype": args.dtype}), flush=True)

    # --- full step -------------------------------------------------------
    state0 = jax.tree_util.tree_map(jnp.asarray,
                                    net.init_carry_state_batched(S, dtype))
    frames = jnp.asarray(rng.randn(N, S, 60).astype(np.float32) * 0.1, dtype)

    @jax.jit
    def run_full(params, state, frames):
        (pose, joints, root, contact), _ = net.forward_carry_sequence_batched(
            params, state, frames)
        return (pose.astype(jnp.float32).sum()
                + joints.astype(jnp.float32).sum()
                + root.astype(jnp.float32).sum()
                + contact.astype(jnp.float32).sum())

    report("full_step", timed_fetch(run_full, params, state0, frames))

    # --- joints tail -----------------------------------------------------
    jc0 = jax.tree_util.tree_map(
        jnp.asarray,
        CS.joints_carry_init(S, dtype))
    imu_t = jnp.asarray(rng.randn(S, 60).astype(np.float32) * 0.1, dtype)
    ini = jnp.ones((S,), bool)

    def joints_step(carry):
        jc, x = carry
        y_tail, jc = CS.joints_carry_step(params["joints"], jc, x, ini)
        # serialize iterations by folding the FULL output (all tail
        # positions) back in, so no provisional step is dead code
        # (CLAUDE.md benchmark honesty)
        return jc, x + (y_tail.astype(jnp.float32).sum()
                        * jnp.float32(1e-9)).astype(x.dtype)

    report("joints_tail", timed_fetch(
        _chain(joints_step, lambda a: a, N), (jc0, imu_t)))

    # --- poser tail ------------------------------------------------------
    pc0 = jax.tree_util.tree_map(jnp.asarray, CS.bi_carry_init("poser", S,
                                                               dtype))
    x132 = jnp.asarray(rng.randn(CS.LOOKAHEAD, S, 132).astype(np.float32) * 0.1,
                       dtype)

    def poser_step(carry):
        pc, x = carry
        y, pc = CS.bi_carry_step(params["poser"], pc, x, ini)
        return pc, x + (y.astype(jnp.float32).sum()
                        * jnp.float32(1e-9)).astype(x.dtype)

    report("poser_tail", timed_fetch(
        _chain(poser_step, lambda a: a, N), (pc0, x132)))

    # --- footcontact tail ------------------------------------------------
    fc0 = jax.tree_util.tree_map(jnp.asarray,
                                 CS.bi_carry_init("footcontact", S, dtype))

    def fc_step(carry):
        fc, x = carry
        y, fc = CS.bi_carry_step(params["footcontact"], fc, x, ini)
        return fc, x + (y.astype(jnp.float32).sum()
                        * jnp.float32(1e-9)).astype(x.dtype)

    report("footcontact_tail", timed_fetch(
        _chain(fc_step, lambda a: a, N), (fc0, x132)))

    # --- velocity cells ---------------------------------------------------
    vh0 = jnp.zeros((2, S, 256), dtype)
    x_emit = x132[0]

    def vel_step(carry):
        h, c, x = carry
        y, h, c = CS.velocity_carry_step(params["velocity"], h, c, x, ini)
        return h, c, x + (y.astype(jnp.float32).sum()
                          * jnp.float32(1e-9)).astype(x.dtype)

    report("velocity_cells", timed_fetch(
        _chain(vel_step, lambda a: a, N), (vh0, vh0, x_emit)))

    # --- per-frame IK (reduced_global_to_full) ----------------------------
    r6d0 = jnp.asarray(
        np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), (S, 16)), dtype)

    def ik_step(r6d):
        pose = reduced_global_to_full(r6d, net.body_model)
        return r6d + (pose.astype(jnp.float32).sum()
                      * jnp.float32(1e-9)).astype(r6d.dtype)

    report("ik_per_frame_aos", timed_fetch(
        _chain(ik_step, lambda a: a, N), r6d0))

    def ik_step_soa(r6d):
        pose = reduced_global_to_full_soa(r6d, net.body_model)
        return r6d + (pose.astype(jnp.float32).sum()
                      * jnp.float32(1e-9)).astype(r6d.dtype)

    report("ik_per_frame_soa", timed_fetch(
        _chain(ik_step_soa, lambda a: a, N), r6d0))

    # --- fusion math -------------------------------------------------------
    joints_e = jnp.asarray(rng.randn(S, 24, 3).astype(np.float32) * 0.1, dtype)
    contact_e = jnp.asarray(rng.randn(S, 2).astype(np.float32), dtype)
    vel_e = jnp.asarray(rng.randn(S, 72).astype(np.float32), dtype)
    feet = jnp.asarray(np.asarray(net.feet_pos, np.float32), dtype)

    def fusion_step(carry):
        lf, rf, ry, rp = carry
        velocity, v_y, lf, rf = net._fusion_step(
            joints_e + rp[:, None, :] * 1e-6, contact_e, vel_e, lf, rf, ry, rp)
        return lf, rf, ry + v_y, rp + velocity

    report("fusion_step", timed_fetch(
        _chain(fusion_step, lambda a: a, N),
        (jnp.broadcast_to(feet[0], (S, 3)), jnp.broadcast_to(feet[1], (S, 3)),
         jnp.zeros((S,), dtype), jnp.zeros((S, 3), dtype))))

    known = sum(v for k, v in results.items()
                if k not in ("full_step", "ik_per_frame_aos"))
    print(json.dumps({"sum_of_components_us": round(known, 1),
                      "full_step_us": results["full_step"]}), flush=True)


if __name__ == "__main__":
    main()
