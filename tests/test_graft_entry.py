"""Driver-contract tests for __graft_entry__ (single-chip compile check +
self-provisioning multi-chip dry run)."""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__  # noqa: E402


def test_entry_is_jittable():
    fn, args = __graft_entry__.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None


def test_dryrun_inline_on_virtual_mesh():
    # conftest provisions 8 virtual CPU devices, so this takes the inline path.
    assert len(jax.devices()) >= 8
    __graft_entry__.dryrun_multichip(8)


def test_dryrun_self_provisions_via_subprocess(monkeypatch):
    # Simulate the driver's environment (single tunneled TPU chip): make the
    # inline-eligibility check fail so the dry run must re-exec itself in a
    # scrubbed-env subprocess with a virtual 8-device CPU mesh.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    __graft_entry__.dryrun_multichip(8)


def test_dryrun_never_initializes_backend_in_parent(monkeypatch):
    # Outage regression (MULTICHIP_r04 rc=124): with the axon tunnel down,
    # the first backend initialization in the parent process blocks forever.
    # Simulate an uninitialized-JAX parent with a hanging plugin: any call
    # that would initialize the default backend fails the test; the dry run
    # must go straight to the hermetic subprocess.
    from jax._src import xla_bridge
    monkeypatch.setattr(xla_bridge, "backends_are_initialized", lambda: False)

    def _would_hang(*a, **k):
        raise AssertionError(
            "dryrun_multichip initialized the default backend in-parent")

    monkeypatch.setattr(jax, "default_backend", _would_hang)
    monkeypatch.setattr(jax, "devices", _would_hang)
    __graft_entry__.dryrun_multichip(8)


def test_dryrun_subprocess_propagates_failure(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(sys, "executable", "/nonexistent/python")
    with pytest.raises((RuntimeError, OSError)):
        __graft_entry__.dryrun_multichip(8)
