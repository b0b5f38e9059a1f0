"""Visualization / debug exports (headless-first)."""

from mobileposer_tpu.viz.render import render_motion  # noqa: F401
from mobileposer_tpu.viz.viewer import MotionDump, SMPLViewer, SequenceLoader  # noqa: F401
