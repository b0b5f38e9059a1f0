#!/usr/bin/env python3
"""Produce `ref_metrics.json` for the checkpoint-parity harness.

Runs the REFERENCE implementation's own evaluation CLI
(`mobileposer/evaluate.py --model <ckpt> --dataset <name>`, reference
evaluate.py:110-126) as a subprocess — inside the reference repo, with the
reference's Python environment — and parses its 8-row printout into the
JSON that `python -m mobileposer_tpu.cli.parity --reference-metrics`
consumes. No reference code is imported; the contract is its stdout
format ("SIP Error (deg): X.XX (+/- Y.YY)", evaluate.py:31-36).

Usage (parity day, step 1 — see docs/parity.md for the full runbook):

    python scripts/make_ref_metrics.py \
        --reference-repo /path/to/MobilePoser \
        --model checkpoints/weights.pth \
        --dataset dip \
        [--python /path/to/ref-venv/bin/python] \
        [--online] \
        --out ref_metrics.json

Requires the reference repo to already have its config paths pointed at
the processed DIP test set and the official SMPL pickle (its config.py).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

ROW_RE = re.compile(r"^(.+?):\s*([-\d.]+)\s*\(\+/-\s*([-\d.]+)\)\s*$")

# printed-name -> ref_metrics key (SIP and positional feed the parity gate)
KEYMAP = {
    "SIP Error (deg)": "sip_deg",
    "Angular Error (deg)": "ang_deg",
    "Masked Angular Error (deg)": "masked_ang_deg",
    "Positional Error (cm)": "pos_cm",
    "Masked Positional Error (cm)": "masked_pos_cm",
    "Mesh Error (cm)": "mesh_cm",
    "Jitter Error (100m/s^3)": "jitter_100ms3",
    "Distance Error (cm)": "dist_cm",
}


def parse_report(stdout: str) -> dict:
    """Parse the reference printout into {section: {key: [mean, std]}}."""
    sections: dict = {}
    current = "offline"
    for line in stdout.splitlines():
        line = line.strip()
        m = re.match(r"^=+\s*(\w+)\s*=+$", line)
        if m:
            current = m.group(1)
            continue
        m = ROW_RE.match(line)
        if m and m.group(1) in KEYMAP:
            sections.setdefault(current, {})[KEYMAP[m.group(1)]] = [
                float(m.group(2)), float(m.group(3))]
    return sections


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--reference-repo", required=True,
                   help="checkout of SPICExLAB/MobilePoser")
    p.add_argument("--model", required=True,
                   help="checkpoint path, relative to the reference repo "
                        "or absolute")
    p.add_argument("--dataset", default="dip",
                   choices=["dip", "totalcapture", "imuposer"])
    p.add_argument("--python", default=sys.executable,
                   help="interpreter of the reference's environment "
                        "(torch + lightning)")
    p.add_argument("--online", action="store_true",
                   help="also capture the ONLINE protocol section")
    p.add_argument("--out", default="ref_metrics.json")
    args = p.parse_args(argv)

    env = dict(os.environ)
    if args.online:
        env["ONLINE"] = "1"
    proc = subprocess.run(
        [args.python, "mobileposer/evaluate.py",
         "--model", args.model, "--dataset", args.dataset],
        cwd=args.reference_repo, env=env,
        capture_output=True, text=True)
    sys.stderr.write(proc.stderr)
    print(proc.stdout)
    if proc.returncode != 0:
        raise SystemExit(f"reference evaluate.py failed (rc={proc.returncode})")

    sections = parse_report(proc.stdout)
    if "offline" not in sections or "sip_deg" not in sections["offline"]:
        raise SystemExit("could not parse the reference report — did the "
                         "printout format change?")
    out = {
        # flat keys consumed by cli/parity.py
        "sip_deg": sections["offline"]["sip_deg"][0],
        "pos_cm": sections["offline"]["pos_cm"][0],
        # full report for the record
        "dataset": args.dataset,
        "model": args.model,
        "sections": sections,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
