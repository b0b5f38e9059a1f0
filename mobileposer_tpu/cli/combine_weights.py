"""Merge best per-module checkpoints into one weights file
(reference CLI: mobileposer/combine_weights.py).

    python -m mobileposer_tpu.cli.combine_weights --checkpoint-dir checkpoints/1
"""

from __future__ import annotations

import argparse

from mobileposer_tpu.train import combine_weights


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint-dir", required=True)
    parser.add_argument("--out", default=None)
    parser.add_argument("--finetune", default=None,
                        help="take joints/poser from finetuned_<dataset>")
    args = parser.parse_args(argv)
    out = combine_weights(args.checkpoint_dir, args.out,
                          finetune=args.finetune)
    print(f"Model written to {out}.")


if __name__ == "__main__":
    main()
