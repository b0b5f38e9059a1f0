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
    parser.add_argument("--export-torch", default=None, metavar="PATH",
                        help="also write the combined weights as a "
                             "reference-format torch state_dict "
                             "(combine_weights.py:41-56 layout) so the "
                             "reference implementation can evaluate a "
                             "checkpoint trained here")
    args = parser.parse_args(argv)
    out = combine_weights(args.checkpoint_dir, args.out,
                          finetune=args.finetune)
    print(f"Model written to {out}.")
    if args.export_torch:
        from mobileposer_tpu.nn import save_torch_checkpoint
        from mobileposer_tpu.nn.torch_convert import load_from_npz
        save_torch_checkpoint(load_from_npz(out), args.export_torch)
        print(f"Reference-format torch checkpoint written to "
              f"{args.export_torch}.")


if __name__ == "__main__":
    main()
