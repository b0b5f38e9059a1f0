"""Preprocess raw datasets (reference CLI: mobileposer/process.py:349-369).

    python -m mobileposer_tpu.cli.process --dataset amass
    python -m mobileposer_tpu.cli.process --dataset dip
    python -m mobileposer_tpu.cli.process --dataset totalcapture
    python -m mobileposer_tpu.cli.process --dataset imuposer
    python -m mobileposer_tpu.cli.process --dataset synthetic   # fixture
"""

from __future__ import annotations

import argparse

from mobileposer_tpu import config as C
from mobileposer_tpu.data.process import (
    process_amass, process_dipimu, process_imuposer, process_totalcapture)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="amass",
                        choices=["amass", "dip", "totalcapture", "imuposer",
                                 "synthetic"])
    parser.add_argument("--split", default=None,
                        help="train/test split for dip & imuposer")
    args = parser.parse_args(argv)

    C.paths.processed_datasets.mkdir(parents=True, exist_ok=True)
    C.paths.eval_dir.mkdir(parents=True, exist_ok=True)

    if args.dataset == "amass":
        process_amass()
    elif args.dataset == "dip":
        for split in ([args.split] if args.split else ["train", "test"]):
            process_dipimu(split=split)
    elif args.dataset == "totalcapture":
        process_totalcapture()
    elif args.dataset == "imuposer":
        for split in ([args.split] if args.split else ["train", "test"]):
            process_imuposer(split=split)
    elif args.dataset == "synthetic":
        from mobileposer_tpu.data.fixtures import make_synthetic_processed_dataset
        out = C.paths.processed_datasets / "synthetic.pt"
        make_synthetic_processed_dataset(out, n_sequences=8, T=400)
        print(f"Synthetic dataset saved: {out}")


if __name__ == "__main__":
    main()
