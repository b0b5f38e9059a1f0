"""Overfit-one-batch sanity harness (reference CLI: mobileposer/overfit.py).

    python -m mobileposer_tpu.cli.overfit --module joints [--steps 100]

Prints parameter counts and the loss trajectory on a single repeated batch —
the reference's de-facto module sanity check (overfit.py:44-56).
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from mobileposer_tpu import config as C
from mobileposer_tpu.data import PoseDataset
from mobileposer_tpu.data.fixtures import make_synthetic_processed_dataset
from mobileposer_tpu.kinematics.smpl import ParametricModel
from mobileposer_tpu.train import MODULE_NAMES, init_train_state, make_train_step


def count_params(params) -> int:
    return sum(int(np.prod(l.shape))
               for l in jax.tree_util.tree_leaves(params))


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--module", default="joints", choices=MODULE_NAMES)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--synthetic", action="store_true",
                        help="use the synthetic fixture dataset")
    args = parser.parse_args(argv)

    body = ParametricModel.from_file_or_synthetic(C.paths.smpl_file)
    import contextlib
    with contextlib.ExitStack() as stack:
        if args.synthetic or not C.paths.processed_datasets.exists():
            import tempfile
            d = stack.enter_context(tempfile.TemporaryDirectory())
            path = f"{d}/overfit.pt"
            make_synthetic_processed_dataset(path, n_sequences=1, T=150,
                                             body_model=body)
            dataset = PoseDataset(fold="train", body_model=body,
                                  data_files=[path])
        else:
            dataset = PoseDataset(fold="train", body_model=body)

    state = init_train_state(args.module, jax.random.PRNGKey(0),
                             lr=C.train_hypers.lr)
    print(f"module {args.module}: {count_params(state.params):,} parameters")
    step = make_train_step(args.module, lr=C.train_hypers.lr,
                           body_model=body if args.module == "poser" else None)
    batch = dataset._assemble(np.arange(min(args.batch_size, len(dataset))),
                              C.datasets.window_length)
    key = jax.random.PRNGKey(1)
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        state, loss = step(state, batch, sub)
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss {float(loss):.6f}")


if __name__ == "__main__":
    main()
