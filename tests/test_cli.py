"""End-to-end CLI workflow on synthetic data:
process -> overfit -> train -> combine -> evaluate -> example."""

import os
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("cli_ws")
    (ws / "processed").mkdir()
    (ws / "processed" / "eval").mkdir()
    return ws


@pytest.fixture(scope="module", autouse=True)
def env(workspace):
    old = dict(os.environ)
    os.environ["MP_PROCESSED"] = str(workspace / "processed")
    yield
    os.environ.clear()
    os.environ.update(old)


@pytest.fixture(scope="module")
def body():
    from mobileposer_tpu.kinematics import ParametricModel
    return ParametricModel.synthetic(num_vertices=240)


@pytest.fixture(scope="module")
def datasets(workspace, body):
    from mobileposer_tpu.data.fixtures import make_synthetic_processed_dataset
    train = workspace / "processed" / "synthetic.pt"
    test = workspace / "processed" / "eval" / "dip_test.pt"
    make_synthetic_processed_dataset(train, n_sequences=2, T=150, seed=0,
                                     body_model=body)
    make_synthetic_processed_dataset(test, n_sequences=1, T=60, seed=1,
                                     body_model=body)
    return train, test


def test_cli_train_combine(workspace, datasets, body, monkeypatch):
    # keep the CLI on the small synthetic body
    import mobileposer_tpu.kinematics.smpl as smpl_mod
    monkeypatch.setattr(
        smpl_mod.ParametricModel, "from_file_or_synthetic",
        classmethod(lambda cls, f, **kw: body))
    from mobileposer_tpu.cli import train as train_cli
    ckpt_dir = workspace / "ckpt"
    train_cli.main(["--fast-dev-run", "--checkpoint-dir", str(ckpt_dir),
                    "--combine"])
    assert (ckpt_dir / "base_model.npz").exists()
    assert (ckpt_dir / "metrics.jsonl").exists()


def test_cli_train_concurrent(workspace, datasets, body, monkeypatch):
    """--concurrent: the fused all-module recipe through the same CLI,
    producing the same combined-weights layout."""
    import mobileposer_tpu.kinematics.smpl as smpl_mod
    monkeypatch.setattr(
        smpl_mod.ParametricModel, "from_file_or_synthetic",
        classmethod(lambda cls, f, **kw: body))
    from mobileposer_tpu.cli import train as train_cli
    ckpt_dir = workspace / "ckpt_concurrent"
    train_cli.main(["--fast-dev-run", "--concurrent",
                    "--checkpoint-dir", str(ckpt_dir), "--combine"])
    assert (ckpt_dir / "base_model.npz").exists()
    with pytest.raises(SystemExit):
        train_cli.main(["--concurrent", "--module", "poser"])


def test_cli_evaluate(workspace, datasets, body, monkeypatch, capsys):
    import mobileposer_tpu.kinematics.smpl as smpl_mod
    monkeypatch.setattr(
        smpl_mod.ParametricModel, "from_file_or_synthetic",
        classmethod(lambda cls, f, **kw: body))
    from mobileposer_tpu.cli import evaluate as eval_cli
    eval_cli.main(["--model", str(workspace / "ckpt" / "base_model.npz"),
                   "--dataset", "dip", "--tran"])
    out = capsys.readouterr().out
    assert "SIP Error (deg)" in out
    assert "offline" in out
    # --dataset synthetic closes the blob-free recipe loop: it evaluates
    # against the fixture `process --dataset synthetic` writes
    eval_cli.main(["--model", str(workspace / "ckpt" / "base_model.npz"),
                   "--dataset", "synthetic"])
    assert "SIP Error (deg)" in capsys.readouterr().out


def test_cli_example(workspace, datasets, body, monkeypatch):
    import mobileposer_tpu.kinematics.smpl as smpl_mod
    monkeypatch.setattr(
        smpl_mod.ParametricModel, "from_file_or_synthetic",
        classmethod(lambda cls, f, **kw: body))
    from mobileposer_tpu.cli import example as example_cli
    out_dir = workspace / "motions"
    example_cli.main(["--model", str(workspace / "ckpt" / "base_model.npz"),
                      "--dataset", "dip", "--out", str(out_dir)])
    assert (out_dir / "pose.txt").exists()
    assert (out_dir / "tran.txt").exists()
    saved = np.load(out_dir / "example_dip_0.npz")
    assert saved["pose_p"].shape[1:] == (24, 3, 3)


def test_cli_overfit(workspace, body, monkeypatch, capsys):
    import mobileposer_tpu.kinematics.smpl as smpl_mod
    monkeypatch.setattr(
        smpl_mod.ParametricModel, "from_file_or_synthetic",
        classmethod(lambda cls, f, **kw: body))
    from mobileposer_tpu.cli import overfit as overfit_cli
    overfit_cli.main(["--module", "footcontact", "--steps", "5",
                      "--synthetic", "--batch-size", "2"])
    out = capsys.readouterr().out
    assert "parameters" in out
    assert "step    4" in out


def test_cli_combiner_roundtrip(workspace, body):
    """Recorded sessions merge into an npz that load_processed_file reads."""
    import numpy as np
    from mobileposer_tpu.cli import combiner as combiner_cli
    from mobileposer_tpu.data import load_processed_file
    T = 10
    sess = workspace / "dev_1.npz"
    np.savez(sess,
             acc=np.random.randn(T, 5, 3).astype(np.float32),
             ori=np.random.randn(T, 5, 4).astype(np.float32),
             pose=np.tile(np.eye(3, dtype=np.float32), (T, 24, 1, 1)),
             tran=np.zeros((T, 3), np.float32))
    out = workspace / "combined.npz"
    combiner_cli.main(["--sessions", str(sess), "--out", str(out)])
    seqs = load_processed_file(out)
    assert len(seqs) == 1
    assert seqs[0]["acc"].shape == (T, 5, 3)


def test_parity_cli_dry_run(workspace, datasets, body, monkeypatch, capsys):
    """Parity-day harness exercised end-to-end on the synthetic fixture:
    weights load, evaluation runs, 'ours' metrics print (no reference
    metrics -> informational exit 0), and the comparison path refuses to
    gate against reference numbers on a non-official body."""
    import json
    import jax
    import mobileposer_tpu.kinematics.smpl as smpl_mod
    monkeypatch.setattr(
        smpl_mod.ParametricModel, "from_file_or_synthetic",
        classmethod(lambda cls, *a, **k: body))
    from mobileposer_tpu.cli import parity
    from mobileposer_tpu.models import init_all_modules
    from mobileposer_tpu.nn.torch_convert import export_to_npz
    ckpt = workspace / "synth_weights.npz"
    export_to_npz(init_all_modules(jax.random.PRNGKey(0)), ckpt)

    parity.main(["--torch-checkpoint", str(ckpt)])
    out = capsys.readouterr().out
    ours = json.loads([l for l in out.splitlines() if '"ours"' in l][0])
    assert np.isfinite(ours["ours"]["sip_deg"])
    assert np.isfinite(ours["ours"]["pos_cm"])

    ref = workspace / "ref_metrics.json"
    ref.write_text(json.dumps(ours["ours"]))
    with pytest.raises(SystemExit):   # refuses: synthetic body, not official
        parity.main(["--torch-checkpoint", str(ckpt),
                     "--reference-metrics", str(ref)])


def test_make_ref_metrics_parser():
    """The stdout-format contract of the reference's evaluate.py printout."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "make_ref_metrics",
        Path(__file__).parent.parent / "scripts" / "make_ref_metrics.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    stdout = """Starting evaluation: Dip
============== offline ================
SIP Error (deg): 19.46 (+/- 12.34)
Angular Error (deg): 24.27 (+/- 11.80)
Masked Angular Error (deg): 19.46 (+/- 12.34)
Positional Error (cm): 6.64 (+/- 3.51)
Masked Positional Error (cm): 8.51 (+/- 4.54)
Mesh Error (cm): 8.03 (+/- 4.17)
Jitter Error (100m/s^3): 6.97 (+/- 4.67)
Distance Error (cm): 0.00 (+/- 0.00)
============== online ================
SIP Error (deg): 21.00 (+/- 13.00)
Positional Error (cm): 7.00 (+/- 4.00)
"""
    sections = m.parse_report(stdout)
    assert sections["offline"]["sip_deg"] == [19.46, 12.34]
    assert sections["offline"]["pos_cm"] == [6.64, 3.51]
    assert sections["online"]["sip_deg"] == [21.0, 13.0]


def test_cli_finetune_concurrent(workspace, datasets, body, monkeypatch):
    """Finetune recipe through the concurrent trainer: joints+poser warm-
    started from the base run's best checkpoints, trained in one jit
    region, and combinable via combine_weights(finetune=...)."""
    import mobileposer_tpu.kinematics.smpl as smpl_mod
    monkeypatch.setattr(
        smpl_mod.ParametricModel, "from_file_or_synthetic",
        classmethod(lambda cls, f, **kw: body))
    from mobileposer_tpu.data.fixtures import make_synthetic_processed_dataset
    ft_data = workspace / "processed" / "eval" / "dip_train.pt"
    if not ft_data.exists():
        make_synthetic_processed_dataset(ft_data, n_sequences=2, T=150,
                                         seed=3, body_model=body)
    from mobileposer_tpu.cli import finetune as ft_cli
    ft_cli.main(["--dataset", "dip", "--checkpoint-dir",
                 str(workspace / "ckpt"), "--fast-dev-run", "--concurrent"])
    out_dir = workspace / "ckpt" / "finetuned_dip"
    assert list((out_dir / "joints").glob("epoch=*.npz"))
    assert list((out_dir / "poser").glob("epoch=*.npz"))
    from mobileposer_tpu.train import combine_weights, load_combined_weights
    combined = combine_weights(workspace / "ckpt", finetune="dip")
    assert set(load_combined_weights(combined)) == {
        "joints", "poser", "footcontact", "velocity"}


def test_cli_combine_export_torch(workspace):
    """combine_weights --export-torch also writes the reference-format
    torch state_dict; converting it back reproduces the combined pytree."""
    import torch

    from mobileposer_tpu.cli import combine_weights as combine_cli
    from mobileposer_tpu.models import MODULE_CONFIGS
    from mobileposer_tpu.nn import convert_mobileposer_checkpoint
    from mobileposer_tpu.nn.lstm import init_rnn
    from mobileposer_tpu.nn.torch_convert import export_to_npz

    import jax

    ckpt_dir = workspace / "ckpt_export"
    for i, (name, cfg) in enumerate(MODULE_CONFIGS.items()):
        d = ckpt_dir / name
        d.mkdir(parents=True)
        export_to_npz(init_rnn(jax.random.PRNGKey(i), cfg),
                      d / "epoch=0-valloss=0.1000.npz")
    out = ckpt_dir / "base_model.npz"
    pt = ckpt_dir / "ref_format.pt"
    combine_cli.main(["--checkpoint-dir", str(ckpt_dir),
                      "--out", str(out), "--export-torch", str(pt)])
    assert out.exists() and pt.exists()
    sd = torch.load(pt, map_location="cpu", weights_only=False)
    back = convert_mobileposer_checkpoint(sd, MODULE_CONFIGS)
    assert set(back) == set(MODULE_CONFIGS)


def test_cli_serve_pipelined_flag_wiring(workspace, body, monkeypatch):
    """cli.serve defaults to the pipelined tick; --no-pipeline restores the
    synchronous server. The server itself is stubbed — this pins the
    argparse wiring, not the serving loop (tests/test_server.py does that)."""
    import jax

    from mobileposer_tpu.cli import serve as serve_cli
    from mobileposer_tpu.models import init_all_modules
    from mobileposer_tpu.nn.torch_convert import export_to_npz

    w = workspace / "serve_weights.npz"
    export_to_npz(init_all_modules(jax.random.PRNGKey(0)), w)

    captured = {}

    class StubServer:
        def __init__(self, net, params, **kw):
            captured.update(kw)
            self.port = 0
            self.mode = kw.get("mode", "exact")
            self.pipelined = kw.get("pipelined")

        def run(self, duration=None):
            pass

        def stop(self):
            pass

        def close(self):
            pass

        def stats(self):
            return {}

    monkeypatch.setattr(serve_cli, "PoseServer", StubServer)
    serve_cli.main(["--model", str(w), "--duration", "0"])
    assert captured["pipelined"] is True
    serve_cli.main(["--model", str(w), "--duration", "0", "--no-pipeline"])
    assert captured["pipelined"] is False
