"""CLI entry points (the reference's L7 scripts, SURVEY §1):

    python -m mobileposer_tpu.cli.process          # dataset synthesis
    python -m mobileposer_tpu.cli.train            # module training
    python -m mobileposer_tpu.cli.evaluate         # metric evaluation
    python -m mobileposer_tpu.cli.overfit          # one-batch sanity check
    python -m mobileposer_tpu.cli.combine_weights  # merge best checkpoints
    python -m mobileposer_tpu.cli.example          # run + export a sequence
    python -m mobileposer_tpu.cli.calibration      # sensor frontend app
    python -m mobileposer_tpu.cli.live_demo        # live streaming demo
    python -m mobileposer_tpu.cli.combiner         # merge recorded sessions
    python -m mobileposer_tpu.cli.finetune         # DIP/IMUPoser finetune chain
    python -m mobileposer_tpu.cli.serve            # multi-stream pose server
    python -m mobileposer_tpu.cli.parity           # checkpoint-parity check
"""
