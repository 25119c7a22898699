"""CLI argument plumbing (no training executed)."""

import jax.numpy as jnp

from unipose_tpu.cli.train import build_argparser, configs_from_args


def test_image_defaults():
    args = build_argparser().parse_args(["--dataset", "LSP"])
    mc, tc = configs_from_args(args)
    assert mc.variant == "image" and mc.num_classes == 14
    assert tc.batch_size == 8 and tc.sigma == 3.0  # unipose.py:49,53


def test_video_defaults():
    args = build_argparser().parse_args(
        ["--dataset", "Penn_Action", "--model_arch", "uniposeLSTM"]
    )
    mc, tc = configs_from_args(args)
    assert mc.variant == "lstm" and mc.num_classes == 13
    assert tc.batch_size == 1 and tc.sigma == 1.0  # uniposeLSTM.py:51,55


def test_bf16_flag():
    args = build_argparser().parse_args(["--dataset", "MPII", "--bf16"])
    mc, _ = configs_from_args(args)
    assert mc.compute_dtype == jnp.bfloat16
    assert mc.num_classes == 16


def test_yaml_config_flag(tmp_path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text("preset: penn_lstm\ntrain:\n  batch_size: 2\n")
    args = build_argparser().parse_args(["--config", str(cfg)])
    from unipose_tpu.core.config import load_yaml_config

    preset = load_yaml_config(args.config)
    assert preset.model.variant == "lstm"
    assert preset.train.batch_size == 2


def test_freeze_bn_flag():
    args = build_argparser().parse_args(["--dataset", "LSP", "--freeze_bn"])
    mc, _ = configs_from_args(args)
    assert mc.freeze_bn is True


def test_export_cli_roundtrip(tmp_path):
    """cli/export writes an artifact that cli/serve derives geometry from."""
    from unipose_tpu.cli import export as export_cli
    from unipose_tpu.compat.export import load_exported

    out = tmp_path / "model.hlo"
    export_cli.main(["--dataset", "LSP", "--out", str(out), "--size", "64"])
    blob = out.read_bytes()
    exported = load_exported(blob)
    assert tuple(exported.in_avals[0].shape) == (1, 64, 64, 3)
    assert int(exported.out_avals[0].shape[-1]) == 15  # 14 joints + background


def test_export_cli_from_checkpoint_dir(tmp_path):
    """--checkpoint_dir restores the latest orbax step before baking."""
    import jax

    from unipose_tpu.cli import export as export_cli
    from unipose_tpu.core.config import ModelConfig, TrainConfig
    from unipose_tpu.train.checkpoint import CheckpointManager
    from unipose_tpu.train.state import create_train_state

    mc = ModelConfig(dataset="LSP", num_classes=14)
    _, _, state = create_train_state(
        mc, TrainConfig(), jax.random.PRNGKey(0), input_size=64
    )
    state = state.replace(step=state.step + 5)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(5, state)
    mgr.wait()

    out = tmp_path / "model.hlo"
    export_cli.main([
        "--dataset", "LSP", "--out", str(out), "--size", "64",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ])
    assert out.stat().st_size > 0


def test_eval_missing_pretrained_fails_fast(tmp_path):
    """The parity-runbook entry point (docs/ROADMAP.md) must fail before any
    model build with a message pointing at the runbook when the checkpoint
    artifact is absent."""
    import pytest

    from unipose_tpu.cli import eval as eval_cli

    with pytest.raises(SystemExit) as exc:
        eval_cli.main(
            [
                "--dataset", "LSP",
                "--val_dir", str(tmp_path),
                "--pretrained", str(tmp_path / "UniPose_LSP.tar"),
            ]
        )
    msg = str(exc.value)
    assert "not found" in msg and "runbook" in msg


def test_sigma_stride_flags():
    """--sigma/--stride reach TrainConfig (and from there effective_spec);
    defaults keep the reference's 3.0-image / 1.0-video sigmas."""
    from unipose_tpu.cli.train import build_argparser, configs_from_args

    args = build_argparser().parse_args(
        ["--dataset", "LSP", "--sigma", "1.5", "--stride", "4"]
    )
    _, tc = configs_from_args(args)
    assert tc.sigma == 1.5 and tc.stride == 4

    args = build_argparser().parse_args(["--dataset", "LSP"])
    _, tc = configs_from_args(args)
    assert tc.sigma == 3.0 and tc.stride is None

    args = build_argparser().parse_args(
        ["--dataset", "Penn_Action", "--model_arch", "uniposeLSTM"]
    )
    _, tc = configs_from_args(args)
    assert tc.sigma == 1.0
