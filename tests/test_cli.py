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
