"""Converter tests: torch state_dict layout -> flax variables."""

import os

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from unipose_tpu.compat.torch_convert import (
    convert_state_dict,
    to_nchw,
    to_nhwc,
)
from unipose_tpu.models.unipose_lstm import ConvLSTMCell


def test_layout_helpers(rng):
    x = rng.randn(2, 3, 5, 7).astype(np.float32)
    assert to_nhwc(x).shape == (2, 5, 7, 3)
    np.testing.assert_array_equal(to_nchw(to_nhwc(x)), x)


def test_key_intersection_and_transpose(rng):
    template = {
        "params": {
            "backbone": {"conv1": {"weight": np.zeros((7, 7, 3, 64), np.float32)}},
            "wasp": {
                "bn1": {
                    "weight": np.zeros((256,), np.float32),
                    "bias": np.zeros((256,), np.float32),
                }
            },
        },
        "batch_stats": {
            "wasp": {
                "bn1": {
                    "running_mean": np.zeros((256,), np.float32),
                    "running_var": np.ones((256,), np.float32),
                }
            }
        },
    }
    w = rng.randn(64, 3, 7, 7).astype(np.float32)
    rm = rng.randn(256).astype(np.float32)
    state = {
        "backbone.conv1.weight": w,
        "wasp.bn1.running_mean": rm,
        "wasp.bn1.num_batches_tracked": np.array(5),
        "decoder.conv2.weight": rng.randn(256, 2048, 1, 1).astype(np.float32),  # dead
        "nonexistent.thing": rng.randn(3).astype(np.float32),
    }
    out, report = convert_state_dict(state, template)
    np.testing.assert_array_equal(
        out["params"]["backbone"]["conv1"]["weight"], w.transpose(2, 3, 1, 0)
    )
    np.testing.assert_array_equal(
        out["batch_stats"]["wasp"]["bn1"]["running_mean"], rm
    )
    assert "decoder.conv2.weight" in report["skipped"]
    assert "nonexistent.thing" in report["skipped"]
    assert "backbone.conv1.weight" in report["loaded"]
    # untouched template values preserved
    np.testing.assert_array_equal(
        out["batch_stats"]["wasp"]["bn1"]["running_var"], np.ones((256,))
    )


def test_lstm_gate_packing_matches_torch(rng):
    """Per-gate reference weights, packed by the converter, must reproduce
    the torch gate math through ConvLSTMCell."""
    ch = 15
    gates = ("g", "i", "o", "f")
    state = {}
    for xh in ("x", "h"):
        for g in gates:
            state[f"lstm.conv_{g}{xh}_lstm.weight"] = (
                rng.randn(ch, ch, 3, 3).astype(np.float32) * 0.1
            )
            state[f"lstm.conv_{g}{xh}_lstm.bias"] = rng.randn(ch).astype(np.float32)

    cell_mod = ConvLSTMCell(ch)
    x = rng.randn(1, 8, 8, ch).astype(np.float32)
    h = rng.randn(1, 8, 8, ch).astype(np.float32)
    c = rng.randn(1, 8, 8, ch).astype(np.float32)
    template = cell_mod.init(
        jax.random.PRNGKey(0), (jnp.asarray(c), jnp.asarray(h)), jnp.asarray(x)
    )
    template = jax.tree_util.tree_map(np.asarray, dict(template))
    # re-root: cell params live at params/<gates>; converter expects params/lstm/...
    template = {"params": {"lstm": template["params"]}}
    out, report = convert_state_dict(state, template, variant="lstm")
    assert not report["skipped"], report["skipped"]
    cell_params = {"params": out["params"]["lstm"]}

    (cell_j, hide_j), _ = cell_mod.apply(
        cell_params, (jnp.asarray(c), jnp.asarray(h)), jnp.asarray(x)
    )

    conv = lambda t, n, xh: F.conv2d(  # noqa: E731
        t,
        torch.from_numpy(state[f"lstm.conv_{n}{xh}_lstm.weight"]),
        torch.from_numpy(state[f"lstm.conv_{n}{xh}_lstm.bias"]),
        padding=1,
    )
    xt = torch.from_numpy(to_nchw(x).copy())
    ht = torch.from_numpy(to_nchw(h).copy())
    ct = torch.from_numpy(to_nchw(c).copy())
    gt = torch.tanh(conv(xt, "g", "x") + conv(ht, "g", "h"))
    it = torch.sigmoid(conv(xt, "i", "x") + conv(ht, "i", "h"))
    ot = torch.sigmoid(conv(xt, "o", "x") + conv(ht, "o", "h"))
    ft = torch.sigmoid(conv(xt, "f", "x") + conv(ht, "f", "h"))
    cell_t = ft * ct + it * gt
    hide_t = ot * torch.tanh(cell_t)
    np.testing.assert_allclose(
        np.asarray(cell_j), to_nhwc(cell_t.numpy()), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(hide_j), to_nhwc(hide_t.numpy()), rtol=1e-4, atol=1e-5
    )


def test_head_reroot(rng):
    template = {
        "params": {
            "head": {
                "conv1": {
                    "weight": np.zeros((11, 11, 15, 128), np.float32),
                    "bias": np.zeros((128,), np.float32),
                }
            }
        }
    }
    w = rng.randn(128, 15, 11, 11).astype(np.float32)
    out, report = convert_state_dict(
        {"conv1.weight": w, "conv1.bias": rng.randn(128).astype(np.float32)},
        template,
        variant="lstm",
    )
    assert report["loaded"] == ["conv1.weight", "conv1.bias"]
    np.testing.assert_array_equal(
        out["params"]["head"]["conv1"]["weight"], w.transpose(2, 3, 1, 0)
    )


def test_torchvision_backbone_prefix(rng):
    """Raw torchvision-style keys load into the backbone subtree via
    key_prefix (reference ImageNet warm start, resnet.py:138-150)."""
    template = {
        "params": {
            "backbone": {
                "conv1": {"weight": np.zeros((7, 7, 3, 64), np.float32)},
                "layer1": {
                    "0": {"conv1": {"weight": np.zeros((1, 1, 64, 64), np.float32)}}
                },
            }
        },
        "batch_stats": {},
    }
    w = rng.randn(64, 3, 7, 7).astype(np.float32)
    state = {
        "conv1.weight": w,
        "layer1.0.conv1.weight": rng.randn(64, 64, 1, 1).astype(np.float32),
        "fc.weight": rng.randn(1000, 2048).astype(np.float32),  # no target
    }
    out, report = convert_state_dict(state, template, key_prefix="backbone.")
    assert "backbone.conv1.weight" in report["loaded"]
    assert "backbone.fc.weight" in report["skipped"]
    np.testing.assert_array_equal(
        out["params"]["backbone"]["conv1"]["weight"], w.transpose(2, 3, 1, 0)
    )


def test_load_torch_checkpoint_file(tmp_path, rng):
    """Round-trip through a real torch .pth.tar file, including the
    reference's {'state_dict': ...} wrapper and module. prefix stripping."""
    state = {
        "module.backbone.conv1.weight": torch.from_numpy(
            rng.randn(64, 3, 7, 7).astype(np.float32)
        ),
        "module.wasp.bn1.running_mean": torch.from_numpy(
            rng.randn(256).astype(np.float32)
        ),
    }
    path = str(tmp_path / "ckpt_best.pth.tar")
    torch.save({"state_dict": state}, path)

    from unipose_tpu.compat.torch_convert import load_torch_checkpoint

    loaded = load_torch_checkpoint(path)
    assert set(loaded) == {"backbone.conv1.weight", "wasp.bn1.running_mean"}
    np.testing.assert_array_equal(
        loaded["backbone.conv1.weight"],
        state["module.backbone.conv1.weight"].numpy(),
    )


def test_load_torch_checkpoint_subprocess_isolated(tmp_path, rng):
    """The torch read must work from a process that has NOT imported torch
    (``cli.train --pretrained`` on a TPU host: importing torch after the
    axon client is live deadlocks, so the read subprocess-isolates).  This
    test pins the child-process path by invoking it from a fresh
    interpreter that asserts torch stays unimported in the parent."""
    import subprocess
    import sys

    state = {"module.decoder.last_conv.bias": torch.from_numpy(
        rng.randn(15).astype(np.float32)
    )}
    path = str(tmp_path / "ckpt_best.pth.tar")
    torch.save({"state_dict": state}, path)

    child = f"""
import sys
assert "torch" not in sys.modules
from unipose_tpu.compat.torch_convert import load_torch_checkpoint
d = load_torch_checkpoint({path!r})
assert "torch" not in sys.modules, "parent process imported torch"
assert list(d) == ["decoder.last_conv.bias"], list(d)
assert d["decoder.last_conv.bias"].shape == (15,)
print("ok")
"""
    out = subprocess.run(
        [sys.executable, "-c", child],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr
    assert "ok" in out.stdout


def _tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _tree_equal(a[k], b[k], f"{path}.{k}")
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=path)


def test_export_state_dict_roundtrip_image():
    from unipose_tpu.compat.torch_export import export_state_dict
    from unipose_tpu.core.config import ModelConfig
    from unipose_tpu.models.unipose import init_model

    model, variables = init_model(
        ModelConfig(dataset="LSP", num_classes=14),
        jax.random.PRNGKey(7),
        input_size=64,
    )
    sd = export_state_dict(variables, variant="image")
    assert "backbone.conv1.weight" in sd
    assert sd["backbone.conv1.weight"].shape[0] == 64  # OIHW
    assert "backbone.bn1.num_batches_tracked" in sd

    template = jax.tree_util.tree_map(np.zeros_like, jax.device_get(variables))
    restored, report = convert_state_dict(sd, template, variant="image")
    assert report["skipped"] == [], report["skipped"][:10]
    _tree_equal(jax.device_get(variables), restored)


def test_export_state_dict_roundtrip_lstm():
    from unipose_tpu.compat.torch_export import export_state_dict
    from unipose_tpu.core.config import ModelConfig
    from unipose_tpu.models.unipose import init_model

    model, variables = init_model(
        ModelConfig(
            dataset="Penn_Action", num_classes=13, variant="lstm", frame_memory=2
        ),
        jax.random.PRNGKey(8),
        input_size=64,
    )
    sd = export_state_dict(variables, variant="lstm")
    # fused gates split back to per-gate reference names, head re-rooted
    for g in "giof":
        assert f"lstm.conv_{g}x_lstm.weight" in sd
        assert f"lstm.conv_{g}h_lstm.bias" in sd
    assert "conv1.weight" in sd and "head.conv1.weight" not in sd
    assert sd["conv1.weight"].shape[-2:] == (11, 11)  # OIHW 11x11 head

    template = jax.tree_util.tree_map(np.zeros_like, jax.device_get(variables))
    restored, report = convert_state_dict(sd, template, variant="lstm")
    assert report["skipped"] == [], report["skipped"][:10]
    _tree_equal(jax.device_get(variables), restored)
