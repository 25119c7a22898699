"""Model-level contracts: shapes, dtype policy, train-mode stats/dropout,
LSTM scan semantics (first-frame cell, streaming chunks, torch-oracle gate
math)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from unipose_tpu.models.unipose import UniPose
from unipose_tpu.models.unipose_lstm import ConvLSTM0, ConvLSTMCell, UniPoseLSTM


SIZE = 96  # small spatial size: all model ratios preserved (96/16=6, 96/4=24)


@pytest.fixture(scope="module")
def image_model():
    m = UniPose(num_classes=14)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    return m, v


@pytest.fixture(scope="module")
def lstm_model():
    m = UniPoseLSTM(num_classes=13)
    f = jnp.zeros((1, 2, SIZE, SIZE, 3))
    c = jnp.zeros((1, 2, SIZE, SIZE, 1))
    v = m.init(jax.random.PRNGKey(0), f, c, train=False)
    return m, v


def test_image_output_shape(image_model):
    m, v = image_model
    out = m.apply(v, jnp.zeros((2, SIZE, SIZE, 3)), train=False)
    assert out.shape == (2, SIZE // 8, SIZE // 8, 15)
    assert out.dtype == jnp.float32


def test_image_train_updates_batch_stats(image_model, rng):
    m, v = image_model
    x = jnp.asarray(rng.randn(2, SIZE, SIZE, 3).astype(np.float32))
    out, updates = m.apply(
        v,
        x,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    old = v["batch_stats"]["backbone"]["bn1"]["running_mean"]
    new = updates["batch_stats"]["backbone"]["bn1"]["running_mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_freeze_bn_uses_running_stats_and_keeps_dropout(image_model, rng):
    """freeze_bn=True = torch model.freeze_bn() intent (Reference:
    model/unipose.py:24-25,40-45, broken upstream): during training BN
    normalizes with running stats and does NOT update them, while dropout
    stays active and BN affine params still receive gradients."""
    m, v = image_model
    mf = UniPose(num_classes=14, freeze_bn=True)
    x = jnp.asarray(rng.randn(2, SIZE, SIZE, 3).astype(np.float32))

    out, updates = mf.apply(
        v, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    # stats untouched
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        v["batch_stats"], updates["batch_stats"],
    )
    # differs from the unfrozen train forward (which uses batch stats)
    out_train, _ = m.apply(
        v, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert not np.allclose(np.asarray(out), np.asarray(out_train))
    # dropout still active: a different rng changes the output
    out2, _ = mf.apply(
        v, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    # BN affine params still get gradients
    def loss_fn(params):
        y, _ = mf.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return jnp.sum(y**2)

    grads = jax.grad(loss_fn)(v["params"])
    g = np.asarray(grads["backbone"]["bn1"]["weight"])
    assert np.any(g != 0)


def test_image_bf16_compute_f32_out(rng):
    m = UniPose(num_classes=14, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.randn(1, SIZE, SIZE, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    # params stay f32
    assert v["params"]["backbone"]["conv1"]["weight"].dtype == jnp.float32
    out = m.apply(v, x, train=False)
    assert out.dtype == jnp.float32


def test_lstm_output_shape(lstm_model):
    m, v = lstm_model
    f = jnp.zeros((2, 4, SIZE, SIZE, 3))
    c = jnp.zeros((2, 4, SIZE, SIZE, 1))
    out = m.apply(v, f, c, train=False)
    assert out.shape == (2, 4, SIZE // 8, SIZE // 8, 14)
    assert (np.asarray(out) >= 0).all()  # head is ReLU'd (uniposeLSTM.py:124)


def test_lstm_single_frame(lstm_model):
    m, v = lstm_model
    f = jnp.zeros((1, 1, SIZE, SIZE, 3))
    c = jnp.zeros((1, 1, SIZE, SIZE, 1))
    out = m.apply(v, f, c, train=False)
    assert out.shape == (1, 1, SIZE // 8, SIZE // 8, 14)


def test_lstm_streaming_chunks_match_full(lstm_model, rng):
    """Chunked eval with carried state == one full rollout (long-video path)."""
    m, v = lstm_model
    f = jnp.asarray(rng.randn(1, 4, SIZE, SIZE, 3).astype(np.float32))
    c = jnp.asarray(rng.rand(1, 4, SIZE, SIZE, 1).astype(np.float32))

    full = m.apply(v, f, c, train=False)

    out1, inter = m.apply(
        v, f[:, :2], c[:, :2], train=False, mutable=["intermediates"]
    )
    state = inter["intermediates"]["final_state"][0]
    out2 = m.apply(v, f[:, 2:], c[:, 2:], train=False, initial_state=state)

    got = np.concatenate([np.asarray(out1), np.asarray(out2)], axis=1)
    np.testing.assert_allclose(got, np.asarray(full), rtol=1e-4, atol=1e-5)


def _conv_w(rng, cout, cin, k):
    return rng.randn(cout, cin, k, k).astype(np.float32) * 0.1


def _conv_b(rng, cout):
    return rng.randn(cout).astype(np.float32) * 0.1


def test_convlstm0_matches_torch_math(rng):
    """cell = tanh(g*i), hide = o*cell (uniposeLSTM.py:17-24)."""
    ch = 15
    x = rng.randn(1, 10, 10, ch).astype(np.float32)
    ws = {n: _conv_w(rng, ch, ch, 3) for n in ("g", "i", "o")}
    bs = {n: _conv_b(rng, ch) for n in ("g", "i", "o")}

    m = ConvLSTM0(ch)
    params = {
        "params": {
            f"conv_{n}_lstm": {
                "weight": jnp.asarray(ws[n].transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(bs[n]),
            }
            for n in ("g", "i", "o")
        }
    }
    cell, hide = m.apply(params, jnp.asarray(x))

    xt = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    conv = lambda n: F.conv2d(  # noqa: E731
        xt, torch.from_numpy(ws[n]), torch.from_numpy(bs[n]), padding=1
    )
    g, i, o = torch.tanh(conv("g")), torch.sigmoid(conv("i")), torch.sigmoid(conv("o"))
    cell_t = torch.tanh(g * i)
    hide_t = o * cell_t
    np.testing.assert_allclose(
        np.asarray(cell), np.moveaxis(cell_t.numpy(), 1, -1), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(hide), np.moveaxis(hide_t.numpy(), 1, -1), rtol=1e-4, atol=1e-5
    )


def test_convlstm_cell_matches_torch_math(rng):
    """cell = f*prev + i*g, hide = o*tanh(cell) with fused-gate packing
    order (g, i, o, f) (uniposeLSTM.py:40-64)."""
    ch = 15
    x = rng.randn(1, 10, 10, ch).astype(np.float32)
    hprev = rng.randn(1, 10, 10, ch).astype(np.float32)
    cprev = rng.randn(1, 10, 10, ch).astype(np.float32)
    gates = ("g", "i", "o", "f")
    wx = {n: _conv_w(rng, ch, ch, 3) for n in gates}
    bx = {n: _conv_b(rng, ch) for n in gates}
    wh = {n: _conv_w(rng, ch, ch, 3) for n in gates}
    bh = {n: _conv_b(rng, ch) for n in gates}

    def pack(ws, bs):
        w = np.concatenate([ws[n] for n in gates], axis=0)  # (4C, C, 3, 3)
        b = np.concatenate([bs[n] for n in gates], axis=0)
        return jnp.asarray(w.transpose(2, 3, 1, 0)), jnp.asarray(b)

    wxp, bxp = pack(wx, bx)
    whp, bhp = pack(wh, bh)
    m = ConvLSTMCell(ch)
    params = {
        "params": {
            "conv_x_gates": {"weight": wxp, "bias": bxp},
            "conv_h_gates": {"weight": whp, "bias": bhp},
        }
    }
    (cell, hide), out = m.apply(
        params, (jnp.asarray(cprev), jnp.asarray(hprev)), jnp.asarray(x)
    )

    xt = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    ht = torch.from_numpy(np.moveaxis(hprev, -1, 1).copy())
    ct = torch.from_numpy(np.moveaxis(cprev, -1, 1).copy())
    conv = lambda t, w, b: F.conv2d(  # noqa: E731
        t, torch.from_numpy(w), torch.from_numpy(b), padding=1
    )
    gt = torch.tanh(conv(xt, wx["g"], bx["g"]) + conv(ht, wh["g"], bh["g"]))
    it = torch.sigmoid(conv(xt, wx["i"], bx["i"]) + conv(ht, wh["i"], bh["i"]))
    ot = torch.sigmoid(conv(xt, wx["o"], bx["o"]) + conv(ht, wh["o"], bh["o"]))
    ft = torch.sigmoid(conv(xt, wx["f"], bx["f"]) + conv(ht, wh["f"], bh["f"]))
    cell_t = ft * ct + it * gt
    hide_t = ot * torch.tanh(cell_t)
    np.testing.assert_allclose(
        np.asarray(cell), np.moveaxis(cell_t.numpy(), 1, -1), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(hide), np.moveaxis(hide_t.numpy(), 1, -1), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(hide))


def test_stream_video_matches_full_rollout(lstm_model, rng):
    """eval.video.stream_video (chunked, carried state) == one full scan,
    including non-multiple-of-chunk lengths (padding path)."""
    import dataclasses

    from unipose_tpu.core.config import DATASETS
    from unipose_tpu.eval.video import stream_video
    from unipose_tpu.train.steps import make_centermaps, preprocess_images

    m, v = lstm_model
    spec = dataclasses.replace(DATASETS["Penn_Action"], input_size=SIZE)
    t_total = 5  # not a multiple of chunk=2 -> exercises padding
    frames = rng.rand(1, t_total, SIZE, SIZE, 3).astype(np.float32) * 255
    centers = (rng.rand(1, t_total, 2) * SIZE).astype(np.float32)

    full = m.apply(
        v,
        preprocess_images(jnp.asarray(frames)),
        make_centermaps(jnp.asarray(centers), spec),
        train=False,
    )
    streamed = stream_video(
        m, v["params"], v["batch_stats"], frames, centers, spec, chunk=2
    )
    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, np.asarray(full), rtol=1e-4, atol=1e-5)

    # device-side twin: scan over chunks inside one program == host loop
    from unipose_tpu.eval.video import stream_video_scan

    scanned = np.asarray(
        stream_video_scan(
            m, v["params"], v["batch_stats"], frames, centers, spec, chunk=2
        )
    )
    assert scanned.shape == full.shape
    np.testing.assert_allclose(scanned, np.asarray(full), rtol=1e-4, atol=1e-5)
    # single-chunk shape path (n_chunks == 1)
    one = np.asarray(
        stream_video_scan(
            m, v["params"], v["batch_stats"],
            frames[:, :2], centers[:, :2], spec, chunk=2,
        )
    )
    np.testing.assert_allclose(
        one, np.asarray(full)[:, :2], rtol=1e-4, atol=1e-5
    )


def test_bbox_head_variant(rng):
    """bbox-head variant: (K+1 keypoint maps, 5 box maps) split, feeding the
    multi-person postproc (model/unipose.py:34-35, decoder.py:31)."""
    m = UniPose(num_classes=14, bbox_head=True)
    x = jnp.asarray(rng.randn(1, SIZE, SIZE, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    kpt_maps, box_maps = m.apply(v, x, train=False)
    assert kpt_maps.shape == (1, SIZE // 8, SIZE // 8, 15)
    assert box_maps.shape == (1, SIZE // 8, SIZE // 8, 5)

    # postproc consumes the concatenated layout (NCHW, box channels at K+1)
    from unipose_tpu.compat.torch_convert import to_nchw
    from unipose_tpu.postproc.multi_person import multi_person_kpts

    maps = to_nchw(np.concatenate([np.asarray(kpt_maps), np.asarray(box_maps)], -1))
    kpts = multi_person_kpts(maps, "LSP", num_joints=14)
    assert isinstance(kpts, list)
