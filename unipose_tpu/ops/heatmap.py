"""Batched, device-side Gaussian heatmap target generation.

The reference builds targets one joint at a time with ``np.mgrid`` inside
DataLoader worker processes (Reference: utils/lsp_lspet_data.py:65-68,
224-240), which is a measured CPU bottleneck at batch 8 x 15 channels.  Here
the same math runs as one fused broadcast on device for a whole batch.

Exact semantics preserved:
  * joint centers are ``int(kpt) / stride`` — truncation toward zero, then
    float division (Reference: utils/lsp_lspet_data.py:227-228);
  * the Gaussian is ``exp(-D2 / 2 / sigma / sigma)`` on an integer grid
    (Reference: utils/lsp_lspet_data.py:65-68);
  * values are clamped: ``>1 -> 1`` then ``<0.0099 -> 0``
    (Reference: utils/lsp_lspet_data.py:230-231);
  * channel 0 is the background: ``1 - max(joint channels)``
    (Reference: utils/lsp_lspet_data.py:234).

Layout note: the reference emits CHW; this module emits HWC (TPU-native
channel-last).  ``unipose_tpu.compat`` handles transposition at the API edge.
"""

from __future__ import annotations

import jax.numpy as jnp


def gaussian_kernel(size_w: int, size_h: int, center_x, center_y, sigma) -> jnp.ndarray:
    """Drop-in device equivalent of the reference's ``guassian_kernel``
    (Reference: utils/lsp_lspet_data.py:65-68). Returns (size_h, size_w) f32."""
    gridy = jnp.arange(size_h, dtype=jnp.float32)[:, None]
    gridx = jnp.arange(size_w, dtype=jnp.float32)[None, :]
    d2 = (gridx - center_x) ** 2 + (gridy - center_y) ** 2
    return jnp.exp(-d2 / 2.0 / sigma / sigma)


def gaussian_heatmaps(
    centers: jnp.ndarray, size_hw, sigma, *, clamp: bool = True
) -> jnp.ndarray:
    """Render Gaussians at ``centers`` (..., 2) as (x, y) -> (..., H, W) f32.

    Broadcasts over all leading dims at once (batch, time, joints).
    """
    h, w = int(size_hw[0]), int(size_hw[1])
    centers = jnp.asarray(centers, jnp.float32)
    cx = centers[..., 0][..., None, None]
    cy = centers[..., 1][..., None, None]
    gridy = jnp.arange(h, dtype=jnp.float32)[:, None]
    gridx = jnp.arange(w, dtype=jnp.float32)[None, :]
    d2 = (gridx - cx) ** 2 + (gridy - cy) ** 2
    heat = jnp.exp(-d2 / 2.0 / jnp.float32(sigma) / jnp.float32(sigma))
    if clamp:
        heat = jnp.minimum(heat, 1.0)
        heat = jnp.where(heat < 0.0099, 0.0, heat)
    return heat


def render_targets(
    kpts: jnp.ndarray,
    height: int,
    width: int,
    stride: int,
    sigma,
    *,
    truncate: bool = True,
) -> jnp.ndarray:
    """Full target tensor for a batch of keypoint sets.

    Args:
      kpts: (..., K, 2) joint coordinates (x, y) at input resolution.
      height, width: input resolution (e.g. 368).
      stride: output stride (e.g. 8).
      sigma: Gaussian sigma at heatmap resolution.
      truncate: apply the reference's ``int()`` truncation before dividing by
        stride (disable for already-downscaled coordinates).

    Returns:
      (..., height/stride, width/stride, K+1) f32 heatmaps, channel 0 =
      background.
    """
    kpts = jnp.asarray(kpts, jnp.float32)
    if truncate:
        kpts = jnp.trunc(kpts)
    centers = kpts / jnp.float32(stride)
    hm_h, hm_w = height // stride, width // stride
    # (..., K, H, W) -> (..., H, W, K)
    joint_maps = gaussian_heatmaps(centers, (hm_h, hm_w), sigma)
    joint_maps = jnp.moveaxis(joint_maps, -3, -1)
    background = 1.0 - jnp.max(joint_maps, axis=-1, keepdims=True)
    return jnp.concatenate([background, joint_maps], axis=-1)
