"""Segmentation-mask preprocessing + masked depth splitting.

Reference: nvblox's mask preprocessing — connected-component filtering of
segmentation masks and foreground/background depth-frame splitting for the
human/dynamic mapping modes (SURVEY.md §2.1 "Mask preprocessing"; params
`remove_small_connected_components`,
`connected_mask_component_size_threshold`,
mapper_initialization.cpp:113-133; overlay getters nvblox_node.cpp:1098-1147).

Connected components run on the host via scipy.ndimage (a per-frame 2D
labeling of a mono8 mask is microseconds-scale CPU work; keeping it off the
TPU avoids an awkward iterative device kernel). The split + overlays are
jitted elementwise ops.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def remove_small_connected_components(mask: np.ndarray,
                                      size_threshold: int) -> np.ndarray:
    """Drop mask components smaller than `size_threshold` pixels."""
    from scipy import ndimage
    mask = np.asarray(mask) > 0
    labels, n = ndimage.label(mask)
    if n == 0:
        return mask.astype(np.uint8)
    sizes = np.bincount(labels.reshape(-1))
    keep = sizes >= size_threshold
    keep[0] = False
    return keep[labels].astype(np.uint8)


@jax.jit
def split_depth_by_mask(depth, mask) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(background_depth, foreground_depth): masked-out pixels invalidated.

    Parity: the reference's masked `integrateDepth(depth, mask, ...)` which
    routes background to the static mapper and foreground (mask > 0) to the
    dynamic/people mapper (nvblox_node.cpp:1057-1063).
    """
    fg = mask > 0
    background = jnp.where(fg, 0.0, depth)
    foreground = jnp.where(fg, depth, 0.0)
    return background, foreground


@jax.jit
def mask_overlay(image, mask, color=(255, 0, 0), alpha=0.5):
    """Debug overlay image (parity: getLastDepthFrameMaskOverlay etc.)."""
    img = jnp.asarray(image, jnp.float32)
    if img.ndim == 2:
        img = jnp.stack([img] * 3, axis=-1)
    c = jnp.asarray(color, jnp.float32)
    fg = (mask > 0)[..., None]
    out = jnp.where(fg, img * (1 - alpha) + c * alpha, img)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)
