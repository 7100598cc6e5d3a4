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


@functools.partial(jax.jit,
                   static_argnames=("size_threshold", "downsample", "iters"))
def remove_small_connected_components_device(mask, size_threshold: int,
                                             downsample: int = 4,
                                             iters: int = 48):
    """Device-resident small-component removal (zero host syncs).

    The scipy path costs a ~30 ms device->host mask readback per frame on
    tunneled TPUs — this keeps the reference's semantics on-device at
    `downsample`-granularity: (1) max-pool the mask `downsample`x, (2)
    min-label propagation (`iters` rounds of 3x3 reduce_window — labels
    converge to each component's min linear index; components with
    diameter > iters cells are conservatively KEPT in pieces, never
    dropped... large components are the kept ones anyway), (3) component
    sizes by sorting labels and differencing run boundaries (sort-based,
    no histograms), (4) keep components with
    size >= size_threshold / downsample^2, upsample, AND with the input.

    Approximation vs scipy: component sizes are counted on the downsampled
    grid (granularity `downsample**2` px) and 8-connectivity at that
    granularity; borderline-size components may differ. That matches how
    the filter is used — dropping speck noise, not exact-size analysis
    (mapper_initialization.cpp:113-133).
    """
    H, W = mask.shape
    m = mask > 0
    ds = downsample
    Hp, Wp = ((H + ds - 1) // ds) * ds, ((W + ds - 1) // ds) * ds
    mp = jnp.pad(m, ((0, Hp - H), (0, Wp - W)))
    small = jax.lax.reduce_window(mp.astype(jnp.float32), -jnp.inf,
                                  jax.lax.max, (ds, ds), (ds, ds),
                                  "VALID") > 0.5           # (Hp/ds, Wp/ds)
    h, w = small.shape
    n = h * w
    big = jnp.int32(n)
    labels = jnp.where(small,
                       jnp.arange(n, dtype=jnp.int32).reshape(h, w), big)

    def body(_, lab):
        prop = jax.lax.reduce_window(lab, big, jax.lax.min, (3, 3), (1, 1),
                                     "SAME")
        return jnp.where(small, prop, big)

    labels = jax.lax.fori_loop(0, iters, body, labels)

    # Sizes by sorted run-length: sort labels, run starts where the value
    # changes, each element's component size = next_start - my_start,
    # scattered back through the sort permutation.
    flat = labels.reshape(-1)
    order = jnp.argsort(flat)
    s = flat[order]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    start_pos = jax.lax.cummax(jnp.where(is_start, idx, 0))
    # next run start after each position (reverse cummin of start positions
    # of following runs): compute via flipped cummax on flipped starts.
    nxt = jnp.where(is_start, idx, n)
    next_start = jnp.flip(jax.lax.cummin(jnp.flip(
        jnp.concatenate([nxt[1:], jnp.asarray([n], jnp.int32)]))))
    size_sorted = next_start - start_pos
    keep_sorted = (s < big) & (size_sorted * (ds * ds) >= size_threshold)
    keep_flat = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    keep = keep_flat.reshape(h, w)
    keep_full = jnp.repeat(jnp.repeat(keep, ds, axis=0), ds, axis=1)[:H, :W]
    return (m & keep_full).astype(jnp.uint8)


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
