"""ESDF integrator: Euclidean signed distance field from TSDF/occupancy.

Reference: nvblox's incremental GPU ESDF integrator — wavefront propagation
of squared voxel distances with parent-direction tracking, 2D or 3D mode
(SURVEY.md §2.1 "ESDF integrator"; params at mapper_initialization.cpp:360-372).

NOTE (round 2): the production ESDF is the exact dense banded EDT in
ops/esdf_dense.py. This module keeps the site extraction helpers (used by
both paths) and the XLA relaxation sweep used by the host debugging
backend (mapper/mapper.py). Sweep design: every voxel stores the global
voxel coordinate of its (current) nearest surface site, and iterated
block-local 26-neighbor relaxation sweeps + halo exchange move site
candidates outward:

    outer loop (host, early-exit on convergence):
      gather +-1 halos of (site, has_site) per block   [N,10,10,10]
      inner fori_loop x8: voxel takes the neighbor site minimizing
        ||voxel - site||^2   (26 candidates, branch-free min)
      scatter interior back; report #changed

Each outer iteration propagates distances 8 voxels across block boundaries,
so `ceil(max_esdf_distance / (8 * voxel))` outer iterations suffice. Because
every update is a *full relaxation to currently-known sites* (not an
increment over previous distances), site removal (the "raise" wavefront that
makes incremental ESDF hard) is handled by re-initializing from the TSDF
every update — correct by construction.

Signs follow the reference: `is_inside` comes from the TSDF/occupancy sign;
the propagated distance is unsigned and negated for inside voxels at query
time (EsdfVoxel{squared_distance_vox, is_inside, observed} parity —
esdf_and_gradients_conversions.cu:33-44).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.core.types import VOXELS_PER_SIDE
from isaac_ros_nvblox_tpu.ops.halo import gather_halo

B = VOXELS_PER_SIDE
INF_SQ = jnp.float32(1e12)


@dataclasses.dataclass(frozen=True)
class EsdfIntegratorParams:
    """Mirrors esdf_integrator_* reference params
    (mapper_initialization.cpp:360-372)."""
    max_esdf_distance_m: float = 2.0
    max_site_distance_vox: float = 1.0
    min_weight: float = 1e-4
    # Occupied-space threshold when building sites from occupancy layers.
    occupied_log_odds_threshold: float = 0.0


@functools.partial(jax.jit, static_argnames=("max_site_distance_vox",
                                             "min_weight"))
def esdf_sites_from_tsdf(tsdf_distance, tsdf_weight, *, voxel_size_m,
                         max_site_distance_vox: float, min_weight: float):
    """Derive (is_site, is_inside, observed) `bool[cap, 512]` from TSDF."""
    observed = tsdf_weight >= min_weight
    inside = observed & (tsdf_distance <= 0.0)
    band = max_site_distance_vox * voxel_size_m
    site = observed & (jnp.abs(tsdf_distance) <= band)
    return site, inside, observed


@functools.partial(jax.jit, static_argnames=("occupied_log_odds_threshold",))
def esdf_sites_from_occupancy(log_odds, observed_mask, *,
                              occupied_log_odds_threshold: float):
    """Sites from an occupancy layer: occupied voxels are sites & inside."""
    occupied = observed_mask & (log_odds > occupied_log_odds_threshold)
    return occupied, occupied, observed_mask


@functools.partial(jax.jit, donate_argnums=(0, 1))
def init_esdf_from_sites(site_coord, sq_dist, is_site, block_indices_all):
    """(Re)initialize site/sq_dist pools from the site mask.

    site_coord: f32[cap, 512, 3] — global voxel coords of nearest site.
    sq_dist:    f32[cap, 512]    — squared distance in voxel units.
    is_site:    bool[cap, 512]
    block_indices_all: i32[cap, 3]
    """
    cap = sq_dist.shape[0]
    offs = _local_offsets_f32()  # [512, 3]
    own = (block_indices_all.astype(jnp.float32)[:, None, :] * B + offs[None])
    site_coord = jnp.where(is_site[..., None], own, 0.0)
    sq_dist = jnp.where(is_site, 0.0, INF_SQ)
    return site_coord, sq_dist


@functools.lru_cache(maxsize=1)
def _local_offsets_np() -> np.ndarray:
    r = np.arange(B)
    xx, yy, zz = np.meshgrid(r, r, r, indexing="ij")
    return np.stack([xx, yy, zz], -1).reshape(-1, 3).astype(np.float32)


def _local_offsets_f32() -> jnp.ndarray:
    return jnp.asarray(_local_offsets_np())


_SHIFTS = [(dx, dy, dz)
           for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
           if (dx, dy, dz) != (0, 0, 0)]


@functools.partial(jax.jit, static_argnames=("inner_iters", "max_sq_dist_vox"),
                   donate_argnums=(0, 1))
def esdf_sweep_pass(site_coord, sq_dist, neighbor_slots, slots,
                    block_indices, *, inner_iters: int = B,
                    max_sq_dist_vox: float):
    """One outer relaxation pass over a batch of blocks.

    Returns (site_coord, sq_dist, num_changed). Padding entries must carry
    slot >= cap (dropped at scatter).
    """
    cap = sq_dist.shape[0]
    site_grid = site_coord.reshape(cap, B, B, B, 3)
    sq_grid = sq_dist.reshape(cap, B, B, B)

    site_pad = gather_halo(site_grid, neighbor_slots, lo=1, hi=1, fill=0.0)
    sq_pad = gather_halo(sq_grid, neighbor_slots, lo=1, hi=1, fill=INF_SQ)

    N, P = site_pad.shape[0], B + 2
    # Padded-voxel global coordinates.
    ii = jax.lax.broadcasted_iota(jnp.float32, (P, P, P), 0) - 1.0
    jj = jax.lax.broadcasted_iota(jnp.float32, (P, P, P), 1) - 1.0
    kk = jax.lax.broadcasted_iota(jnp.float32, (P, P, P), 2) - 1.0
    coords = jnp.stack([ii, jj, kk], axis=-1)[None]  # [1, P, P, P, 3]
    coords = coords + (block_indices.astype(jnp.float32) * B)[:, None, None, None, :]

    # Static edge-validity masks per shift (True where the rolled value is real).
    ix = jax.lax.broadcasted_iota(jnp.int32, (P, P, P), 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (P, P, P), 1)
    iz = jax.lax.broadcasted_iota(jnp.int32, (P, P, P), 2)

    def relax_once(state):
        site_p, sq_p = state
        has = sq_p < INF_SQ * 0.5
        best_site, best_sq = site_p, sq_p
        for (dx, dy, dz) in _SHIFTS:
            cand_site = jnp.roll(site_p, shift=(-dx, -dy, -dz), axis=(1, 2, 3))
            cand_has = jnp.roll(has, shift=(-dx, -dy, -dz), axis=(1, 2, 3))
            ok = ((ix + dx >= 0) & (ix + dx < P)
                  & (iy + dy >= 0) & (iy + dy < P)
                  & (iz + dz >= 0) & (iz + dz < P))
            cand_has = cand_has & ok[None]
            diff = coords - cand_site
            cand_sq = jnp.sum(diff * diff, axis=-1)
            better = cand_has & (cand_sq < best_sq) & (cand_sq <= max_sq_dist_vox)
            best_sq = jnp.where(better, cand_sq, best_sq)
            best_site = jnp.where(better[..., None], cand_site, best_site)
        return best_site, best_sq

    def body(_, state):
        return relax_once(state)

    site_p, sq_p = jax.lax.fori_loop(0, inner_iters, body, (site_pad, sq_pad))

    new_site = site_p[:, 1:-1, 1:-1, 1:-1].reshape(N, B ** 3, 3)
    new_sq = sq_p[:, 1:-1, 1:-1, 1:-1].reshape(N, B ** 3)
    old_sq = sq_grid[jnp.clip(slots, 0, cap - 1)].reshape(N, B ** 3)
    in_range = (slots < cap)[:, None]
    changed = jnp.sum(jnp.where(in_range & (new_sq < old_sq - 1e-6), 1, 0))

    site_coord = site_coord.at[slots].set(new_site, mode="drop")
    sq_dist = sq_dist.at[slots].set(new_sq, mode="drop")
    return site_coord, sq_dist, changed


def update_esdf(pool, table, *, voxel_size_m: float,
                params: EsdfIntegratorParams,
                sites_from: str = "tsdf",
                max_outer_iters: int = 16) -> int:
    """Full ESDF update over all allocated blocks. Returns #outer iterations.

    Requires pool channels: `tsdf_distance`/`tsdf_weight` (or
    `occupancy_log_odds` + `occupancy_observed` when `sites_from ==
    "occupancy"`), `esdf_site` f32[cap,512,3], `esdf_sq_dist` f32[cap,512],
    plus bool channels `esdf_is_site`, `esdf_is_inside`, `esdf_observed`.
    """
    if sites_from == "tsdf":
        is_site, is_inside, observed = esdf_sites_from_tsdf(
            pool["tsdf_distance"], pool["tsdf_weight"],
            voxel_size_m=jnp.float32(voxel_size_m),
            max_site_distance_vox=float(params.max_site_distance_vox),
            min_weight=float(params.min_weight))
    elif sites_from == "occupancy":
        is_site, is_inside, observed = esdf_sites_from_occupancy(
            pool["occupancy_log_odds"],
            pool["occupancy_observed"] > 0,
            occupied_log_odds_threshold=float(
                params.occupied_log_odds_threshold))
    else:
        raise ValueError(sites_from)
    pool["esdf_is_site"] = is_site
    pool["esdf_is_inside"] = is_inside
    pool["esdf_observed"] = observed

    bidx_all = jnp.asarray(table.block_indices)
    site, sq = init_esdf_from_sites(
        pool["esdf_site"], pool["esdf_sq_dist"], is_site, bidx_all)

    slots_np = table.allocated_slots()
    if slots_np.size == 0:
        pool["esdf_site"], pool["esdf_sq_dist"] = site, sq
        return 0
    n_pad = 1 << int(np.ceil(np.log2(max(slots_np.size, 64))))
    slots_p = np.full((n_pad,), table.capacity, np.int32)
    slots_p[:slots_np.size] = slots_np
    nb = jnp.asarray(table.neighbors[np.clip(slots_p, 0, table.capacity - 1)])
    bidx = jnp.asarray(table.block_indices[np.clip(slots_p, 0, table.capacity - 1)])
    slots_d = jnp.asarray(slots_p)

    max_sq = (params.max_esdf_distance_m / voxel_size_m) ** 2
    iters = 0
    for iters in range(1, max_outer_iters + 1):
        site, sq, changed = esdf_sweep_pass(
            site, sq, nb, slots_d, bidx, max_sq_dist_vox=float(max_sq))
        if int(changed) == 0:
            break
    pool["esdf_site"] = site
    pool["esdf_sq_dist"] = sq
    return iters


def esdf_distance_m(pool, voxel_size_m: float,
                    max_esdf_distance_m: float) -> jnp.ndarray:
    """Signed metric ESDF `f32[cap, 512]`: negative inside, clamped at max."""
    d = jnp.sqrt(jnp.minimum(pool["esdf_sq_dist"], INF_SQ)) * voxel_size_m
    d = jnp.minimum(d, max_esdf_distance_m)
    return jnp.where(pool["esdf_is_inside"], -d, d)
