"""Reconstruction-accuracy metrics against analytic scene SDFs.

The strongest accuracy proxy available in this environment (no real
Replica/Redwood sequences ship with the repo): every synthetic scene
(models/scene.py) has an EXACT signed distance function, so mesh surface
error and surface completeness (F-score) can be evaluated against ground
truth with no annotation noise — mirroring the accuracy-threshold
philosophy of the reference's core test suite (SURVEY.md §4).

All heavy work stays on device (the tunneled TPU's device->host path runs
~seconds/MB): mesh vertices are consumed chunk-by-chunk as device arrays,
GT SDF values are evaluated with jnp, and only a handful of scalar
accumulators are read back.

Metrics (defaults follow common mesh-evaluation practice, e.g. the
TanksAndTemples-style F-score, at thresholds scaled to the voxel size):
  * surface_err_m: mean |scene.sdf(v)| over mesh vertices — how far the
    reconstructed surface sits from the true surface.
  * precision: fraction of mesh vertices within `tau` of the true surface.
  * completeness: fraction of true-surface samples (observed voxel centers
    with |gt_sdf| < voxel/2) that have a mesh vertex within ~tau (voxel-
    grid proximity: the vertex-occupancy grid dilated by one voxel).
  * fscore: harmonic mean of precision and completeness.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.core import world_grid as wg
from isaac_ros_nvblox_tpu.core.types import voxel_centers_for_blocks


def mesh_accuracy(mapper, scene, tau_m: float | None = None
                  ) -> Dict[str, float]:
    """Mesh accuracy of a DeviceMapper's map vs the analytic scene SDF.

    Runs full-map marching cubes on device (cold path), evaluates the
    scene SDF at every valid vertex, and builds a voxel-resolution vertex
    occupancy grid for the completeness test. Restores the mapper's dirty
    bookkeeping (this is a diagnostic, not a pipeline step).
    """
    vox = float(mapper.voxel_size_m)
    tau = float(tau_m) if tau_m is not None else 2.0 * vox

    dirty_save = mapper.dirty
    pending_save = mapper.mesh_pending

    origin, dims = mapper.esdf_region(margin_blocks=0, mult=1)
    origin_vox = jnp.asarray(origin, jnp.int32) * 8
    dims_vox = tuple(int(d) * 8 for d in dims)

    # One jitted reduction per mesh chunk (scene is a hashable frozen
    # dataclass -> static arg; XLA fuses the per-primitive SDF min chain
    # instead of materializing a [n_prims, M] stack, and the coverage
    # grid updates in place via donation). The chunk generator is lazy, so
    # peak HBM is one chunk's soup, not the whole map's.
    n_prims = len(scene.primitives)

    @functools.partial(jax.jit, static_argnames=("scn",),
                       donate_argnums=(0,))
    def _chunk_stats(cover, acc, verts, valid, *, scn):
        vv = verts.reshape(-1, 3, 3).reshape(-1, 3)  # per corner, meters
        okc = jnp.repeat(valid.reshape(-1), 3)
        d = jnp.where(okc, jnp.abs(scn.sdf(vv)), 0.0)
        err_sum, n_verts, n_prec, per_prim, hist = acc
        err_sum = err_sum + jnp.sum(d)
        n_verts = n_verts + jnp.sum(okc.astype(jnp.float32))
        n_prec = n_prec + jnp.sum((okc & (d < tau)).astype(jnp.float32))
        # Error attribution (VERDICT r4 next #7): nearest primitive per
        # vertex (argmin |sdf_i|) + an error histogram in 1/4-voxel bins —
        # which primitives and which error scales drive the mean.
        d_all = jnp.stack([jnp.abs(p.sdf(vv)) for p in scn.primitives])
        pid = jnp.argmin(d_all, axis=0)
        okf = okc.astype(jnp.float32)
        per_prim = per_prim.at[pid].add(
            jnp.stack([okf, d * okf, okf * (d >= tau)], axis=-1))
        bin_i = jnp.clip((d / (0.25 * vox)).astype(jnp.int32), 0, 31)
        hist = hist.at[bin_i].add(okf)
        cell = jnp.floor(vv / vox).astype(jnp.int32) - origin_vox
        dims_a = jnp.asarray(dims_vox, jnp.int32)
        in_g = okc & jnp.all((cell >= 0) & (cell < dims_a), axis=-1)
        cellw = jnp.where(in_g[:, None], cell, dims_a)
        cover = cover.at[cellw[:, 0], cellw[:, 1], cellw[:, 2]].set(
            True, mode="drop")
        return cover, (err_sum, n_verts, n_prec, per_prim, hist)

    cover = jnp.zeros(dims_vox, jnp.bool_)
    acc = (jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
           jnp.zeros((n_prims, 3), jnp.float32),
           jnp.zeros((32,), jnp.float32))
    for verts, colors, valid, bidx in mapper.update_mesh_device(chunk=1024):
        cover, acc = _chunk_stats(cover, acc, verts, valid, scn=scene)
        del verts, colors, valid, bidx
    err_sum, n_verts, n_prec, per_prim, hist = acc

    @functools.partial(jax.jit, static_argnames=("scn",))
    def _completeness(cover, state, w, *, scn):
        # Dilate coverage by one voxel per axis (proximity ~ tau).
        dil = cover
        for axis in range(3):
            dil = dil | jnp.roll(dil, 1, axis) | jnp.roll(dil, -1, axis)
        cap = w.shape[0]
        live = wg.live_slot_mask(state)
        centers = voxel_centers_for_blocks(state.block_index_of_slot, vox)
        gt = scn.sdf(centers.reshape(-1, 3)).reshape(cap, -1)
        gt_surface = (jnp.abs(gt) < 0.5 * vox) & (w > 1e-6) & live[:, None]
        cell = (jnp.floor(centers / vox).astype(jnp.int32)
                - origin_vox).reshape(-1, 3)
        dims_a = jnp.asarray(dims_vox, jnp.int32)
        in_g = jnp.all((cell >= 0) & (cell < dims_a), axis=-1)
        safe = jnp.clip(cell, 0, dims_a - 1)
        covered = dil[safe[:, 0], safe[:, 1], safe[:, 2]] & in_g
        gs = gt_surface.reshape(-1)
        return (jnp.sum(gs.astype(jnp.float32)),
                jnp.sum((gs & covered).astype(jnp.float32)))

    n_surface, n_covered = _completeness(
        cover, mapper.state, mapper.channels["tsdf_weight"], scn=scene)

    out = jax.device_get((err_sum, n_verts, n_prec, n_surface, n_covered))
    err_sum_f, n_verts_f, n_prec_f, n_surface_f, n_covered_f = map(
        float, out)
    per_prim_np = np.asarray(jax.device_get(per_prim))
    hist_np = np.asarray(jax.device_get(hist))

    mapper.dirty = dirty_save
    mapper.mesh_pending = pending_save

    precision = n_prec_f / n_verts_f if n_verts_f else 0.0
    completeness = n_covered_f / n_surface_f if n_surface_f else 0.0
    fscore = (2 * precision * completeness / (precision + completeness)
              if precision + completeness > 0 else 0.0)
    per_primitive = []
    for i, prim in enumerate(scene.primitives):
        n_i, derr_i, far_i = (float(per_prim_np[i, 0]),
                              float(per_prim_np[i, 1]),
                              float(per_prim_np[i, 2]))
        per_primitive.append({
            "prim": f"{type(prim).__name__}[{i}]",
            "n_verts": int(n_i),
            "err_mean_m": round(derr_i / n_i, 4) if n_i else 0.0,
            "frac_of_verts": round(n_i / n_verts_f, 4) if n_verts_f
            else 0.0,
            "frac_beyond_tau": round(far_i / n_i, 4) if n_i else 0.0,
        })
    return {
        "mesh_surface_err_m": err_sum_f / n_verts_f if n_verts_f else
        float("nan"),
        "mesh_precision": precision,
        "mesh_completeness": completeness,
        "mesh_fscore": fscore,
        "mesh_vertices": int(n_verts_f),
        "gt_surface_samples": int(n_surface_f),
        "tau_m": tau,
        "per_primitive": per_primitive,
        "err_hist_quarter_voxel_bins": [round(float(h), 1)
                                        for h in hist_np],
    }
