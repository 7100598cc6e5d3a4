"""ESDF cost vs map size: does the dense EDT track occupied lines or AABB?

The reference's site-driven wavefront scales with allocated blocks
(nvblox mapper_initialization.cpp:197-200 drives incremental ESDF off the
updated-block set). Our exact separable EDT runs over the allocated-AABB
volume — this sweep measures whether the per-program line-pruning skip
(ops/esdf_dense.py: scalar-prefetch occupancy flags) makes cost track
*occupied* lines instead of AABB volume, including the corridor pathology
(two occupied clusters at the ends of a mostly-empty AABB).

Scenes are synthetic site layouts (room shells at 3 scales + a two-room
"corridor" whose AABB is ~5x its occupied volume). Timing: K site-mask
variants cycled inside ONE 64-step lax.scan whose carry accumulates the
min over outputs (nothing DCE-able; relay dispatch cost amortized —
CLAUDE.md bench methodology).

Writes ESDF_SCALING.json and prints it.
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))  # noqa: E401,E702

import json
import time
from pathlib import Path

import numpy as np


def _room_shell(dims_b, cap):
    """Allocated blocks = the shell (walls/floor/ceiling) of an
    Nx x Ny x Nz block box; sites on each block's outer voxel face."""
    Nx, Ny, Nz = dims_b
    cells = []
    for cx in range(Nx):
        for cy in range(Ny):
            for cz in range(Nz):
                if (cx in (0, Nx - 1) or cy in (0, Ny - 1)
                        or cz in (0, Nz - 1)):
                    cells.append((cx, cy, cz))
    return _site_map(dims_b, cells, cap)


def _two_rooms(room_b, gap_b, cap):
    """Two room shells separated by an empty gap along x: AABB volume is
    ~(2 + gap/room)x the occupied volume -> pruning testbed."""
    Nx, Ny, Nz = room_b
    cells = []
    for x0 in (0, Nx + gap_b):
        for cx in range(Nx):
            for cy in range(Ny):
                for cz in range(Nz):
                    if (cx in (0, Nx - 1) or cy in (0, Ny - 1)
                            or cz in (0, Nz - 1)):
                        cells.append((x0 + cx, cy, cz))
    dims = (2 * Nx + gap_b, Ny, Nz)
    return _site_map(dims, cells, cap)


def _site_map(dims_b, cells, cap):
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    n = len(cells)
    assert n <= cap, (n, cap)
    cells_np = np.zeros((cap, 3), np.int32)
    cells_np[:n] = np.asarray(cells, np.int32)
    # Surface-ish density: ~64 site voxels per shell block (one 8x8 face).
    is_site = np.zeros((cap, 512), bool)
    face = np.zeros((8, 8, 8), bool)
    face[0, :, :] = True
    is_site[:n] = face.reshape(-1)[None, :] & (rng.random((n, 512)) < 0.9)
    return (jnp.asarray(is_site), jnp.asarray(cells_np), n, dims_b)


def _last_pass_model(is_site_np, cells_np, n, dims_b, band):
    """Block-granular model of the LAST banded pass's skip flags (r5
    order: shortest axis first/binary, longest last): a chunk runs iff
    (a) some input row in its +-ceil(band/8)-row candidate window can be
    finite — sites dilated by Hb blocks along the first+mid axes (the
    reach of passes 1-2) — AND (b) some output row in the chunk is
    NEEDED (allocated; needed-output pruning, esdf_from_sites_dense).
    Returns (program_frac, chunk_frac): fraction of 8-line programs with
    any active chunk, and of 8-row chunks active, in the padded last-pass
    layout (carries and candidates are per-active-chunk since r5, so
    chunk_frac IS the work fraction)."""
    from isaac_ros_nvblox_tpu.ops.esdf_dense import (_NL, halo_blocks,
                                                     line_rows)
    dims = list(dims_b)
    order = [int(a) for a in np.argsort(dims, kind="stable")]
    first, mid, last = order
    Sl = dims[last]
    Hb = halo_blocks(band)

    alloc = np.zeros(tuple(dims), bool)
    occ = np.zeros(tuple(dims), bool)
    has = is_site_np[:n].any(axis=1)
    for s in range(n):
        c = tuple(cells_np[s])
        alloc[c] = True
        if has[s]:
            occ[c] = True
    # Input occupancy of the last pass: sites spread by <= band voxels
    # (<= Hb blocks) along the first and mid axes by passes 1-2.
    for ax in (first, mid):
        acc = occ.copy()
        for d in range(1, Hb + 1):
            for sgn in (-d, d):
                acc |= _shift(occ, sgn, ax)
        occ = acc

    _line_perm = {0: (1, 2, 0), 1: (2, 0, 1), 2: (0, 1, 2)}
    occ_l = occ.transpose(_line_perm[last]).reshape(-1, Sl)
    need_l = alloc.transpose(_line_perm[last]).reshape(-1, Sl)
    n_lines = occ_l.shape[0]
    Sp = line_rows(Sl, band)
    n_lines_pad = ((n_lines + _NL - 1) // _NL) * _NL

    rows_occ = np.zeros((n_lines_pad, Sp), bool)
    rows_occ[:n_lines, :Sl] = occ_l
    rows_need = np.zeros((n_lines_pad, Sp), bool)
    rows_need[:n_lines, :Sl] = need_l
    flat_occ = rows_occ.reshape(-1)
    flat_need = rows_need.reshape(-1)
    A = Hb
    ext = np.pad(flat_occ, (A, A))
    n_chunks = len(flat_occ) // 8
    active = np.asarray(
        [ext[c * 8:c * 8 + 8 + 2 * A].any()
         and flat_need[c * 8:c * 8 + 8].any() for c in range(n_chunks)])
    cpl = Sp // 8
    prog = active.reshape(-1, _NL * cpl).any(axis=1)
    return float(prog.mean()), float(active.mean())


def _shift(a, d, axis):
    out = np.zeros_like(a)
    src = [slice(None)] * 3
    dst = [slice(None)] * 3
    if d > 0:
        src[axis], dst[axis] = slice(0, a.shape[axis] - d), slice(d, None)
    else:
        src[axis], dst[axis] = slice(-d, None), slice(0, a.shape[axis] + d)
    out[tuple(dst)] = a[tuple(src)]
    return out


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent /
                          ".jax_cache"))
    import jax.numpy as jnp

    from isaac_ros_nvblox_tpu.ops.esdf_dense import esdf_from_sites_dense

    band = 20  # 1 m at 0.05 m voxels (nvblox default esdf max distance 2 m
    #            uses band 40 at bench scale; 20 keeps the sweep tractable
    #            across 5 sizes — scaling *shape* is what's measured)
    cap = 16384
    K = 4        # site-mask variants cycled per scan step (defeat hoisting)
    n_steps = 64

    scenes = {
        # Replica-office scale and up: shells of increasing block count
        # (suffix = allocated shell blocks).
        "room_0.7k": _room_shell((16, 12, 8), cap),
        "room_2k": _room_shell((28, 22, 10), cap),
        "room_4k": _room_shell((40, 32, 12), cap),
        "room_7k": _room_shell((56, 40, 14), cap),
        # AABB ~4.4x occupied volume: the corridor pathology.
        "two_rooms_gap": _two_rooms((16, 12, 8), 32, cap),
    }

    results = []
    for name, (is_site, cells, n, dims_b) in scenes.items():
        alloc = jnp.int32(n)
        origin = jnp.zeros((3,), jnp.int32)
        # K variants: jitter the site mask so each scan step's input is new.
        rng = np.random.default_rng(17)
        variants = jnp.stack([
            is_site & jnp.asarray(rng.random((cap, 512)) < 0.97)
            for _ in range(K)])

        def step(carry, k, _v=variants, _a=alloc, _o=origin, _d=dims_b):
            sq = esdf_from_sites_dense(_v[k], cells, _a, _o,
                                       dims_b=_d, band=band)
            return jnp.minimum(carry, sq), ()

        @jax.jit
        def run(_v=variants, _step=step):
            init = jnp.full((cap, 512), np.float32(1e12))
            ks = jnp.arange(n_steps, dtype=jnp.int32) % K
            out, _ = jax.lax.scan(_step, init, ks)
            return out

        out = run()
        float(jnp.sum(out[:1, :1]))  # compile + completion barrier
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run()
            float(jnp.sum(out[:1, :1]))
            best = min(best, time.perf_counter() - t0)
        ms = best * 1e3 / n_steps

        Nx, Ny, Nz = dims_b
        pf, cf = _last_pass_model(np.asarray(is_site), np.asarray(cells),
                                  n, dims_b, band)
        results.append({
            "scene": name,
            "allocated_blocks": n,
            "aabb_block_volume": Nx * Ny * Nz,
            "occupied_frac": round(n / (Nx * Ny * Nz), 4),
            "lastpass_active_program_frac": round(pf, 4),
            "lastpass_active_chunk_frac": round(cf, 4),
            "esdf_ms": round(ms, 3),
        })
        print(results[-1])

    # Scaling diagnosis: ms per occupied block across the room series, and
    # the corridor's cost relative to what pure AABB-volume scaling would
    # predict from room_0.7k (same shell family as the corridor's rooms).
    rooms = {r["scene"]: r for r in results}
    per_block_ns = {r["scene"]: 1e6 * r["esdf_ms"] / r["allocated_blocks"]
                    for r in results}
    vol_pred = (rooms["room_0.7k"]["esdf_ms"]
                * rooms["two_rooms_gap"]["aabb_block_volume"]
                / rooms["room_0.7k"]["aabb_block_volume"])
    doc = {
        "band_vox": band,
        "scenes": results,
        "ns_per_allocated_block": {k: round(v, 1)
                                   for k, v in per_block_ns.items()},
        "corridor_vs_aabb_volume_prediction": round(
            rooms["two_rooms_gap"]["esdf_ms"] / vol_pred, 3),
        "note": "corridor ratio < 1 means cost tracks occupied lines, "
                "not AABB volume (pruning active). lastpass_* model the "
                "r5 longest-axis-last banded pass: chunk flag = input "
                "occupancy window AND needed-output (allocated); since "
                "r5 carries+candidates are per-active-chunk, chunk_frac "
                "approximates the work fraction.",
        "device": str(jax.devices()[0]),
    }
    out_path = Path(__file__).resolve().parent.parent / "ESDF_SCALING.json"
    out_path.write_text(json.dumps(doc, indent=1))
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
