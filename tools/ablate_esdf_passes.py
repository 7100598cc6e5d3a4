import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
"""Per-stage cost of the dense-EDT solve on the room_7k shell (r5).

Needed-pruning landed but room_7k stayed ~4.5 ms: shells keep every
z-chunk 'needed' (floor+ceiling). This ladder times seed-scatter, pass1,
repad1, pass2, repad2, pass3 and the slot gather separately (cumulative
variants inside scans, paired vs empty) to find what actually costs.
"""
import json
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from isaac_ros_nvblox_tpu.ops import esdf_dense as ed

    # room_7k shell geometry from tools/esdf_scaling.py
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    from esdf_scaling import _room_shell
    cap, band = 16384, 20
    is_site, cells, n, dims_b = _room_shell((56, 40, 14), cap)
    Nx, Ny, Nz = dims_b
    K, n_steps = 4, 32
    rng = np.random.default_rng(17)
    variants = jnp.stack([
        is_site & jnp.asarray(rng.random((cap, 512)) < 0.97)
        for _ in range(K)])
    alloc = jnp.int32(n)
    origin = jnp.zeros((3,), jnp.int32)

    INF = ed.INF

    # Mirrors esdf_from_sites_dense's r5 pass order: shortest axis first
    # (binary), longest last (most output-pruned).
    order = tuple(int(a) for a in np.argsort([Nx, Ny, Nz], kind="stable"))
    first, mid, last = order
    print("pass order (axes):", order)

    def build_stage_fn(upto):
        def solve(g_site):
            cells_j = cells - origin[None, :]
            live = jnp.arange(cap) < alloc
            in_region = (live
                         & (cells_j[:, 0] >= 0) & (cells_j[:, 0] < Nx)
                         & (cells_j[:, 1] >= 0) & (cells_j[:, 1] < Ny)
                         & (cells_j[:, 2] >= 0) & (cells_j[:, 2] < Nz))
            g0 = jnp.where(g_site, np.float32(0.0), INF)
            lean = ed.binary_pass_lean(band)
            n_lines_f, Sf = ed._line_dims(dims_b, first)
            R = n_lines_f * ed.line_rows(Sf, band, lean)
            row_f = ed._row_of_cell(cells_j[:, 0], cells_j[:, 1],
                                    cells_j[:, 2], dims_b, first, band,
                                    padded=True, lean=lean)
            row_f = jnp.where(in_region, row_f, R)
            slot_of_row = jnp.full((R,), cap, jnp.int32).at[row_f].set(
                jnp.arange(cap, dtype=jnp.int32), mode="drop")
            ok_r = slot_of_row < cap
            rows_f = jnp.where(ok_r[:, None],
                               g0[jnp.clip(slot_of_row, 0, cap - 1)], INF)
            if upto == "seed":
                return jnp.sum(rows_f[:, :1])
            Hb = ed.halo_blocks(band)
            lin = (cells_j[:, 0] * Ny + cells_j[:, 1]) * Nz + cells_j[:, 2]
            lin = jnp.where(in_region, lin, Nx * Ny * Nz)
            alloc_g = jnp.zeros((Nx * Ny * Nz,), jnp.int32).at[lin].set(
                1, mode="drop").reshape(Nx, Ny, Nz)

            def dil(g, ax):
                win = [1, 1, 1]
                win[ax] = 2 * Hb + 1
                return jax.lax.reduce_window(g, jnp.int32(0), jax.lax.max,
                                             tuple(win), (1, 1, 1), "SAME")
            _line_perm = {0: (1, 2, 0), 1: (2, 0, 1), 2: (0, 1, 2)}

            def nr(g, ax):
                return g.transpose(_line_perm[ax]).reshape(-1) > 0
            need_last = alloc_g
            need_mid = dil(need_last, last)
            need_first = dil(need_mid, mid)
            out_f = ed.edt_pass_blockmajor(rows_f, nr(need_first, first),
                                           n_lines=n_lines_f,
                                           Sb=Sf, band=band, axis=first,
                                           binary_input=True, lean=lean)
            if upto == "pass1":
                return jnp.sum(out_f[:, :1])
            rows_m = ed._repad(out_f, dims_b, first, mid, band)
            if upto == "repad1":
                return jnp.sum(rows_m[:, :1])
            n_lines_m, Sm = ed._line_dims(dims_b, mid)
            out_m = ed.edt_pass_blockmajor(rows_m, nr(need_mid, mid),
                                           n_lines=n_lines_m,
                                           Sb=Sm, band=band, axis=mid)
            if upto == "pass2":
                return jnp.sum(out_m[:, :1])
            rows_l = ed._repad(out_m, dims_b, mid, last, band)
            if upto == "repad2":
                return jnp.sum(rows_l[:, :1])
            n_lines_l, Sl = ed._line_dims(dims_b, last)
            out_l = ed.edt_pass_blockmajor(rows_l, nr(need_last, last),
                                           n_lines=n_lines_l,
                                           Sb=Sl, band=band, axis=last)
            if upto == "pass3":
                return jnp.sum(out_l[:, :1])
            row_l = ed._row_of_cell(cells_j[:, 0], cells_j[:, 1],
                                    cells_j[:, 2], dims_b, last, band,
                                    padded=False)
            row_l = jnp.clip(row_l, 0, out_l.shape[0] - 1)
            sq = out_l[row_l]
            return jnp.sum(jnp.where(in_region[:, None], sq, INF)[:, :1])

        def run(ks):
            def step(c, k):
                return jnp.minimum(c, solve(variants[k])), ()
            return jax.lax.scan(step, jnp.float32(1e30), ks)[0]
        return jax.jit(run)

    def t_of(fn, ks):
        t0 = time.perf_counter()
        float(fn(ks))
        return time.perf_counter() - t0

    kinds = ["empty", "seed", "pass1", "repad1", "pass2", "repad2",
             "pass3", "gather"]
    fns = {}
    ks = jnp.arange(n_steps, dtype=jnp.int32) % K
    for kind in kinds:
        if kind == "empty":
            def emp(ks):
                def step(c, k):
                    return c + k.astype(jnp.float32), ()
                return jax.lax.scan(step, jnp.float32(0), ks)[0]
            fns[kind] = jax.jit(emp)
        else:
            fns[kind] = build_stage_fn(kind if kind != "gather" else "all")
        float(fns[kind](ks))
        print("compiled", kind, flush=True)

    out = {}
    for kind in kinds[1:]:
        diffs = []
        for _ in range(5):
            b = t_of(fns["empty"], ks)
            diffs.append(t_of(fns[kind], ks) - b)
        diffs.sort()
        out[kind + "_ms"] = round(max(diffs[2] * 1e3 / n_steps, 0.0), 3)
    prev = 0.0
    for kind in kinds[1:]:
        out["marginal_" + kind + "_ms"] = round(out[kind + "_ms"] - prev, 3)
        prev = out[kind + "_ms"]
    print(json.dumps(out, indent=1))
    pathlib.Path("/root/repo/ESDF_PASSES.json").write_text(
        json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
