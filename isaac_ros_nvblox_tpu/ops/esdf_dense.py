"""Dense separable ESDF: exact banded Euclidean distance transform.

Reference behavior: nvblox's ESDF integrator propagates squared voxel
distances from TSDF/occupancy surface sites out to `max_esdf_distance`
(SURVEY.md §2.1 "ESDF integrator"; EsdfVoxel{squared_distance_vox,
is_inside, observed} parity — esdf_and_gradients_conversions.cu:33-44).
The CUDA implementation is an incremental wavefront over the block hash.

TPU-native design (round 2, replacing the iterated 26-neighbor sweeps of
ops/esdf.py): because the WorldGrid is a bounded dense world, the ESDF is
computed as an **exact separable squared EDT** over the axis-aligned
bounding box of the allocated blocks:

    dt(x,y,z) = min_{site s} (x-sx)^2 + (y-sy)^2 + (z-sz)^2

decomposes into three 1-D banded min-plus passes (classic separable EDT),
each `out[i] = min_{|k|<=band} in[i+k] + k^2`. Exactness: any voxel within
`max_esdf_distance` of a site has per-axis offsets <= band, and capping
intermediates beyond band^2 only removes candidates that exceed the cap.

The passes run **directly on block-major rows** `f32[n_rows, 512]` (the
pool's native layout; voxel lane v = lx*64 + ly*8 + lz) — no voxel-level
repacking to a dense [X,Y,Z] array is ever needed:

  * per pass, rows are ordered so the scan-axis blocks of one (u,v)-line
    are contiguous, with `halo_blocks` INF rows between lines;
  * a shift by k = 8a + b decomposes into a lane roll by b*m (m = the
    scan coordinate's lane stride: 64/8/1 for x/y/z) plus a block-row
    offset a (+1 for lanes whose intra-block coordinate wraps). The
    kernel precomputes 7 carry-combined buffers C_b in VMEM, after which
    every one of the 2*band+1 candidates is a single aligned sublane-
    offset read + add + min;
  * between passes, rows are re-ordered by a **row gather** with a
    permutation that is a compile-time constant (row gathers are fast on
    TPU; element-level transposes are not).

Compared with round-1's relaxation sweeps this is exact (no staleness, no
warm/cold split, no "raise" problem — every update is a full re-solve),
and ~6x faster at bench scale.

Incremental updates (`region` argument): recomputing only the dirty-block
AABB + band margin is exact, because a voxel's distance can only change if
some site within `band` of it changed, and sites only change in dirty
(TSDF-updated) blocks.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = np.float32(1e12)
V = 512  # voxels per block

# Lane stride of the intra-block coordinate along each axis for the pool's
# voxel layout v = lx*64 + ly*8 + lz.
_LANE_STRIDE = {0: 64, 1: 8, 2: 1}


def halo_blocks(band: int) -> int:
    """INF gap rows BETWEEN consecutive lines (shared, not per end).

    Lean layout (round 4): lines start at local row 0 and are separated
    by one shared gap of ceil(band/8) INF rows — enough that (a) banded
    candidate reads (|a| <= band//8 rows) from one line's output rows
    never touch another line's real rows, and (b) pass-1 log-doubling
    leakage across the gap carries L1 distance >= 8*gap + 1 > band, which
    the final band clamp squashes. The old layout paid 2*(band//8 + 1)
    rows per line plus round-to-8 padding (~20-30% of all pass volume at
    band 40); NL = 8 lines per program keeps any Sp a legal Mosaic
    sublane multiple without per-line rounding."""
    return (band + 7) // 8


def line_rows(Sb: int, band: int, lean: bool = False) -> int:
    """Rows per line in pass-input layout: Sb real rows + the shared
    inter-line INF gap, rounded to a multiple of 8 so chunk and line
    boundaries stay aligned (the round-up rows extend the gap).

    lean=True (r5, BINARY first pass only): no round-to-8 — the
    log-doubling kernel has no 8-row chunk machinery, line isolation only
    needs the Hb-row gap (leakage L1 >= 8*Hb + 1 > band, squashed by the
    final clamp), and the Mosaic block sublane dim NL*Sp is a multiple of
    8 for any Sp since NL = 8. On short axes this removes up to 7 padded
    rows per line (a (56,40,14)-block room's z-first pass: 24 -> 17 rows
    per line, -29% pass-1 volume)."""
    if lean:
        return Sb + halo_blocks(band)
    return ((Sb + halo_blocks(band) + 7) // 8) * 8


def binary_pass_lean(band: int) -> bool:
    """Whether the first (binary-seed) pass runs the log-doubling kernel —
    and may therefore use the lean line layout. Mirrors the dispatch
    condition in edt_pass_blockmajor."""
    return (_binary_steps(band)[-1] // 8 + 1) <= _EP


# ---------------------------------------------------------------------------
# The pass kernel
# ---------------------------------------------------------------------------

_NL = 8   # lines per program (amortizes per-program overhead ~8x)
_EP = 8   # INF edge-pad rows around the stacked block in scratch


def _pass_kernel(pflag_ref, cflag_ref, in_ref, out_ref, c_ref, *, Sb: int,
                 Hb: int, band: int, m: int, NL: int):
    """NL stacked lines: banded 1-D min-plus along the scan axis.

    pflag_ref: i32[n_grid] scalar-prefetch per-program occupancy flags —
             0 means every input row of this program is INF (no site
             reaches any of its lines), so the whole program is skipped
             and the output filled INF (bit-exact: all-INF input yields
             min(INF, INF + k^2) = INF).
    cflag_ref: i32[n_grid * (L//8)] per-8-row-CHUNK occupancy flags: chunk
             c is 0 iff every input row in [8c - band//8, 8c + 8 + band//8)
             is INF — i.e. no candidate any of its output rows reads is
             finite. Inactive chunks skip the candidate loop and write INF.
             Cost therefore tracks occupied 8-block spans of each line, not
             region-AABB volume: hollow-room interiors, corridor slack and
             the line-end halo/round-up padding all prune away. (The
             candidate loop also only ever computes rows that are actually
             emitted — the old whole-block loop computed halo rows and
             discarded them, ~35% waste at bench dims.)
    in_ref:  f32[NL * Sp, 512] NL independent lines, each Sp =
             line_rows(Sb, band) rows with halo/pad rows = INF.
    out_ref: f32[NL * Sb, 512] results for each line's center blocks.
    c_ref:   f32[1, NL*Sp + 2*EP, 512] scratch: the input, edge-padded
             with INF (carry-combined shift buffers are built per chunk
             in registers — see _pass_body).

    Exactness of the chunk skip: an output row r only reads candidate rows
    [r - band//8, r + band//8]; the chunk window covers that range for all
    its rows, so an inactive chunk's candidates are all INF and its exact
    result is INF. Cross-line flag contamination (a window reaching into a
    neighbor line's rows) can only create false-ACTIVE chunks — wasted
    work, never wrong results (the >= Hb-row INF gap between lines still
    isolates the candidate reads themselves).
    """
    i = pl.program_id(0)

    @pl.when(pflag_ref[i] == 0)
    def _():
        out_ref[:] = jnp.full(out_ref.shape, INF)

    @pl.when(pflag_ref[i] > 0)
    def _():
        _pass_body(cflag_ref, in_ref, out_ref, c_ref, i, Sb=Sb, Hb=Hb,
                   band=band, m=m, NL=NL)


def _pass_body(cflag_ref, in_ref, out_ref, c_ref, i, *, Sb: int, Hb: int,
               band: int, m: int, NL: int):
    L = in_ref.shape[0]
    x = in_ref[:]

    # Intra-block scan coordinate of each lane: ls = (v // m) % 8.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
    ls = (lane // m) % 8

    # Edge pads (once; rows [EP, EP+L) hold the padded input).
    inf_pad = jnp.full((_EP, V), INF)
    c_ref[0, :_EP] = inf_pad
    c_ref[0, _EP + L:] = inf_pad
    c_ref[0, _EP:_EP + L] = x

    # Chunks that emit real line output (compile-time): chunk c covers
    # rows [8c, 8c+8); rows [Sb, Sp) of each line are the shared INF gap,
    # so gap-only chunks never compute.
    Sp = L // NL
    CPL = Sp // 8                      # chunks per line (Sp % 8 == 0)
    n_chunks = L // 8
    A = Hb                             # candidate row reach: ceil(band/8)

    # Carries are built PER CHUNK, IN REGISTERS, inside the chunk's
    # existing flag gate (round 5): the old whole-block carry scratch made
    # the 14 rolls a cost proportional to AABB volume even with the chunk
    # skip (ESDF_PASSES.json: pass2+pass3 carries ~2/3 of 2.96 ms) and
    # round-tripped 7 (L,512) buffers through VMEM. Here each active
    # chunk rolls its own (h + 2A + 1)-row window once per b, consumes the
    # carry immediately (candidates grouped by b = k mod 8, pairing b with
    # 8-b so the symmetric +k/-k weight sharing still holds), and discards
    # it — inactive chunks cost nothing at all.
    for c in range(n_chunks):
        ll, cl = c // CPL, c % CPL
        lo = 8 * cl
        hi = min(8 * cl + 8, Sb)
        if lo >= hi:
            continue
        r0 = ll * Sp + lo              # first computed input row
        h = hi - lo                    # rows computed (1..8)
        o0 = ll * Sb + lo              # first output row

        @pl.when(cflag_ref[i * n_chunks + c] > 0)
        def _(r0=r0, h=h, o0=o0):
            # Window rows [r0-A, r0+h+A]: all candidate rows plus one for
            # the wrap (carry row r reads w[r] and w[r+1]).
            W = h + 2 * A + 1
            w = c_ref[0, _EP + r0 - A:_EP + r0 - A + W]

            def carry(b):
                # C_b[r] = value b steps further along the scan axis
                # (crossing into row r+1 for lanes whose intra-block
                # coordinate wraps); rows [r0-A, r0+h+A).
                r_b = pltpu.roll(w, (V - b * m) % V, axis=1)   # w[v + b*m]
                r_pb = pltpu.roll(w, ((8 - b) * m) % V, axis=1)
                return jnp.where(ls < (8 - b), r_b[:W - 1], r_pb[1:W])

            def rows(buf, k):
                # Candidate k = 8a + b reads carry rows [r0+a, r0+a+h)
                # = buf rows [A+a, A+a+h).
                a = (k - k % 8) // 8
                return buf[A + a:A + a + h]

            acc = w[A:A + h] + np.float32(0.0)
            # b = 0 candidates (pure row shifts) read the window directly.
            for k in range(8, band + 1, 8):
                pair = jnp.minimum(rows(w, k), rows(w, -k))
                acc = jnp.minimum(acc, pair + np.float32(k * k))
            # b and 8-b are the residues of +k and -k for k % 8 == b, so
            # building both lets every such pair min before the weight add
            # (3 VPU ops per pair) with only two carries live at a time.
            for bg in ((1, 7), (2, 6), (3, 5), (4,)):
                bufs = {b: carry(b) for b in bg}
                b = bg[0]
                bufs[8 - b] = bufs[b] if len(bg) == 1 else bufs[8 - b]
                for k in range(b, band + 1, 8):
                    pair = jnp.minimum(rows(bufs[b], k),
                                       rows(bufs[8 - b], -k))
                    acc = jnp.minimum(acc, pair + np.float32(k * k))
                for k in range(8 - b, band + 1, 8):
                    if k % 8 == b:     # b == 4: already handled above
                        continue
                    pair = jnp.minimum(rows(bufs[8 - b], k),
                                       rows(bufs[b], -k))
                    acc = jnp.minimum(acc, pair + np.float32(k * k))
            out_ref[o0:o0 + h] = acc

        @pl.when(cflag_ref[i * n_chunks + c] == 0)
        def _(o0=o0, h=h):
            out_ref[o0:o0 + h] = jnp.full((h, V), INF)


def _binary_steps(band: int):
    """Log-doubling shift schedule: powers of two whose subset sums reach
    every |k| <= 2^{m+1}-1 >= band."""
    steps = [1]
    while 2 * steps[-1] - 1 < band:
        steps.append(2 * steps[-1])
    return tuple(steps)


def _pass1_kernel(flag_ref, in_ref, out_ref, c_ref, *, Sb: int, Hb: int,
                  band: int, m: int, NL: int):
    """First-pass specialization: input rows are exactly {0, INF} (site
    seeds), so the parabola min-plus equals (L1 distance to the nearest
    site)^2 — and L1 min-plus LOG-DOUBLES (the |k| kernel is min-plus
    decomposable; the k^2 kernel is not): after steps s = 1,2,4,...,
    acc[i] = min_{|k| <= 2^{m+1}-1} in[i+k] + |k|. 2*log2(band) masked
    shifts replace 2*band candidate adds.

    Exactness: the final `where(acc <= band, acc^2, INF)` reproduces the
    banded kernel's output bit-for-bit — distances beyond `band` map to
    INF either way — and also squashes cross-line leakage (the doubling
    reach 2^{m+1}-1 can exceed the Hb-block halo, but any value crossing
    the >= band-voxel INF gap carries acc > band).

    `flag_ref` whole-program skip as in `_pass_kernel` (all-INF programs
    write INF, bit-exact).
    """
    i = pl.program_id(0)

    @pl.when(flag_ref[i] == 0)
    def _():
        out_ref[:] = jnp.full(out_ref.shape, INF)

    @pl.when(flag_ref[i] > 0)
    def _():
        _pass1_body(in_ref, out_ref, c_ref, Sb=Sb, Hb=Hb, band=band, m=m,
                    NL=NL)


def _pass1_body(in_ref, out_ref, c_ref, *, Sb: int, Hb: int, band: int,
                m: int, NL: int):
    L = in_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
    ls = (lane // m) % 8

    inf_pad = jnp.full((_EP, V), INF)
    c_ref[0, :_EP] = inf_pad
    c_ref[0, _EP + L:] = inf_pad

    acc = in_ref[:]
    for s in _binary_steps(band):
        a, b = s // 8, s % 8
        c_ref[0, _EP:_EP + L] = acc
        # Value at scan coord +s: row +a lanes ls < 8-b (lane shift +b*m),
        # else row +a+1 (lane wrap -(8-b)*m) — the banded kernel's carry
        # construction, applied to the CURRENT accumulator.
        rows_a = c_ref[0, _EP + a:_EP + a + L]
        if b:
            r_b = pltpu.roll(rows_a, (V - b * m) % V, axis=1)
            r_pb = pltpu.roll(c_ref[0, _EP + a + 1:_EP + a + 1 + L],
                              ((8 - b) * m) % V, axis=1)
            plus = jnp.where(ls < 8 - b, r_b, r_pb)
        else:
            plus = rows_a
        # Value at scan coord -s: row -a lanes ls >= b, else row -a-1.
        rows_ma = c_ref[0, _EP - a:_EP - a + L]
        if b:
            l_b = pltpu.roll(rows_ma, (b * m) % V, axis=1)
            l_pb = pltpu.roll(c_ref[0, _EP - a - 1:_EP - a - 1 + L],
                              (V - (8 - b) * m) % V, axis=1)
            minus = jnp.where(ls >= b, l_b, l_pb)
        else:
            minus = rows_ma
        acc = jnp.minimum(acc, jnp.minimum(plus, minus) + np.float32(s))

    sq = jnp.where(acc <= np.float32(band), acc * acc, INF)
    Sp = L // NL
    for ll in range(NL):
        out_ref[ll * Sb:(ll + 1) * Sb] = \
            sq[ll * Sp:ll * Sp + Sb]


@functools.partial(jax.jit,
                   static_argnames=("n_lines", "Sb", "band", "axis",
                                    "binary_input", "lean", "interpret"))
def edt_pass_blockmajor(rows, needed_rows=None, *, n_lines: int, Sb: int,
                        band: int, axis: int, binary_input: bool = False,
                        lean: bool = False,
                        interpret: bool = False) -> jnp.ndarray:
    """Banded min-plus over block-major rows.

    rows: f32[n_lines * line_rows(Sb, band), 512], halo/pad rows = INF.
    binary_input: rows are {0, INF} site seeds (every solve's FIRST pass)
    — dispatches the log-doubling L1 kernel (bit-identical output, ~2x
    fewer VPU ops at band 40) when the doubling row-reach fits the edge
    pad. Returns f32[n_lines * Sb, 512] (compact: halo rows removed).

    needed_rows (optional): bool[n_lines * Sb] in compact OUTPUT order —
    output-side pruning (round 5). A chunk runs only if one of its output
    rows can still influence the solve's consumers (allocated blocks,
    dilated by the band along the remaining pass axes — see
    esdf_from_sites_dense). Exact: a pruned row is INF, and by the
    dilation-chain construction no downstream active chunk ever reads it.
    Without this, hollow-room interiors (sites on every wall => every
    line's input-occupancy window is live) cost AABB volume; with it,
    cost tracks allocated blocks (VERDICT r4 next #4).
    """
    Hb = halo_blocks(band)
    assert Hb + 1 <= _EP, (
        f"band {band} needs {Hb}+1 window rows > the {_EP}-row kernel "
        f"edge pad")
    Sp = line_rows(Sb, band, lean)
    m = _LANE_STRIDE[axis]
    NL = _NL
    n_grid = (n_lines + NL - 1) // NL
    n_pad = n_grid * NL
    if n_pad != n_lines:
        rows = jnp.concatenate(
            [rows, jnp.full(((n_pad - n_lines) * Sp, V), INF, rows.dtype)])
    use_binary = binary_input and binary_pass_lean(band)
    assert not (lean and not use_binary), (
        "lean layout requires the log-doubling binary kernel "
        "(binary_input=True and the doubling reach fitting the edge pad)")

    # Per-row occupancy (one bandwidth-bound reduction) feeds both flag
    # granularities: per-program (skip whole 8-line blocks) and, for the
    # banded kernel, per-8-row-chunk (skip empty spans inside occupied
    # lines — hollow-room interiors, halo padding). See _pass_kernel on
    # why false-active flags are harmless and false-inactive impossible.
    row_fin = jnp.any(rows < INF, axis=1)

    # Output-side pruning: per-input-chunk "some output row is needed"
    # flags from needed_rows (compact order -> padded line layout).
    nchunk = None
    if needed_rows is not None:
        nr = needed_rows
        if n_pad != n_lines:
            nr = jnp.concatenate(
                [nr, jnp.zeros(((n_pad - n_lines) * Sb,), nr.dtype)])
        nrp = jnp.zeros((n_pad, Sp), jnp.bool_).at[:, :Sb].set(
            nr.reshape(n_pad, Sb))
        nchunk = jnp.any(nrp.reshape(-1, 8), axis=1)

    def _blk(i, *_prefetch):
        return (i, 0)

    if use_binary:
        kern = functools.partial(_pass1_kernel, Sb=Sb, Hb=Hb, band=band,
                                 m=m, NL=NL)
        scratch = [pltpu.VMEM((1, NL * Sp + 2 * _EP, V), jnp.float32)]
        flags = jnp.any(row_fin.reshape(n_grid, NL * Sp),
                        axis=1).astype(jnp.int32)
        if nchunk is not None:
            # Program-level only (the log-doubling body is whole-block
            # vectorized): skip programs none of whose lines are needed.
            flags = flags * jnp.any(nchunk.reshape(n_grid, -1),
                                    axis=1).astype(jnp.int32)
        prefetch = (flags,)
    else:
        kern = functools.partial(_pass_kernel, Sb=Sb, Hb=Hb, band=band, m=m,
                                 NL=NL)
        scratch = [pltpu.VMEM((1, NL * Sp + 2 * _EP, V), jnp.float32)]
        # Candidate input reach per output row is ceil(band/8) rows (the
        # carry buffers C_b read rows r and r+1, so k = 8a+b reaches
        # a + (b > 0) rows) — NOT band//8; the two differ when band is
        # not a multiple of 8.
        A = halo_blocks(band)
        ext = jnp.concatenate([jnp.zeros((A,), jnp.int32),
                               row_fin.astype(jnp.int32),
                               jnp.zeros((A,), jnp.int32)])
        cflags = jax.lax.reduce_window(ext, jnp.int32(0), jax.lax.max,
                                       (8 + 2 * A,), (8,), "VALID")
        if nchunk is not None:
            cflags = cflags * nchunk.astype(jnp.int32)
        flags = jnp.any(cflags.reshape(n_grid, -1) > 0,
                        axis=1).astype(jnp.int32)
        prefetch = (flags, cflags)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(n_grid,),
        in_specs=[pl.BlockSpec((NL * Sp, V), _blk,
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((NL * Sb, V), _blk,
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad * Sb, V), rows.dtype),
        interpret=interpret,
    )(*prefetch, rows)
    return out[:n_lines * Sb]


# ---------------------------------------------------------------------------
# Row-order bookkeeping (all compile-time constants)
# ---------------------------------------------------------------------------

def _line_dims(dims_b: Tuple[int, int, int], axis: int):
    """(n_lines, Sb, line-major ordering helper) for a pass along `axis`.

    Line order: x-pass lines are (cy, cz); y-pass (cz, cx); z-pass (cx, cy)
    — each pass's output feeds the next with a pure row permutation.
    """
    Nx, Ny, Nz = dims_b
    if axis == 0:
        return Ny * Nz, Nx
    if axis == 1:
        return Nz * Nx, Ny
    return Nx * Ny, Nz


def _row_of_cell(cx, cy, cz, dims_b, axis: int, band: int, padded: bool,
                 lean: bool = False):
    """Row index of block cell (cx,cy,cz) in the `axis` pass order.

    padded=True: the pass INPUT layout (halo rows between lines);
    padded=False: the compact pass OUTPUT layout. `lean` selects the
    binary-pass gap layout (see line_rows)."""
    Nx, Ny, Nz = dims_b
    if axis == 0:
        line, r, S = cy * Nz + cz, cx, Nx
    elif axis == 1:
        line, r, S = cz * Nx + cx, cy, Ny
    else:
        line, r, S = cx * Ny + cy, cz, Nz
    if padded:
        # Lines start at local row 0; the shared INF gap trails each line
        # (see halo_blocks).
        return line * line_rows(S, band, lean) + r
    return line * S + r


@functools.lru_cache(maxsize=32)
def _perm_between(dims_b: Tuple[int, int, int], src_axis: int, dst_axis: int,
                  band: int) -> np.ndarray:
    """Row permutation: padded dst-order row -> compact src-order row (-1 =
    halo/out-of-region, to be filled INF)."""
    Nx, Ny, Nz = dims_b
    n_lines, S = _line_dims(dims_b, dst_axis)
    out = np.full(n_lines * line_rows(S, band), -1, np.int32)
    cx, cy, cz = np.meshgrid(np.arange(Nx), np.arange(Ny), np.arange(Nz),
                             indexing="ij")
    cx, cy, cz = cx.ravel(), cy.ravel(), cz.ravel()
    dst = _row_of_cell(cx, cy, cz, dims_b, dst_axis, band, padded=True)
    src = _row_of_cell(cx, cy, cz, dims_b, src_axis, band, padded=False)
    out[dst] = src
    return out


def _repad(compact_rows, dims_b, src_axis: int, dst_axis: int, band: int):
    """Re-order compact src-pass output into padded dst-pass input."""
    perm = jnp.asarray(_perm_between(dims_b, src_axis, dst_axis, band))
    gathered = compact_rows[jnp.clip(perm, 0, compact_rows.shape[0] - 1)]
    return jnp.where((perm >= 0)[:, None], gathered, INF)


# ---------------------------------------------------------------------------
# Full update over a block region
# ---------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("dims_b", "band", "interpret"))
def esdf_from_sites_dense(is_site, block_index_of_slot, alloc_count,
                          origin_b, *, dims_b: Tuple[int, int, int],
                          band: int, interpret: bool = False) -> jnp.ndarray:
    """Exact banded squared EDT for all allocated blocks in a region.

    Args:
      is_site: bool[cap, 512] surface-site mask (pool layout).
      block_index_of_slot: i32[cap, 3] world block index per slot.
      alloc_count: i32[] number of live slots.
      origin_b: i32[3] world block index of region cell (0,0,0).
      dims_b: static region size in blocks (Nx, Ny, Nz).
      band: static max propagation distance in voxels.

    Returns sq: f32[cap, 512] squared voxel distances (INF beyond band^2 or
    outside the region; 0 at sites). Slots outside the region keep INF —
    callers splice with their previous channel when doing regional updates.
    """
    cap = is_site.shape[0]
    Nx, Ny, Nz = dims_b

    cells = block_index_of_slot - origin_b[None, :]
    live = jnp.arange(cap) < alloc_count
    in_region = (live
                 & (cells[:, 0] >= 0) & (cells[:, 0] < Nx)
                 & (cells[:, 1] >= 0) & (cells[:, 1] < Ny)
                 & (cells[:, 2] >= 0) & (cells[:, 2] < Nz))

    g0 = jnp.where(is_site, np.float32(0.0), INF)

    # Pass ORDER (r5): separable passes commute, so order them so that the
    # LAST (most output-pruned: needed = allocated only, and carries are
    # per-active-chunk) pass runs along the LONGEST axis — most chunks per
    # line means chunk-granular pruning bites hardest (a hollow room's
    # interior lines keep only their two wall-end chunks), and fewest
    # lines means least shared-gap padding. The FIRST pass (binary
    # log-doubling, cheapest per row, whole-program-gated only) takes the
    # shortest axis; its higher relative gap overhead rides the cheap
    # kernel.
    order = tuple(int(a) for a in
                  np.argsort([Nx, Ny, Nz], kind="stable"))  # short..long
    first, mid, last = order

    # Seed the first-pass rows with a SCALAR scatter + row gather: scatter
    # only the slot ids (i32[R], ~KBs) into padded row order, then
    # row-gather the g0 rows — instead of scattering all `cap` pool rows
    # (f32[cap,512], tens of MB, mostly dropped) directly.
    lean = binary_pass_lean(band)
    n_lines_f, Sf = _line_dims(dims_b, first)
    R = n_lines_f * line_rows(Sf, band, lean)
    row_f = _row_of_cell(cells[:, 0], cells[:, 1], cells[:, 2], dims_b,
                         first, band, padded=True, lean=lean)
    row_f = jnp.where(in_region, row_f, R)
    slot_of_row = jnp.full((R,), cap, jnp.int32).at[row_f].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop")
    ok_r = slot_of_row < cap
    rows_f = jnp.where(ok_r[:, None],
                       g0[jnp.clip(slot_of_row, 0, cap - 1)], INF)

    # Output-side pruning chain (r5): the last pass only needs outputs at
    # ALLOCATED blocks; the middle pass only at rows the last pass's
    # active chunks can read (allocated dilated by the band along `last`);
    # the first pass at that dilated by the band along `mid`. On hollow
    # rooms (sites on every wall, air mostly unallocated) this is what
    # makes cost track allocated blocks instead of AABB volume.
    # Block-granular: Hb = ceil(band/8) blocks >= band voxels, so the
    # dilation covers every possible read.
    Hb = halo_blocks(band)
    lin = (cells[:, 0] * Ny + cells[:, 1]) * Nz + cells[:, 2]
    lin = jnp.where(in_region, lin, Nx * Ny * Nz)
    alloc = jnp.zeros((Nx * Ny * Nz,), jnp.int32).at[lin].set(
        1, mode="drop").reshape(Nx, Ny, Nz)

    def _dilate_axis(g, axis_i):
        win = [1, 1, 1]
        win[axis_i] = 2 * Hb + 1
        return jax.lax.reduce_window(g, jnp.int32(0), jax.lax.max,
                                     tuple(win), (1, 1, 1), "SAME")

    # Line-major orderings per pass axis (see _row_of_cell): rows of the
    # compact output of a pass over axis a enumerate (line dims..., a).
    _line_perm = {0: (1, 2, 0), 1: (2, 0, 1), 2: (0, 1, 2)}

    def _nr(g, axis_i):
        return g.transpose(_line_perm[axis_i]).reshape(-1) > 0

    need_last = alloc
    need_mid = _dilate_axis(need_last, last)
    need_first = _dilate_axis(need_mid, mid)

    out_f = edt_pass_blockmajor(rows_f, _nr(need_first, first),
                                n_lines=n_lines_f, Sb=Sf, band=band,
                                axis=first, binary_input=True, lean=lean,
                                interpret=interpret)
    rows_m = _repad(out_f, dims_b, first, mid, band)
    n_lines_m, Sm = _line_dims(dims_b, mid)
    out_m = edt_pass_blockmajor(rows_m, _nr(need_mid, mid),
                                n_lines=n_lines_m, Sb=Sm, band=band,
                                axis=mid, interpret=interpret)
    rows_l = _repad(out_m, dims_b, mid, last, band)
    n_lines_l, Sl = _line_dims(dims_b, last)
    out_l = edt_pass_blockmajor(rows_l, _nr(need_last, last),
                                n_lines=n_lines_l, Sb=Sl, band=band,
                                axis=last, interpret=interpret)

    # Gather back to slot rows (compact last-pass row of each slot's cell).
    row_l = _row_of_cell(cells[:, 0], cells[:, 1], cells[:, 2], dims_b,
                         last, band, padded=False)
    row_l = jnp.clip(row_l, 0, out_l.shape[0] - 1)
    sq = out_l[row_l]
    sq = jnp.where(in_region[:, None], sq, INF)
    max_sq = np.float32(band * band)
    return jnp.where(sq <= max_sq, sq, INF)


# ---------------------------------------------------------------------------
# 2D ESDF (EsdfMode 2d): sites collapsed over a height band, 2-pass EDT
# ---------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("dims_b", "band", "interpret"))
def esdf_2d_from_sites(is_site, voxel_z_ok, block_index_of_slot, alloc_count,
                       origin_b, *, dims_b: Tuple[int, int], band: int,
                       interpret: bool = False) -> jnp.ndarray:
    """Exact banded 2-D squared EDT from height-band-restricted sites.

    Parity: nvblox's EsdfMode::k2D — only sites inside
    [esdf_2d_min_height, esdf_2d_max_height] seed the field, and distances
    are planar (mapper_initialization.cpp:197-200). Implementation embeds
    the 2-D problem in the 3-D block-major pass kernels with a single-
    block z extent: band sites collapse onto the lz=0 plane of an Nz=1
    region (a scatter-min), the x and y passes run unchanged, and the z
    pass is skipped (all sites and queries share lz=0).

    Args:
      is_site: bool[cap, 512]; voxel_z_ok: bool[cap, 512] height-band mask.
      dims_b: static (Nx, Ny) region size in blocks.

    Returns sq2d: f32[Nx*8, Ny*8] squared planar voxel distances (INF
    beyond band or away from any site).
    """
    cap = is_site.shape[0]
    Nx, Ny = dims_b
    dims3 = (Nx, Ny, 1)

    # Collapse each slot's sites over z onto lane (lx, ly, lz=0):
    # lane v = lx*64 + ly*8 + lz -> group-of-8 any() -> put at lz == 0.
    site = (is_site & voxel_z_ok).reshape(cap, 64, 8)
    col = jnp.any(site, axis=-1)                    # [cap, 64] per (lx, ly)
    g0_64 = jnp.where(col, np.float32(0.0), INF)
    lz0 = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1) % 8 == 0
    g0 = jnp.where(lz0, jnp.repeat(g0_64, 8, axis=1), INF)  # [cap, 512]

    cells = block_index_of_slot[:, :2] - origin_b[None, :2]
    live = ((jnp.arange(cap) < alloc_count)
            & (cells[:, 0] >= 0) & (cells[:, 0] < Nx)
            & (cells[:, 1] >= 0) & (cells[:, 1] < Ny))

    lean = binary_pass_lean(band)
    n_lines_x, Sx = _line_dims(dims3, 0)
    rows_x = jnp.full((n_lines_x * line_rows(Sx, band, lean), V), INF)
    row_x = _row_of_cell(cells[:, 0], cells[:, 1], 0, dims3, 0, band,
                         padded=True, lean=lean)
    row_x = jnp.where(live, row_x, rows_x.shape[0])
    # Scatter-min: several z blocks of one column share a 2-D row.
    rows_x = rows_x.at[row_x].min(g0, mode="drop")

    out_x = edt_pass_blockmajor(rows_x, n_lines=n_lines_x, Sb=Sx, band=band,
                                axis=0, binary_input=True, lean=lean,
                                interpret=interpret)
    rows_y = _repad(out_x, dims3, 0, 1, band)
    n_lines_y, Sy = _line_dims(dims3, 1)
    out_y = edt_pass_blockmajor(rows_y, n_lines=n_lines_y, Sb=Sy, band=band,
                                axis=1, interpret=interpret)

    # out_y rows are y-order lines (cz=0, cx) x cy; read lane lz==0 and
    # reassemble [X, Y].
    vals = out_y.reshape(Nx, Ny, 64, 8)[..., 0]      # [Nx, Ny, (lx*8+ly)]
    vals = vals.reshape(Nx, Ny, 8, 8)                # [Nx, Ny, lx, ly]
    sq2d = vals.transpose(0, 2, 1, 3).reshape(Nx * 8, Ny * 8)
    max_sq = np.float32(band * band)
    return jnp.where(sq2d <= max_sq, sq2d, INF)


@functools.partial(jax.jit, static_argnames=("dims_b",))
def collapse_2d_mask(mask, voxel_z_ok, block_index_of_slot, alloc_count,
                     origin_b, *, dims_b: Tuple[int, int]) -> jnp.ndarray:
    """any() of a bool voxel mask over each height-band column -> bool[X, Y]."""
    cap = mask.shape[0]
    Nx, Ny = dims_b
    col = jnp.any((mask & voxel_z_ok).reshape(cap, 64, 8), axis=-1)
    cells = block_index_of_slot[:, :2] - origin_b[None, :2]
    live = ((jnp.arange(cap) < alloc_count)
            & (cells[:, 0] >= 0) & (cells[:, 0] < Nx)
            & (cells[:, 1] >= 0) & (cells[:, 1] < Ny))
    row = jnp.where(live, cells[:, 0] * Ny + cells[:, 1], Nx * Ny)
    acc = jnp.zeros((Nx * Ny, 64), jnp.bool_).at[row].max(col, mode="drop")
    return acc.reshape(Nx, Ny, 8, 8).transpose(0, 2, 1, 3) \
        .reshape(Nx * 8, Ny * 8)


# ---------------------------------------------------------------------------
# Reference (XLA/numpy) implementation for exact-match tests
# ---------------------------------------------------------------------------

def esdf_from_sites_reference(is_site: np.ndarray, cells: np.ndarray,
                              n_alloc: int, dims_b: Tuple[int, int, int],
                              band: int) -> np.ndarray:
    """Brute separable EDT on a dense numpy grid; mirrors
    esdf_from_sites_dense exactly (same candidates, same f32 arithmetic)."""
    cap = is_site.shape[0]
    Nx, Ny, Nz = dims_b
    X, Y, Z = Nx * 8, Ny * 8, Nz * 8
    dense = np.full((X, Y, Z), INF, np.float32)
    for s in range(min(n_alloc, cap)):
        cx, cy, cz = cells[s]
        if not (0 <= cx < Nx and 0 <= cy < Ny and 0 <= cz < Nz):
            continue
        blk = np.where(is_site[s].reshape(8, 8, 8), np.float32(0.0), INF)
        dense[cx * 8:cx * 8 + 8, cy * 8:cy * 8 + 8, cz * 8:cz * 8 + 8] = blk
    for axis in range(3):
        pad = [(0, 0)] * 3
        pad[axis] = (band, band)
        dp = np.pad(dense, pad, constant_values=INF)
        S = dense.shape[axis]
        out = np.full_like(dense, INF)
        for k in range(-band, band + 1):
            sl = [slice(None)] * 3
            sl[axis] = slice(k + band, k + band + S)
            out = np.minimum(out, dp[tuple(sl)] + np.float32(k * k))
        dense = out
    sq = np.full((cap, V), INF, np.float32)
    for s in range(min(n_alloc, cap)):
        cx, cy, cz = cells[s]
        if not (0 <= cx < Nx and 0 <= cy < Ny and 0 <= cz < Nz):
            continue
        blk = dense[cx * 8:cx * 8 + 8, cy * 8:cy * 8 + 8, cz * 8:cz * 8 + 8]
        sq[s] = blk.reshape(-1)
    return np.where(sq <= np.float32(band * band), sq, INF)
