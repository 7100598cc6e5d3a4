"""ShardedDeviceMapper: spatial scale-out of the device-resident mapper.

The genuinely new capability vs the single-GPU reference (BASELINE.json
north star): shard the voxel-block map into x-slabs across a device mesh,
integrate every sensor frame into each shard's slab simultaneously, and
keep the ESDF consistent across slab boundaries with ghost-layer exchange
over `lax.ppermute`.

Decomposition:
  * the global world grid (Dx, Dy, Dz blocks) splits into `n` x-slabs of
    L = Dx/n owned layers; each shard's local grid is (L+2, Dy, Dz) — one
    **ghost layer** per inner face, overlapping the neighbor's boundary;
  * every per-shard state/channel array gains a leading [n] axis sharded
    over the 1-D mesh axis "space" (`PartitionSpec("space")`);
  * depth frames are replicated; each shard's allocator clips the view to
    its slab automatically (WorldGrid bounds), and ghost blocks integrate
    on both sides of a boundary consistently (same deterministic math);
  * after ESDF sweeps, shards exchange boundary-layer site coordinates in
    grid space: a dense face tensor [Dy*Dz, 512, 3] is built by row
    gathers, `ppermute`d to the neighbor, and scattered into its ghost
    blocks (allocating them on arrival if the sender observed them) —
    the halo-exchange analogue of ring sequence parallelism
    (SURVEY.md §5.7-5.8).

All steps are shard_map'd pure functions over a WorldGridState/channels
pytree with a leading device axis, so the same code runs on an 8-device
virtual CPU mesh (tests / driver dry run) and on real multi-chip slices.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from isaac_ros_nvblox_tpu.core import world_grid as wg
from isaac_ros_nvblox_tpu.core.types import VOXELS_PER_BLOCK, VOXELS_PER_SIDE
from isaac_ros_nvblox_tpu.mapper.params import MapperParams
from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.ops import esdf as esdf_ops
from isaac_ros_nvblox_tpu.ops import view as view_ops
from isaac_ros_nvblox_tpu.ops.tsdf import integrate_tsdf

B = VOXELS_PER_SIDE
V = VOXELS_PER_BLOCK


@dataclasses.dataclass(frozen=True)
class ShardedMapperConfig:
    n_shards: int = 8
    # Global world extent in blocks (x must divide evenly by n_shards).
    global_dims: Tuple[int, int, int] = (64, 32, 16)
    origin_block: Tuple[int, int, int] = (-32, -16, -4)
    capacity_per_shard: int = 4096
    voxel_size_m: float = 0.05
    max_blocks_per_frame: int = 1024

    @property
    def slab_width(self) -> int:
        assert self.global_dims[0] % self.n_shards == 0
        return self.global_dims[0] // self.n_shards


class ShardedDeviceMapper:
    def __init__(self, mesh: Mesh, camera: Camera,
                 config: Optional[ShardedMapperConfig] = None,
                 params: Optional[MapperParams] = None):
        self.mesh = mesh
        self.camera = camera
        self.config = config or ShardedMapperConfig(
            n_shards=mesh.devices.size)
        self.params = params or MapperParams()
        assert self.config.n_shards == mesh.devices.size
        c = self.config
        L = c.slab_width
        cap = c.capacity_per_shard

        # Stacked per-shard states (origins differ by slab, minus the ghost
        # layer on the left).
        states = []
        for s in range(c.n_shards):
            origin = (c.origin_block[0] + s * L - 1,
                      c.origin_block[1], c.origin_block[2])
            states.append(wg.create_world_grid(wg.WorldGridConfig(
                dims=(L + 2, c.global_dims[1], c.global_dims[2]),
                capacity=cap, origin_block=origin)))
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        sh = NamedSharding(mesh, P("space"))
        self.state = jax.tree.map(lambda x: jax.device_put(x, sh), stacked)
        self.channels = {
            "tsdf_distance": jax.device_put(
                jnp.zeros((c.n_shards, cap, V), jnp.float32), sh),
            "tsdf_weight": jax.device_put(
                jnp.zeros((c.n_shards, cap, V), jnp.float32), sh),
            "esdf_site": jax.device_put(
                jnp.full((c.n_shards, cap, V, 3), 1.0e6, jnp.float32), sh),
            "esdf_sq_dist": jax.device_put(
                jnp.full((c.n_shards, cap, V), float(esdf_ops.INF_SQ),
                         jnp.float32), sh),
        }
        self._integrate = self._build_integrate()
        self._esdf = self._build_esdf()

    # ------------------------------------------------------------ integrate
    def _build_integrate(self):
        c = self.config
        camera = self.camera
        p = self.params.projective
        vs = c.voxel_size_m

        def local(state, distance, weight, depth, T_L_C):
            state = jax.tree.map(lambda x: x[0], state)
            distance = distance[0]
            weight = weight[0]
            grid, origin = view_ops.touched_block_grid(
                depth, T_L_C, camera=camera, voxel_size_m=vs,
                max_distance_m=p.max_integration_distance_m,
                truncation_m=p.truncation_m(vs), subsample=1)
            state = wg.allocate_from_mask(state, grid, origin)
            slots, bidx, _ = wg.view_batch(
                state, grid, origin, max_blocks=c.max_blocks_per_frame)
            distance, weight = integrate_tsdf(
                distance, weight, slots, bidx, depth, T_L_C, camera=camera,
                voxel_size_m=vs, params=p)
            return (jax.tree.map(lambda x: x[None], state),
                    distance[None], weight[None])

        spec = P("space")
        fn = shard_map(
            local, mesh=self.mesh,
            in_specs=(jax.tree.map(lambda _: spec, self.state),
                      spec, spec, P(), P()),
            out_specs=(jax.tree.map(lambda _: spec, self.state), spec, spec),
            check_rep=False)
        return jax.jit(fn, donate_argnums=(0, 1, 2))

    def integrate_depth(self, depth, T_L_C) -> None:
        depth = jnp.asarray(depth, jnp.float32)
        T_L_C = jnp.asarray(T_L_C, jnp.float32)
        self.state, d, w = self._integrate(
            self.state, self.channels["tsdf_distance"],
            self.channels["tsdf_weight"], depth, T_L_C)
        self.channels["tsdf_distance"] = d
        self.channels["tsdf_weight"] = w

    # ----------------------------------------------------------------- esdf
    def _build_esdf(self):
        c = self.config
        ep = self.params.esdf
        vs = c.voxel_size_m
        L = c.slab_width
        cap = c.capacity_per_shard
        Dy, Dz = c.global_dims[1], c.global_dims[2]
        n = c.n_shards
        max_sq = (ep.max_esdf_distance_m / vs) ** 2
        bs = vs * B
        n_rounds = int(np.ceil(ep.max_esdf_distance_m / bs)) + 1
        SENT = 1.0e6

        def face_payload(state, site, x_cell):
            """Site data + allocated mask for all blocks at local x=x_cell."""
            yz_slots = state.slot_grid[x_cell].reshape(-1)       # [Dy*Dz]
            data = site[jnp.clip(yz_slots, 0, cap - 1)]          # [F,512,3]
            ok = yz_slots >= 0
            data = jnp.where(ok[:, None, None], data, SENT)
            return data, ok

        def scatter_face(state, site, x_cell, data, ok):
            """Write received face data into ghost blocks at x=x_cell."""
            yz_slots = state.slot_grid[x_cell].reshape(-1)
            write = ok & (yz_slots >= 0)
            tgt = jnp.where(write, yz_slots, cap)                # drop others
            return site.at[tgt].set(data, mode="drop")

        def local(state, site_pool, sq, tsdf_d, tsdf_w, bidx_all):
            state = jax.tree.map(lambda x: x[0], state)
            site_pool = site_pool[0]
            tsdf_d = tsdf_d[0]
            tsdf_w = tsdf_w[0]
            bidx_all = bidx_all[0]
            del sq

            is_site, is_inside, observed = esdf_ops.esdf_sites_from_tsdf(
                tsdf_d, tsdf_w, voxel_size_m=jnp.float32(vs),
                max_site_distance_vox=float(ep.max_site_distance_vox),
                min_weight=float(ep.min_weight))
            offs = esdf_ops._local_offsets_f32()
            own = (bidx_all.astype(jnp.float32)[:, None, :] * B + offs[None])
            site_pool = jnp.where(is_site[..., None], own, SENT)

            slots, bidx, _ = wg.allocated_batch(state, max_blocks=cap)
            nbrs = wg.neighbor_slots_of(state, bidx)

            right = [(i, (i + 1) % n) for i in range(n)]
            left = [(i, (i - 1) % n) for i in range(n)]

            def one_round(_, site_pool):
                # Local relaxation (XLA sweep for portability inside
                # shard_map; the single-chip path uses the Pallas kernel).
                # Current best = actual distance to the held site (INF when
                # none) so closer sites can still displace it.
                cur_diff = own - site_pool
                sq_cur = jnp.where(
                    jnp.any(site_pool >= SENT * 0.5, axis=-1),
                    esdf_ops.INF_SQ,
                    jnp.sum(cur_diff * cur_diff, axis=-1))
                site_new, _, _ = esdf_ops.esdf_sweep_pass(
                    site_pool, sq_cur, nbrs, slots, bidx,
                    inner_iters=B, max_sq_dist_vox=float(max_sq))
                site_pool = site_new
                # Ghost exchange: owned boundary layers -> neighbor ghosts.
                data_r, ok_r = face_payload(state, site_pool, L)   # to right
                data_l, ok_l = face_payload(state, site_pool, 1)   # to left
                recv_r = jax.lax.ppermute(data_r, "space", right)
                okr = jax.lax.ppermute(ok_r, "space", right)
                recv_l = jax.lax.ppermute(data_l, "space", left)
                okl = jax.lax.ppermute(ok_l, "space", left)
                # The ring wraps; spatially there is no neighbor beyond the
                # outermost slabs — drop wrapped payloads at the ends.
                idx = jax.lax.axis_index("space")
                okr = okr & (idx > 0)
                okl = okl & (idx < n - 1)
                # Received-from-left goes into my left ghost (x=0);
                # received-from-right into my right ghost (x=L+1).
                site_pool = scatter_face(state, site_pool, 0, recv_r, okr)
                site_pool = scatter_face(state, site_pool, L + 1, recv_l, okl)
                return site_pool

            site_pool = jax.lax.fori_loop(0, n_rounds, one_round, site_pool)

            diff = own - site_pool
            sq_out = jnp.sum(diff * diff, axis=-1)
            sq_out = jnp.where(jnp.any(site_pool >= SENT * 0.5, axis=-1),
                               esdf_ops.INF_SQ,
                               jnp.minimum(sq_out, esdf_ops.INF_SQ))
            sq_out = jnp.where(is_site, 0.0, sq_out)
            return site_pool[None], sq_out[None]

        spec = P("space")
        fn = shard_map(
            local, mesh=self.mesh,
            in_specs=(jax.tree.map(lambda _: spec, self.state),
                      spec, spec, spec, spec, spec),
            out_specs=(spec, spec),
            check_rep=False)
        return jax.jit(fn, donate_argnums=(1, 2))

    def update_esdf(self) -> None:
        site, sq = self._esdf(
            self.state, self.channels["esdf_site"],
            self.channels["esdf_sq_dist"], self.channels["tsdf_distance"],
            self.channels["tsdf_weight"], self.state.block_index_of_slot)
        self.channels["esdf_site"] = site
        self.channels["esdf_sq_dist"] = sq

    # ------------------------------------------------------------- queries
    def owned_block_mask(self, shard: int) -> np.ndarray:
        """Host: which slots of `shard` are non-ghost (owned) blocks."""
        c = self.config
        L = c.slab_width
        state_np = jax.tree.map(np.asarray, self.state)
        count = int(state_np.alloc_count[shard])
        bidx = state_np.block_index_of_slot[shard][:count]
        x_local = bidx[:, 0] - state_np.origin_block[shard][0]
        return (x_local >= 1) & (x_local <= L)

    def total_owned_blocks(self) -> int:
        return sum(int(self.owned_block_mask(s).sum())
                   for s in range(self.config.n_shards))
