"""Sharded forward-model runner.

The multi-chip execution driver: the TPU-native equivalent of the
reference's per-rank GPU dispatch + lane pipelining
(GPUdrivers.cu:262-360).  Rays are domain-decomposed over the mesh's
``"rays"`` axis (the reference's embarrassingly parallel MPI/OpenMP ray
batching, CPUdrivers.c:91-95); spectral channels optionally shard over
``"chan"``.  Tables are placed once per process (get_tbl_on_GPU,
GPUdrivers.cu:83-90 -> ``jax.device_put`` with a channel-minor
NamedSharding) and stay resident; per-call observation data is placed
with a rays-sharded layout so the whole jitted pipeline -- ray tracing
AND the RT integration -- runs SPMD with no per-step collectives (the
forward model is collective-free by construction; the mesh exists for
table broadcast and result gather).

Kernel parity with the single-chip driver: the fused Pallas kernel is
the production path here too, dispatched per shard through
``jax.shard_map`` (the analogue of the reference launching its fusion
kernel on every device, ``cudaSetDevice(MPIlocalrank)`` +
``formod_one_package``, GPUdrivers.cu:262-360).  The jnp scan pipeline
partitions automatically under GSPMD and needs no explicit mapping.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Ctl
from ..forward import ForwardModel, RtOut, rt_pallas_core
from ..geometry import (LosData, RayProfiles, build_ray_profiles,
                        hydrostatic_atm, trace_rays)
from ..io_tab import Atm, Obs
from ..ops.pallas.ega_fused import PallasTables
from ..tables import EgaTables
from .mesh import (CHAN_AXIS, RAY_AXIS, chan_minor_sharding,
                   ray_sharding, replicated)


def _place_tables(mesh: Mesh, model: ForwardModel) -> None:
    """Shard the device-resident table pytree channel-minor and the
    per-channel vectors over ``"chan"``; scalars/axes replicate."""
    put = jax.device_put
    model.dev_tbl = type(model.dev_tbl)(*(
        put(leaf, chan_minor_sharding(mesh, np.ndim(leaf)))
        for leaf in model.dev_tbl))
    model.sr = put(model.sr, chan_minor_sharding(mesh, 2))
    model.st = put(model.st, replicated(mesh))
    model.nu = put(model.nu, chan_minor_sharding(mesh, 1))
    model.window = put(model.window, chan_minor_sharding(mesh, 1))
    model.cc = type(model.cc)(*(
        put(leaf, chan_minor_sharding(mesh, 1)) for leaf in model.cc))
    if model.kernel_mode == "pallas":
        pt = model.pallas_tbl
        model.pallas_tbl = pt._replace(
            eps_aug=put(pt.eps_aug, NamedSharding(
                mesh, P(None, None, None, CHAN_AXIS))),
            sr=put(pt.sr, chan_minor_sharding(mesh, 2)),
            chan_mask=put(pt.chan_mask, chan_minor_sharding(mesh, 2)),
            p_ax=put(pt.p_ax, replicated(mesh)),
            t_ax=put(pt.t_ax, replicated(mesh)),
            np_u=put(pt.np_u, replicated(mesh)),
            nt_u=put(pt.nt_u, replicated(mesh)))
        model.cc_rows = put(model.cc_rows, chan_minor_sharding(mesh, 2))


def _pallas_in_specs(pt: PallasTables):
    """shard_map in_specs: lane (channel-shard) axes split over "chan",
    ray-major arrays over "rays", axes/scalars replicated."""
    pt_specs = PallasTables(
        eps_aug=P(None, None, None, CHAN_AXIS),
        sr=P(None, CHAN_AXIS), chan_mask=P(None, CHAN_AXIS),
        p_ax=P(), t_ax=P(), np_u=P(), nt_u=P(),
        k_rows=pt.k_rows, d_true=pt.d_true, n_chan=pt.n_chan,
        mode=pt.mode, deg_f=pt.deg_f, deg_i=pt.deg_i,
        n_bad=pt.n_bad)
    r1, r2, r3 = P(RAY_AXIS), P(RAY_AXIS, None), P(RAY_AXIS, None, None)
    los_specs = LosData(
        z=r2, lon=r2, lat=r2, p=r2, t=r2, q=r3, k=r3, ds=r2, u=r3,
        valid=r2, np_=r1, tsurf=r1, tpz=r1, tplon=r1, tplat=r1)
    return (pt_specs,
            P(None, CHAN_AXIS),      # cc_rows
            P(None, CHAN_AXIS),      # sr (unpadded [S, D])
            P(),                     # st
            P(CHAN_AXIS),            # nu
            los_specs,
            r1)                      # tsurf


def make_sharded_pallas_fn(mesh: Mesh, pt: PallasTables, flags,
                           ig_co2: int, ig_h2o: int, bbt: bool,
                           interpret: bool, early_exit=None,
                           variant: str = "group"):
    """jit(shard_map(...)) of the fused-Pallas RT step over the
    ("rays", "chan") mesh: every shard runs the SAME kernel the
    single-chip driver runs (rt_pallas_core) on its ray/channel block.
    The per-shard PallasTables carry per-shard statics (d_true is the
    per-shard channel count), so the kernel body needs no mesh
    awareness at all."""
    out_specs = RtOut(rad=P(RAY_AXIS, CHAN_AXIS),
                      tau=P(RAY_AXIS, CHAN_AXIS))
    if variant == "pool!":     # + per-shard capacity-ok flag
        out_specs = (out_specs, P(RAY_AXIS, CHAN_AXIS))
    body = partial(rt_pallas_core, flags=flags, ig_co2=ig_co2,
                   ig_h2o=ig_h2o, bbt=bbt, interpret=interpret,
                   early_exit=early_exit, variant=variant)
    try:
        fn = jax.shard_map(body, mesh=mesh,
                           in_specs=_pallas_in_specs(pt),
                           out_specs=out_specs, check_vma=False)
    except TypeError:      # older jax: check_rep instead of check_vma
        fn = jax.shard_map(body, mesh=mesh,
                           in_specs=_pallas_in_specs(pt),
                           out_specs=out_specs, check_rep=False)
    return jax.jit(fn)


def global_put(x, sharding):
    """Place a full host copy of the data with a sharding, multi-host
    aware.

    Single-process: plain ``device_put``.  Multi-process (after
    mesh.init_distributed): every process holds the same full host array
    (the drop-in formod contract) and contributes only the shards its
    local devices own (``jax.make_array_from_callback`` materialises
    per-shard slices, so no device ever sees the full batch)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def global_put_local(x_local, global_shape, sharding):
    """Place PER-PROCESS data: each process passes only its own slice of
    the ray axis and the pieces assemble into one global array without
    any host holding the full batch
    (``jax.make_array_from_process_local_data`` — the per-host input
    loading of SURVEY section 5's distributed-backend design; the
    upstream MPI harness partitions the obs batch externally the same
    way)."""
    if jax.process_count() == 1:
        return jax.device_put(np.asarray(x_local), sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(x_local), global_shape)


def host_gather(x) -> np.ndarray:
    """Distributed device array -> full host array on EVERY process
    (the result-gather of SURVEY section 5's distributed backend; the
    forward model itself stays collective-free)."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


class ShardedForwardModel(ForwardModel):
    """Forward model executing SPMD over a ("rays", "chan") mesh.

    Drop-in for :class:`ForwardModel`; single-device behaviour is the
    degenerate 1x1 mesh.  Channel sharding requires ``nd`` divisible by
    the mesh's chan extent (channels are never padded because the
    channel set is part of the physics configuration).  formod
    (including the RAYPACK package pipelining) is inherited: the ray
    axis pads to the mesh multiple via ``ray_multiple``.
    """

    def __init__(self, ctl: Ctl, mesh: Mesh, tables: EgaTables | None = None,
                 directory: str = ".", dtype=None, fast_tables=None):
        n_chan = mesh.shape[CHAN_AXIS]
        if ctl.nd % n_chan != 0:
            raise ValueError(
                f"ND={ctl.nd} not divisible by chan mesh axis {n_chan}")
        super().__init__(ctl, tables, directory, dtype,
                         fast_tables=fast_tables, pallas_n_chan=n_chan)
        if self.exec_device is not None:
            raise ValueError(
                "USETPU = 0 (never) contradicts running on an "
                "accelerator mesh; drop the mesh or set USETPU = -1/1")
        if self.pallas_tbl_table is not None:
            # hybrid turbo (bad-fit rows) is a single-chip feature for
            # now: the taint splice would need a second shard-mapped
            # dispatch per batch.  Demote to the exact table kernel --
            # correct on every row, just without the turbo speedup.
            print("# sharded driver: hybrid turbo tables demoted to "
                  "the exact table kernel "
                  f"({self.pallas_tbl.n_bad} bad-fit rows)")
            self.pallas_tbl = self.pallas_tbl_table
            self.pallas_tbl_table = None
        self.mesh = mesh
        self.n_ray_shards = mesh.shape[RAY_AXIS]
        self.ray_multiple = self.n_ray_shards
        _place_tables(mesh, self)
        self._pallas_sharded_fns: dict = {}

    def _sharded_pallas_fn(self, variant: str):
        """Per-variant jit(shard_map) cache (the variant resolution is
        the optimistic pool -> group policy of
        ForwardModel._resolve_variant; each shard checks its OWN pool
        capacity, the driver AND-reduces the per-shard flags)."""
        fn = self._pallas_sharded_fns.get(variant)
        if fn is None:
            fn = make_sharded_pallas_fn(
                self.mesh, self.pallas_tbl, self.flags, self.ig_co2,
                self.ig_h2o, bool(self.ctl.write_bbt),
                self.pallas_interpret,
                early_exit=True if self.ctl.early_exit else None,
                variant=variant)
            self._pallas_sharded_fns[variant] = fn
        return fn

    def trace(self, atm: Atm, obs: Obs, hydro: bool = True) -> LosData:
        """Rays-sharded tracing: profiles and observer geometry are placed
        with ``P("rays", ...)`` so the jitted tracer (a vmap over rays)
        partitions over the mesh; output shardings propagate."""
        if hydro:
            hydrostatic_atm(self.ctl, atm)
        prof = build_ray_profiles(self.ctl, atm, obs, self.dtype)
        prof = RayProfiles(*(
            global_put(leaf, ray_sharding(self.mesh, np.ndim(leaf)))
            for leaf in prof))
        sh1 = ray_sharding(self.mesh, 1)
        obs_geo = {
            name: global_put(
                np.asarray(getattr(obs, name), self.dtype), sh1)
            for name in ("obsz", "obslon", "obslat", "vpz", "vplon", "vplat")}
        return trace_rays(self.ctl, prof, obs_geo, self.dtype)

    def _integrate_deferred(self, los: LosData) -> RtOut:
        if self.kernel_mode == "pallas":
            return self._integrate_pallas(
                lambda var: self._sharded_pallas_fn(var)(
                    self.pallas_tbl, self.cc_rows, self.sr, self.st,
                    self.nu, los, los.tsurf),
                los)
        return super()._integrate_deferred(los)

    def _to_host(self, x) -> np.ndarray:
        return host_gather(x).astype(np.float64)

    def _outputs_to_host_many(self, items):
        """Distributed arrays take the per-package allgather path (no
        single-device_get batching across packages)."""
        return [self._outputs_to_host(a, r, pend) for a, r, pend in items]

    def _outputs_to_host(self, arrays, r, pend=None):
        """Distributed arrays need the per-leaf allgather path (a plain
        device_get cannot materialise non-addressable shards).  The
        optimistic pool dispatch's per-shard capacity flags AND-reduce
        across the mesh; any shard's overflow redoes the whole batch
        with the group kernel (same policy as the single-chip driver)."""
        if pend is not None:
            okf, _taintf, redo = pend    # taint is None here (hybrid
            #                              demotes at init, see above)
            if not bool(host_gather(okf).all()):
                out2 = redo()
                self.last_variant = "group"
                arrays = (out2.rad, out2.tau) + tuple(arrays)[2:]
        return tuple(host_gather(a).astype(np.float64)[:r]
                     for a in arrays)
