"""The forward model: formod pipeline.

TPU-native re-expression of the reference execution drivers
(``formod``/``formod_CPU``, CPUdrivers.c:109-193, and ``formod_GPU``,
GPUdrivers.cu:187-360): one jitted radiative-transfer pipeline that XLA
compiles for the local backend.  The reference's structural tricks map as:

* the 16-way kernel multiversioning over the 4-bit continuum mask
  (jr_multiversion4gases.h) -> 4 static booleans burned into the jit trace;
* the fused GPU kernel's block-per-ray / thread-per-channel layout
  (jr_fusion_kernel.mv4g.cu) -> one ``lax.scan`` over the LOS axis whose
  body is batched over [rays, channels] (rays on sublanes, channels on
  lanes);
* the sequential transmittance recursion (``tau_path`` loop-carried state,
  CPUdrivers.c:66-83 "non-parallelisable") -> the scan carry
  ``[R, G, D]``;
* the observation mask (save_mask/apply_mask, jr_common.h:193-210) ->
  host-side NaN bookkeeping around the jitted call.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import Ctl
from .constants import C1, C2, TAU_CUTOFF
from .geometry import (LosData, build_ray_profiles, hydrostatic_atm,
                       trace_rays)
from .io_tab import Atm, Obs, read_shape
from .ops.continua import ContinuaCoeffs, beta_ds, precompute_continua
from .ops.ega import (EgaDeviceTables, FastDeviceTables, ega_eps_exact,
                      ega_eps_fast)
from .tables import (EgaTables, FastTables, build_fast_tables,
                     load_tables_cached)


N_SEG_STREAM = 8   # ega_fused.N_SEG: fixed stream fields per segment


def _round_up_128(x: int) -> int:
    return -(-x // 128) * 128


# ---------------------------------------------------------------------------
# Device-side table containers

def ega_tables_to_device(tbl: EgaTables) -> EgaDeviceTables:
    """Upload padded tables; payloads stay f32 (real_tblND_t, jurassic.h:387),
    axes in f64 like the reference."""
    return EgaDeviceTables(
        np_=jnp.asarray(tbl.np_), nt=jnp.asarray(tbl.nt),
        nu=jnp.asarray(tbl.nu), p=jnp.asarray(tbl.p), t=jnp.asarray(tbl.t),
        u=jnp.asarray(tbl.u), eps=jnp.asarray(tbl.eps))


def fast_tables_to_device(tbl: FastTables) -> FastDeviceTables:
    return FastDeviceTables(
        np_=jnp.asarray(tbl.np_), nt=jnp.asarray(tbl.nt),
        p=jnp.asarray(tbl.p), t=jnp.asarray(tbl.t), nu=jnp.asarray(tbl.nu),
        log2_u0=jnp.asarray(tbl.log2_u0), eps=jnp.asarray(tbl.eps),
        valid=jnp.asarray(tbl.valid))


def continua_to_device(cc: ContinuaCoeffs, dtype) -> ContinuaCoeffs:
    return ContinuaCoeffs(*(jnp.asarray(np.asarray(f), dtype) for f in cc))


# ---------------------------------------------------------------------------
# Source function and brightness temperature

def src_planck(sr, st, t):
    """Table-interpolated source radiance [D] at temperature t
    (src_planck_core, jr_common.h:221-224; locate_st index (int)(4 t)-400,
    jr_common.h:83-84, clamped here for safety)."""
    n = st.shape[0]
    it = jnp.clip((4.0 * t).astype(jnp.int32) - 400, 0, n - 2)
    t0, t1 = st[it], st[it + 1]
    return sr[it] + (t - t0) * (sr[it + 1] - sr[it]) / (t1 - t0)


def brightness_jnp(rad, nu):
    """Radiance -> brightness temperature (brightness_core,
    jr_common.h:189-190)."""
    return C2 * nu / jnp.log1p(C1 * nu ** 3 / rad)


# ---------------------------------------------------------------------------
# The jitted RT integration

class RtOut(NamedTuple):
    rad: jax.Array  # [R, D]
    tau: jax.Array  # [R, D]


@partial(jax.jit,
         static_argnames=("flags", "ig_co2", "ig_h2o", "use_fast", "bbt"))
def rt_integrate(tbl, sr, st, nu, cc: ContinuaCoeffs, window, los: LosData,
                 tsurf, flags, ig_co2, ig_h2o, use_fast, bbt) -> RtOut:
    """Radiative-transfer integration over traced lines of sight.

    The analogue of the fused GPU kernel + surface + BT kernels
    (GPUdrivers.cu:226-240): a single ``lax.scan`` over the LOS step axis,
    body batched over [R] rays x [D] channels, carrying
    (rad [R,D], tau [R,D], tau_path [R,G,D]).

    Args:
      tbl: EgaDeviceTables or FastDeviceTables (selected by use_fast).
      sr, st: source-function table [S, D] / axis [S].
      nu: channel wavenumbers [D] (for BBT conversion).
      cc: per-channel continuum coefficients.
      window: [D] int32 channel->window map.
      los: traced rays (LosData, [R, NLOS, ...]).
      tsurf: [R] surface temperature (-999 => no surface hit).
      flags: static (co2, h2o, n2, o2) continuum switches incl. emitter
        presence (fourbit, CPUdrivers.c:130-134).
      ig_co2, ig_h2o: static emitter indices (>= 0 when the matching flag
        is set).
      use_fast: static kernel selector.
      bbt: static WRITE_BBT switch (radiance_to_brightness_CPU,
        CPUdrivers.c:6-14).
    """
    dtype = los.p.dtype
    R, NLOS = los.ds.shape
    G = los.u.shape[2]
    D = sr.shape[1]
    ega = ega_eps_fast if use_fast else ega_eps_exact

    sr_ = sr.astype(dtype)
    st_ = st.astype(dtype)

    def step(carry, inp):
        rad, tau, tau_path = carry
        p, t, q, k, ds, u, valid = inp
        # extinction + continua (continua_core, jr_common.h:397-409)
        kw = jnp.take(k, window, axis=1)                       # [R, D]
        zq = jnp.zeros((R,), dtype)
        q_h2o = q[:, ig_h2o] if ig_h2o >= 0 else zq
        u_h2o = u[:, ig_h2o] if ig_h2o >= 0 else zq
        u_co2 = u[:, ig_co2] if ig_co2 >= 0 else zq
        bds = beta_ds(flags, cc, kw, ds[:, None], p[:, None], t[:, None],
                      q_h2o[:, None], u_co2[:, None], u_h2o[:, None])
        # EGA transmittance update (apply_ega_core, jr_common.h:271-280)
        factor = jax.vmap(
            lambda tp, tt, uu, pp: ega(tbl, tp, tt, uu, pp)
        )(tau_path, t, u, p)                                   # [R, G, D]
        tau_gas = jnp.prod(factor, axis=1)                     # [R, D]
        tau_path = jnp.where(valid[:, None, None],
                             tau_path * factor, tau_path)
        # source term (src_planck_core) + integration (new_obs_core,
        # jr_common.h:294-300)
        src = jax.vmap(lambda tt: src_planck(sr_, st_, tt))(t)  # [R, D]
        eps = 1.0 - tau_gas * jnp.exp(-bds)
        upd = valid[:, None] & (tau_gas > TAU_CUTOFF)
        rad = jnp.where(upd, rad + src * eps * tau, rad)
        tau = jnp.where(upd, tau * (1.0 - eps), tau)
        return (rad, tau, tau_path), None

    init = (jnp.zeros((R, D), dtype), jnp.ones((R, D), dtype),
            jnp.ones((R, G, D), dtype))
    xs = (jnp.moveaxis(los.p, 1, 0), jnp.moveaxis(los.t, 1, 0),
          jnp.moveaxis(los.q, 1, 0), jnp.moveaxis(los.k, 1, 0),
          jnp.moveaxis(los.ds, 1, 0), jnp.moveaxis(los.u, 1, 0),
          jnp.moveaxis(los.valid, 1, 0))
    (rad, tau, _), _ = jax.lax.scan(step, init, xs)

    # surface emission (add_surface_core, jr_common.h:228-234)
    src_surf = jax.vmap(lambda tt: src_planck(sr_, st_, tt))(tsurf)
    rad = jnp.where((tsurf > 0.0)[:, None], rad + src_surf * tau, rad)

    if bbt:
        rad = brightness_jnp(rad, nu.astype(dtype))
    return RtOut(rad=rad, tau=tau)


def rt_pallas_core(pt, cc_rows, sr, st, nu, los: LosData, tsurf,
                   flags, ig_co2, ig_h2o, bbt,
                   interpret=False, early_exit=None,
                   variant="group") -> RtOut:
    """Unjitted fused-Pallas RT step: the kernel plus the surface
    emission (add_surface_core, jr_common.h:228-234) and brightness
    conversion epilogues, which stay outside the kernel as cheap [R, D]
    jnp ops mirroring the reference's separate surface/BT kernels
    (GPUdrivers.cu:234-240).  Also the per-shard body of the
    shard-mapped multi-chip driver (parallel/sharded.py)."""
    from .ops.pallas import rt_fused_pallas
    out = rt_fused_pallas(pt, cc_rows, los, flags, ig_co2, ig_h2o,
                          interpret=interpret, early_exit=early_exit,
                          variant=variant)
    rad, tau = out[0], out[1]
    sr_ = sr.astype(jnp.float32)
    st_ = st.astype(jnp.float32)
    ts = tsurf.astype(jnp.float32)
    src_surf = jax.vmap(lambda tt: src_planck(sr_, st_, tt))(ts)
    rad = jnp.where((ts > 0.0)[:, None], rad + src_surf * tau, rad)
    if bbt:
        rad = brightness_jnp(rad, nu.astype(jnp.float32))
    res = RtOut(rad=rad, tau=tau)
    if variant == "pool!":
        # in-graph capacity flag, shaped [1, 1] so the shard-mapped
        # driver can give every mesh shard its own block; hybrid turbo
        # tables (n_bad > 0) add the per-(ray, channel) taint map
        if len(out) > 3:
            return res, out[2].reshape(1, 1), out[3]
        return res, out[2].reshape(1, 1)
    return res


@partial(jax.jit, static_argnames=("flags", "ig_co2", "ig_h2o", "bbt",
                                   "interpret", "early_exit", "variant"))
def rt_integrate_pallas(pt, cc_rows, sr, st, nu, los: LosData, tsurf,
                        flags, ig_co2, ig_h2o, bbt,
                        interpret=False, early_exit=None,
                        variant="group") -> RtOut:
    """RT integration through the fused Pallas kernel
    (ops/pallas/ega_fused.py): same contract as :func:`rt_integrate`."""
    return rt_pallas_core(pt, cc_rows, sr, st, nu, los, tsurf,
                          flags, ig_co2, ig_h2o, bbt, interpret,
                          early_exit, variant)


# ---------------------------------------------------------------------------
# FOV convolution (formod_fov, jurassic.c:214-258)

def formod_fov(ctl: Ctl, obs: Obs) -> None:
    """Convolve rad/tau profiles with the instrument field of view
    (formod_fov, jurassic.c:214-258).

    Fully vectorized host-side NumPy (the round-3 per-ray Python loop
    became the host bottleneck at 10k+-ray batches): every ray's
    same-time neighbour window (at most 2 NFOV + 1 candidates) is
    compacted with a stable sort, the shape-grid interpolation indices
    come from a batched counted comparison (== searchsorted per row),
    and the weight sum is one einsum.  Ray-chunked so the [chunk,
    NSHAPE, D] intermediates stay bounded."""
    if ctl.fov == "-":
        return
    from .config import NFOV
    dz, w = read_shape(ctl.fov)
    R = obs.nr
    rad0, tau0 = obs.rad.copy(), obs.tau.copy()
    WW = 2 * NFOV + 1
    ir = np.arange(R)
    col = np.clip(ir[:, None] + np.arange(-NFOV, NFOV + 1), 0, R - 1)
    mask = (obs.time[col] == obs.time[:, None]) \
        & (ir[:, None] + np.arange(-NFOV, NFOV + 1) >= 0) \
        & (ir[:, None] + np.arange(-NFOV, NFOV + 1) < R)
    n = mask.sum(axis=1)
    if (n < 2).any():
        raise ValueError("Cannot apply FOV convolution!")
    # compact the selected neighbours to the front, original order kept
    ordr = np.argsort(~mask, axis=1, kind="stable")
    colc = np.take_along_axis(col, ordr, axis=1)          # [R, WW]
    inb = np.arange(WW)[None, :] < n[:, None]
    zwin = np.where(inb, obs.vpz[colc], np.inf)
    wsum = np.sum(w)
    chunk = max(1, (64 << 20) // max(dz.size * obs.rad.shape[1] * 8, 1))
    for c0 in range(0, R, chunk):
        sl = slice(c0, min(c0 + chunk, R))
        zfov = obs.vpz[sl, None] + dz[None, :]            # [r, NS]
        # locate() on each compacted ray-altitude grid
        cnt = np.sum(zwin[sl][:, None, :] <= zfov[:, :, None], axis=2)
        idx = np.clip(cnt - 1, 0, (n[sl] - 2)[:, None])
        g0 = np.take_along_axis(colc[sl], idx, axis=1)    # [r, NS]
        g1 = np.take_along_axis(colc[sl], idx + 1, axis=1)
        z0, z1 = obs.vpz[g0], obs.vpz[g1]
        f = ((zfov - z0) / (z1 - z0))[:, :, None]
        for src, dst in ((rad0, obs.rad), (tau0, obs.tau)):
            v0, v1 = src[g0], src[g1]                     # [r, NS, D]
            dst[sl] = np.einsum("s,rsd->rd", w,
                                v0 + f * (v1 - v0)) / wsum


# ---------------------------------------------------------------------------
# Host orchestration

def pad_obs(obs: Obs, r_pad: int) -> Obs:
    """Pad the ray axis to r_pad by repeating the last ray (cheap,
    discarded after the gather; keeps every shard's geometry well-posed
    so the tracer never sees degenerate inputs)."""
    import dataclasses
    r = obs.nr
    if r == r_pad:
        return obs
    fields = {}
    for f in dataclasses.fields(Obs):
        arr = np.asarray(getattr(obs, f.name))
        reps = (r_pad - r,) + (1,) * (arr.ndim - 1)
        fields[f.name] = np.concatenate([arr, np.tile(arr[-1:], reps)])
    return Obs(**fields)


class ForwardModel:
    """Loaded, device-resident forward model for one ctl configuration.

    The analogue of the reference's once-per-process state: the cached
    table upload (get_tbl, jr_common.h:61-79 / get_tbl_on_GPU,
    GPUdrivers.cu:83-90) plus the continuum setup (CPUdrivers.c:126-134).
    Construct once, call :meth:`formod` per observation batch.
    """

    def __init__(self, ctl: Ctl, tables: EgaTables | None = None,
                 directory: str = ".", dtype=None,
                 fast_tables: FastTables | None = None,
                 pallas_n_chan: int = 1):
        self.ctl = ctl
        self.ray_multiple = 1   # mesh ray-shard count (ShardedForwardModel)
        if ctl.formod != 2:
            # The reference ships only the EGA forward model and hard-asserts
            # on the CGA selector when not compiled in (jr_common.h:701-707);
            # RFM is declared but not implemented there either.
            raise ValueError(
                f"FORMOD = {ctl.formod} is not supported (1 = CGA and "
                "3 = RFM are not implemented; use FORMOD = 2 for EGA)")
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.dtype = dtype
        if tables is None and fast_tables is None:
            tables = load_tables_cached(ctl, directory)
        self.tables = tables
        self.use_fast = ctl.kernel in ("auto", "jax", "pallas", "turbo",
                                       "fast")
        self.kernel_mode = "exact" if not self.use_fast else "jax"
        self.pallas_tbl = None
        self.pallas_tbl_table = None     # exact backing for hybrid turbo
        self.turbo_stats = None
        self._pending_ok = None          # (ok flag, taint | None, redo)
        #                                  of the last optimistic pool
        #                                  dispatch
        self._narrated_shapes: set = set()
        self.last_variant = None         # variant of the last dispatch
        # USETPU dispatch (the reference's useGPU -1/0/1 = "if possible
        # / never / required", CPUdrivers.c:179-193, with USEGPU as the
        # drop-in ctl alias): 0 pins execution to the host CPU backend
        # and the jnp pipeline (the CPU-driver analogue) even when an
        # accelerator backend is active; 1 requires one and errors
        # otherwise; -1 auto-selects (the default).
        backend = jax.default_backend()
        on_tpu = backend not in ("cpu", "gpu")
        self.exec_device = None
        if ctl.usetpu == 0:
            # an EXPLICIT KERNEL = pallas/turbo still runs -- in
            # interpret mode on the pinned CPU devices (the reference
            # example ctls ship USEGPU 0 and its CPU build runs the
            # same physics); only KERNEL = auto re-resolves to the jnp
            # pipeline here
            if backend != "cpu":
                self.exec_device = jax.local_devices(backend="cpu")[0]
            on_tpu = False
        elif ctl.usetpu >= 1 and not on_tpu:
            raise ValueError(
                "USETPU = 1 (required) but the JAX backend is "
                f"'{backend}'; select an accelerator via JAX_PLATFORMS "
                "(the reference aborts the same way when useGPU = 1 "
                "finds no CUDA device, CPUdrivers.c:185-188)")
        if self.use_fast:
            if fast_tables is None:
                fast_tables = build_fast_tables(tables)
            self.dev_tbl = fast_tables_to_device(fast_tables)
            want_pallas = (ctl.kernel in ("pallas", "turbo")
                           or (ctl.kernel == "auto" and on_tpu))
            if want_pallas:
                if ctl.kernel in ("turbo", "auto"):
                    # Chebyshev-compressed tables (turbo_fit.py): the
                    # fit is validated against every row at build time;
                    # refuse the mode when the achieved error exceeds
                    # the EGA physics tolerance (the discipline of the
                    # reference's FAST_INVERSE_OF_U self-validation,
                    # jurassic.c:487-609).  File-backed tables cache
                    # the fitted coefficients beside the table cache
                    # (READ_BINARY/WRITE_BINARY semantics).  ``auto``
                    # prefers turbo on accelerators (the reference GPU
                    # build ships --use_fast_math by default,
                    # Makefile:71) but falls back to the table kernel
                    # when validation rejects the fit.
                    self.pallas_tbl, self.turbo_stats = \
                        self._turbo_tables_cached(fast_tables,
                                                  pallas_n_chan,
                                                  directory)
                    # gate on fit error AND chord deviation: the fit
                    # errors bound turbo vs the smooth emissivity
                    # curve, max_chord_dev bounds turbo vs the TABLE
                    # kernels' linear-in-u chords (the documented
                    # ~1-2e-3 contract, turbo_fit.TurboStats) -- a
                    # pathological high-curvature table must not pass
                    # on fit quality alone (ADVICE r3).  Round 5: the
                    # stats cover GOOD rows only; rows failing the
                    # per-row gate are marked (n_bad) and handled by
                    # the PER-ROW HYBRID -- tainted lanes re-evaluate
                    # through the exact table kernel -- as long as
                    # their fraction stays under
                    # JURASSIC_TURBO_HYBRID_MAX (default 5%); past
                    # that the whole config demotes as before
                    # (VERDICT r4 item 6).
                    import os
                    st = self.turbo_stats
                    n_bad = (self.pallas_tbl.n_bad
                             if self.pallas_tbl is not None else 0)
                    frac_bad = (n_bad / max(st.rows, 1)
                                if st is not None else 0.0)
                    hyb_max = float(os.environ.get(
                        "JURASSIC_TURBO_HYBRID_MAX", "0.05"))
                    bad = (st is not None
                           and (max(st.max_fwd_err,
                                    st.max_inv_err) > 2e-3
                                or st.max_chord_dev > 3e-3
                                or frac_bad > hyb_max))
                    if not bad and n_bad > 0:
                        from .ops.pallas import build_pallas_tables
                        self.pallas_tbl_table = build_pallas_tables(
                            fast_tables, pallas_n_chan)
                        if self.pallas_tbl_table is None:
                            bad = True       # no exact backing: demote
                        else:
                            print(f"# turbo hybrid: {n_bad} of "
                                  f"{st.rows} rows failed the per-row "
                                  f"fit gate (pass rate "
                                  f"{1 - frac_bad:.2%}); tainted lanes "
                                  "re-evaluate through the table "
                                  "kernel")
                    if bad and ctl.kernel == "turbo":
                        raise ValueError(
                            "KERNEL = turbo: Chebyshev fit validation "
                            f"failed ({self.turbo_stats}, "
                            f"bad rows {n_bad}); these tables "
                            "need KERNEL = pallas")
                    if bad:
                        self.pallas_tbl = None
                        self.turbo_stats = None
                        self.pallas_tbl_table = None
                if self.pallas_tbl is None:
                    from .ops.pallas import build_pallas_tables
                    self.pallas_tbl = build_pallas_tables(fast_tables,
                                                          pallas_n_chan)
                if self.pallas_tbl is not None:
                    self.kernel_mode = "pallas"
                    self.pallas_interpret = not on_tpu
                elif ctl.kernel in ("pallas", "turbo"):
                    raise ValueError(
                        f"KERNEL = {ctl.kernel} requires channel-uniform "
                        "table axes per gas (table build returned None); "
                        "use KERNEL = jax for ragged-across-channel tables")
        else:
            self.dev_tbl = ega_tables_to_device(tables)
        src = tables if tables is not None else fast_tables
        self.sr = jnp.asarray(src.sr)
        self.st = jnp.asarray(src.st)
        self.nu = jnp.asarray(ctl.nu)
        self.window = jnp.asarray(ctl.window, jnp.int32)
        self.cc = continua_to_device(precompute_continua(ctl), dtype)
        if self.kernel_mode == "pallas":
            from .ops.pallas import pack_continua
            self.cc_rows = pack_continua(
                precompute_continua(ctl), np.asarray(ctl.window), ctl.nd,
                ctl.nw, pallas_n_chan)
        # continuum configuration (fourbit, CPUdrivers.c:126-134)
        self.ig_co2 = ctl.emitter_index("CO2")
        self.ig_h2o = ctl.emitter_index("H2O")
        self.flags = (
            ctl.ctm_co2 == 1 and self.ig_co2 >= 0,
            ctl.ctm_h2o == 1 and self.ig_h2o >= 0,
            ctl.ctm_n2 == 1,
            ctl.ctm_o2 == 1,
        )

    def _turbo_tables_cached(self, fast_tables, n_chan, directory):
        """build_turbo_tables with an npz cache for file-backed tables
        (keyed like the table cache: config + source-file freshness)."""
        import jax.numpy as jnp
        from .ops.pallas import build_turbo_tables
        from .ops.pallas.ega_fused import PallasTables
        from .ops.pallas.turbo_fit import TurboStats
        ctl = self.ctl
        cf = None
        if self.tables is not None and ctl.tblbase != "-":
            from .tables import cache_filename
            base = cache_filename(ctl, directory)
            # v2: the round-5 aux layout (21 aux rows incl. the
            # precomputed slopes + n_bad); older caches must re-fit
            cf = base.with_name(f"{base.stem}_turbo{n_chan}v2.npz")
        if cf is not None and ctl.read_binary and cf.exists():
            with np.load(cf, allow_pickle=False) as f:
                pt = PallasTables(
                    *(jnp.asarray(f[k]) for k in
                      ("eps_aug", "sr", "chan_mask", "p_ax", "t_ax",
                       "np_u", "nt_u")),
                    k_rows=int(f["k_rows"]), d_true=int(f["d_true"]),
                    n_chan=int(f["n_chan"]), mode="turbo",
                    deg_f=int(f["deg_f"]), deg_i=int(f["deg_i"]))
                sv = f["stats"]
                stats = TurboStats(int(sv[0]), *map(float, sv[1:]))
            return pt, stats
        pt, stats = build_turbo_tables(fast_tables, n_chan)
        if pt is not None and stats is not None:
            # observability narration (the table-report style of
            # init_tbl, jurassic.c:429-484)
            mb = pt.eps_aug.size * 4 / 1e6
            print(f"# turbo tables: {stats.rows} rows fitted, "
                  f"max fwd err {stats.max_fwd_err:.2e}, "
                  f"inv roundtrip {stats.max_inv_err:.2e}, "
                  f"chord dev {stats.max_chord_dev:.2e}, "
                  f"{mb:.1f} MByte HBM")
        if pt is not None and cf is not None and ctl.write_binary:
            np.savez(
                cf, eps_aug=np.asarray(pt.eps_aug),
                sr=np.asarray(pt.sr), chan_mask=np.asarray(pt.chan_mask),
                p_ax=np.asarray(pt.p_ax), t_ax=np.asarray(pt.t_ax),
                np_u=np.asarray(pt.np_u), nt_u=np.asarray(pt.nt_u),
                k_rows=pt.k_rows, d_true=pt.d_true, n_chan=pt.n_chan,
                deg_f=pt.deg_f, deg_i=pt.deg_i, n_bad=pt.n_bad,
                stats=np.asarray(list(stats), np.float64))
        return pt, stats

    def per_ray_device_bytes(self) -> int:
        """Device PEAK-footprint bytes per ray of one in-flight package:
        the traced LosData arrays, the Pallas segment/index streams, the
        rad/tau outputs, AND the transient intermediates of the corner
        bracketing + slot-pool schedule (the one-hot [S, G, P]/[S, G, T]
        contraction operands and the [2SG, NPAIR] compaction masks) --
        XLA's buffer assignment keeps several of those live at once, and
        at nlos = 400 they dominate the steady-state arrays ~50x: a
        10k-ray batch peaks ~1.9 MB/ray = ~20 GB, past a 16 GB chip.
        (Tables are process-resident and excluded, like the reference's
        lane sizing, GPUdrivers.cu:278,296-307.)"""
        ctl = self.ctl
        S, G, W = ctl.nlos, ctl.ng, ctl.nw
        b = np.dtype(self.dtype).itemsize
        los = S * (7 + 2 * G + W) * b                 # LosData fields
        streams = S * (N_SEG_STREAM + W + G + G * 2 + 2) * 4
        out = 2 * _round_up_128(max(ctl.nd, 1)) * 4
        sched = 0
        if self.kernel_mode == "pallas" and self.pallas_tbl is not None:
            from .ops.pallas.ega_fused import POOL_NSLOT, RG_MAX
            P = int(self.pallas_tbl.p_ax.shape[-1])
            T = int(self.pallas_tbl.t_ax.shape[-1])
            # one-hot operands + bracketing rows (lo+hi, ~4 concurrent
            # f32 temps) and the pool compaction/inverse masks (the
            # row-candidate stream is 2x the pair stream)
            sched = S * G * ((P + T) * 4 * 4
                             + 4 * (min(POOL_NSLOT, P * T) + 8) * 4)
            if self.pallas_tbl.mode == "turbo":
                # the PRE-GATHERED pool (one [G*NSLOT, K_aug, Dp]
                # block per 8-ray group) dominates per-ray HBM at wide
                # nd: 21 MB/ray at nd = 2048 -- without this term the
                # auto package overruns the chip (measured OOM)
                _, _, K_aug, Dp = (int(x) for x in
                                   self.pallas_tbl.eps_aug.shape)
                nslot = min(POOL_NSLOT, P * T)
                sched += G * nslot * K_aug * Dp * 4 // RG_MAX
        return los + streams + out + sched

    def package_size(self, nr: int, pack: int | None = None) -> int:
        """The ACTUAL per-package ray count formod runs for an nr-ray
        batch: the batch is split into equal-size packages (same count
        as the resolved RAYPACK size implies, never larger, rounded up
        to the mesh ray-shard multiple).  Sizing 1084 rays as 2x717
        would trace 350 dead padded rays (+32% device work); 2x542
        pads only to the shard multiple.  0 = monolithic."""
        if pack is None:
            pack = self._resolve_raypack(nr)
        if not (0 < pack < nr):
            return 0
        m = max(self.ray_multiple, 1)
        npk = -(-nr // pack)
        even = -(-nr // npk)
        return -(-even // m) * m

    def _resolve_raypack(self, nr: int) -> int:
        """RAYPACK = 0 (default): auto-size the package so ~2 in-flight
        packages fit 90% of free device memory (the reference sizes its
        GPU lane pool to 90% of free, GPUdrivers.cu:296-321); > 0: the
        explicit knob; < 0: force one monolithic batch.  Auto resolves
        to one batch when memory stats are unavailable (CPU backend,
        some plugins) or when the whole batch fits -- so small batches
        behave exactly as before."""
        pack = int(self.ctl.raypack)
        if pack > 0:
            return pack
        if pack < 0:
            return 0
        cache = getattr(self, "_raypack_cache", None)
        if cache is None:
            cache = self._raypack_cache = {}
        if nr in cache:
            return cache[nr]
        dev = jax.local_devices()[0]
        try:
            st = dev.memory_stats()
            free = int(st["bytes_limit"]) - int(st.get("bytes_in_use", 0))
        except Exception:
            if dev.platform == "cpu":
                return 0       # host RAM: one batch, as before
            # accelerator plugin without memory_stats (e.g. tunneled
            # chips): fall back to the chip class's HBM capacity, less
            # the resident tables (JURASSIC_DEVICE_MEM_GB overrides)
            import os
            cap = float(os.environ.get("JURASSIC_DEVICE_MEM_GB", 16.0))
            tbl = (self.pallas_tbl.eps_aug.size * 4
                   if self.pallas_tbl is not None else 0)
            free = int(cap * 1e9) - tbl
        prb = self.per_ray_device_bytes()
        # ~2 packages in flight (the RAYPACK loop overlaps package n+1's
        # dispatch with package n's compute); a package's rays split
        # across the mesh's ray shards, so the per-DEVICE budget sizes
        # ray_multiple times as many package rays (ADVICE r4).  The
        # turbo pool path divides by 3: its pre-gathered pool peaks
        # with the gather TEMP of the next package alive next to two
        # resident pools (measured OOM at nd = 2048 with the /2 rule)
        div = 3 if (self.pallas_tbl is not None
                    and self.pallas_tbl.mode == "turbo") else 2
        budget = int(0.9 * free) // div
        fit = max(budget // max(prb, 1), 1) * max(self.ray_multiple, 1)
        if fit >= nr:
            fit = 0
        elif getattr(self, "_raypack_printed", None) != fit:
            self._raypack_printed = fit
            print(f"# RAYPACK auto: {fit} rays/package "
                  f"({prb} B/ray, {free / 1e9:.2f} GB free)")
        # cache per batch size: device.memory_stats() is an RPC on
        # tunneled devices (~tens of ms, erratic) and the sizing only
        # depends on the once-per-process free-memory snapshot
        cache[nr] = fit
        return fit

    def _exec_ctx(self):
        """USETPU = 0: pin the whole pipeline to the host CPU backend
        (jit follows the committed default device); no-op otherwise."""
        import contextlib
        return (jax.default_device(self.exec_device)
                if self.exec_device is not None
                else contextlib.nullcontext())

    def _resolve_variant(self, los: LosData) -> str:
        """Kernel-variant policy for one traced batch: OPTIMISTICALLY
        dispatch the slot-pool kernel ("pool!": pool + an in-graph
        capacity-ok flag).  The flag is NOT synced here: it rides the
        batched output pull (:meth:`_outputs_to_host`), where an
        overflow triggers a group-kernel re-run of the same batch --
        physical atmospheres never overflow (measured max 76 distinct
        pairs of the 96-slot pool), so the check is free and, unlike
        the round-4 ``id(los.ds)``-keyed verdict cache, cannot alias a
        recycled Python id onto a new batch (ADVICE r4) nor block the
        async RAYPACK package pipelining on a per-package host sync.

        ``JURASSIC_PALLAS_VARIANT=group|pool`` forces either (A/B
        knob; "pool" skips the capacity check)."""
        import os
        pt = self.pallas_tbl
        if pt is None or pt.mode != "turbo":
            return "group"
        env = os.environ.get("JURASSIC_PALLAS_VARIANT")
        if env in ("group", "pool"):
            return env
        return "pool!"

    def _integrate_pallas(self, fn, los: LosData) -> RtOut:
        """Variant-resolved Pallas dispatch: ``fn(variant)`` runs the
        jitted kernel; records the optimistic pool dispatch's capacity
        flag, the hybrid taint map (when the turbo tables carry
        bad-fit rows) and a redo closure in ``self._pending_ok`` for
        deferred consumption at the output pull, and
        ``self.last_variant`` for observability."""
        var = self._resolve_variant(los)
        self._pending_ok = None
        if var == "pool!":
            self._narrate_schedule(los)
            r = fn("pool!")
            out, okf = r[0], r[1]
            taintf = r[2] if len(r) > 2 else None
            self.last_variant = "pool"
            # hybrid: the redo is the EXACT table kernel (backs both a
            # capacity overflow and the taint splice); pure turbo
            # falls back to its own group form
            redo = (self._table_redo(los) if taintf is not None
                    else (lambda: fn("group")))
            self._pending_ok = (okf, taintf, redo)
            return out
        self.last_variant = "pool" if var == "pool" else "group"
        return fn(var)

    def _table_redo(self, los: LosData):
        """Exact-table-kernel dispatch closure for the hybrid splice
        (same group-kernel path KERNEL = pallas runs)."""
        return lambda: rt_integrate_pallas(
            self.pallas_tbl_table, self.cc_rows, self.sr, self.st,
            self.nu, los, los.tsurf, self.flags, self.ig_co2,
            self.ig_h2o, bool(self.ctl.write_bbt),
            self.pallas_interpret,
            early_exit=(True if self.ctl.early_exit else None),
            variant="group")

    def _narrate_schedule(self, los: LosData) -> None:
        """One-line pool-schedule occupancy narration per workload
        SHAPE (VERDICT r4 item 10): the production analogue of
        table_report -- catches capacity drift (pool slots / combo
        entries approaching their limits) in the field before the
        overflow fallback ever fires.  Costs one jitted plan pass per
        new (rays, segments) shape, nothing per call."""
        import os
        if os.environ.get("JURASSIC_QUIET"):
            return
        sig = tuple(int(s) for s in los.ds.shape)
        if sig in self._narrated_shapes:
            return
        self._narrated_shapes.add(sig)
        try:
            from .ops.pallas.ega_fused import (POOL_MAXC, POOL_NSLOT,
                                               pool_plan)
            nd_, nc_ = (int(x) for x in jax.jit(
                partial(pool_plan, self.pallas_tbl))(los))
            print(f"# pool schedule: {sig[0]} rays x {sig[1]} segments: "
                  f"max {nd_}/{POOL_NSLOT} distinct table rows per "
                  f"(group, gas), max {nc_}/{POOL_MAXC} cell combos "
                  "per (segment, gas)")
        except Exception as e:       # narration must never break formod
            print(f"# pool schedule: plan unavailable ({e})")

    def _pop_pending_ok(self):
        """The (flag, redo) pair of the most recent optimistic pool
        dispatch -- must be captured right after :meth:`integrate` (the
        next package's dispatch overwrites it)."""
        pend, self._pending_ok = self._pending_ok, None
        return pend

    def integrate(self, los: LosData) -> RtOut:
        """RT integration with the resolved kernel: the fused Pallas
        kernel when selected (jr_fusion_kernel.mv4g.cu analogue), else
        the jnp scan pipeline.

        Public form: an optimistic pool dispatch's capacity flag is
        consumed HERE (one host bool) so direct callers always get
        validated results.  formod's package loop uses
        :meth:`_integrate_deferred` + :meth:`_pop_pending_ok` instead,
        riding the flag on the batched output pull to keep the async
        pipeline intact."""
        out = self._integrate_deferred(los)
        pend = self._pop_pending_ok()
        if pend is not None:
            okf, taintf, redo = pend
            pulled = self._to_host(okf if taintf is None
                                   else jnp.concatenate(
                                       [okf.ravel().astype(jnp.float32),
                                        taintf.ravel()]))
            if taintf is None:
                ok, taint = bool(pulled.all()), None
            else:
                ok = bool(pulled[0] > 0.5)
                taint = pulled[1:].reshape(taintf.shape) > 0.5
            if not ok:
                out = redo()
                self.last_variant = "group"
            elif taint is not None and taint.any():
                out2 = redo()
                tm = jnp.asarray(taint)
                out = RtOut(rad=jnp.where(tm, out2.rad, out.rad),
                            tau=jnp.where(tm, out2.tau, out.tau))
                self.last_variant = "pool+hybrid"
        return out

    def _integrate_deferred(self, los: LosData) -> RtOut:
        if self.kernel_mode == "pallas":
            # EARLY_EXIT ctl flag (0 leaves the env-var debug override
            # in charge, which defaults to off)
            ee = True if self.ctl.early_exit else None
            return self._integrate_pallas(
                lambda var: rt_integrate_pallas(
                    self.pallas_tbl, self.cc_rows, self.sr, self.st,
                    self.nu, los, los.tsurf, self.flags, self.ig_co2,
                    self.ig_h2o, bool(self.ctl.write_bbt),
                    self.pallas_interpret, early_exit=ee, variant=var),
                los)
        return rt_integrate(
            self.dev_tbl, self.sr, self.st, self.nu, self.cc, self.window,
            los, los.tsurf, self.flags, self.ig_co2, self.ig_h2o,
            self.use_fast, bool(self.ctl.write_bbt))

    def trace(self, atm: Atm, obs: Obs, hydro: bool = True) -> LosData:
        """Hydrostatic adjustment + ray tracing (hydrostatic1d_CPU +
        raytrace_rays_CPU, CPUdrivers.c:89-103).  Mutates atm.p like the
        reference."""
        if hydro:
            hydrostatic_atm(self.ctl, atm)
        prof = build_ray_profiles(self.ctl, atm, obs, self.dtype)
        obs_geo = dict(
            obsz=jnp.asarray(obs.obsz, self.dtype),
            obslon=jnp.asarray(obs.obslon, self.dtype),
            obslat=jnp.asarray(obs.obslat, self.dtype),
            vpz=jnp.asarray(obs.vpz, self.dtype),
            vplon=jnp.asarray(obs.vplon, self.dtype),
            vplat=jnp.asarray(obs.vplat, self.dtype))
        return trace_rays(self.ctl, prof, obs_geo, self.dtype)

    def pencil_trace(self, atm: Atm, obs: Obs) -> LosData:
        """Host "pencil" tracing for IP=2/3 (intpol_atm_2d/3d,
        jurassic.c:704-804): straight-ray geometry over the global
        altitude range, then the atmosphere re-sampled at every LOS
        point with the 2D/3D interpolator.

        The reference's own execution drivers reject IP != 1 outright
        (the device interpolator asserts ip == 1, jr_common.h:573,581);
        this path extends formod to the track/Lagrangian modes the
        reference reserves for its retrieval library.  REFRAC must be
        off: ray bending would need in-path (p, T) during tracing.
        """
        ctl = self.ctl
        if ctl.refrac:
            raise NotImplementedError(
                "IP=2/3 requires REFRAC=0 (straight rays); the reference "
                "formod does not support IP != 1 at all (jr_common.h:573)")
        from .interp_atm import intpol_atm_geo, split_profiles
        hydrostatic_atm(ctl, atm)
        # geometry-only tracing: 1D dummy profiles spanning the global
        # altitude range (values are re-sampled afterwards)
        import dataclasses
        first = dataclasses.replace(atm)
        zs = np.sort(np.unique(atm.z))
        n0 = zs.size
        first.time = np.full(n0, atm.time[0])
        first.z = zs
        first.lon = np.zeros(n0)
        first.lat = np.zeros(n0)
        first.p = np.interp(zs, atm.z[np.argsort(atm.z)],
                            atm.p[np.argsort(atm.z)])
        first.t = np.full(n0, 250.0)
        first.q = np.zeros((ctl.ng, n0))
        first.k = np.zeros((ctl.nw, n0))
        geo_ctl = dataclasses.replace(ctl, ip=1)
        prof = build_ray_profiles(geo_ctl, first, obs, self.dtype)
        obs_geo = dict(
            obsz=jnp.asarray(obs.obsz, self.dtype),
            obslon=jnp.asarray(obs.obslon, self.dtype),
            obslat=jnp.asarray(obs.obslat, self.dtype),
            vpz=jnp.asarray(obs.vpz, self.dtype),
            vplon=jnp.asarray(obs.vplon, self.dtype),
            vplat=jnp.asarray(obs.vplat, self.dtype))
        los = trace_rays(geo_ctl, prof, obs_geo, self.dtype)
        # re-sample the atmosphere along the traced paths; padded LOS
        # points (beyond np_) carry garbage coordinates, so clamp them to
        # the first atmosphere point before interpolating and zero their
        # contributions afterwards
        valid = np.asarray(los.valid, bool)
        z = np.where(valid, np.asarray(los.z, np.float64), atm.z[0])
        lon = np.where(valid, np.asarray(los.lon, np.float64), atm.lon[0])
        lat = np.where(valid, np.asarray(los.lat, np.float64), atm.lat[0])
        tp = split_profiles(atm) if ctl.ip == 2 else None
        p, t, q, k = intpol_atm_geo(ctl, atm, z.ravel(), lon.ravel(),
                                    lat.ravel(), tp)
        R, S = z.shape
        # IP=3 returns NaN outside every influence radius
        # (jurassic.c:800-803); for the pencil forward those segments
        # carry no data -> treat as vacuum rather than poisoning the ray
        nodata = ~np.isfinite(t.reshape(R, S))
        keep = valid & ~nodata
        p = np.where(keep, p.reshape(R, S), 1e-3)
        t = np.where(keep, t.reshape(R, S), 250.0)
        v3 = keep[:, :, None]
        q = np.where(v3, np.moveaxis(q.reshape(ctl.ng, R, S), 0, -1), 0.0)
        k = np.where(v3, np.moveaxis(k.reshape(ctl.nw, R, S), 0, -1), 0.0)
        ds = np.where(valid, np.asarray(los.ds, np.float64), 0.0)
        from .constants import KB
        u = 10.0 * q * p[:, :, None] / (KB * t[:, :, None]) * ds[:, :, None]
        # surface temperature from the re-sampled boundary point
        np_ = np.asarray(los.np_)
        tsurf = np.asarray(los.tsurf, np.float64)
        hit = tsurf > -998.0
        last = np.clip(np_ - 1, 0, S - 1)
        tsurf = np.where(hit, t[np.arange(R), last], tsurf)
        d = self.dtype
        return los._replace(
            p=jnp.asarray(p, d), t=jnp.asarray(t, d), q=jnp.asarray(q, d),
            k=jnp.asarray(k, d), u=jnp.asarray(u, d),
            tsurf=jnp.asarray(tsurf, d))

    def formod(self, atm: Atm, obs: Obs) -> Obs:
        """Full forward model (formod, CPUdrivers.c:179-193).

        Fills obs.rad/obs.tau/tangent points in place and returns obs.

        With ``RAYPACK > 0`` the scan is processed in fixed-size ray
        packages: JAX's async dispatch overlaps host-side profile prep
        of package k+1 with the device raytrace + RT integration of
        package k — the stream/package overlap of the reference GPU
        driver (GPUdrivers.cu:176-183, 296-335) without explicit
        streams.  Results transfer back only after every package has
        been enqueued."""
        ctl = self.ctl
        if ctl.checkmode:
            print(f"# formod: checkmode = {ctl.checkmode}, "
                  "no actual computation is performed!")
            return obs
        mask = ~np.isfinite(obs.rad)                  # save_mask
        pack = self._resolve_raypack(obs.nr)
        m = max(self.ray_multiple, 1)
        with self._exec_ctx():
            if ctl.ip == 1 and 0 < pack < obs.nr:
                self._formod_packaged(atm, obs,
                                      self.package_size(obs.nr, pack))
            else:
                r = obs.nr
                obs_run = pad_obs(obs, -(-r // m) * m)
                los = (self.trace(atm, obs_run) if ctl.ip == 1
                       else self.pencil_trace(atm, obs_run))
                out = self._integrate_deferred(los)
                (obs.rad, obs.tau, obs.tpz, obs.tplon,
                 obs.tplat) = self._outputs_to_host(
                     (out.rad, out.tau, los.tpz, los.tplon, los.tplat), r,
                     pend=self._pop_pending_ok())
        formod_fov(ctl, obs)
        obs.rad[mask] = np.nan                        # apply_mask
        return obs

    def _to_host(self, x) -> np.ndarray:
        """Device array -> host float64 (overridden by the sharded model
        to gather fully-distributed arrays across processes)."""
        return np.array(x, np.float64)

    def _outputs_to_host(self, arrays, r, pend=None):
        """All per-call outputs in ONE device->host transfer: a single
        round trip matters on remote/tunneled devices where each pull
        pays fixed latency (the analogue of the reference's one D2H obs
        copy per package, GPUdrivers.cu:244).

        ``pend``: the (capacity flag, hybrid taint | None, redo fn) of
        an optimistic pool dispatch.  Both flags join the same
        transfer; on the (never physically observed) overflow the
        batch is re-integrated through the redo path, and tainted
        hybrid lanes are spliced from the exact table kernel -- the
        failure mode of a missed check is silent garbage, so the
        flags are consumed EVERY call."""
        return self._outputs_to_host_many([(arrays, r, pend)])[0]

    def _outputs_to_host_many(self, items):
        """Batched form of :meth:`_outputs_to_host` over a package
        list ``[(arrays, r, pend), ...]``: EVERY package's outputs and
        capacity/taint flags join a single ``jax.device_get`` -- on a
        tunneled device each pull pays a fixed ~tens-of-ms round trip,
        so one pull for the whole package loop (vs one per package)
        is the D2H analogue of the reference's single obs copy per
        stream batch (GPUdrivers.cu:244).  Overridden by the sharded
        model (allgather path)."""
        flats, metas = [], []
        for arrays, r, pend in items:
            arrs = tuple(arrays)
            extra = ()
            if pend is not None:
                okf, taintf, _redo = pend
                extra = (okf,) + (() if taintf is None else (taintf,))
            flats.append(arrs + extra)
            metas.append((len(arrs), r, pend))
        pulled_all = jax.device_get(flats)
        return [self._finish_pulled(p, n, r, pend)
                for p, (n, r, pend) in zip(pulled_all, metas)]

    def _finish_pulled(self, pulled, n, r, pend):
        # np.array (not asarray): device_get may hand back zero-copy
        # read-only buffers, and formod mutates the outputs in place
        if pend is not None:
            okf, taintf, redo = pend
            ok = bool(np.asarray(pulled[n]).all())
            taint = (None if taintf is None
                     else np.asarray(pulled[n + 1]) > 0.5)
            if ok and (taint is None or not taint.any()):
                return tuple(np.array(a[:r], np.float64)
                             for a in pulled[:n])
            out2 = redo()     # overflow or tainted lanes: exact re-run
            rad2, tau2 = (np.array(x, np.float64) for x in
                          jax.device_get((out2.rad, out2.tau)))
            host = [np.array(a, np.float64) for a in pulled[:n]]
            if ok and taint is not None:
                host[0][taint] = rad2[taint]
                host[1][taint] = tau2[taint]
                self.last_variant = "pool+hybrid"
                print(f"# turbo hybrid: {int(taint.sum())} of "
                      f"{taint.size} lanes re-evaluated through the "
                      "table kernel")
            else:
                host[0], host[1] = rad2, tau2
                self.last_variant = "group"
            return tuple(a[:r] for a in host)
        return tuple(np.array(a[:r], np.float64) for a in pulled[:n])

    def _formod_packaged(self, atm: Atm, obs: Obs, pack: int) -> None:
        """Pipelined package loop: enqueue trace+integrate per package
        (device, async), only then pull results to host.  The last
        package is padded by repeating the final ray so every package
        shares one compiled shape."""
        import dataclasses as dc
        hydrostatic_atm(self.ctl, atm)               # once, up front
        R = obs.nr
        handles = []
        for start in range(0, R, pack):
            idx = np.minimum(np.arange(start, start + pack), R - 1)
            obs_k = Obs(**{
                f.name: np.ascontiguousarray(getattr(obs, f.name)[idx])
                for f in dc.fields(Obs)})
            los_k = self.trace(atm, obs_k, hydro=False)  # prep + enqueue
            out_k = self._integrate_deferred(los_k)  # enqueue
            handles.append((min(pack, R - start), los_k, out_k,
                            self._pop_pending_ok()))
        rad, tau, tpz, tplon, tplat = [], [], [], [], []
        # ONE device_get for every package's outputs + flags
        results = self._outputs_to_host_many(
            [((out_k.rad, out_k.tau, los_k.tpz, los_k.tplon,
               los_k.tplat), n, pend)
             for n, los_k, out_k, pend in handles])
        for r5 in results:
            for dst, a in zip((rad, tau, tpz, tplon, tplat), r5):
                dst.append(a)
        obs.rad = np.concatenate(rad)
        obs.tau = np.concatenate(tau)
        obs.tpz = np.concatenate(tpz)
        obs.tplon = np.concatenate(tplon)
        obs.tplat = np.concatenate(tplat)


def formod(ctl: Ctl, atm: Atm, obs: Obs, tables: EgaTables | None = None,
           directory: str = ".", dtype=None) -> Obs:
    """One-shot forward model (formod, CPUdrivers.c:179)."""
    if ctl.checkmode:
        print(f"# formod: checkmode = {ctl.checkmode}, "
              "no actual computation is performed!")
        return obs
    return ForwardModel(ctl, tables, directory, dtype).formod(atm, obs)
