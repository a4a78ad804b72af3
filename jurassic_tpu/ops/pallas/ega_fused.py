"""Fused EGA radiative-transfer Pallas TPU kernel (ray-group form).

The TPU-native equivalent of the reference's fused GPU kernel
(jr_fusion_kernel.mv4g.cu:1-25, launched block-per-ray /
thread-per-channel from GPUdrivers.cu:232): one kernel fuses the
continuum (continua_core, jr_common.h:397-409), the EGA transmittance
update (ega_eps + apply_ega_core, jr_common.h:238-290), the source
function (src_planck_core, jr_common.h:221-224) and the radiative
transfer integration (new_obs_core, jr_common.h:294-300) over the whole
ray, with the per-gas ``tau_path`` carried in VMEM exactly like the
reference keeps it in the register file.

TPU-first structure (SURVEY.md section 7 step 6):

* grid over ray GROUPS of ``RG`` (<= 8) rays: channels ride the
  128-lane minor axis of every vector and the RG rays ride the vreg
  SUBLANE axis, so each (8, 128) f32 vreg is fully occupied -- the TPU
  analogue of the reference's block-per-ray / thread-per-channel
  occupancy.  (The round-3 kernel processed one ray per grid step on
  (128,)-lane vectors, idling 7/8 of every vreg at nd <= 128.)
* rays are sorted by tangent height before grouping, so the rays of a
  group traverse nearly identical (p, T) table cells in lockstep;
* the sequential LOS recursion is an in-kernel ``fori_loop`` (the
  reference's "non-parallelisable" ip loop, CPUdrivers.c:83);
* the four (pressure, temperature) corner rows per gas are fetched from
  HBM as dense [2, K, 1, D] slabs by double-buffered async DMA with
  one-segment lookahead; the schedule is GROUP-level: a pair is
  (re)fetched only on segments where ANY ray of the group changes cell,
  and within such a segment a ray whose cell equals its left
  neighbour's copies the neighbour's freshly landed slab VMEM->VMEM
  instead of re-reading HBM (the cross-ray reuse the reference gets
  from the GPU read-only cache, __ldg, jr_common.h:307-313);
* eps-row searches and lookups are branch-free masked reductions over
  the VMEM-resident rows (monotone rows make extraction a masked
  max/min), replacing the reference's per-thread binary searches
  (locate_tbl_id, jr_common.h:117-125) -- no scattered gathers at all;
* each row is augmented with per-lane log2(u0), axis values and a
  validity flag, so interpolation weights and the reference's no-table
  guards (jr_common.h:239-246) stay faithful per channel even though
  the fetch indices are shared.

Requirements: channel-uniform table *axes* per gas (all channels that
have a table share the p/t grids -- true for tables generated on a
common climatology grid, and validated by :func:`build_pallas_tables`,
which returns None to signal fallback to the jnp path otherwise).
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import NA, P0, TAU_OPAQUE
from ...tables import LOG2_RATIO_U, FastTables

LANE = 128          # channel lane width
BIG = 1.0e30        # eps-row padding sentinel (self-describing counts)
BIG_CHK = 1.0e29    # nk = count(row < BIG_CHK)
N_AUG = 5           # appended rows: log2_u0, t value, p value, valid,
                    # nk2 = clip(count - 2, 0) (precomputed row count)
N_SEG = 8           # packed per-segment scalars (see _pack_segments)
N_CC = 12           # packed continuum coefficient rows
RG_MAX = 8          # rays per group = f32 vreg sublane count
NBUF = 2            # slab double buffering
SLAB_BUDGET = 8 << 20   # VMEM budget for the corner slabs [bytes]
POOL_NSLOT = 128    # slot-pool capacity: distinct table ROWS per
                    # (group, gas) over the whole LOS (a corner pair
                    # ipt uses rows ipt and ipt+1; physical limb scans
                    # measure ~67 distinct rows, max 115 at RG=8).
                    # Exactly 7 bits so slot ids fit the packed combo
                    # encoding.
POOL_MAXC = 4       # distinct cell combos per (segment, gas) the pool
                    # kernel evaluates (measured max 3 at RG=8)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class PallasTables(NamedTuple):
    """Device-side tables for the fused kernel.

    ``eps_aug``: [G, P*T, K_aug, Dp] float32, rows 0..K-1 the log-uniform
    eps curve padded with BIG beyond each (cell,channel)'s count, row K
    the per-lane log2(u0), row K+1 the temperature value, row K+2 the
    pressure value, row K+3 the validity flag (nu>=2 & nt>=2 & resample
    ok, the guard set of jr_common.h:241-246).

    With ``n_chan > 1`` the lane axis holds that many channel shards
    back to back, each independently lane-padded to a LANE multiple, so
    a ``PartitionSpec(..., "chan")`` sharding hands every mesh shard an
    exact, lane-aligned [.., Dp_shard] block (``d_true`` is then the
    per-shard true channel count).  Such tables must run through
    the shard-mapped driver (parallel.sharded), never rt_fused_pallas
    directly.
    """

    eps_aug: jax.Array    # [G, PT, K_aug, Dp] f32 (lives in HBM)
    sr: jax.Array         # [S, Dp] f32 source radiance
    chan_mask: jax.Array  # [G, Dp] f32 (np_ >= 2 per channel)
    # channel-uniform axes for the prologue's corner bracketing
    p_ax: jax.Array       # [G, P] f64
    t_ax: jax.Array       # [G, P, T] f64
    np_u: jax.Array       # [G] int32
    nt_u: jax.Array       # [G, P] int32
    k_rows: int           # K (eps rows per cell) -- static
    d_true: int           # unpadded channel count per shard -- static
    n_chan: int = 1       # channel shards packed on the lane axis
    mode: str = "table"   # "table" (log-uniform rows) | "turbo"
    #                       (Chebyshev-compressed rows, turbo_fit.py)
    deg_f: int = 0        # turbo: forward fit degree (static)
    deg_i: int = 0        # turbo: inverse fit degree (static)
    n_bad: int = 0        # turbo: rows whose per-row fit failed the
    #                       tolerance (ROW_VALID = 2.0 marks; > 0
    #                       switches the pool kernel to hybrid-taint
    #                       output, turbo_fit.build_turbo_tables)


jax.tree_util.register_pytree_node(
    PallasTables,
    lambda pt: ((pt.eps_aug, pt.sr, pt.chan_mask, pt.p_ax, pt.t_ax,
                 pt.np_u, pt.nt_u),
                (pt.k_rows, pt.d_true, pt.n_chan, pt.mode,
                 pt.deg_f, pt.deg_i, pt.n_bad)),
    lambda aux, ch: PallasTables(*ch, *aux))


def shard_lanes(x: np.ndarray, n_chan: int) -> np.ndarray:
    """Repack the true-channel minor axis into n_chan back-to-back
    lane-padded shards: [..., D] -> [..., n_chan * round_up(D/n_chan)].
    D must divide n_chan (channels are physics config, never padded)."""
    D = x.shape[-1]
    if D % n_chan != 0:
        raise ValueError(f"D={D} not divisible by n_chan={n_chan}")
    Ds = D // n_chan
    Dp = _round_up(max(Ds, 1), LANE)
    out = np.zeros(x.shape[:-1] + (n_chan * Dp,), x.dtype)
    for j in range(n_chan):
        out[..., j * Dp:j * Dp + Ds] = x[..., j * Ds:(j + 1) * Ds]
    return out


def _pad_small_axes(ft: FastTables) -> FastTables:
    """Corner-pair DMAs read rows [ipt, ipt+2) and the (ipr+1) pressure
    level: pad tiny (stub) tables to P, T >= 2 with invalid rows."""
    G, P, T, K, D = ft.eps.shape
    if P >= 2 and T >= 2:
        return ft
    P2, T2 = max(P, 2), max(T, 2)
    pad5 = ((0, 0), (0, P2 - P), (0, T2 - T), (0, 0), (0, 0))
    return ft._replace(
        eps=np.pad(ft.eps, pad5),
        nu=np.pad(ft.nu, pad5[:3] + pad5[4:]),
        log2_u0=np.pad(ft.log2_u0, pad5[:3] + pad5[4:]),
        valid=np.pad(ft.valid, pad5[:3] + pad5[4:]),
        t=np.pad(ft.t, pad5[:3] + pad5[4:]),
        nt=np.pad(ft.nt, (pad5[0], pad5[1], pad5[4])),
        p=np.pad(ft.p, (pad5[0], pad5[1], pad5[4])))


def _uniform_axes(ft: FastTables):
    """Channel-uniform (p, t) axes per gas, or None when ragged across
    channels (over channels that have a table)."""
    G, P, T, K, D = ft.eps.shape
    p_ax = np.zeros((G, P))
    t_ax = np.zeros((G, P, T))
    np_u = np.zeros(G, np.int32)
    nt_u = np.zeros((G, P), np.int32)
    for g in range(G):
        chans = np.nonzero(ft.np_[g] >= 2)[0]
        if chans.size == 0:
            continue
        d0 = chans[0]
        np_u[g] = ft.np_[g, d0]
        nt_u[g] = ft.nt[g, :, d0]
        p_ax[g] = ft.p[g, :, d0]
        t_ax[g] = ft.t[g, :, :, d0]
        for d in chans[1:]:
            if (ft.np_[g, d] != np_u[g]
                    or not np.array_equal(ft.nt[g, :, d], nt_u[g])
                    or not np.allclose(ft.p[g, :, d], p_ax[g])
                    or not np.allclose(ft.t[g, :, :, d], t_ax[g])):
                return None  # ragged across channels: jnp path handles it
    return p_ax, t_ax, np_u, nt_u


def build_pallas_tables(ft: FastTables,
                        n_chan: int = 1) -> PallasTables | None:
    """Pack FastTables for the kernel; None if axes are not
    channel-uniform (per gas, over channels that have a table)."""
    G, P, T, K, D = ft.eps.shape
    if n_chan > 1 and D % n_chan != 0:
        return None
    ft = _pad_small_axes(ft)
    G, P, T, K, D = ft.eps.shape
    Ds = max(D, 1) // n_chan if n_chan > 1 else max(D, 1)
    Dp = n_chan * _round_up(Ds, LANE)
    K_aug = _round_up(K + N_AUG, 8)

    ax = _uniform_axes(ft)
    if ax is None:
        return None
    p_ax, t_ax, np_u, nt_u = ax

    eps_aug = np.zeros((G, P * T, K_aug, Dp), np.float32)

    def place(dst, src):
        """Write true-channel data into the (per-shard lane-padded)
        minor axis of dst (identity layout at n_chan = 1)."""
        Dps = Dp // n_chan
        for j in range(n_chan):
            dst[..., j * Dps:j * Dps + Ds] = src[..., j * Ds:(j + 1) * Ds]

    eps = ft.eps.reshape(G, P * T, K, D)
    nu = ft.nu.reshape(G, P * T, D)
    l2u0 = ft.log2_u0.reshape(G, P * T, D)
    nt3 = np.repeat(ft.nt, T, axis=1)                       # [G, P*T, D]
    valid = (ft.valid.reshape(G, P * T, D) & (nu >= 2) & (nt3 >= 2))
    # pad beyond each cell's count with BIG so nk = count(row < BIG_CHK)
    kk = np.arange(K)[None, None, :, None]
    pad = kk >= nu[:, :, None, :]
    place(eps_aug[:, :, :K, :], np.where(pad, BIG, eps))
    place(eps_aug[:, :, K, :], l2u0)
    place(eps_aug[:, :, K + 1, :], ft.t.reshape(G, P * T, D))
    place(eps_aug[:, :, K + 2, :], np.repeat(
        ft.p[:, :, None, :], T, axis=2).reshape(G, P * T, D))
    place(eps_aug[:, :, K + 3, :], valid.astype(np.float32))
    place(eps_aug[:, :, K + 4, :],
          np.maximum(nu - 2, 0).astype(np.float32))

    chan_mask = np.zeros((G, Dp), np.float32)
    place(chan_mask, (ft.np_ >= 2).astype(np.float32))
    S = ft.sr.shape[0]
    sr = np.zeros((S, Dp), np.float32)
    place(sr, ft.sr)

    return PallasTables(
        eps_aug=jnp.asarray(eps_aug), sr=jnp.asarray(sr),
        chan_mask=jnp.asarray(chan_mask),
        p_ax=jnp.asarray(p_ax), t_ax=jnp.asarray(t_ax),
        np_u=jnp.asarray(np_u), nt_u=jnp.asarray(nt_u),
        k_rows=K, d_true=Ds, n_chan=n_chan)


def pack_continua(cc, window: np.ndarray, nd: int, nw: int = 0,
                  n_chan: int = 1) -> jax.Array:
    """Continuum coefficients as [N_CC + W, Dp] f32 rows with the band
    masks pre-applied (continua_ctm*, jr_common.h:316-390) followed by
    the window one-hot rows for the gray-extinction channel map.

    ``nw`` is the declared window count (ctl.nw): the kernel statically
    reads one row per declared window, so the one-hot block must span
    all of them even when some windows are not referenced by any
    channel (unreferenced rows are zero and contribute nothing).
    ``n_chan`` packs the lane axis into that many per-shard lane-padded
    channel shards (see PallasTables)."""
    m = np.zeros((N_CC, max(nd, 1)))
    z = lambda a: np.asarray(a, np.float64)
    m[0, :nd] = np.where(cc.co2_mask, z(cc.co2_cw296), 0)
    m[1, :nd] = np.where(cc.co2_mask, z(cc.co2_cw260), 0)
    m[2, :nd] = np.where(cc.co2_mask, z(cc.co2_cw230), 0)
    m[3, :nd] = np.where(cc.h2o_mask, z(cc.h2o_cw296), 0)
    m[4, :nd] = np.where(cc.h2o_mask, z(cc.h2o_cw260), 0)
    m[5, :nd] = np.where(cc.h2o_mask, z(cc.h2o_ctwfrn), 0)
    m[6, :nd] = np.where(cc.h2o_mask, z(cc.h2o_sfac), 0)
    m[7, :nd] = np.where(cc.h2o_mask, z(cc.h2o_nu), 0)
    m[8, :nd] = np.where(cc.n2_mask, z(cc.n2_b), 0)
    m[9, :nd] = np.where(cc.n2_mask, z(cc.n2_beta), 0)
    m[10, :nd] = np.where(cc.o2_mask, z(cc.o2_b), 0)
    m[11, :nd] = np.where(cc.o2_mask, z(cc.o2_beta), 0)
    W = max(int(np.max(window)) + 1 if len(window) else 1, nw, 1)
    oh = np.zeros((W, max(nd, 1)))
    oh[np.asarray(window, int), np.arange(nd)] = 1.0
    rows = shard_lanes(np.concatenate([m, oh], 0), n_chan)
    return jnp.asarray(rows, jnp.float32)


# ---------------------------------------------------------------------------
# Prologue: per-(ray, segment, gas) corner bracketing (channel-independent)

def _count_leq(values, counts, x):
    """#\\{values <= x within count\\} - 1, clipped to [0, count-2]
    (locate_id, jr_common.h:107-115) -- values on the last axis."""
    iota = jax.lax.broadcasted_iota(jnp.int32, values.shape,
                                    values.ndim - 1)
    below = (values <= x[..., None]) & (iota < counts[..., None])
    idx = jnp.sum(below.astype(jnp.int32), axis=-1) - 1
    return jnp.clip(idx, 0, jnp.maximum(counts - 2, 0))


def _corner_indices(p_ax, t_ax, np_u, nt_u, p_seg, t_seg):
    """Flat [P*T] corner-pair start indices ipt00/ipt10 per
    (ray, segment, gas).  p_seg/t_seg: [R, S].

    The bracketing-row extraction is a ONE-HOT CONTRACTION over the
    tiny pressure axis (an einsum the MXU eats), not a gather: XLA
    lowers a 39M-element ``take_along_axis`` on TPU to per-element
    dynamic slicing that costs more than the Pallas kernel it feeds.
    Exactly one one-hot term is nonzero per output, so the contraction
    is bit-exact row extraction."""
    G, P, T = t_ax.shape
    pb = p_seg[:, :, None]                                 # [R, S, 1]
    tb = t_seg[:, :, None]
    ipr = _count_leq(p_ax[None, None], np_u[None, None],
                     jnp.broadcast_to(pb, pb.shape[:2] + (G,)))  # [R,S,G]
    dt = t_ax.dtype
    oh_lo = (ipr[..., None] == jnp.arange(P)).astype(dt)   # [R,S,G,P]
    oh_hi = ((ipr + 1)[..., None] == jnp.arange(P)).astype(dt)
    t_lo = jnp.einsum("rsgp,gpt->rsgt", oh_lo, t_ax)       # [R,S,G,T]
    t_hi = jnp.einsum("rsgp,gpt->rsgt", oh_hi, t_ax)
    ntf = nt_u.astype(dt)
    nt_lo = jnp.einsum("rsgp,gp->rsg", oh_lo, ntf).astype(jnp.int32)
    nt_hi = jnp.einsum("rsgp,gp->rsg", oh_hi, ntf).astype(jnp.int32)
    tg = jnp.broadcast_to(tb, tb.shape[:2] + (G,))
    it0 = _count_leq(t_lo, nt_lo, tg)
    it1 = _count_leq(t_hi, nt_hi, tg)
    ipt00 = ipr * T + it0
    ipt10 = (ipr + 1) * T + it1
    return jnp.stack([ipt00, ipt10], axis=-1).astype(jnp.int32)


def _freeze_beyond_np(idx, np_):
    """Clamp each ray's corner-index stream beyond its active LOS bound
    to its last active value, so inactive segments never contribute
    cell changes to the group fetch schedule.  idx: [R, S, G, 2].

    Only the [R, G, 2] end values are gathered (tiny); the fill is a
    broadcast select, not a [R, S, G, 2] gather."""
    R, S = idx.shape[:2]
    last_s = (jnp.clip(np_, 1, S) - 1).astype(jnp.int32)       # [R]
    last = jnp.take_along_axis(
        idx, last_s[:, None, None, None], axis=1)              # [R,1,G,2]
    active = jnp.arange(S)[None, :, None, None] <= last_s[:, None,
                                                          None, None]
    return jnp.where(active, idx, last)


def _group_schedule(idx, rg: int):
    """Fold the corner-pair DMA schedule into a packed index stream.

    Consecutive LOS segments mostly bracket the SAME (p, T) cell (a
    40x30 grid vs ~400 segments), and the rays of a tangent-sorted
    group mostly bracket the same cell as each other, so the schedule
    is GROUP-level: per (group, segment, gas, pair)

      chg_grp -- 1 iff ANY ray of the group changes cell at this
                 segment (segment 0 always fetches);
      buf     -- which of two VMEM slab buffers this segment reads:
                 (number of group changes so far - 1) mod 2, shared by
                 the whole group so compute reads stay single-indexed;

    and per ray within a changing segment

      fetch   -- 1 for the first ray of each run of equal cells: issue
                 the HBM DMA;
      copyl   -- 1 for the remaining rays of a run: copy the left
                 neighbour's freshly landed slab VMEM->VMEM (the
                 cross-ray reuse; zero HBM traffic).

    Packed per (s, g, pair, ray) as ``ipt * 8 + buf * 4 + copyl * 2 +
    fetch`` (ipt < P*T <= 1200, far inside int32).

    idx: [R, S, G, 2] int32 (R a multiple of rg, streams already frozen
    beyond each ray's np).  Returns [R/rg, S, G, 2, rg] int32."""
    R, S, G, _ = idx.shape
    gi = idx.reshape(R // rg, rg, S, G, 2)
    chg_own = jnp.concatenate(
        [jnp.ones_like(gi[:, :, :1]),
         (gi[:, :, 1:] != gi[:, :, :-1]).astype(jnp.int32)], axis=2)
    chg_grp = jnp.max(chg_own, axis=1, keepdims=True)   # [NG,1,S,G,2]
    buf = (jnp.cumsum(chg_grp, axis=2) - 1) % 2
    left = jnp.concatenate(
        [jnp.full_like(gi[:, :1], -1), gi[:, :-1]], axis=1)
    first_or_new = ((jnp.arange(rg)[None, :, None, None, None] == 0)
                    | (gi != left)).astype(jnp.int32)
    fetch = chg_grp * first_or_new
    copyl = chg_grp * (1 - first_or_new)
    packed = gi * 8 + buf * 4 + copyl * 2 + fetch
    return jnp.moveaxis(packed, 1, -1)                  # [NG, S, G, 2, rg]


def _pool_schedule(idx, rg: int, nslot: int, maxc: int, np_=None):
    """Slot-pool schedule: each DISTINCT table ROW of a ray group's
    whole LOS gets one pool slot, fetched exactly once per group.

    A limb LOS is U-shaped (descends to the tangent point, then
    ascends through the same (p, T) cells), so the consecutive-change
    schedule of :func:`_group_schedule` re-fetches every cell at least
    twice per ray, and its per-ray sublane-strided slab DMAs plus the
    neighbour-copy chains dominate the kernel's runtime at small nd.
    On physical atmospheres a tangent-sorted group traverses only ~70
    distinct rows per gas over the WHOLE LOS, and at any one segment
    its rays bracket at most 3-4 distinct (pair0, pair1) cell combos
    -- so the kernel holds every row in a VMEM pool and evaluates each
    segment per DISTINCT combo with pool rows broadcast across the ray
    sublanes.

    ROW (not pair) slots, round 5: a corner pair ``ipt`` reads rows
    ``ipt`` and ``ipt + 1``; since integers are dense, row ``v + 1``
    always sits in the slot right after row ``v``, so a combo still
    needs only the two PAIR slot ids (s0, s1) and each corner c reads
    slot ``(c < 2 ? s0 : s1) + (c & 1)``.  Row slots halve the pool
    VMEM vs pair slots (shared rows stored once) and let the driver
    materialise the whole pool with ONE XLA row gather instead of
    ~500 per-pair kernel DMAs per group (whose issue overhead was
    ~10% of round-4 kernel time).

    Returns

      rows  [NG, G, nslot] int32 -- distinct table rows in ascending
            order (-1 = unused slot); slot j of gas g holds row
            ``rows[ng, g, j]`` of eps_aug's [PT] axis;
      combo [NG, S, G, maxc] int32 -- packed ``s0 << 15 | s1 << 8 |
            raymask`` per distinct combo (0 = unused entry), where
            s0/s1 are the pair's base ROW slots and raymask bit r
            selects group ray r (rg <= 8, nslot <= 128 keep the
            encoding inside 22 bits);
      ok    bool -- False iff any row or combo capacity overflowed
            (caller must then use the "group" variant; the packed
            streams are garbage in that case).

    idx: [R, S, G, 2] int32, R a multiple of rg, frozen beyond np.
    ``np_`` (optional, [R]): active LOS point counts -- rays beyond
    their np are EXCLUDED from combo detection (their frozen cells
    otherwise accumulate up to rg distinct stale combos late in the
    scan and overflow MAXC for nothing; the kernel masks their
    physics with valid_s regardless, so they need no combo at all).
    """
    R, S, G, _ = idx.shape
    NG = R // rg
    vals = (idx.reshape(NG, rg, S, G, 2)
            .transpose(0, 3, 1, 2, 4)
            .reshape(NG, G, rg * S * 2))

    # --- distinct-row pool, scatter-free ------------------------------
    # (jnp.unique's inverse path costs ~0.3 s/call on a v5e at the
    # flagship shape -- 10x the kernel it schedules; everything here is
    # elementwise + one sort + fused masked reductions instead.
    # The row set is derived in TWO stages: distinct PAIR starts from
    # the big stream first, then rows {p, p+1} from the tiny compacted
    # pair array -- sorting the doubled row-candidate stream directly
    # costs 2x on the dominant [.., V]-wide sort for nothing.)
    BIGV = jnp.int32(1 << 30)
    npair = (nslot // 4 * 3) if nslot >= 8 else nslot   # pair slots
    sv = jnp.sort(vals, axis=-1)                       # [NG, G, V]
    newf = jnp.concatenate(
        [jnp.ones_like(sv[..., :1], jnp.bool_),
         sv[..., 1:] != sv[..., :-1]], axis=-1)
    ok = jnp.all(jnp.sum(newf, axis=-1) <= npair)
    pos = jnp.cumsum(newf, axis=-1) - 1                # slot of sv value
    # pairs[j] = the first-occurrence value at slot j (masked max over
    # the sorted stream; XLA fuses the [.., V, npair] mask into the
    # reduction, nothing is materialised)
    sel = newf & (pos < npair)
    oh = sel[..., None] & (pos[..., None] == jnp.arange(npair))
    pairs = jnp.max(
        jnp.where(oh, sv[..., None], -1), axis=-2)     # [NG, G, npair]
    # rows = distinct of {p, p+1} over the COMPACTED pairs (tiny)
    pv = jnp.where(pairs >= 0, pairs, BIGV)
    cand2 = jnp.concatenate([pv, pv + 1], axis=-1)     # [NG, G, 2*npair]
    sv2 = jnp.sort(cand2, axis=-1)
    newf2 = jnp.concatenate(
        [jnp.ones_like(sv2[..., :1], jnp.bool_),
         sv2[..., 1:] != sv2[..., :-1]], axis=-1)
    live2 = sv2 < BIGV
    ok = ok & jnp.all(jnp.sum(newf2 & live2, axis=-1) <= nslot)
    pos2 = jnp.cumsum((newf2 & live2).astype(jnp.int32), axis=-1) - 1
    sel2 = newf2 & live2 & (pos2 < nslot)
    oh2 = sel2[..., None] & (pos2[..., None] == jnp.arange(nslot))
    rows = jnp.max(
        jnp.where(oh2, sv2[..., None], -1), axis=-2)   # [NG, G, nslot]
    # inverse for the PAIR base rows: slot(v) = #distinct rows <= v - 1
    le = (rows[:, :, None, :] >= 0) \
        & (rows[:, :, None, :] <= vals[..., None])
    inv = jnp.sum(le, axis=-1, dtype=jnp.int32) - 1    # [NG, G, V]
    inv = jnp.clip(inv, 0, nslot - 2)

    # --- distinct (pair0, pair1) combos per (group, segment, gas) ----
    # pairwise first-occurrence logic on the rg axis: no sorts at all
    slots = inv.reshape(NG, G, rg, S, 2)
    key = (slots[..., 0] * nslot + slots[..., 1]) \
        .transpose(0, 3, 1, 2)                         # [NG, S, G, rg]
    iota_r = jnp.arange(rg, dtype=jnp.int32)
    if np_ is None:
        act = jnp.ones(key.shape, jnp.bool_)
    else:
        act = (jnp.arange(S)[None, :, None]
               < np_.reshape(NG, rg)[:, None, :]
               )[:, :, None, :]                        # [NG, S, 1, rg]
        act = jnp.broadcast_to(act, key.shape)
        key = jnp.where(act, key, jnp.int32(1 << 29))
    eq = key[..., :, None] == key[..., None, :]        # [.., rg, rg]
    firstpos = jnp.min(jnp.where(eq, iota_r, rg), axis=-1)  # [.., rg]
    first = (firstpos == iota_r) & act
    ncomb = jnp.sum(first, axis=-1)
    ok = ok & jnp.all(ncomb <= maxc)
    # combo id per ray = #distinct keys first-seen before this ray's
    cid = jnp.sum((firstpos[..., None, :] < firstpos[..., :, None])
                  & first[..., None, :], axis=-1)      # [.., rg]
    onehot = (cid[..., None] == jnp.arange(maxc)) \
        & act[..., None]                               # [.., rg, maxc]
    ck = jnp.max(jnp.where(onehot & first[..., None], key[..., None],
                           -1), axis=-2)               # [.., maxc]
    mask = jnp.sum(jnp.where(onehot, 1 << iota_r[..., None], 0),
                   axis=-2)
    s0 = jnp.maximum(ck, 0) // nslot
    s1 = jnp.maximum(ck, 0) % nslot
    combo = jnp.where(ck >= 0, (s0 << 15) | (s1 << 8) | mask, 0)
    return (rows.astype(jnp.int32), combo.astype(jnp.int32), ok)


def _sorted_frozen_idx(pt: "PallasTables", los, rg: int):
    """The shared schedule prologue: tangent-sort the rays, pad the ray
    axis to the group multiple with the last ray, bracket every
    (ray, segment, gas) corner pair and freeze the streams beyond each
    ray's active LOS bound.  Returns (sorted/padded los, idx [Rp, S, G,
    2], sort order [R])."""
    R, S = los.ds.shape
    order = jnp.argsort(los.tpz)
    Rp = _round_up(R, rg)
    perm = jnp.concatenate(
        [order, jnp.broadcast_to(order[-1:], (Rp - R,))]) if Rp > R \
        else order
    los = jax.tree_util.tree_map(lambda a: a[perm], los)
    idx = _freeze_beyond_np(
        _corner_indices(jnp.asarray(pt.p_ax, los.p.dtype),
                        jnp.asarray(pt.t_ax, los.p.dtype),
                        jnp.asarray(pt.np_u), jnp.asarray(pt.nt_u),
                        los.p, los.t), los.np_)
    return los, idx, order


def pool_plan(pt: "PallasTables", los, rg: int | None = None):
    """(max distinct table ROWS per (group, gas), max cell combos per
    (segment, gas)) for this workload -- jit-friendly traced scalars.

    Diagnostic/test helper: the production capacity decision is NOT
    made here -- the driver dispatches the pool kernel optimistically
    and consumes the in-graph ok flag of :func:`_pool_schedule` at the
    output pull (ForwardModel._resolve_variant / _outputs_to_host).
    This plan exists for tests and for schedule observability (the
    workload-sizing report style of GPUdrivers.cu:296-321)."""
    G, PT, K_aug, Dp = pt.eps_aug.shape
    R, S = los.ds.shape
    rg = rg or resolve_rg(G, K_aug, Dp, pool=True)
    los, idx, _ = _sorted_frozen_idx(pt, los, rg)
    Rp = idx.shape[0]
    NG = Rp // rg
    vals = (idx.reshape(NG, rg, S, G, 2).transpose(0, 3, 1, 2, 4)
            .reshape(NG, G, rg * S * 2))
    cand = jnp.concatenate([vals, vals + 1], axis=-1)
    sv = jnp.sort(cand, axis=-1)
    ndist = jnp.max(jnp.sum(jnp.concatenate(
        [jnp.ones_like(sv[..., :1]),
         (sv[..., 1:] != sv[..., :-1]).astype(sv.dtype)], -1), axis=-1))
    gi = idx.reshape(NG, rg, S, G, 2)
    key = (gi[..., 0] * 8192 + gi[..., 1])             # [NG, rg, S, G]
    # inactive (beyond-np) rays carry frozen stale cells and get no
    # combo in the schedule -- exclude them here the same way
    act = (jnp.arange(S)[None, None, :]
           < los.np_.astype(jnp.int32).reshape(NG, rg)[:, :, None]
           )[..., None]
    key = jnp.where(act, key, jnp.int32(1 << 29))
    ksort = jnp.sort(key, axis=1)
    newk = jnp.concatenate(
        [ksort[:, :1] < (1 << 29),
         (ksort[:, 1:] != ksort[:, :-1]) & (ksort[:, 1:] < (1 << 29))],
        axis=1)
    ncomb = jnp.max(jnp.sum(newk, axis=1))
    return ndist, ncomb


def dma_schedule_stats(pt: "PallasTables", los, variant: str = "group"):
    """(RG, HBM pair fetches, VMEM neighbour copies) for the schedule
    :func:`rt_fused_pallas` will run on this workload under the given
    variant -- the roofline bytes-moved model.  Replicates the driver's
    tangent sort, group padding and beyond-np freezing exactly.

    Groups are processed in jitted chunks: the schedule is
    group-independent, and an eager (unfused) _pool_schedule on a
    10k-ray batch materialises a >10 GB compaction mask."""
    G, PT, K_aug, Dp = pt.eps_aug.shape
    RG = resolve_rg(G, K_aug, Dp, pool=(variant == "pool"))
    _, idx, _ = _sorted_frozen_idx(pt, los, RG)
    idx = np.asarray(idx)
    Rp = idx.shape[0]
    CH = 128 * RG                         # rays per stats chunk
    if variant == "pool":
        nslot, maxc = min(POOL_NSLOT, PT), min(POOL_MAXC, RG)

        @jax.jit
        def chunk_stats(blk):
            rows, _c, _o = _pool_schedule(blk, RG, nslot, maxc)
            return jnp.sum(rows >= 0)

        used = 0
        for s in range(0, Rp, CH):
            blk = idx[s:s + CH]
            if blk.shape[0] % RG:        # pad partial tail chunk
                blk = np.concatenate(
                    [blk, np.repeat(blk[-1:],
                                    RG - blk.shape[0] % RG, axis=0)])
            used += int(chunk_stats(blk))
        # "pairs" slot of the return: used ROW slots (the bytes model
        # multiplies by one augmented row, not a 2-row pair)
        return RG, used, 0
    packed = _group_schedule(jnp.asarray(idx), RG)
    return (RG, int(jnp.sum(packed & 1)),
            int(jnp.sum((packed >> 1) & 1)))


def pool_compute_model(pt: "PallasTables", los, flags,
                       rg: int | None = None):
    """Analytic vector-op model of the pool kernel for the COMPUTE
    roofline (VERDICT r4 item 1: the turbo+pool redesign cut bytes
    moved ~20x, so the HBM roofline no longer bounds anything -- the
    kernel is compute/issue-limited and its ceiling is the VPU's
    element-wise op rate, measured empirically by tools/vpu_peak.py).

    Counts, per vector ELEMENT (one (ray, lane) pair), the kernel
    body's ops with FMA = 1 op and transcendentals (exp/exp2/log/log2/
    pow/tanh) tallied separately (they issue ~2x slower than FMAs on
    v5e, measured).  Totals scale by the schedule's ACTIVE work: combo
    evaluations and loop steps below each group's dynamic LOS bound.
    The +-15% honesty bar of the count is inherent (masked selects and
    compiler CSE shift it); the model's job is to expose order-of-
    magnitude headroom, like the reference's ptxas occupancy reports
    (Makefile:72), not to claim 3-digit precision.

    Returns a dict with the counts and, when given peaks, the ideal
    seconds; bench.py divides model time by measured kernel time into
    ``compute_fraction``."""
    G, PT, K_aug, Dp = pt.eps_aug.shape
    R, S = los.ds.shape
    W = los.k.shape[2]
    rg = rg or resolve_rg(G, K_aug, Dp, pool=True)
    J_f, J_i = pt.deg_f + 1, pt.deg_i + 1

    los_s, idx, _ = _sorted_frozen_idx(pt, los, rg)
    Rp = idx.shape[0]
    NG = Rp // rg
    nslot, maxc = min(POOL_NSLOT, PT), min(POOL_MAXC, rg)
    # jitted: the eager compaction mask materialises ~GBs at 1k+ rays
    sched = jax.jit(_pool_schedule, static_argnums=(1, 2, 3))
    _, combo, _ = sched(idx, rg, nslot, maxc,
                        los_s.np_.astype(jnp.int32))
    combo = np.asarray(combo)                           # [NG, S, G, maxc]
    np_ = np.asarray(los.np_)
    order = np.argsort(np.asarray(jax.device_get(los.tpz)))
    npp = np.concatenate([np_[order],
                          np.repeat(np_[order][-1:], Rp - R)])
    nb = np.clip(npp.reshape(NG, rg).max(axis=1), 1, S)   # [NG]
    act = np.arange(S)[None, :, None, None] < nb[:, None, None, None]
    evals = int(((combo != 0) & act).sum())
    steps = int(nb.sum())

    # per-element op counts (see _turbo_corner / the kernel body;
    # round 5 folded ~27 ops/corner into precomputed slope rows)
    corner = (J_f + J_i) + 43                 # + 4 transcendentals
    per_combo = 4 * corner + 28               # corners + okl + bilinear
    per_combo_tr = 4 * 4
    per_sg = 17 + 6                           # eta_t + factor + blend
    per_sg_tr = 2
    f_co2, f_h2o, f_n2, f_o2 = flags
    cont = 12 * f_co2 + 20 * f_h2o + 8 * f_n2 + 6 * f_o2
    cont_tr = 3 * f_h2o + (f_n2 or f_o2)
    per_seg = 12 + 2 * W + cont + 5 + 10      # fields+kw+cont+src+integ
    per_seg_tr = 1 + cont_tr

    el = rg * Dp
    ops = (evals * per_combo + steps * G * per_sg
           + steps * per_seg) * el
    trans = (evals * per_combo_tr + steps * G * per_sg_tr
             + steps * per_seg_tr) * el
    return {
        "groups": NG, "steps": steps, "combo_evals": evals,
        "mean_combos_per_seg_gas": round(evals / max(steps * G, 1), 3),
        "vector_ops": int(ops), "transcendentals": int(trans),
    }


def _pack_segments(los, ig_co2: int, ig_h2o: int):
    """Per-(ray, segment) stream tensor [R, S, F] f32 with the lane
    (minor) axis indexing the field:

      0 valid, 1 p, 2 t, 3 ds, 4 q_h2o, 5 u_co2, 6 u_h2o, 7 pad,
      8 .. 8+W-1   gray extinction k per window,
      8+W .. 8+W+G-1  column density u per gas.

    In-kernel a field is a static LANE extract and a segment a dynamic
    SUBLANE slice -- both natively supported layouts."""
    R, S = los.ds.shape
    f32 = jnp.float32
    z = jnp.zeros((R, S), f32)
    cols = [los.valid.astype(f32), los.p.astype(f32), los.t.astype(f32),
            los.ds.astype(f32),
            los.q[:, :, ig_h2o].astype(f32) if ig_h2o >= 0 else z,
            los.u[:, :, ig_co2].astype(f32) if ig_co2 >= 0 else z,
            los.u[:, :, ig_h2o].astype(f32) if ig_h2o >= 0 else z,
            z]
    seg = jnp.stack(cols, axis=-1)
    return jnp.concatenate([seg, los.k.astype(f32),
                            los.u.astype(f32)], axis=-1)


# ---------------------------------------------------------------------------
# The kernel

def _lipg(x0, y0, x1, y1, x):
    """lip with guarded denominator (jr_common.h:48-50)."""
    d = x1 - x0
    d = jnp.where(d == 0, 1.0, d)
    return y0 + (x - x0) * (y1 - y0) / d


def _c01(x):
    return jnp.clip(x, 0.0, 1.0)


def _continua_bds(p_s, t_s, ds_s, q_h2o, u_co2, u_h2o, kw, cc_ref, flags):
    """Continuum optical depth of one segment (continua_core,
    jr_common.h:397-409): gray extinction ``kw`` plus the four enabled
    continua, on whatever (rays, lanes) shape the caller works in.
    Shared by the kernel variants (the physics must stay bitwise
    identical between them)."""
    f_co2, f_h2o, f_n2, f_o2 = flags
    bds = kw * ds_s
    if f_co2:
        dt230, dt260, dt296 = t_s - 230.0, t_s - 260.0, t_s - 296.0
        ctw = (dt260 * 5.050505e-4 * dt296 * cc_ref[2]
               - dt230 * 9.259259e-4 * dt296 * cc_ref[1]
               + dt230 * 4.208754e-4 * dt260 * cc_ref[0])
        bds = bds + u_co2 * p_s * ctw / np.float32(NA * 1000.0 * P0)
    if f_h2o:
        cw296, cw260 = cc_ref[3], cc_ref[4]
        base = jnp.where(cw296 > 0, cw260
                         / jnp.where(cw296 > 0, cw296, 1.0), 1.0)
        ctwslf = cc_ref[6] * cw296 * jnp.power(
            base, (296.0 - t_s) / 36.0)
        a1 = cc_ref[7] * u_h2o * jnp.tanh(0.7193876 / t_s * cc_ref[7])
        a3 = p_s / np.float32(P0) * (q_h2o * ctwslf
                                     + (1 - q_h2o) * cc_ref[5]) \
            * np.float32(1e-20)
        bds = bds + a1 * (296.0 / t_s) * a3
    if f_n2 or f_o2:
        pp2 = (p_s / np.float32(P0)) ** 2 * (273.0 / t_s) ** 2
        tfac = 1.0 / 296.0 - 1.0 / t_s
        if f_n2:
            mix = 0.79 + 0.21 * (1.294 - 0.4545 * t_s / 296.0)
            bds = bds + ds_s * (0.1 * pp2 * jnp.exp(cc_ref[9] * tfac)
                                * 0.79 * cc_ref[8] * mix)
        if f_o2:
            bds = bds + ds_s * (0.1 * pp2 * jnp.exp(cc_ref[11] * tfac)
                                * 0.21 * cc_ref[10])
    return bds


def _eta_of(target):
    """Curve-of-growth transform of the inversion target -- shared by
    all 4 corners of a gas, so computed once per (gas, segment).
    (Mosaic lowers no log1p/expm1; the plain log forms lose precision
    only for eps < ~1e-6, where the EGA factor is 1 to float32 accuracy
    anyway -- and targets below e0 take the linear-extrapolation
    branch.)"""
    t_c = jnp.clip(target, 1e-12, 1.0 - 1e-7)
    return jnp.log(jnp.maximum(
        -jnp.log(jnp.maximum(1.0 - t_c, 1e-37)), 1e-37))


def _turbo_corner(get_row, J_f, J_i, target, eta_t, u_seg):
    """One (p,T) corner in turbo mode: eps->u inversion + eps(u+u_seg)
    re-lookup through the eta-space Chebyshev pair (turbo_fit.py), with
    the exact path's out-of-range linear extensions and guards
    replicated.  ``get_row(off)`` reads augmented row ``off`` of the
    corner in whatever layout the kernel variant stores it (per-ray
    slab or broadcast pool slot); turbo_fit.py documents the layout:
    rows [0, J_f) forward coefs, [J_f, J_f+J_i) inverse coefs, then the
    aux rows."""
    R6 = np.float32(LOG2_RATIO_U)
    RATIO = np.float32(2.0 ** LOG2_RATIO_U)
    AUX = J_f + J_i

    def cheb(off, J, x):
        """Clenshaw evaluation of rows [off, off+J) -- O(J) FMAs."""
        x2 = 2.0 * x
        b1 = jnp.zeros_like(x)
        b2 = jnp.zeros_like(x)
        for j in range(J - 1, 0, -1):
            b1, b2 = x2 * b1 - b2 + get_row(off + j), b1
        return x * b1 - b2 + get_row(off)

    l2u0 = get_row(AUX + 0)
    k_hi = get_row(AUX + 1)
    e0 = get_row(AUX + 2)
    e2nd = get_row(AUX + 4)
    emax = get_row(AUX + 5)
    ends = get_row(AUX + 6)
    u0 = get_row(AUX + 12)
    u_n1 = get_row(AUX + 13)
    # precomputed slopes (turbo_fit rows A+14..20): the former guarded
    # divisions are build-time constants per (corner row, channel)
    xi_a = get_row(AUX + 14)
    xi_b = get_row(AUX + 15)
    s_lo_inv = get_row(AUX + 16)
    s_hi_inv = get_row(AUX + 17)
    s_lo_fwd = get_row(AUX + 18)
    s_hi_fwd = get_row(AUX + 19)
    ky = get_row(AUX + 20)
    u_n2 = u_n1 * np.float32(2.0 ** -LOG2_RATIO_U)
    # inversion: precomputed eta(target) -> normalized xi -> k
    xi = jnp.clip(eta_t * xi_a + xi_b, -1.0, 1.0)
    k_c = jnp.clip(cheb(J_f, J_i, xi), 0.0, k_hi)
    u_c = jnp.exp2(l2u0 + k_c * R6)
    # below-range: linear extrapolation through the first u-interval
    # (get_u with idx clamped to 0)
    u_c = jnp.where(target < e0,
                    u0 + (target - e0) * s_lo_inv, u_c)
    # beyond-range, row truly ends: through the last active interval;
    # saturated rows pin u at the plateau start
    hi_u = u_n2 + (target - e2nd) * s_hi_inv
    u_c = jnp.where((target > emax) & (ends > 0), hi_u, u_c)
    # forward: eps(u_c + u_seg) through the forward expansion
    u_new = u_c + u_seg
    k_new = (jnp.log2(jnp.maximum(u_new, 1e-37)) - l2u0) / R6
    k_cl = jnp.clip(k_new, 0.0, k_hi)
    y = jnp.clip(k_cl * ky - 1.0, -1.0, 1.0)
    eps = 1.0 - jnp.exp(-jnp.exp(cheb(0, J_f, y)))
    # linear extensions outside the active range (get_eps with the
    # clamped end intervals; saturated rows extend flat -- the ends
    # factor is folded into s_hi_fwd)
    eps = jnp.where(k_new < 0.0, e0 + (u_new - u0) * s_lo_fwd, eps)
    eps = jnp.where(k_new > k_hi,
                    emax + (u_new - u_n1) * s_hi_fwd, eps)
    # flat rows: the exact path's guarded lip freezes the value
    eps = jnp.where(jnp.abs(emax - e0) > 1e-10, eps, e0)
    return _c01(eps)


def _source_rows(tsm_ref, sr_ref, s, RG: int, n_src: int):
    """Per-ray source radiance rows [RG, Dp]: the table index
    (int)(4 T) - 400 (locate_st, jr_common.h:83-84) differs per ray, so
    each ray's row pair comes from its SMEM temperature scalar (a [Dp]
    dynamic row slice per ray, stacked on the sublane axis)."""
    rows = []
    for r in range(RG):
        t_r = tsm_ref[0, 0, s * RG + r]
        it = jnp.clip((4.0 * t_r).astype(jnp.int32) - 400, 0, n_src - 2)
        st0 = 100.0 + 0.25 * it.astype(jnp.float32)
        sr0 = sr_ref[it]
        rows.append(sr0 + (t_r - st0) * (sr_ref[it + 1] - sr0) * 4.0)
    return jnp.stack(rows, axis=0)


def _make_kernel(G: int, S: int, K: int, K_aug: int, Dp: int, W: int,
                 RG: int, flags, ig_co2: int, ig_h2o: int, n_src: int,
                 early_exit: bool = False, mode: str = "table",
                 deg_f: int = 0, deg_i: int = 0):
    """Build the kernel body with all shape/config statics burned in
    (the analogue of the 16-way multiversioning, jr_multiversion4gases.h).

    Row extraction is masked reductions by necessity, not preference:
    Mosaic's dynamic sublane gather handles only ONE source vreg (8
    rows) along the gather dimension ("Multiple source vregs along
    gather dimension" is Not Implemented as of this writing), so
    per-lane dynamic indexing into a [K~224, 128] row is not
    expressible as a gather on TPU -- the branch-free masked max/min
    over monotone rows is the fastest available exact mechanism.

    All working vectors are [RG, Dp]: RG rays on the vreg sublane axis,
    channels on the lanes.

    ``early_exit``: stop the LOS loop once every channel lane of every
    ray is frozen by opacity (exact; see the loop-form comment below).
    Lanes with no gas table at all (all-gas chan_mask == 0, including
    the Dp padding lanes) keep factor = 1 forever and are masked as
    already-frozen so they cannot pin the loop open."""
    R6 = np.float32(LOG2_RATIO_U)
    RATIO = np.float32(2.0 ** LOG2_RATIO_U)

    F_SEG = N_SEG + W + G         # stream-tensor lane count
    if mode == "turbo":
        J_f, J_i = deg_f + 1, deg_i + 1
        AUX = J_f + J_i             # first aux row (turbo_fit layout)
        ROW_T, ROW_P, ROW_VALID = AUX + 9, AUX + 10, AUX + 11
    else:
        ROW_T, ROW_P, ROW_VALID = K + 1, K + 2, K + 3

    def kernel(np_ref, idx_ref, tsm_ref, seg_ref, cc_ref, sr_ref, cm_ref,
               eps_hbm, *out_and_scratch):
        if early_exit:
            rad_ref, tau_ref, send_ref, slab, sem = out_and_scratch
        else:
            rad_ref, tau_ref, slab, sem = out_and_scratch
        iota_k = (jax.lax.broadcasted_iota(jnp.int32, (K, 1, Dp), 0)
                  if mode != "turbo" else None)
        # dynamic LOS bound: loop only the group's actual point count
        # (the reference's per-ray np[ir], CPUdrivers.c:66); at least 1
        # so the prefetch issued before the loop is always consumed
        nb = np_ref[0, 0, 0]
        for r in range(1, RG):
            nb = jnp.maximum(nb, np_ref[0, 0, r])
        nb = jnp.clip(nb, 1, S)

        def meta(s, g, c, r):
            """(ipt, buf, copyl, fetch) for one (corner pair, ray)
            (_group_schedule)."""
            v = idx_ref[0, 0, ((s * G + g) * 2 + c) * RG + r]
            return v >> 3, (v >> 2) & 1, (v >> 1) & 1, v & 1

        def copy(ipt, b, g, c, r):
            return pltpu.make_async_copy(
                eps_hbm.at[g, pl.ds(ipt, 2), :, pl.ds(0, 1), :],
                slab.at[b, g, pl.ds(2 * c, 2), :, pl.ds(r, 1), :],
                sem.at[b, g, c, r])

        def start(s):
            """Issue HBM DMAs only for run-leader rays of pairs whose
            cell changed at s; a new slab lands in the buffer the
            current segment is NOT reading (group-level buf parity), so
            the fetch of segment s+1's cells overlaps segment s's
            compute."""
            for g in range(G):
                for c in range(2):
                    for r in range(RG):
                        ipt, b, _cl, f = meta(s, g, c, r)

                        @pl.when(f == 1)
                        def _(ipt=ipt, b=b, g=g, c=c, r=r):
                            copy(ipt, b, g, c, r).start()

        def wait(s):
            for g in range(G):
                for c in range(2):
                    for r in range(RG):
                        ipt, b, _cl, f = meta(s, g, c, r)

                        @pl.when(f == 1)
                        def _(ipt=ipt, b=b, g=g, c=c, r=r):
                            copy(ipt, b, g, c, r).wait()

        def chain(s):
            """Left-neighbour slab reuse: a ray whose cell equals ray
            r-1's copies its slab VMEM->VMEM (ascending r, so chained
            runs resolve in one pass).  Runs after wait(s): the run
            leader's HBM fetch has landed."""
            for g in range(G):
                for c in range(2):
                    for r in range(1, RG):
                        _ipt, b, cl, _f = meta(s, g, c, r)

                        @pl.when(cl == 1)
                        def _(b=b, g=g, c=c, r=r):
                            slab[b, g, 2 * c, :, r, :] = \
                                slab[b, g, 2 * c, :, r - 1, :]
                            slab[b, g, 2 * c + 1, :, r, :] = \
                                slab[b, g, 2 * c + 1, :, r - 1, :]

        start(0)

        def field(s, f):
            """Stream field f at segment s: [RG, 1] (dynamic sublane
            slice, static lane extract)."""
            return seg_ref[:, pl.ds(s, 1), f]

        def bracket(row, i):
            """(row[i], row[i+1]) per (ray, lane): one complement mask
            feeds both the max and the min (monotone rows with BIG
            padding make extraction a masked max/min).  row: [K, RG,
            Dp]; i: [RG, Dp]."""
            m = iota_k <= i[None]
            lo = jnp.max(jnp.where(m, row, -BIG), axis=0)
            hi = jnp.min(jnp.where(m, BIG, row), axis=0)
            return lo, hi

        def row_lookup(row, l2u0, nk2, target, u_seg):
            """One (p,T) corner: eps->u inversion + eps(u + u_seg)
            re-lookup on the log-uniform grid (get_u/get_eps,
            jr_common.h:157-185, legitimized FAST_INVERSE_OF_U).
            nk2 = clip(row count - 2, 0) comes precomputed from the
            augmented table row (saves a K-axis reduction per corner
            per segment)."""
            # invert: index of last eps <= target (locate_tbl_id)
            cnt = jnp.sum((row <= target).astype(jnp.int32), axis=0)
            i = jnp.clip(cnt - 1, 0, nk2)
            e0, e1 = bracket(row, i)
            fi = i.astype(jnp.float32)
            u0 = jnp.exp2(l2u0 + fi * R6)
            u_c = _lipg(e0, u0, e1, u0 * RATIO, target)
            # forward: index from log2 arithmetic
            u_new = u_c + u_seg
            kf = (jnp.log2(jnp.maximum(u_new, 1e-37)) - l2u0) / R6
            kf = jnp.clip(kf, 0.0, np.float32(K))
            ki = jnp.minimum(kf.astype(jnp.int32), nk2)
            e_lo, e_hi = bracket(row, ki)
            fk = ki.astype(jnp.float32)
            u_lo = jnp.exp2(l2u0 + fk * R6)
            return _c01(_lipg(u_lo, e_lo, u_lo * RATIO, e_hi, u_new))

        def body(s, carry):
            rad, tau, tau_path = carry

            @pl.when(s + 1 < nb)
            def _():
                start(s + 1)

            wait(s)
            chain(s)

            valid_s = field(s, 0) > 0.0                    # [RG, 1]
            p_s = field(s, 1)
            t_s = field(s, 2)
            ds_s = field(s, 3)
            q_h2o = field(s, 4)
            u_co2 = field(s, 5)
            u_h2o = field(s, 6)

            # --- continua (continua_core, jr_common.h:397-409) --------
            kw = jnp.zeros((RG, Dp), jnp.float32)
            for w in range(W):
                kw = kw + field(s, N_SEG + w) * cc_ref[N_CC + w]
            bds = _continua_bds(p_s, t_s, ds_s, q_h2o, u_co2, u_h2o,
                                kw, cc_ref, flags)

            # --- EGA per gas (apply_ega_core, jr_common.h:271-290) ----
            tau_gas = jnp.ones((RG, Dp), jnp.float32)
            new_rows = []
            for g in range(G):
                tp = tau_path[g]
                target = 1.0 - tp
                u_seg = field(s, N_SEG + W + g)
                _, b0, _, _ = meta(s, g, 0, 0)
                _, b1, _, _ = meta(s, g, 1, 0)
                eps_c = []
                okl = cm_ref[g]
                eta_t = _eta_of(target) if mode == "turbo" else None
                for c in range(4):
                    b = b0 if c < 2 else b1
                    if mode == "turbo":
                        eps_c.append(_turbo_corner(
                            lambda off, b=b, g=g, c=c:
                                slab[b, g, c, off, :, :],
                            J_f, J_i, target, eta_t, u_seg))
                    else:
                        row = slab[b, g, c, :K, :, :]
                        l2u0 = slab[b, g, c, K, :, :]
                        nk2 = slab[b, g, c, K + 4, :, :].astype(jnp.int32)
                        eps_c.append(
                            row_lookup(row, l2u0, nk2, target, u_seg))
                    okl = okl * slab[b, g, c, ROW_VALID, :, :]
                # bilinear: t within each p row, then p (jr_common.h:259-265)
                t00 = slab[b0, g, 0, ROW_T, :, :]
                t01 = slab[b0, g, 1, ROW_T, :, :]
                t10 = slab[b1, g, 2, ROW_T, :, :]
                t11 = slab[b1, g, 3, ROW_T, :, :]
                p0 = slab[b0, g, 0, ROW_P, :, :]
                p1 = slab[b1, g, 2, ROW_P, :, :]
                eps_p0 = _c01(_lipg(t00, eps_c[0], t01, eps_c[1], t_s))
                eps_p1 = _c01(_lipg(t10, eps_c[2], t11, eps_c[3], t_s))
                eps_t = _c01(_lipg(p0, eps_p0, p1, eps_p1, p_s))
                opaque = tp < np.float32(TAU_OPAQUE)
                factor = (1.0 - eps_t) / jnp.where(opaque, 1.0, tp)
                factor = jnp.where(okl > 0, factor, 1.0)
                factor = jnp.where(opaque, 0.0, factor)
                tau_gas = tau_gas * factor
                new_rows.append(jnp.where(valid_s, tp * factor, tp))
            tau_path = jnp.stack(new_rows, axis=0)

            # --- source + integration (new_obs_core) ------------------
            src = _source_rows(tsm_ref, sr_ref, s, RG, n_src)
            eps_tot = 1.0 - tau_gas * jnp.exp(-bds)
            upd = valid_s & (tau_gas > 0.0)
            rad = jnp.where(upd, rad + src * eps_tot * tau, rad)
            tau = jnp.where(upd, tau * (1.0 - eps_tot), tau)
            return rad, tau, tau_path

        rad0 = jnp.zeros((RG, Dp), jnp.float32)
        tau0 = jnp.ones((RG, Dp), jnp.float32)
        tp0 = jnp.ones((G, RG, Dp), jnp.float32)

        if not early_exit:
            rad, tau, _ = jax.lax.fori_loop(0, nb, body, (rad0, tau0, tp0))
        else:
            # Early exit on full opacity (exact): once a lane has ANY
            # gas with tau_path < TAU_OPAQUE, its factor is pinned to 0,
            # so tau_gas = 0 and the lane's rad/tau are frozen for every
            # remaining segment (new_obs_core's tau_gas > 0 guard).
            # When every live lane of every ray is frozen the rest of
            # the LOS loop is bitwise no-ops -- stop it.  The reference
            # loops all np points (CPUdrivers.c:66-83); the exit changes
            # nothing in the output.  Lanes with no table for any gas
            # (incl. the Dp padding) never saturate and are masked as
            # already-frozen (they contribute factor = 1 identically).
            # Off by default: a while_loop forfeits cross-iteration
            # pipelining, which costs a few % when rays never fully
            # saturate; worth enabling for opaque-limb workloads (low
            # tangent heights through the troposphere).
            dead_lane = jnp.max(cm_ref[:, :], axis=0) <= 0.0      # [Dp]

            def cond(carry):
                s, _rad, _tau, tau_path = carry
                lanemin = jnp.min(tau_path, axis=0)               # [RG, Dp]
                lanemin = jnp.where(dead_lane[None, :], 0.0, lanemin)
                live = jnp.max(lanemin) >= np.float32(TAU_OPAQUE)
                return (s < nb) & live

            def wbody(carry):
                s, rad, tau, tau_path = carry
                rad, tau, tau_path = body(s, (rad, tau, tau_path))
                return s + 1, rad, tau, tau_path

            s_end, rad, tau, _ = jax.lax.while_loop(
                cond, wbody, (jnp.int32(0), rad0, tau0, tp0))

            # Drain the lookahead: the last executed body (s_end - 1)
            # prefetched segment s_end's changed pairs; on an early
            # exit they must be consumed so the next grid step's
            # semaphores start clean.
            @pl.when(s_end < nb)
            def _():
                wait(s_end)

            send_ref[0, :, :] = jnp.full((RG, Dp), s_end, jnp.int32)

        rad_ref[0, :, :] = rad
        tau_ref[0, :, :] = tau

    return kernel


def _make_pool_kernel(G: int, S: int, Dp: int, W: int, RG: int,
                      NSLOT: int, MAXC: int, flags, ig_co2: int,
                      ig_h2o: int, n_src: int, early_exit: bool,
                      deg_f: int, deg_i: int, pool_in_vmem: bool,
                      hybrid: bool = False):
    """Slot-pool kernel variant (turbo tables only; see
    :func:`_pool_schedule` for the why).

    Round-5 structure: the driver pre-gathers the whole pool in HBM
    with ONE XLA row gather (runs at memory bandwidth), so the kernel
    has either NO prologue at all (``pool_in_vmem``: the pool block
    arrives through the pallas pipeline, double-buffered across
    groups) or a single whole-pool DMA per group (large-G fallback
    where double buffering would exceed VMEM).  The LOS loop runs with
    no DMAs: each (segment, gas) is evaluated once per DISTINCT
    (pair0, pair1) cell combo with pool rows broadcast across all RG
    ray sublanes.

    Combo dispatch, round 5: combo 0 always exists (every active
    segment brackets SOME cell), so it is evaluated branch-free and
    its result used directly; only the ~20% of (segment, gas) sites
    with a second combo enter a ``pl.when`` region (and the ~1% with a
    third enter one more).  Round 4 ran four ``pl.when`` + accumulator
    round trips per (segment, gas) unconditionally, which cost ~3x the
    evaluation itself (ablation: 30 ms of 90 at the flagship).

    Physics is shared with the group kernel (_continua_bds,
    _turbo_corner, _source_rows), and the per-lane arithmetic is
    bitwise identical: a combo's pool rows hold exactly the bits the
    group kernel's per-ray slab copies held.

    ``Dp`` is the per-grid-step CHANNEL BLOCK width: the grid is
    (ray groups, channel blocks), so wide spectral batches (nd >=
    1024) and reference-capacity gas counts (NG = 30, jurassic.h:138)
    bound their VMEM by the block width instead of the full lane
    axis; at one block the second grid axis degenerates away."""
    F_SEG = N_SEG + W + G
    J_f, J_i = deg_f + 1, deg_i + 1
    AUX = J_f + J_i
    ROW_T, ROW_P, ROW_VALID = AUX + 9, AUX + 10, AUX + 11

    def kernel(np_ref, combo_ref, tsm_ref, seg_ref, cc_ref,
               sr_ref, cm_ref, pool_in, *out_and_scratch):
        rad_ref, tau_ref, *rest = out_and_scratch
        send_ref = taint_ref = None
        if early_exit:
            send_ref, *rest = rest
        if hybrid:
            taint_ref, *rest = rest
        scratch = rest
        if pool_in_vmem:
            (acc,) = scratch
            pool = pool_in           # [1, G * NSLOT, K_aug, Dp] block
        else:
            pool_s, sem, acc = scratch
            r0 = pl.program_id(0)
            cb = pl.program_id(1)
            src = pool_in.at[r0, :, :, pl.ds(cb * Dp, Dp)]
            pltpu.make_async_copy(src, pool_s, sem).start()
            pltpu.make_async_copy(src, pool_s, sem).wait()
            pool = None
        nb = np_ref[0, 0, 0]
        for r in range(1, RG):
            nb = jnp.maximum(nb, np_ref[0, 0, r])
        nb = jnp.clip(nb, 1, S)

        def prow(g, sl, off):
            """Augmented row ``off`` of pool slot ``sl`` of gas g:
            [Dp], broadcast across ray sublanes by the caller."""
            if pool_in_vmem:
                return pool[0, g * NSLOT + sl, off, :]
            return pool_s[g * NSLOT + sl, off, :]

        def pblk(g, sl):
            """The whole augmented slab of pool slot ``sl``:
            [K_aug, Dp] via ONE dynamic slice (row reads then index
            statically into the value -- see combo_eval)."""
            if pool_in_vmem:
                return pool[0, g * NSLOT + sl]
            return pool_s[g * NSLOT + sl]

        iota_ray = jax.lax.broadcasted_iota(jnp.int32, (RG, Dp), 0)

        ABLATE = os.environ.get("JURASSIC_POOL_ABLATE", "")

        def body(s, carry):
            rad, tau, tau_path, taint = carry
            if ABLATE in ("pureloop", "nopro", "nosched"):
                return rad + 1e-30, tau, tau_path, taint
            # ONE natural [RG, F] vreg load per segment (the stream is
            # ray-minor, see the [NG, S, RG, F] packing in the driver);
            # every field is then a static lane column [RG, 1].  (A
            # ray-major [RG, S, F] stream needs a strided per-ray
            # gather PER FIELD here, which costs more than the whole
            # EGA physics: ~6 us/segment of pure extraction overhead
            # measured on v5e.)
            tile = seg_ref[0, pl.ds(s, 1), :, :].reshape(RG, F_SEG)

            def field(f):
                return tile[:, f:f + 1]                    # [RG, 1]

            valid_s = field(0) > 0.0
            p_s = field(1)
            t_s = field(2)
            ds_s = field(3)
            q_h2o = field(4)
            u_co2 = field(5)
            u_h2o = field(6)

            if ABLATE == "empty":
                rad = rad + p_s * 1e-30
                return rad, tau, tau_path, taint

            kw = jnp.zeros((RG, Dp), jnp.float32)
            for w in range(W):
                kw = kw + field(N_SEG + w) * cc_ref[N_CC + w]
            bds = _continua_bds(p_s, t_s, ds_s, q_h2o, u_co2, u_h2o,
                                kw, cc_ref, flags)

            if ABLATE == "noega":
                src = _source_rows(tsm_ref, sr_ref, s, RG, n_src)
                eps_tot = 1.0 - jnp.exp(-bds)
                upd = valid_s
                rad = jnp.where(upd, rad + src * eps_tot * tau, rad)
                tau = jnp.where(upd, tau * (1.0 - eps_tot), tau)
                return rad, tau, tau_path, taint

            # --- EGA per gas, one evaluation per DISTINCT cell combo --
            tau_gas = jnp.ones((RG, Dp), jnp.float32)
            new_rows = []
            for g in range(G):
                tp = tau_path[g]
                target = 1.0 - tp
                u_seg = field(N_SEG + W + g)
                eta_t = _eta_of(target)

                def combo_eval(s0, s1, g=g, target=target, eta_t=eta_t,
                               u_seg=u_seg, t_s=t_s, p_s=p_s):
                    """(eps_t, okl) of the cell combo (pair base slots
                    s0, s1) for ALL RG rays (pool rows broadcast
                    across sublanes).  Corner c reads row slot
                    (c < 2 ? s0 : s1) + (c & 1): _pool_schedule packs
                    rows densely, so a pair's second row always sits
                    in the next slot.

                    The 4 corners evaluate as ONE [4, RG, Dp] batched
                    _turbo_corner call: the Clenshaw recurrences are
                    loop-carried dependency chains, so a per-corner
                    evaluation is ALU-latency-bound on single vregs --
                    corner-stacking gives the scheduler 4 independent
                    chains.  Each corner's augmented rows are pulled
                    with ONE whole-slab dynamic slice; the ~32
                    per-row reads are then STATIC offsets into the
                    sliced value -- a dynamically indexed [Dp] row
                    load costs ~30x a static one on Mosaic (measured:
                    0.9 us vs 0.03 us), and round 4 issued 128 of
                    them per combo evaluation."""
                    slots = [s0, s0 + 1, s1, s1 + 1]
                    blk4 = jnp.stack(
                        [pblk(g, sj) for sj in slots])   # [4, K_aug, Dp]

                    def get4(off):
                        return blk4[:, off][:, None, :]  # [4, 1, Dp]

                    eps4 = _turbo_corner(get4, J_f, J_i,
                                         target[None], eta_t[None],
                                         u_seg[None])    # [4, RG, Dp]
                    vld = get4(ROW_VALID)
                    okl = cm_ref[g] * vld[0, 0] * vld[1, 0] \
                        * vld[2, 0] * vld[3, 0]
                    # ROW_VALID = 2.0 marks a bad-fit row (hybrid):
                    # any corner using one taints the lane
                    badm = jnp.maximum(
                        jnp.maximum(vld[0, 0], vld[1, 0]),
                        jnp.maximum(vld[2, 0], vld[3, 0])) \
                        if hybrid else None
                    # bilinear: t within each p row, then p
                    # (jr_common.h:259-265)
                    t4 = get4(ROW_T)
                    p0 = blk4[0, ROW_P]
                    p1 = blk4[2, ROW_P]
                    eps_p0 = _c01(_lipg(t4[0, 0], eps4[0], t4[1, 0],
                                        eps4[1], t_s))
                    eps_p1 = _c01(_lipg(t4[2, 0], eps4[2], t4[3, 0],
                                        eps4[3], t_s))
                    return (_c01(_lipg(p0, eps_p0, p1, eps_p1, p_s)),
                            okl, badm)

                # combo 0: branch-free direct evaluation (always used)
                v0 = combo_ref[0, 0, (s * G + g) * MAXC]
                eps0, okl0, bad0 = combo_eval(v0 >> 15, (v0 >> 8) & 127)
                if ABLATE == "onecombo" or MAXC == 1:
                    eps_t, okl = eps0, okl0
                    badv = bad0
                else:
                    # extra combos (~20% of sites have a 2nd, ~1% a
                    # 3rd): pl.when regions accumulate into scratch;
                    # rays owned by combo 0 never read the (possibly
                    # stale) accumulator, so it needs zeroing only
                    # inside the taken branch
                    v1 = combo_ref[0, 0, (s * G + g) * MAXC + 1]

                    @pl.when(v1 != 0)
                    def _(v1=v1, combo_eval=combo_eval):
                        e1, o1, b1 = combo_eval(v1 >> 15, (v1 >> 8) & 127)
                        r1 = ((v1 >> iota_ray) & 1) != 0
                        acc[0, :, :] = jnp.where(r1, e1, 0.0)
                        acc[1, :, :] = jnp.where(r1, o1, 0.0)
                        if hybrid:
                            acc[2, :, :] = jnp.where(r1, b1, 0.0)
                    if MAXC > 2:
                        v2 = combo_ref[0, 0, (s * G + g) * MAXC + 2]

                        @pl.when(v2 != 0)
                        def _(v2=v2, combo_eval=combo_eval):
                            for k, vk in [(2, v2)] + [
                                    (k, combo_ref[0, 0,
                                                  (s * G + g) * MAXC + k])
                                    for k in range(3, MAXC)]:
                                ek, ok_, bk = combo_eval(vk >> 15,
                                                         (vk >> 8) & 127)
                                rk = ((vk >> iota_ray) & 1) != 0
                                acc[0, :, :] = acc[0, :, :] + jnp.where(
                                    rk, ek, 0.0)
                                acc[1, :, :] = acc[1, :, :] + jnp.where(
                                    rk, ok_, 0.0)
                                if hybrid:
                                    acc[2, :, :] = acc[2, :, :] \
                                        + jnp.where(rk, bk, 0.0)
                    ray0 = ((v0 >> iota_ray) & 1) != 0
                    eps_t = jnp.where(ray0, eps0, acc[0, :, :])
                    okl = jnp.where(ray0, okl0, acc[1, :, :])
                    if hybrid:
                        badv = jnp.where(ray0, bad0, acc[2, :, :])
                opaque = tp < np.float32(TAU_OPAQUE)
                factor = (1.0 - eps_t) / jnp.where(opaque, 1.0, tp)
                factor = jnp.where(okl > 0, factor, 1.0)
                factor = jnp.where(opaque, 0.0, factor)
                tau_gas = tau_gas * factor
                new_rows.append(jnp.where(valid_s, tp * factor, tp))
                if hybrid:
                    # a bad-fit row used on any ACTIVE, still-live
                    # segment taints the lane's accumulated radiance
                    hit = valid_s & ~opaque & (badv > 1.5)
                    taint = jnp.where(hit, 1.0, taint)
            tau_path = jnp.stack(new_rows, axis=0)

            # --- source + integration (new_obs_core) ------------------
            src = _source_rows(tsm_ref, sr_ref, s, RG, n_src)
            eps_tot = 1.0 - tau_gas * jnp.exp(-bds)
            upd = valid_s & (tau_gas > 0.0)
            rad = jnp.where(upd, rad + src * eps_tot * tau, rad)
            tau = jnp.where(upd, tau * (1.0 - eps_tot), tau)
            return rad, tau, tau_path, taint

        rad0 = jnp.zeros((RG, Dp), jnp.float32)
        tau0 = jnp.ones((RG, Dp), jnp.float32)
        tp0 = jnp.ones((G, RG, Dp), jnp.float32)
        tn0 = jnp.zeros((RG, Dp), jnp.float32)

        if not early_exit:
            # Macro-stepped LOS loop: each fori iteration evaluates
            # ``unroll`` consecutive segments.  lax.fori_loop's own
            # unroll needs static bounds, but the per-segment body is
            # already a masked no-op beyond a ray's np (valid_s == 0
            # freezes every carry), so fusing k segments per dynamic
            # step is bitwise identical while amortizing the Mosaic
            # loop boundary (~us-scale per step on (8, Dp) vregs)
            # across k segments.  Requires S % k == 0 so the last
            # macro-step never indexes past the segment stream.
            unroll = int(os.environ.get("JURASSIC_POOL_UNROLL", "1"))
            if unroll > 1 and S % unroll == 0:
                def body_k(i, carry):
                    for j in range(unroll):
                        carry = body(i * unroll + j, carry)
                    return carry
                rad, tau, _, taint = jax.lax.fori_loop(
                    0, (nb + unroll - 1) // unroll, body_k,
                    (rad0, tau0, tp0, tn0))
            else:
                rad, tau, _, taint = jax.lax.fori_loop(
                    0, nb, body, (rad0, tau0, tp0, tn0))
        else:
            # same exact exit as the group kernel (see its comment);
            # with the pool pre-gathered there is no lookahead to
            # drain, so the while_loop is the whole story
            dead_lane = jnp.max(cm_ref[:, :], axis=0) <= 0.0

            def cond(carry):
                s, _rad, _tau, tau_path, _tn = carry
                lanemin = jnp.min(tau_path, axis=0)
                lanemin = jnp.where(dead_lane[None, :], 0.0, lanemin)
                live = jnp.max(lanemin) >= np.float32(TAU_OPAQUE)
                return (s < nb) & live

            def wbody(carry):
                s, rad, tau, tau_path, tn = carry
                rad, tau, tau_path, tn = body(s, (rad, tau, tau_path, tn))
                return s + 1, rad, tau, tau_path, tn

            s_end, rad, tau, _, taint = jax.lax.while_loop(
                cond, wbody, (jnp.int32(0), rad0, tau0, tp0, tn0))
            send_ref[0, :, :] = jnp.full((RG, Dp), s_end, jnp.int32)

        rad_ref[0, :, :] = rad
        tau_ref[0, :, :] = tau
        if hybrid:
            taint_ref[0, :, :] = taint

    return kernel


def resolve_rg(G: int, K_aug: int, Dp: int, pool: bool = False) -> int:
    """Rays per grid step: as many sublanes as the corner-slab VMEM
    budget allows (the analogue of the reference's GPU_SHARED_MEMORY
    sizing knob, jurassic.h:344-345).  The slot-POOL kernel has no
    per-ray slabs at all (its pool is RG-independent), so it always
    runs the full 8 sublanes; the group kernel's big table-mode slabs
    (K_aug ~ 232) step down with gas count and lane width."""
    env = os.environ.get("JURASSIC_PALLAS_RG")
    if env:
        return max(1, min(RG_MAX, int(env)))
    if pool:
        return RG_MAX
    rg = RG_MAX
    while rg > 1 and NBUF * G * 4 * K_aug * rg * Dp * 4 > SLAB_BUDGET:
        rg //= 2
    return rg


def rt_fused_pallas(pt: PallasTables, cc_rows, los, flags,
                    ig_co2: int, ig_h2o: int,
                    interpret: bool = False,
                    early_exit: bool | None = None,
                    return_s_end: bool = False,
                    variant: str = "group"):
    """Run the fused kernel over all rays; returns (rad, tau) [R, D] f32
    (plus the per-group early-exit segment counts when requested).

    The grid iterates tangent-sorted ray groups (sequential on a TPU
    core, pipelined block fetches); the sort is a device-side gather,
    and the outputs are scattered back to input order, so the kernel is
    bitwise independent of the caller's ray order.  Surface emission
    and brightness conversion stay outside (cheap [R, D] epilogues,
    like the separate surface/BT kernels, GPUdrivers.cu:234-240).

    ``variant``: "group" = per-segment double-buffered slab DMAs with
    neighbour reuse (any table mode); "pool" = whole-LOS slot pool with
    per-combo evaluation (turbo mode only; the caller must have checked
    :func:`pool_plan` against POOL_NSLOT/POOL_MAXC -- an overflowing
    workload yields garbage under "pool", which is why the choice is a
    static driver decision, not an in-kernel branch).
    """
    G, PT, K_aug, Dp = pt.eps_aug.shape
    K = pt.k_rows
    R, S = los.ds.shape
    W = los.k.shape[2]
    n_src = pt.sr.shape[0]
    RG = resolve_rg(G, K_aug, Dp, pool=variant.startswith("pool"))
    if variant == "pool" and pt.mode != "turbo":
        raise ValueError("variant='pool' requires turbo tables")
    return_ok = False
    if variant == "pool!":                 # pool + in-graph capacity flag
        variant, return_ok = "pool", True

    # sort by tangent height so each group's rays traverse nearly
    # identical table cells (maximises fetch skipping + neighbour
    # reuse); pad the ray axis to the group multiple with the last ray
    los, idx, order = _sorted_frozen_idx(pt, los, RG)
    Rp = idx.shape[0]
    NG = Rp // RG
    seg = _pack_segments(los, ig_co2, ig_h2o)          # [Rp, S, F]
    F_SEG = seg.shape[2]
    t_smem = jnp.transpose(
        los.t.astype(jnp.float32).reshape(NG, RG, S),
        (0, 2, 1)).reshape(NG, 1, S * RG)
    np_grp = los.np_.astype(jnp.int32).reshape(NG, 1, RG)

    if early_exit is None:
        early_exit = bool(int(os.environ.get(
            "JURASSIC_PALLAS_EARLY_EXIT", "0")))

    out_specs = [
        pl.BlockSpec((1, RG, Dp), lambda r: (r, 0, 0)),
        pl.BlockSpec((1, RG, Dp), lambda r: (r, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((NG, RG, Dp), jnp.float32),
        jax.ShapeDtypeStruct((NG, RG, Dp), jnp.float32),
    ]
    if early_exit:
        out_specs.append(pl.BlockSpec((1, RG, Dp), lambda r: (r, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((NG, RG, Dp), jnp.int32))

    common_specs = [
        pl.BlockSpec((RG, S, F_SEG), lambda r: (r, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # cc rows
        pl.BlockSpec(memory_space=pltpu.VMEM),   # sr
        pl.BlockSpec(memory_space=pltpu.VMEM),   # chan_mask
        pl.BlockSpec(memory_space=pl.ANY),       # eps_aug (HBM)
    ]

    if variant == "pool":
        NSLOT = min(POOL_NSLOT, PT)
        MAXC = min(POOL_MAXC, RG)
        if os.environ.get("JURASSIC_POOL_ABLATE") == "nosched":
            rows = jnp.zeros((NG, G, NSLOT), jnp.int32)
            combo = jnp.zeros((NG, S, G, MAXC), jnp.int32)
            ok = jnp.bool_(True)
        else:
            rows, combo, ok = _pool_schedule(idx, RG, NSLOT, MAXC,
                                             los.np_.astype(jnp.int32))
        # pre-gather the whole pool in HBM: ONE leading-axis row
        # gather at memory bandwidth (~1 ms flagship) replaces the
        # ~500 per-pair kernel DMAs per group whose issue overhead was
        # ~10% of round-4 kernel time; unused slots clamp to row 0
        # (valid data, never referenced by any combo)
        gid = jnp.where(rows >= 0,
                        rows + (jnp.arange(G, dtype=jnp.int32)
                                * PT)[None, :, None], 0)
        pool_hbm = jnp.take(pt.eps_aug.reshape(G * PT, K_aug, Dp),
                            gid.reshape(-1), axis=0
                            ).reshape(NG, G * NSLOT, K_aug, Dp)
        # --- channel-block resolution: the grid is (groups, channel
        # blocks); DpB bounds the VMEM-resident pool/sr/output slices
        # so wide spectral batches (nd >= 1024) and NG = 30 gas counts
        # compile within the chip's VMEM.  Prefer the pipelined
        # (double-buffered BlockSpec) pool; fall back to one
        # whole-pool DMA per (group, block) when even one block's
        # double buffer will not fit (large G).
        n_src_rows = pt.sr.shape[0]
        BUDGET = int(float(os.environ.get(
            "JURASSIC_POOL_VMEM_MB", "100")) * 1024 * 1024)

        def sizes(DpB):
            pool_b = G * NSLOT * K_aug * DpB * 4
            other = 2 * S * RG * max(F_SEG, 128) * 4 \
                + n_src_rows * DpB * 4 + 6 * 1024 * 1024
            return pool_b, other

        NCB = 1
        while Dp // NCB > LANE and (lambda p, o: 2 * p + o)(
                *sizes(Dp // NCB)) > BUDGET:
            NCB *= 2
        DpB = Dp // NCB
        pool_bytes, other = sizes(DpB)
        pool_in_vmem = 2 * pool_bytes + other <= BUDGET
        N_CC_W = cc_rows.shape[0]
        hybrid = pt.n_bad > 0
        if hybrid:                 # per-(ray, channel) bad-row taint
            out_specs = out_specs + [out_specs[0]]
            out_shape = out_shape + [
                jax.ShapeDtypeStruct((NG, RG, Dp), jnp.float32)]
        # channel-blocked out specs (at NCB = 1 these match the group
        # kernel's whole-lane blocks)
        out_specs = [pl.BlockSpec((1, RG, DpB),
                                  lambda r, cb: (r, 0, cb))
                     for _ in out_specs]
        kernel = _make_pool_kernel(G, S, DpB, W, RG, NSLOT, MAXC,
                                   tuple(flags), ig_co2, ig_h2o, n_src,
                                   early_exit, pt.deg_f, pt.deg_i,
                                   pool_in_vmem, hybrid=hybrid)
        # ray-minor stream [NG, S, RG, F]: one (RG, F) vreg tile per
        # segment (see the field-extraction comment in the kernel)
        seg4 = seg.reshape(NG, RG, S, F_SEG).transpose(0, 2, 1, 3)
        # accumulator rows: eps, okl, + the hybrid taint row
        scratch = [pltpu.VMEM((3 if hybrid else 2, RG, DpB),
                              jnp.float32)]
        if pool_in_vmem:
            pool_spec = pl.BlockSpec((1, G * NSLOT, K_aug, DpB),
                                     lambda r, cb: (r, 0, 0, cb),
                                     memory_space=pltpu.VMEM)
            vlim = 2 * pool_bytes + other
        else:
            pool_spec = pl.BlockSpec(memory_space=pl.ANY)
            scratch = [pltpu.VMEM((G * NSLOT, K_aug, DpB), jnp.float32),
                       pltpu.SemaphoreType.DMA] + scratch
            vlim = pool_bytes + other
        outs = pl.pallas_call(
            kernel,
            grid=(NG, NCB),
            in_specs=[
                pl.BlockSpec((1, 1, RG), lambda r, cb: (r, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, S * G * MAXC),
                             lambda r, cb: (r, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, S * RG), lambda r, cb: (r, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, S, RG, F_SEG),
                             lambda r, cb: (r, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_CC_W, DpB), lambda r, cb: (0, cb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_src_rows, DpB), lambda r, cb: (0, cb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, DpB), lambda r, cb: (0, cb),
                             memory_space=pltpu.VMEM),
                pool_spec,
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(vlim)),
            interpret=interpret,
        )(np_grp, combo.reshape(NG, 1, S * G * MAXC), t_smem, seg4,
          cc_rows, pt.sr, pt.chan_mask, pool_hbm)
    else:
        sched = _group_schedule(idx, RG).reshape(NG, 1, S * G * 2 * RG)
        kernel = _make_kernel(G, S, K, K_aug, Dp, W, RG, tuple(flags),
                              ig_co2, ig_h2o, n_src, early_exit,
                              pt.mode, pt.deg_f, pt.deg_i)

        slab_bytes = NBUF * G * 4 * K_aug * RG * Dp * 4
        stream_bytes = 2 * RG * S * F_SEG * 4   # double-buffered block
        vlim = slab_bytes + stream_bytes + pt.sr.size * 4 \
            + 6 * 1024 * 1024

        outs = pl.pallas_call(
            kernel,
            grid=(NG,),
            in_specs=[
                pl.BlockSpec((1, 1, RG), lambda r: (r, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, S * G * 2 * RG), lambda r: (r, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, S * RG), lambda r: (r, 0, 0),
                             memory_space=pltpu.SMEM),
            ] + common_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((NBUF, G, 4, K_aug, RG, Dp), jnp.float32),
                pltpu.SemaphoreType.DMA((NBUF, G, 2, RG)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(vlim)),
            interpret=interpret,
        )(np_grp, sched, t_smem, seg, cc_rows, pt.sr, pt.chan_mask,
          pt.eps_aug.reshape(G, PT, K_aug, 1, Dp))

    rad, tau = outs[0], outs[1]
    # un-group, un-pad, un-sort, un-lane-pad
    inv = jnp.zeros((R,), jnp.int32).at[order].set(
        jnp.arange(R, dtype=jnp.int32))
    D = pt.d_true
    rad = rad.reshape(Rp, Dp)[inv, :D]
    tau = tau.reshape(Rp, Dp)[inv, :D]
    res = (rad, tau)
    if return_ok:
        res += (ok,)
        if variant == "pool" and pt.n_bad > 0:
            # hybrid taint [R, D]: lanes whose radiance consumed a
            # bad-fit turbo row (driver re-evaluates them through the
            # exact table kernel)
            res += (outs[-1].reshape(Rp, Dp)[inv, :D],)
    if return_s_end:
        s_end = (outs[2].reshape(Rp, Dp)[::RG, 0] if early_exit
                 else jnp.full((NG,), S, jnp.int32))
        res += (s_end,)
    return res if len(res) > 2 else (rad, tau)
