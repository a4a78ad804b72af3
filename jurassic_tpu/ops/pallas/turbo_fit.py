"""Chebyshev-compressed EGA tables for the turbo kernel mode.

The fused table kernel (ega_fused) is VPU-compute-bound: each corner
lookup is O(K) masked-reduction passes over a [K ~ 224, 128] eps row
because Mosaic exposes no multi-vreg dynamic gather (see
_make_kernel's docstring).  The turbo mode removes the O(K) term
entirely by fitting, at table-build time, every (gas, pressure x
temperature cell, channel) log-uniform eps row with a pair of
Chebyshev expansions:

* forward  eps(x),  x = 2 k / k_hi - 1 on the row's ACTIVE range
  (k_hi = last point before the saturation plateau), and
* inverse  k(eps) on the same range,

both evaluated in-kernel with Clenshaw recurrences (O(degree) FMAs on
[128]-lane vectors instead of O(K) full-row passes), with the
reference's out-of-range semantics preserved exactly:

* below-range: linear extrapolation through the first u-interval
  (get_u/get_eps with idx clamped to 0, jr_common.h:157-185);
* beyond-range: linear extrapolation through the last ACTIVE
  u-interval when the row genuinely ends there, constant eps_max when
  the row saturates inside the grid (where the exact path's bracketing
  rows are equal and its guarded lip denominator freezes the value);
* final clip to [0, 1] (the _c01 of the exact path).

This is the same "trade exactness for arithmetic" move as the
reference's FAST_INVERSE_OF_U (jurassic.c:487-609) and --use_fast_math
(Makefile:71), with the same discipline: the fit is validated against
every table row at build time and the achieved max errors are reported
(``TurboStats``); ForwardModel refuses the mode when validation
exceeds the EGA physics tolerance.

Data layout (reusing the PallasTables container; ``mode="turbo"``):

Both expansions are fitted in the curve-of-growth transform
eta = ln(-ln(1 - eps)) (see :func:`eta`), which makes them
near-linear and drives the fit error to the float32 noise floor of the
table data at degree ~6-8.

``eps_aug``: [G, P*T, Q_aug, Dp] float32 where the Q_aug rows are
  rows 0 .. J_f-1         forward Chebyshev coefficients (of eta(x))
  rows J_f .. J_f+J_i-1   inverse Chebyshev coefficients (of k(xi))
  row  A + 0              log2(u0)
  row  A + 1              k_hi (active-range length, float)
  row  A + 2              eps row[0]
  row  A + 3              eps row[1]
  row  A + 4              eps row[k_hi - 1]
  row  A + 5              eps row[k_hi]  (eps_max of the active range)
  row  A + 6              1 if the row truly ends at k_hi (linear
                          extension beyond), 0 if it saturates there
  row  A + 7              eta0   (eta of row[0])
  row  A + 8              eta_hi (eta of row[k_hi])
  row  A + 9              temperature axis value of the cell
  row  A + 10             pressure axis value of the cell
  row  A + 11             validity flag
  row  A + 12             u0  (= 2^log2_u0, precomputed)
  row  A + 13             u_hi (= u at k_hi, precomputed)
with A = J_f + J_i and Q_aug = round_up(A + 14, 8).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ...tables import FastTables

N_TURBO_AUX = 21   # 14 base rows + 7 precomputed-slope rows (A+14..20:
#                    xi_a, xi_b, s_lo_inv, s_hi_inv, s_lo_fwd,
#                    s_hi_fwd, ky) that fold the corner evaluation's
#                    guarded-denominator arithmetic into build-time
#                    constants (~25% fewer vector ops per corner)


class TurboStats(NamedTuple):
    """Build-time validation of the Chebyshev compression.

    ``max_chord_dev`` separates the accuracy CONTRACT from the fit
    quality: the table kernels interpolate eps linearly in u between
    grid rows (get_eps, jr_common.h:157-177), so their goldens embody
    chord values; turbo evaluates the smooth curve through the same
    rows.  The two differ by the chord-discretization error of the
    u-grid (~1e-3 at the reference's 2^(1/6) spacing) even when the
    fit itself is exact -- turbo agrees with the underlying emissivity
    curve to max_fwd_err and with the table kernels to
    ~max_chord_dev."""
    rows: int            # fitted rows
    max_fwd_err: float   # max |cheb(k) - eps_k| over all active points
    max_inv_err: float   # max |eps(cheb_inv(e)) - e| roundtrip at
    #                      interval midpoints (the inversion targets the
    #                      kernel will actually see)
    max_chord_dev: float = 0.0  # max |curve - linear chord| at interval
    #                      midpoints (turbo-vs-table semantic gap)


def _cheb_vander(x: np.ndarray, deg: int) -> np.ndarray:
    """Chebyshev Vandermonde over the last axis: [..., N, deg+1]."""
    V = np.zeros(x.shape + (deg + 1,))
    V[..., 0] = 1.0
    if deg >= 1:
        V[..., 1] = x
    for j in range(2, deg + 1):
        V[..., j] = 2 * x * V[..., j - 1] - V[..., j - 2]
    return V


N_NODES = 64             # shared Chebyshev sample nodes per row


def _cheb_nodes_and_proj(deg: int):
    """Chebyshev points of the first kind x_m (shared by every row) and
    the projection matrix P [M, deg+1] such that coeffs = f(x) @ P --
    the discrete-orthogonality closed form
    c_j = (2 - delta_j0)/M * sum_m f(x_m) T_j(x_m), i.e. the degree-deg
    truncation of the M-point Chebyshev interpolant.  Turns the whole
    batched fit into one GEMM per chunk instead of per-row least
    squares."""
    M = N_NODES
    xm = np.cos(np.pi * (2 * np.arange(M) + 1) / (2 * M))
    V = _cheb_vander(xm, deg)                     # [M, J]
    P = V * (2.0 / M)
    P[:, 0] *= 0.5
    return xm, P


def _interp_rows(xq, xs, ys):
    """Batched monotone linear interpolation: per row b,
    yq[b, m] = interp(xq[b, m]; xs[b, :], ys[b, :]) with end clamping.
    xs must be non-decreasing along the last axis."""
    B, N = xs.shape
    idx = np.sum(xs[:, None, :] <= xq[:, :, None], axis=2) - 1
    idx = np.clip(idx, 0, N - 2)
    x0 = np.take_along_axis(xs, idx, axis=1)
    x1 = np.take_along_axis(xs, idx + 1, axis=1)
    y0 = np.take_along_axis(ys, idx, axis=1)
    y1 = np.take_along_axis(ys, idx + 1, axis=1)
    d = x1 - x0
    f = np.clip((xq - x0) / np.where(d > 0, d, 1.0), 0.0, 1.0)
    return y0 + f * (y1 - y0)


def _chebval(x, c):
    """Clenshaw per row: x [B, N], c [B, J] -> [B, N]."""
    b1 = np.zeros_like(x)
    b2 = np.zeros_like(x)
    x2 = 2 * x
    for j in range(c.shape[-1] - 1, 0, -1):
        b1, b2 = x2 * b1 - b2 + c[:, j:j + 1], b1
    return x * b1 - b2 + c[:, :1]


EPS_FLOOR = 1e-12        # eta transform clamps (see eta())
EPS_CEIL = 1.0 - 1e-9


def eta(e):
    """Curve-of-growth transform eta = ln(-ln(1 - eps)).

    -ln(1 - eps) is the equivalent optical depth, whose log is
    near-linear in the log-uniform index k across both the linear and
    the square-root growth regimes of band transmittance -- the
    transform removes the log singularities that make direct
    polynomial fits of eps(k) / k(eps) ill-behaved at both ends."""
    e = np.clip(e, EPS_FLOOR, EPS_CEIL)
    return np.log(-np.log1p(-e))


def fit_rows(rows: np.ndarray, nk: np.ndarray, deg_f: int, deg_i: int,
             plateau_tol: float = 1e-6, chunk: int = 8192):
    """Fit a batch of log-uniform eps rows in eta space.

    rows: [B, K] float64, nk: [B] valid point counts (>= 2).
    Returns (cf [B, J_f], ci [B, J_i], k_hi [B], ends [B] bool,
    eta0 [B], eta_hi [B], stats).  Forward: eta(x) with
    x = 2 k / k_hi - 1 on the active range (k_hi = plateau start);
    inverse: k(xi) with xi the [-1, 1]-normalized eta.
    """
    B, K = rows.shape
    cf = np.zeros((B, deg_f + 1))
    ci = np.zeros((B, deg_i + 1))
    k_hi_all = np.zeros(B, np.int64)
    ends_all = np.zeros(B, bool)
    eta0_all = np.zeros(B)
    eta_hi_all = np.zeros(B)
    row_f_all = np.zeros(B)    # per-row forward fit error
    row_rt_all = np.zeros(B)   # per-row inverse-roundtrip error
    row_chord = np.zeros(B)    # per-row chord deviation
    max_f = 0.0
    max_rt = 0.0
    max_chord = 0.0
    kk = np.arange(K)[None, :]
    xm_f, P_f = _cheb_nodes_and_proj(deg_f)
    xm_i, P_i = _cheb_nodes_and_proj(deg_i)
    for s in range(0, B, chunk):
        sl = slice(s, min(s + chunk, B))
        r = rows[sl]
        n = nk[sl]
        emax_full = np.take_along_axis(r, n[:, None] - 1, axis=1)
        # active range: k_hi = first index reaching the terminal value
        # (within plateau_tol); beyond it the exact path's bracketing
        # values are equal and eps is pinned to emax
        reach = (r >= emax_full - plateau_tol) & (kk < n[:, None])
        k_hi = np.argmax(reach, axis=1)
        k_hi = np.maximum(k_hi, 1)
        ends = k_hi == (n - 1)          # no plateau: row truly ends
        m = (kk <= k_hi[:, None])
        k_hi_f = k_hi.astype(np.float64)[:, None]
        h = eta(r)

        # forward: sample eta at the shared Chebyshev nodes (fractional
        # k via linear interpolation -- eta is near-linear in k) and
        # project (one GEMM)
        k_q = (xm_f[None, :] + 1) * 0.5 * k_hi_f        # [B, M]
        k0 = np.clip(k_q.astype(np.int64), 0, K - 2)
        fr = k_q - k0
        h0 = np.take_along_axis(h, k0, axis=1)
        h1 = np.take_along_axis(h, k0 + 1, axis=1)
        c_f = (h0 + fr * (h1 - h0)) @ P_f
        eps_fit = -np.expm1(-np.exp(_chebval(
            np.clip(2 * kk / k_hi_f - 1, -1, 1), c_f)))
        err_f = np.abs(np.where(m, eps_fit - r, 0)).max(axis=1)
        max_f = max(max_f, float(err_f.max(initial=0.0)))

        eta0 = h[:, :1]
        eta_hi = np.take_along_axis(h, k_hi[:, None], axis=1)
        dh = eta_hi - eta0
        flat = (np.take_along_axis(r, k_hi[:, None], axis=1)
                - r[:, :1])[:, 0] < 1e-10
        dh_g = np.where(np.abs(dh) > 1e-300, dh, 1.0)

        # inverse: sample k(eta) at the shared nodes by batched
        # monotone interpolation of the (eta, k) data, then project
        # (columns beyond the chunk's widest active range don't
        # participate -- slicing them off keeps the [B, M, N] compare
        # inside _interp_rows small)
        nc = int(min(K, k_hi.max() + 2))
        h_q = eta0 + (xm_i[None, :] + 1) * 0.5 * dh     # [B, M]
        k_at = _interp_rows(h_q, h[:, :nc],
                            (kk[:, :nc] * np.ones((r.shape[0], 1))))
        c_i = k_at @ P_i

        # roundtrip validation at interval midpoints (inversion inputs
        # between grid values, the hard case)
        em = 0.5 * (r[:, :-1] + r[:, 1:])
        mm = m[:, 1:] & ~flat[:, None]
        hm = eta(em)
        xm = np.clip((2 * hm - (eta0 + eta_hi)) / dh_g, -1, 1)
        km = np.clip(_chebval(xm, c_i), 0, k_hi_f)
        e_rt = -np.expm1(-np.exp(
            _chebval(np.clip(2 * km / k_hi_f - 1, -1, 1), c_f)))
        err_rt = np.abs(np.where(mm, e_rt - em, 0)).max(axis=1)
        max_rt = max(max_rt, float(err_rt.max(initial=0.0)))

        # chord deviation: the curve at k+1/2 vs the table kernels'
        # linear-in-u chord at the u-grid midpoint (see TurboStats)
        kmid = kk[:, :-1] + 0.5
        e_curve = -np.expm1(-np.exp(_chebval(
            np.clip(2 * kmid / k_hi_f - 1, -1, 1), c_f)))
        fmid = np.float64(2.0 ** (0.5 * 1.0 / 6.0) - 1.0) \
            / np.float64(2.0 ** (1.0 / 6.0) - 1.0)
        e_chord = r[:, :-1] + fmid * (r[:, 1:] - r[:, :-1])
        err_ch = np.abs(np.where(mm, e_curve - e_chord, 0)).max(axis=1)
        max_chord = max(max_chord, float(err_ch.max(initial=0.0)))

        cf[sl] = c_f
        ci[sl] = c_i
        k_hi_all[sl] = k_hi
        ends_all[sl] = ends
        eta0_all[sl] = eta0[:, 0]
        eta_hi_all[sl] = eta_hi[:, 0]
        row_f_all[sl] = err_f
        row_rt_all[sl] = err_rt
        row_chord[sl] = err_ch
    return (cf, ci, k_hi_all, ends_all, eta0_all, eta_hi_all,
            TurboStats(B, max_f, max_rt, max_chord),
            (row_f_all, row_rt_all, row_chord))


def build_turbo_tables(ft: FastTables, n_chan: int = 1,
                       deg_f: int = 8, deg_i: int = 8,
                       fit_tol: float = 2e-3, chord_tol: float = 3e-3):
    """Pack FastTables into turbo-mode PallasTables.

    Returns (PallasTables | None, TurboStats | None): None when the
    table axes are not channel-uniform (same precondition as
    build_pallas_tables -- the prologue's corner bracketing is shared
    across channels).

    PER-ROW hybrid support (VERDICT r4 item 6): rows whose individual
    fit or chord error exceeds (fit_tol, chord_tol) are marked BAD --
    their ROW_VALID aux value is 2.0 instead of 1.0 (still truthy for
    the okl gating, so the kernel computes the turbo value, but the
    pool kernel accumulates a per-(ray, channel) taint from the > 1.5
    marks and the driver re-evaluates tainted cells through the exact
    table kernel).  The returned TurboStats cover the GOOD rows only;
    ``pt.n_bad`` carries the bad count (0 = today's pure-turbo
    behaviour, bit for bit)."""
    from .ega_fused import (LANE, PallasTables, _round_up,
                            _uniform_axes)

    G, P, T, K, D = ft.eps.shape
    if n_chan > 1 and D % n_chan != 0:
        return None, None
    if P < 2 or T < 2:
        P2, T2 = max(P, 2), max(T, 2)
        pad5 = ((0, 0), (0, P2 - P), (0, T2 - T), (0, 0), (0, 0))
        ft = ft._replace(
            eps=np.pad(ft.eps, pad5),
            nu=np.pad(ft.nu, pad5[:3] + pad5[4:]),
            log2_u0=np.pad(ft.log2_u0, pad5[:3] + pad5[4:]),
            valid=np.pad(ft.valid, pad5[:3] + pad5[4:]),
            t=np.pad(ft.t, pad5[:3] + pad5[4:]),
            nt=np.pad(ft.nt, (pad5[0], pad5[1], pad5[4])),
            p=np.pad(ft.p, (pad5[0], pad5[1], pad5[4])))
        G, P, T, K, D = ft.eps.shape
    ax = _uniform_axes(ft)
    if ax is None:
        return None, None
    p_ax, t_ax, np_u, nt_u = ax

    J_f, J_i = deg_f + 1, deg_i + 1
    A = J_f + J_i
    Q = A + N_TURBO_AUX
    Q_aug = _round_up(Q, 8)
    Ds = max(D, 1) // n_chan if n_chan > 1 else max(D, 1)
    Dp = n_chan * _round_up(Ds, LANE)
    PT = P * T

    eps = ft.eps.reshape(G, PT, K, D)
    nu = ft.nu.reshape(G, PT, D)
    valid = ft.valid.reshape(G, PT, D) & (nu >= 2)
    g_i, c_i_, d_i = np.nonzero(valid)
    rows = eps[g_i, c_i_, :, d_i].astype(np.float64)
    nk = nu[g_i, c_i_, d_i].astype(np.int64)
    (cf, ci, k_hi, ends, eta0_v, eta_hi_v, _stats_all,
     (row_f, row_rt, row_chord)) = fit_rows(rows, nk, deg_f, deg_i)
    bad = (np.maximum(row_f, row_rt) > fit_tol) | (row_chord > chord_tol)
    good = ~bad
    stats = TurboStats(
        rows.shape[0],
        float(row_f[good].max(initial=0.0)),
        float(row_rt[good].max(initial=0.0)),
        float(row_chord[good].max(initial=0.0)))

    # scatter the per-row results into dense [G, PT, ., D] planes
    def plane(vals, j=None):
        out = np.zeros((G, PT, D))
        out[g_i, c_i_, d_i] = vals if j is None else vals[:, j]
        return out

    br = np.arange(rows.shape[0])
    e0_v = rows[:, 0] if rows.size else np.zeros(0)
    e1_v = rows[:, min(1, K - 1)] if rows.size else np.zeros(0)
    e2nd_v = rows[br, np.maximum(k_hi - 1, 0)]
    emax_v = rows[br, np.minimum(k_hi, K - 1)]

    t3 = ft.t.reshape(G, P, T, D)
    packed = np.zeros((G, PT, Q_aug, D), np.float32)
    for j in range(J_f):
        packed[:, :, j, :] = plane(cf, j)
    for j in range(J_i):
        packed[:, :, J_f + j, :] = plane(ci, j)
    packed[:, :, A + 0, :] = ft.log2_u0.reshape(G, PT, D)
    packed[:, :, A + 1, :] = plane(k_hi.astype(np.float64))
    packed[:, :, A + 2, :] = plane(e0_v)
    packed[:, :, A + 3, :] = plane(e1_v)
    packed[:, :, A + 4, :] = plane(e2nd_v)
    packed[:, :, A + 5, :] = plane(emax_v)
    packed[:, :, A + 6, :] = plane(ends.astype(np.float64))
    packed[:, :, A + 7, :] = plane(eta0_v)
    packed[:, :, A + 8, :] = plane(eta_hi_v)
    packed[:, :, A + 9, :] = t3.reshape(G, PT, D)
    packed[:, :, A + 10, :] = np.repeat(
        ft.p.reshape(G, P, 1, D), T, axis=2).reshape(G, PT, D)
    # ROW_VALID: 0 = no table, 1 = good fit, 2 = bad fit (truthy for
    # okl, but > 1.5 feeds the pool kernel's hybrid taint)
    vplane = valid.astype(np.float32)
    vplane[g_i, c_i_, d_i] += bad.astype(np.float32)
    packed[:, :, A + 11, :] = vplane
    l2u0 = ft.log2_u0.reshape(G, PT, D)
    from ...tables import LOG2_RATIO_U
    packed[:, :, A + 12, :] = np.exp2(l2u0)
    packed[:, :, A + 13, :] = np.exp2(
        l2u0 + plane(k_hi.astype(np.float64)) * LOG2_RATIO_U)
    # precomputed corner-evaluation slopes (guards replicated exactly
    # from the former in-kernel forms, _turbo_corner pre-round-5):
    #   xi = clip(eta_t * xi_a + xi_b)    [was (2 eta_t - (eta0+etah))/dh]
    #   u_c(lo)  = u0 + (t - e0) * s_lo_inv
    #   u_c(hi)  = u_n2 + (t - e2nd) * s_hi_inv
    #   eps(lo)  = e0 + (u - u0) * s_lo_fwd
    #   eps(hi)  = emax + (u - u_n1) * s_hi_fwd      [ends folded in]
    #   y = clip(k_cl * ky - 1)
    dh_v = eta_hi_v - eta0_v
    dh_g = np.where(np.abs(dh_v) > 1e-30, dh_v, 1.0)
    RATIO = 2.0 ** LOG2_RATIO_U
    u0_v = np.exp2(ft.log2_u0.reshape(G, PT, D)[g_i, c_i_, d_i])
    u1_v = u0_v * RATIO
    u_n1_v = u0_v * RATIO ** k_hi.astype(np.float64)
    u_n2_v = u_n1_v / RATIO
    d01_v = e1_v - e0_v
    d01_g = np.where(d01_v == 0, 1.0, d01_v)
    d2_v = emax_v - e2nd_v
    d2_g = np.where(d2_v == 0, 1.0, d2_v)
    packed[:, :, A + 14, :] = plane(2.0 / dh_g)
    packed[:, :, A + 15, :] = plane(-(eta0_v + eta_hi_v) / dh_g)
    packed[:, :, A + 16, :] = plane((u1_v - u0_v) / d01_g)
    packed[:, :, A + 17, :] = plane((u_n1_v - u_n2_v) / d2_g)
    packed[:, :, A + 18, :] = plane(d01_v / (u1_v - u0_v))
    packed[:, :, A + 19, :] = plane(
        d2_v / (u_n1_v - u_n2_v) * ends.astype(np.float64))
    packed[:, :, A + 20, :] = plane(
        2.0 / np.maximum(k_hi.astype(np.float64), 1.0))

    from .ega_fused import shard_lanes
    import jax.numpy as jnp
    eps_aug = shard_lanes(packed, n_chan).astype(np.float32)
    chan_mask = shard_lanes((ft.np_ >= 2).astype(np.float32), n_chan)
    S = ft.sr.shape[0]
    sr = shard_lanes(np.asarray(ft.sr, np.float32), n_chan)

    pt = PallasTables(
        eps_aug=jnp.asarray(eps_aug), sr=jnp.asarray(sr),
        chan_mask=jnp.asarray(chan_mask),
        p_ax=jnp.asarray(p_ax), t_ax=jnp.asarray(t_ax),
        np_u=jnp.asarray(np_u), nt_u=jnp.asarray(nt_u),
        k_rows=K, d_true=Ds, n_chan=n_chan,
        mode="turbo", deg_f=deg_f, deg_i=deg_i,
        n_bad=int(bad.sum()))
    return pt, stats
