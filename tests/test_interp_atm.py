"""Atmosphere interpolation: IP=1/2/3 (intpol_atm_*, jurassic.c:685-804)
and the IP=2/3 host pencil forward path."""
import numpy as np
import pytest

from jurassic_tpu.forward import ForwardModel
from jurassic_tpu.interp_atm import (intpol_atm_1d, intpol_atm_2d,
                                     intpol_atm_3d, split_profiles)
from jurassic_tpu.io_tab import Atm
from jurassic_tpu.models.synthetic import (limb_workload, synthetic_atm,
                                           synthetic_ctl,
                                           synthetic_fast_tables)


def _track_atm(ctl, nlat=3):
    """Satellite track: nlat profiles at different latitudes, linear
    temperature gradient across the track so blending is observable."""
    base = synthetic_atm(ctl)
    n = base.npts
    atm = Atm.zeros(n * nlat, ctl.ng, ctl.nw)
    for j in range(nlat):
        sl = slice(j * n, (j + 1) * n)
        atm.z[sl] = base.z
        atm.lat[sl] = -4.0 + 4.0 * j
        atm.lon[sl] = 0.0
        atm.p[sl] = base.p
        atm.t[sl] = base.t + 5.0 * j
        atm.q[:, sl] = base.q
        atm.k[:, sl] = base.k
    return atm


def test_split_profiles_and_2d_blend():
    ctl = synthetic_ctl(ng=2, nd=3)
    atm = _track_atm(ctl)
    tp = split_profiles(atm)
    assert tp.idx.tolist() == [0, 46, 92]
    # on a profile anchor: 1D result of that profile exactly (r = 0)
    p2, t2, q2, k2 = intpol_atm_2d(ctl, atm, 20.0, 0.0, 0.0, tp)
    p1, t1, q1, k1 = intpol_atm_1d(ctl, atm, int(tp.idx[1]),
                                   int(tp.nz[1]), 20.0)
    np.testing.assert_allclose(t2[0], t1, rtol=1e-12)
    np.testing.assert_allclose(p2[0], p1, rtol=1e-12)
    # midway between profiles 0 and 1: r = 0.5 (equal chord distances)
    pm, tm, qm, km = intpol_atm_2d(ctl, atm, 20.0, 0.0, -2.0, tp)
    t0 = intpol_atm_1d(ctl, atm, 0, int(tp.nz[0]), 20.0)[1]
    assert abs(tm[0] - 0.5 * (t0 + t1)) < 1e-6


def test_2d_rejects_bad_ordering():
    ctl = synthetic_ctl(ng=2, nd=3)
    atm = _track_atm(ctl)
    atm.lat[:] = np.arange(atm.npts) * 0.001  # every point its own profile
    with pytest.raises(ValueError, match="Cannot identify profiles"):
        split_profiles(atm)


def test_3d_weighting():
    ctl = synthetic_ctl(ng=2, nd=3)
    ctl.cz, ctl.cx = 2.0, 300.0
    atm = _track_atm(ctl)
    # exactly on a grid point: weights concentrate there; the reference
    # weighting is an average, so check it reproduces a constant field
    atm.t[:] = 222.0
    p, t, q, k = intpol_atm_3d(ctl, atm, 20.0, 0.0, 0.0)
    np.testing.assert_allclose(t[0], 222.0, rtol=1e-12)
    # far outside every influence radius -> NaN (jurassic.c:800-803)
    p, t, q, k = intpol_atm_3d(ctl, atm, 20.0, 120.0, 60.0)
    assert np.isnan(t[0]) and np.isnan(p[0])


@pytest.mark.parametrize("ip", [2, 3])
def test_pencil_formod_matches_1d_on_uniform_track(ip):
    """With all track profiles identical, IP=2/3 radiances must match
    the IP=1 forward model (the interpolators reduce to the vertical
    profile)."""
    ctl = synthetic_ctl(ng=3, nd=5)
    ctl.nlos = 60
    ctl.rayds = 50.0
    ctl.raydz = 5.0
    ctl.refrac = 0          # pencil path requires straight rays
    ft = synthetic_fast_tables(ctl, n_p=8, n_t=5, n_k=48)
    obs = limb_workload(ctl, 4)

    atm1 = synthetic_atm(ctl)
    m1 = ForwardModel(ctl, fast_tables=ft)
    o1 = obs.copy()
    m1.formod(atm1, o1)

    ctl.ip = ip
    # cx large enough that every LOS point sees the track profiles
    # (limb paths span ~2500 km horizontally); cz just above the level
    # spacing so the IP=3 average does not smooth the profile too much
    ctl.cz, ctl.cx = 2.0, 8000.0
    atm = _track_atm(ctl)
    atm.t[:] = np.tile(atm1.t, 3)      # identical profiles
    m2 = ForwardModel(ctl, fast_tables=ft)
    o2 = obs.copy()
    m2.formod(atm, o2)

    scale = np.abs(o1.rad).max()
    # IP=3 averages over the vertical influence radius (cz), which
    # smooths the profile; IP=2 must match the 1D path closely.
    tol = 2e-3 if ip == 2 else 0.1
    assert np.abs(o2.rad - o1.rad).max() <= tol * scale
