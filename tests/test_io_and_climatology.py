"""Golden tests: config parsing, ASCII I/O, climatology and geometry
generators must reproduce the committed reference example files byte-for-byte
(the reference's own integration-test spine, example/*/run.sh)."""
import filecmp

import numpy as np
import pytest

from jurassic_tpu.climatology import climatology
from jurassic_tpu.config import read_ctl
from jurassic_tpu.io_tab import Atm, read_atm, read_obs, write_atm, write_obs
from jurassic_tpu.models.geometry_gen import limb_geometry, nadir_geometry


def _clim_atm(ctl, z0=0.0, z1=90.0, dz=1.0):
    z = np.arange(z0, z1 + dz / 2, dz)
    atm = Atm.zeros(z.size, ctl.ng, ctl.nw)
    atm.z[:] = z
    return climatology(ctl, atm)


def test_limb_ctl_parse(ref_example):
    ctl = read_ctl(["prog", str(ref_example / "limb/limb.ctl")], verbose=False)
    assert ctl.ng == 5
    assert ctl.emitter == ["CO2", "H2O", "O3", "F11", "CCl4"]
    assert ctl.nd == 2 and ctl.nu == [792.0, 832.0]
    assert ctl.ctm_n2 == 0 and ctl.ctm_o2 == 0  # auto-disabled, out of band
    assert ctl.ctm_co2 == 1 and ctl.ctm_h2o == 1


def test_ctl_argv_override(ref_example):
    ctl = read_ctl(["prog", str(ref_example / "limb/limb.ctl"),
                    "CHECKMODE", "1", "RAYDS", "5"], verbose=False)
    assert ctl.checkmode == 1 and ctl.rayds == 5.0


def test_limb_atm_golden(tmp_path, ref_example):
    ctl = read_ctl(["prog", str(ref_example / "limb/limb.ctl")], verbose=False)
    write_atm(tmp_path / "atm.tab", ctl, _clim_atm(ctl))
    assert filecmp.cmp(tmp_path / "atm.tab", ref_example / "limb/atm.tab",
                       shallow=False)


def test_limb_obs_golden(tmp_path, ref_example):
    ctl = read_ctl(["prog", str(ref_example / "limb/limb.ctl")], verbose=False)
    obs = limb_geometry(z0=3, z1=68, dz=1.0, nd=ctl.nd)
    write_obs(tmp_path / "obs.tab", ctl, obs)
    assert filecmp.cmp(tmp_path / "obs.tab", ref_example / "limb/obs.tab",
                       shallow=False)


def test_nadir_goldens(tmp_path, ref_example):
    ctl = read_ctl(["prog", str(ref_example / "nadir/nadir.ctl")], verbose=False)
    assert ctl.write_bbt == 1
    write_atm(tmp_path / "atm.tab", ctl, _clim_atm(ctl))
    assert filecmp.cmp(tmp_path / "atm.tab", ref_example / "nadir/atm.tab",
                       shallow=False)
    obs = nadir_geometry(t1=10, nd=ctl.nd)
    write_obs(tmp_path / "obs.tab", ctl, obs)
    assert filecmp.cmp(tmp_path / "obs.tab", ref_example / "nadir/obs.tab",
                       shallow=False)


def test_io_roundtrip(tmp_path, ref_example):
    ctl = read_ctl(["prog", str(ref_example / "limb/limb.ctl")], verbose=False)
    atm = read_atm(ref_example / "limb/atm.tab", ctl)
    assert atm.npts == 91
    write_atm(tmp_path / "atm.tab", ctl, atm)
    atm2 = read_atm(tmp_path / "atm.tab", ctl)
    np.testing.assert_array_equal(atm.p, atm2.p)
    np.testing.assert_array_equal(atm.q, atm2.q)

    obs = read_obs(ref_example / "limb/rad.org", ctl)
    assert obs.nr == 66
    write_obs(tmp_path / "obs.tab", ctl, obs)
    obs2 = read_obs(tmp_path / "obs.tab", ctl)
    np.testing.assert_array_equal(obs.rad, obs2.rad)


def test_rfm_spectrum_roundtrip(tmp_path):
    """read_rfm_spec / read_obs_rfm (jurassic.c:1071-1131): synthetic
    RFM .asc file, filter convolution against a NumPy reference."""
    import numpy as np
    from jurassic_tpu.io_tab import read_obs_rfm, read_rfm_spec
    npts, nu0, nu1 = 101, 790.0, 800.0
    rad = 1e-3 * (1 + np.sin(np.linspace(0, 6, npts)))
    f = tmp_path / "rfm_10000.asc"
    body = "\n".join(" ".join(f"{v:.6e}" for v in rad[i:i + 5])
                     for i in range(0, npts, 5))
    f.write_text("! RFM\n! header\n! lines\n"
                 f"{npts} {nu0} 0.1 {nu1}\n{body}\n")
    nu, r = read_rfm_spec(f)
    assert r.size == npts and nu[0] == nu0 and nu[-1] == nu1
    np.testing.assert_allclose(r, rad, rtol=1e-6)
    # boxcar filter over the middle of the band
    fgrid = np.linspace(792.0, 798.0, 7)
    fvals = np.ones(7)
    val = read_obs_rfm(str(tmp_path / "rfm"), 10.0, fgrid, fvals)
    sel = (nu >= 792.0) & (nu <= 798.0)
    np.testing.assert_allclose(val, rad[sel].mean(), rtol=1e-6)
    # z just below a stored level resolves to the next millimeter up
    val2 = read_obs_rfm(str(tmp_path / "rfm"), 9.999, fgrid, fvals)
    assert val2 == val


def test_atm_rfm_roundtrip(tmp_path, ref_example):
    """write_atm_rfm (jurassic.c:1280-1297): the RFM driver-format
    atmosphere writer; block layout checked textually and through the
    companion reader round trip (q in ppmv, altitudes/pressures/
    temperatures verbatim)."""
    from jurassic_tpu.io_tab import read_atm_rfm, write_atm_rfm
    ctl = read_ctl(["prog", str(ref_example / "limb/limb.ctl")],
                   verbose=False)
    atm = read_atm(ref_example / "limb/atm.tab", ctl)
    f = tmp_path / "atm.rfm"
    write_atm_rfm(f, ctl, atm)
    lines = f.read_text().splitlines()
    assert lines[0] == str(atm.npts)
    assert lines[1] == "*HGT [km]"
    assert lines[-1] == "*END"
    tags = [ln for ln in lines if ln.startswith("*")]
    assert tags == (["*HGT [km]", "*PRE [mb]", "*TEM [K]"]
                    + [f"*{g} [ppmv]" for g in ctl.emitter[:ctl.ng]]
                    + ["*END"])
    atm2 = read_atm_rfm(f, ctl)
    assert atm2.npts == atm.npts
    np.testing.assert_allclose(atm2.z, atm.z, rtol=1e-6)
    np.testing.assert_allclose(atm2.p, atm.p, rtol=1e-6)
    np.testing.assert_allclose(atm2.t, atm.t, rtol=1e-6)
    np.testing.assert_allclose(atm2.q, atm.q, rtol=1e-6, atol=1e-30)
