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
