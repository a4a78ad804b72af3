"""Reference-capacity gas count golden (VERDICT r4 item 2).

The reference sizes NG = 30 (jurassic.h:138-145) and its refspec
example drives all 30 emitters (example/refspec/template.ctl:10-39,
run.sh:16-29); every round-4 kernel test ran G <= 5.  This case runs
the EXACT refspec emitter list -- 28 gases with synthetic analytic
tables plus the table-less N2/O2 emitters (transparent, the reference's
missing-table behaviour, jr_common.h:240-246) -- through every kernel
path against the locally compiled C oracle's rad.tab
(tools/ref_build; tables regenerate deterministically from
tools/make_synthetic_tables.py, which produced the oracle's inputs).

The turbo/pool path at G = 30 exercises the round-5 capacity design:
the flat row-slot pool (63 MB at full lanes) dispatches through the
manual whole-pool-DMA branch or channel-blocked grid instead of the
double-buffered pipeline.
"""
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from jurassic_tpu.config import read_ctl
from jurassic_tpu.forward import ForwardModel
from jurassic_tpu.io_tab import read_atm, read_obs

GOLD = Path(__file__).parent / "goldens"
TOOLS = Path(__file__).parent.parent / "tools"


@pytest.fixture(scope="module")
def gas30_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("gas30")
    src = GOLD / "gas30"
    for f in src.iterdir():
        shutil.copy(f, d / f.name)
    ctl = read_ctl(["x", str(d / "gas30.ctl"), "o", "a", "r"],
                   verbose=False)
    gases = [g for g in ctl.emitter[:ctl.ng] if g not in ("N2", "O2")]
    subprocess.run(
        [sys.executable, str(TOOLS / "make_synthetic_tables.py"), str(d),
         "--tblbase", "synth", "--gases", *gases,
         "--channels", *[f"{x:.4f}" for x in ctl.nu]],
        check=True, stdout=subprocess.DEVNULL)
    return d


def run_dir(d: Path, kernel: str):
    ctl_file = d / "gas30.ctl"
    ctl = read_ctl(["formod", str(ctl_file), "obs.tab", "atm.tab", "rad"],
                   verbose=False)
    ctl.kernel = kernel
    ctl.tblbase = str(d / "synth")
    obs = read_obs(d / "obs.tab", ctl)
    atm = read_atm(d / "atm.tab", ctl)
    fm = ForwardModel(ctl, directory=str(d))
    fm.formod(atm, obs)
    ref = np.loadtxt(d / "rad.tab")
    return ctl, fm, obs, ref


def test_gas30_exact_matches_reference(gas30_dir):
    ctl, _, obs, ref = run_dir(gas30_dir, "exact")
    assert ctl.ng == 30
    nd = ctl.nd
    rad_ref = ref[:, 10:10 + nd]
    tau_ref = ref[:, 10 + nd:10 + 2 * nd]
    # per-channel scale: the 2400/cm channel is orders dimmer
    scale = np.abs(rad_ref).max(axis=0)
    assert (np.abs(obs.rad - rad_ref).max(axis=0) <= 1e-5 * scale).all()
    assert np.abs(obs.tau - tau_ref).max() <= 5e-6


def test_gas30_turbo_matches_reference(gas30_dir):
    """The turbo production path at reference gas capacity must hit
    the turbo golden bar (5e-3: u-grid chord discretization, see
    turbo_fit).  The golden's 1-km-spaced scan on the minimal table
    grid puts a group's 8 rays in up to 8 distinct (p, T) cells at
    late segments (physical, not a bug), so the optimistic pool
    dispatch may legitimately take its documented combo-capacity
    fallback to the group kernel -- accuracy is identical either
    way."""
    ctl, fm, obs, ref = run_dir(gas30_dir, "turbo")
    assert fm.kernel_mode == "pallas" and fm.pallas_tbl.mode == "turbo"
    assert fm.last_variant in ("pool", "group")
    nd = ctl.nd
    rad_ref = ref[:, 10:10 + nd]
    tau_ref = ref[:, 10 + nd:10 + 2 * nd]
    scale = np.abs(rad_ref).max(axis=0)
    assert (np.abs(obs.rad - rad_ref).max(axis=0) <= 5e-3 * scale).all()
    assert np.abs(obs.tau - tau_ref).max() <= 5e-3


def test_gas30_dense_scan_dispatches_pool(gas30_dir):
    """On a DENSE scan (0.1-km tangent spacing, the production regime
    the bench measures) a group's rays share cells and the POOL
    kernel must dispatch at G = 30 -- the round-5 capacity design
    (flat row-slot pool, manual whole-pool DMA / channel-blocked
    grid).  Output must match the group variant bit for bit."""
    import dataclasses as dc

    from jurassic_tpu.io_tab import Obs
    from jurassic_tpu.models.geometry_gen import limb_geometry

    d = gas30_dir
    ctl = read_ctl(["formod", str(d / "gas30.ctl"), "o", "a", "r"],
                   verbose=False)
    ctl.kernel = "turbo"
    ctl.tblbase = str(d / "synth")
    atm = read_atm(d / "atm.tab", ctl)
    obs = limb_geometry(z0=20.0, z1=21.5, dz=0.1, nd=ctl.nd)
    fm = ForwardModel(ctl, directory=str(d))
    o1 = Obs(**{f.name: np.array(getattr(obs, f.name))
                for f in dc.fields(Obs)})
    fm.formod(atm, o1)
    assert fm.last_variant == "pool"
    import os
    os.environ["JURASSIC_PALLAS_VARIANT"] = "group"
    try:
        o2 = Obs(**{f.name: np.array(getattr(obs, f.name))
                    for f in dc.fields(Obs)})
        fm.formod(atm, o2)
    finally:
        del os.environ["JURASSIC_PALLAS_VARIANT"]
    np.testing.assert_array_equal(o1.rad, o2.rad)
    np.testing.assert_array_equal(o1.tau, o2.tau)
