"""Native C table parser (jurassic_tpu/native/tabparse.c) vs the
pure-Python parser: identical dense output on real golden tables,
including the non-monotone-overwrite rule (jurassic.c:355-394)."""
from pathlib import Path

import numpy as np
import pytest

from jurassic_tpu import native
from jurassic_tpu.tables import _blocks_to_dense, _parse_tab_file

GOLD = Path(__file__).parent / "goldens"


def _all_golden_tabs():
    return sorted(GOLD.glob("*/*_*.tab"))


@pytest.mark.skipif(not native.available(), reason="no C compiler")
@pytest.mark.parametrize("tab", _all_golden_tabs(),
                         ids=lambda p: f"{p.parent.name}/{p.name}")
def test_native_matches_python(tab):
    d_nat = native.parse_tab_file(tab)
    blocks = _parse_tab_file(tab)
    if not blocks:
        assert d_nat["np"] == 0
        return
    d_py = _blocks_to_dense(blocks)
    assert d_nat["np"] == d_py["np"]
    np.testing.assert_array_equal(d_nat["nt"], d_py["nt"])
    np.testing.assert_array_equal(d_nat["nu"], d_py["nu"])
    np.testing.assert_array_equal(d_nat["p"], d_py["p"])
    np.testing.assert_array_equal(d_nat["t"], d_py["t"])
    np.testing.assert_array_equal(d_nat["u"], d_py["u"])
    np.testing.assert_array_equal(d_nat["eps"], d_py["eps"])


@pytest.mark.skipif(not native.available(), reason="no C compiler")
def test_overwrite_rule(tmp_path):
    """Non-monotone entries overwrite the previous one (the IDX_U rule,
    jurassic.c:369-384) in both parsers."""
    f = tmp_path / "t.tab"
    f.write_text(
        "1.0 200.0 1e15 0.1\n"
        "1.0 200.0 2e15 0.05\n"      # eps decreases -> overwrite
        "1.0 200.0 3e15 0.2\n"       # monotone again -> append
        "1.0 210.0 1e15 0.3\n"       # new T block: first entry appends
        "2.0 200.0 1e15 0.01\n")     # new p block
    d_nat = native.parse_tab_file(f)
    d_py = _blocks_to_dense(_parse_tab_file(f))
    for k in ("np", "nt", "nu", "p", "t", "u", "eps"):
        np.testing.assert_array_equal(d_nat[k], d_py[k])
    assert d_nat["np"] == 2
    assert d_nat["nu"][0, 0] == 2                    # overwrite collapsed
    np.testing.assert_allclose(d_nat["eps"][0, 0, :2], [0.05, 0.2])
