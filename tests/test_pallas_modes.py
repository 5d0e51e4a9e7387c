"""Engine-level parity of the extended pallas path (interpret mode on CPU)
against the XLA path: coverage_norm, expected emission (ooe=False), stripes,
and the blocked large-G branch all ride the quad kernel now (VERDICT round-1
item 3: no mode cliff)."""

import numpy as np
import pandas as pd
import pytest

from coolpuppy_tpu import CoordCreator, PileUpper

from fixtures import make_toy_cooler, toy_expected, toy_features, toy_regions

BINSIZE = 1_000_000


@pytest.fixture(scope="module")
def toy(tmp_path_factory):
    path = tmp_path_factory.mktemp("cool") / "toy_pm.cool"
    return make_toy_cooler(str(path), seed=13)


def _run(clr, backend, **kw):
    defaults = dict(expected=False, control=False)
    defaults.update(kw)
    cc_kw = dict(
        features_format="bed",
        flank=3 * BINSIZE,
        nshifts=defaults.pop("nshifts", 0),
        mindist=0,
        seed=0,
    )
    cc = CoordCreator(toy_features(), BINSIZE, **cc_kw)
    pu = PileUpper(
        clr, cc, view_df=toy_regions(), backend=backend, **defaults
    )
    block = defaults_block = kw.pop("_block_groups", None)
    if defaults_block:
        pu._pallas_block_groups = block
    return pu


def _compare(pups_a, pups_b, stripes=False):
    a = pups_a.set_index("group").loc["all"]
    b = pups_b.set_index("group").loc["all"]
    assert a["n"] == b["n"] > 0
    np.testing.assert_allclose(
        np.nan_to_num(a["data"], posinf=1e30),
        np.nan_to_num(b["data"], posinf=1e30),
        rtol=1e-4,
        atol=1e-7,
    )
    np.testing.assert_array_equal(a["num"], b["num"])
    if stripes:
        np.testing.assert_allclose(
            np.nan_to_num(np.asarray(a["vertical_stripe"], float)),
            np.nan_to_num(np.asarray(b["vertical_stripe"], float)),
            rtol=1e-4,
            atol=1e-7,
        )


def test_pallas_coverage_norm(toy):
    clr, dense, weights = toy
    kw = dict(coverage_norm=True, clr_weight_name=None)
    via_pallas = _run(clr, "pallas-interpret", **kw).pileupsWithControl()
    via_xla = _run(clr, "xla", **kw).pileupsWithControl()
    _compare(via_pallas, via_xla)


def test_pallas_expected_emission(toy):
    """expected without ooe: the exp channel comes from the toeplitz
    histogram on the pallas path."""
    clr, dense, weights = toy
    view = toy_regions()
    exp = toy_expected(clr, dense, view, weights=weights)
    kw = dict(expected=exp, ooe=False)
    via_pallas = _run(clr, "pallas-interpret", **kw).pileupsWithControl()
    via_xla = _run(clr, "xla", **kw).pileupsWithControl()
    _compare(via_pallas, via_xla)


def test_pallas_stripes(toy):
    clr, dense, weights = toy
    kw = dict(store_stripes=True, nshifts=1, control=True)
    via_pallas = _run(clr, "pallas-interpret", **kw).pileupsWithControl()
    via_xla = _run(clr, "xla", **kw).pileupsWithControl()
    _compare(via_pallas, via_xla, stripes=True)


def test_pallas_blocked_large_g(toy):
    """Force the cid-sorted group-block branch with a tiny block size: the
    by-strand groups (> block size) must match the XLA path exactly."""
    clr, dense, weights = toy
    pu_p = _run(clr, "pallas-interpret")
    pu_p._pallas_block_groups = 2
    via_pallas = pu_p.pileupsByStrandWithControl()
    via_xla = _run(clr, "xla").pileupsByStrandWithControl()
    a = via_pallas.set_index("orientation")
    b = via_xla.set_index("orientation")
    assert list(a.index) == list(b.index)
    for ori in a.index:
        assert a.loc[ori, "n"] == b.loc[ori, "n"]
        np.testing.assert_allclose(
            np.nan_to_num(a.loc[ori, "data"]),
            np.nan_to_num(b.loc[ori, "data"]),
            rtol=1e-4,
            atol=1e-7,
        )
