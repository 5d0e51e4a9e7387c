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


def test_pallas_trans_stream(toy):
    """Trans pileups via the interval-product tile predicate must stream
    through the quad kernel (VERDICT r3 #8) and match XLA."""
    clr, dense, weights = toy

    def run(backend):
        cc = CoordCreator(
            toy_features(), BINSIZE, features_format="bed",
            flank=3 * BINSIZE, trans=True, nshifts=1, seed=0,
        )
        pu = PileUpper(
            clr, cc, view_df=toy_regions(), backend=backend, expected=False,
            control=True,
        )
        out = pu.pileupsWithControl()
        if backend == "pallas-interpret":
            assert getattr(pu, "_stream_regions", 0) > 0
            assert getattr(pu, "_stream_aborts", 0) == 0
        return out

    _compare(run("pallas-interpret"), run("xla"))


def test_pallas_bedpe_stream(toy):
    """Bedpe rows stream through the rectangle tile predicate."""
    clr, dense, weights = toy
    feats = pd.DataFrame(
        {
            "chrom1": ["chr1", "chr1", "chr1"],
            "start1": [102_000_000, 104_000_000, 108_000_000],
            "end1": [102_500_000, 104_500_000, 108_500_000],
            "chrom2": ["chr1", "chr1", "chr1"],
            "start2": [105_000_000, 109_000_000, 112_000_000],
            "end2": [105_500_000, 109_500_000, 112_500_000],
        }
    )

    def run(backend):
        cc = CoordCreator(
            feats, BINSIZE, features_format="bedpe",
            flank=2 * BINSIZE, mindist=0, nshifts=2, seed=0,
        )
        pu = PileUpper(
            clr, cc, view_df=toy_regions(), backend=backend, expected=False,
            control=True,
        )
        out = pu.pileupsWithControl()
        if backend == "pallas-interpret":
            assert getattr(pu, "_stream_regions", 0) > 0
            assert getattr(pu, "_stream_aborts", 0) == 0
        return out

    _compare(run("pallas-interpret"), run("xla"))


def test_pallas_stream_predicate_abort(tmp_path):
    """A modify func that moves coordinates outside the tile predicate must
    abort the stream (collected path) and still be correct. Needs a region
    spanning many tiles so a shift can actually escape the band."""
    binsize = 100_000
    clr, dense, weights = make_toy_cooler(
        str(tmp_path / "abort.cool"),
        chromsizes={"chrZ": 300_000_000},
        binsize=binsize,
        seed=17,
    )
    rng = np.random.default_rng(3)
    starts = np.sort(
        rng.choice(np.arange(20, 2900), 30, replace=False)
    ) * binsize
    feats = pd.DataFrame(
        {"chrom": "chrZ", "start": starts, "end": starts + binsize}
    )

    def shift_away(frame):
        frame = frame.copy()
        sel = np.arange(len(frame)) % 2 == 1
        for c in ("stBin2", "endBin2"):
            frame.loc[sel, c] = frame.loc[sel, c] - 400
        for c in ("start2", "end2", "center2"):
            frame.loc[sel, c] = frame.loc[sel, c] - 400 * binsize
        return frame[frame["stBin2"] >= 0].reset_index(drop=True)

    def run(backend):
        cc = CoordCreator(
            feats, binsize, features_format="bed",
            flank=3 * binsize, mindist=0, maxdist=50 * binsize, seed=0,
        )
        pu = PileUpper(clr, cc, backend=backend, expected=False)
        out = pu.pileupsWithControl(modify_2Dintervals_func=shift_away)
        if backend == "pallas-interpret":
            assert getattr(pu, "_stream_aborts", 0) > 0
        return out

    _compare(run("pallas-interpret"), run("xla"))


def test_pallas_stripes_with_controls(toy):
    """store_stripes + shifted controls: stripe planes/coordinates exist
    only for ROI snips (control planes never reach the output, reference
    coolpup.py:1533–1625) — ROI-filtered identically on the pallas and XLA
    paths, and the output stripes row count equals the ROI n."""
    clr, dense, weights = toy

    def run(backend):
        cc = CoordCreator(
            toy_features(), BINSIZE, features_format="bed",
            flank=3 * BINSIZE, mindist=0, nshifts=2, seed=0,
        )
        pu = PileUpper(
            clr, cc, view_df=toy_regions(), backend=backend,
            expected=False, control=True, store_stripes=True,
        )
        return pu.pileupsWithControl()

    a = run("pallas-interpret").set_index("group").loc["all"]
    b = run("xla").set_index("group").loc["all"]
    assert a["n"] == b["n"] > 0
    ha = np.asarray(a["horizontal_stripe"], float)
    hb = np.asarray(b["horizontal_stripe"], float)
    assert ha.shape == hb.shape == (a["n"], ha.shape[1])
    np.testing.assert_allclose(
        np.nan_to_num(ha), np.nan_to_num(hb), rtol=1e-4, atol=1e-7
    )
    ca = np.asarray(a["coordinates"], dtype=object)
    cb = np.asarray(b["coordinates"], dtype=object)
    assert ca.shape == cb.shape == (a["n"], 6)
    assert (ca == cb).all()


def test_tile_f16_wire_engine_parity(toy):
    """Engine-level f16 tile wire: force the mode past the interpret gate
    (the gate keeps CPU goldens exact; hardware runs it by default) and
    check the full pileupsWithControl output at f16 tolerance."""
    clr, dense, weights = toy
    pu32 = _run(clr, "pallas-interpret", expected=False)
    want = pu32.pileupsWithControl()
    pu16 = _run(clr, "pallas-interpret", expected=False)
    pu16._tile_f16_mode = lambda: "lossy"  # balanced toy cooler values
    got = pu16.pileupsWithControl()
    a = want.set_index("group").loc["all"]
    b = got.set_index("group").loc["all"]
    assert a["n"] == b["n"] > 0
    np.testing.assert_array_equal(a["num"], b["num"])
    fin = np.isfinite(np.asarray(a["data"], float))
    np.testing.assert_allclose(
        np.asarray(b["data"], float)[fin],
        np.asarray(a["data"], float)[fin],
        rtol=2e-3, atol=1e-5,
    )
