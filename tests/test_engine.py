"""Engine integration tests: reference-count parity on the toy setup
(reference tests/test_coolpup.py) + numerical parity against the numpy oracle."""

import numpy as np
import pandas as pd
import pytest

from coolpuppy_tpu import CoordCreator, PileUpper, pileup
from fixtures import make_toy_cooler, toy_features, toy_regions, toy_expected

from oracle import oracle_snip, oracle_accumulate


@pytest.fixture(scope="module")
def toy(tmp_path_factory):
    path = tmp_path_factory.mktemp("cool") / "toy.cool"
    return make_toy_cooler(str(path), seed=1)


@pytest.fixture(scope="module")
def toy_exp(toy):
    clr, dense, weights = toy
    return toy_expected(clr, dense, toy_regions(), weights=weights)


def make_cc(**kwargs):
    defaults = dict(
        features_format="bed", local=False, flank=2_000_000, mindist=0
    )
    defaults.update(kwargs)
    return CoordCreator(toy_features(), 1_000_000, **defaults)


def test_bystrand_pileups_with_expected(toy, toy_exp):
    """Reference test_coolpup.py:19–72 counterpart."""
    clr, dense, weights = toy
    regions = toy_regions()
    cc = make_cc()
    # ooe=True
    pu = PileUpper(clr, cc, expected=toy_exp, view_df=regions, ooe=True)
    pup = pu.pileupsByStrandWithControl()
    assert np.all(pup.sort_values("orientation")["n"].values == [1, 3, 1, 1, 6])
    # ooe=False
    pu = PileUpper(clr, cc, expected=toy_exp, view_df=regions, ooe=False)
    pup = pu.pileupsByStrandWithControl()
    assert np.all(pup.sort_values("orientation")["n"].values == [1, 3, 1, 1, 6])
    # no view, no expected
    pu = PileUpper(clr, cc, expected=False, ooe=False)
    pup = pu.pileupsByStrandWithControl()
    assert np.all(pup.sort_values("orientation")["n"].values == [1, 3, 1, 1, 6])
    # unbalanced + coverage_norm
    pu = PileUpper(
        clr,
        cc,
        expected=False,
        ooe=False,
        clr_weight_name=None,
        coverage_norm=True,
    )
    pup = pu.pileupsByStrandWithControl()
    assert np.all(pup.sort_values("orientation")["n"].values == [1, 3, 1, 1, 6])
    # ignore_group_order
    pu = PileUpper(clr, cc, expected=False, ooe=False, control=False)
    pup = pu.pileupsByStrandWithControl(ignore_group_order=True)
    assert not pup[pup["orientation"] == "+-"].empty
    assert pup[pup["orientation"] == "-+"].empty
    assert np.all(pup.sort_values("orientation")["n"].values == [1, 4, 1, 6])


def test_bystrand_pileups_with_controls(toy):
    """Reference test_coolpup.py:75–97 counterpart."""
    clr, dense, weights = toy
    cc = make_cc(seed=0)
    pu = PileUpper(clr, cc, expected=False, view_df=toy_regions(), control=True)
    pup = pu.pileupsByStrandWithControl()
    assert np.all(pup.sort_values("orientation")["n"].values == [1, 3, 1, 1, 6])


def test_bystrand_bydistance_pileups_with_controls(toy):
    """Reference test_coolpup.py:100–141 counterpart."""
    clr, dense, weights = toy
    pup = pileup(
        clr=clr,
        features=toy_features(),
        features_format="bed",
        view_df=toy_regions(),
        mindist=0,
        flank=2_000_000,
        nshifts=1,
        by_strand=True,
        by_distance=True,
        seed=0,
    )
    assert np.all(
        pup.sort_values(["orientation", "distance_band"])["n"].values
        == [1, 2, 1, 1, 1, 6]
    )
    distance_bins = np.append([0], 50000 * 2 ** np.arange(30))
    pup = pileup(
        clr=clr,
        features=toy_features(),
        features_format="bed",
        view_df=toy_regions(),
        mindist=0,
        flank=2_000_000,
        nshifts=1,
        by_strand=True,
        by_distance=distance_bins,
        seed=0,
    )
    assert np.all(
        pup.sort_values(["orientation", "distance_band"])["n"].values
        == [1, 2, 1, 1, 1, 6]
    )


def test_pileups_with_stripes(toy):
    """Reference test_coolpup.py:143–172 counterpart: stripes are raw counts
    straight out of the matrix."""
    clr, dense, weights = toy
    cc = make_cc()
    pu = PileUpper(
        clr,
        cc,
        expected=False,
        view_df=toy_regions(),
        control=False,
        store_stripes=True,
        clr_weight_name=None,
        ignore_diags=0,
    )
    pup = pu.pileupsWithControl()
    coords = pup["coordinates"][0][0]
    assert list(coords) == [
        "chr1",
        "102000000",
        "102500000",
        "chr1",
        "105000000",
        "105500000",
    ]
    # vertical stripe = central column, reversed, raw counts
    block = dense[("chr1", "chr1")]
    # feature1 center bin 102, feature2 105; flank 2Mb -> rows 100..105, col 105
    expected_stripe = block[100:105, 105][::-1]
    np.testing.assert_allclose(pup["vertical_stripe"][0][0], expected_stripe)
    expected_h = block[102, 103:108]
    np.testing.assert_allclose(pup["horizontal_stripe"][0][0], expected_h)


def test_matrix_vs_oracle_balanced(toy):
    """'all' pileup matrix equals the oracle's nansum/num accumulation."""
    clr, dense, weights = toy
    regions = toy_regions()
    cc = make_cc(seed=3)
    pu = PileUpper(clr, cc, expected=False, view_df=regions, ooe=False)
    pup = pu.pileupsWithControl()
    got = pup.loc[pup["group"] == "all", "data"].iloc[0]

    # oracle over the same snips
    snips = []
    for _, reg in regions.iterrows():
        rt = (reg["chrom"], reg["start"], reg["end"])
        lo, hi = clr.extent(rt)
        off = clr.offset(reg["chrom"])
        min_left = lo - off
        n = hi - lo
        csr = clr.fetch_coo(rt, balance="weight").tocsr()
        isnan = np.isnan(weights[lo:hi])
        for frame in cc.batches(rt, None, control=False):
            for _, row in frame.iterrows():
                r1 = int(row["stBin1"]) - min_left
                r2 = int(row["stBin2"]) - min_left
                W = int(row["endBin1"] - row["stBin1"])
                if r1 < 0 or r2 < 0 or r1 + W > n or r2 + W > n:
                    continue
                data, _ = oracle_snip(
                    csr,
                    r1,
                    r2,
                    W,
                    W,
                    isnan,
                    isnan,
                    dd0=int(row["stBin1"] - row["stBin2"]),
                    ignore_diags=2,
                    cis=True,
                )
                snips.append((data, np.zeros(W), np.zeros(W)))
    acc = oracle_accumulate(snips)
    want = acc["data"] / acc["num"]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-8, equal_nan=True)


def test_matrix_vs_oracle_ooe(toy, toy_exp):
    """OOE-normalized pileup matches the oracle including expected toeplitz."""
    clr, dense, weights = toy
    regions = toy_regions()
    cc = make_cc(seed=3)
    pu = PileUpper(clr, cc, expected=toy_exp, view_df=regions, ooe=True)
    pup = pu.pileupsWithControl()
    got = pup.loc[pup["group"] == "all", "data"].iloc[0]

    snips = []
    for _, reg in regions.iterrows():
        rt = (reg["chrom"], reg["start"], reg["end"])
        lo, hi = clr.extent(rt)
        off = clr.offset(reg["chrom"])
        min_left = lo - off
        n = hi - lo
        csr = clr.fetch_coo(rt, balance="weight").tocsr()
        isnan = np.isnan(weights[lo:hi])
        sub = toy_exp[toy_exp["region1"] == reg["name"]].sort_values("dist")
        evec = sub["balanced.avg"].values
        for frame in cc.batches(rt, None, control=False):
            for _, row in frame.iterrows():
                r1 = int(row["stBin1"]) - min_left
                r2 = int(row["stBin2"]) - min_left
                W = int(row["endBin1"] - row["stBin1"])
                if r1 < 0 or r2 < 0 or r1 + W > n or r2 + W > n:
                    continue
                data, _ = oracle_snip(
                    csr,
                    r1,
                    r2,
                    W,
                    W,
                    isnan,
                    isnan,
                    dd0=int(row["stBin1"] - row["stBin2"]),
                    ignore_diags=2,
                    cis=True,
                    evec=evec,
                    ooe=True,
                )
                snips.append((data, np.zeros(W), np.zeros(W)))
    acc = oracle_accumulate(snips)
    with np.errstate(invalid="ignore"):
        want = acc["data"] / acc["num"]
    want = np.where(np.isinf(want), np.nan, want)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-8, equal_nan=True)
