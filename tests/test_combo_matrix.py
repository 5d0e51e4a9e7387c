"""Mode-combination smoke matrix: every flag pair the reference allows
must run end-to-end without crashing and produce a sane pup (round 4
found by_window+rescale and bedpe+by_distance crashes hiding exactly in
such combinations). Values are oracle-checked elsewhere; this guards the
combinatorial surface."""

import numpy as np
import pandas as pd
import pytest

from coolpuppy_tpu import pileup
from coolpuppy_tpu.expected import expected_cis

from fixtures import make_toy_cooler, toy_features, toy_regions


@pytest.fixture(scope="module")
def toy(tmp_path_factory):
    path = tmp_path_factory.mktemp("cool") / "combo.cool"
    return make_toy_cooler(str(path), seed=77)


@pytest.fixture(scope="module")
def exp(toy):
    clr, dense, weights = toy
    e = expected_cis(clr, view_df=toy_regions())
    return e


def bedpe_feats():
    return pd.DataFrame(
        {
            "chrom1": ["chr1", "chr1", "chr2"],
            "start1": [102_000_000, 104_000_000, 103_000_000],
            "end1": [102_500_000, 104_500_000, 103_500_000],
            "chrom2": ["chr1", "chr1", "chr2"],
            "start2": [107_000_000, 110_000_000, 109_000_000],
            "end2": [107_500_000, 110_500_000, 109_500_000],
        }
    )


BASE = dict(features_format="bed", mindist=0, flank=2_000_000)

COMBOS = [
    ("controls_stripes", dict(nshifts=2, seed=1, store_stripes=True)),
    ("expected_stripes", dict(use_expected=True, store_stripes=True)),
    ("expected_noooe", dict(use_expected=True, ooe=False)),
    ("coverage_stripes", dict(clr_weight_name=None, coverage_norm=True,
                              store_stripes=True)),
    ("local_stripes", dict(local=True, store_stripes=True)),
    ("local_controls", dict(local=True, nshifts=2, seed=2)),
    ("bystrand_bydistance_controls", dict(by_strand=True, by_distance=True,
                                          nshifts=1, seed=3)),
    ("bystrand_expected", dict(by_strand=True, use_expected=True)),
    ("bywindow_controls", dict(by_window=True, nshifts=1, seed=4)),
    ("bywindow_stripes", dict(by_window=True, store_stripes=True)),
    ("bywindow_coverage", dict(by_window=True, clr_weight_name=None,
                               coverage_norm=True)),
    ("trans_stripes", dict(trans=True, store_stripes=True)),
    ("trans_controls", dict(trans=True, nshifts=2, seed=5)),
    ("bedpe_controls_stripes", dict(features="bedpe", nshifts=2, seed=6,
                                    store_stripes=True)),
    ("bedpe_bydistance", dict(features="bedpe", by_distance=True)),
    ("rescale_controls", dict(local=True, rescale=True, rescale_flank=1,
                              rescale_size=33, nshifts=1, seed=7)),
    ("rescale_stripes", dict(local=True, rescale=True, rescale_flank=1,
                             rescale_size=33, store_stripes=True)),
    ("flip_bydistance", dict(flip_negative_strand=True, by_distance=True)),
    ("groupby_igo", dict(groupby=["strand1", "strand2"],
                         ignore_group_order=True)),
]


@pytest.mark.parametrize("name,kw", COMBOS, ids=[c[0] for c in COMBOS])
def test_combo(toy, exp, name, kw):
    clr, dense, weights = toy
    kw = dict(kw)
    feats = toy_features()
    if kw.get("rescale"):
        # 2-bin local windows are fully ignore_diags-masked (all-NaN, the
        # correct reference semantics) — widen so pups have content
        feats = feats.assign(end=feats["start"] + 3_000_000)
    if kw.pop("features", None) == "bedpe":
        feats = bedpe_feats()
        kw["features_format"] = "bedpe"
    if kw.pop("use_expected", False):
        kw["expected_df"] = exp
    args = dict(BASE)
    args.update(kw)
    args.setdefault("features_format", "bed")
    pup = pileup(clr, feats, view_df=toy_regions(), **args)
    assert len(pup) > 0
    if "by_window" in kw and kw.get("by_window"):
        n_all = int(pup.loc[pup["chrom"] == "all", "n"].iloc[0])
    else:
        key = "group" if "group" in pup.columns else "orientation"
        rows = pup[pup[key].astype(str).isin(["all"])]
        n_all = int(rows["n"].iloc[0]) if len(rows) else int(pup["n"].sum())
    assert n_all > 0
    data = pup["data"].iloc[0]
    assert np.asarray(data).ndim == 2
    assert np.isfinite(np.asarray(data, dtype=float)).any()
