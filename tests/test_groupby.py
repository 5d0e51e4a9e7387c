"""Arbitrary groupby columns, ignore_group_order flipping equivalence, and
the large-G scatter accumulation path."""

import numpy as np
import pandas as pd

from coolpuppy_tpu import CoordCreator, PileUpper, pileup
from coolpuppy_tpu.ops.gather import GatherConfig, make_pileup_step

from fixtures import make_toy_cooler, toy_features, toy_regions


def test_groupby_custom_column(tmp_path):
    clr, dense, weights = make_toy_cooler(str(tmp_path / "t.cool"), seed=4)
    feats = toy_features()
    feats["name"] = ["a", "b", "a"] * 2
    pup = pileup(
        clr=clr,
        features=feats,
        features_format="bed",
        view_df=toy_regions(),
        mindist=0,
        flank=2_000_000,
        groupby=["name1", "name2"],
    )
    groups = set(
        tuple(g) if not isinstance(g, str) else g for g in pup["group"]
    )
    # pairs per chrom: (a,b),(b,a),(a,a) -> plus "all"
    assert ("a", "b") in groups and ("b", "a") in groups and ("a", "a") in groups
    assert "all" in groups
    n_by_group = {
        tuple(g) if not isinstance(g, str) else g: n
        for g, n in zip(pup["group"], pup["n"])
    }
    assert n_by_group[("a", "b")] == 2
    assert n_by_group[("b", "a")] == 2
    assert n_by_group[("a", "a")] == 2
    assert n_by_group["all"] == 6


def test_ignore_group_order_equivalence(tmp_path):
    """Flipped-and-combined groups equal the manual sum of the two
    orientations' accumulators (flip linearity)."""
    clr, dense, weights = make_toy_cooler(str(tmp_path / "t.cool"), seed=4)
    feats = toy_features()
    feats["name"] = ["a", "b", "a"] * 2
    base = pileup(
        clr=clr,
        features=feats,
        features_format="bed",
        view_df=toy_regions(),
        mindist=0,
        flank=2_000_000,
        groupby=["name1", "name2"],
    )
    comb = pileup(
        clr=clr,
        features=feats,
        features_format="bed",
        view_df=toy_regions(),
        mindist=0,
        flank=2_000_000,
        groupby=["name1", "name2"],
        ignore_group_order=True,
    )
    combg = {
        tuple(g) if not isinstance(g, str) else g: r
        for g, r in zip(comb["group"], comb.index)
    }
    assert ("b", "a") not in combg
    n_comb = {
        tuple(g) if not isinstance(g, str) else g: n
        for g, n in zip(comb["group"], comb["n"])
    }
    assert n_comb[("a", "b")] == 4  # 2 + 2 flipped

    # numeric: (a,b) combined pileup = mean of ab's and antitransposed ba's
    def get(df, key):
        for g, d, num in zip(df["group"], df["data"], df["num"]):
            kk = tuple(g) if not isinstance(g, str) else g
            if kk == key:
                return d, num
        raise KeyError(key)

    ab, num_ab = get(base, ("a", "b"))
    ba, num_ba = get(base, ("b", "a"))
    got, _ = get(comb, ("a", "b"))
    # un-normalize to sums with the stored num planes, merge the
    # anti-transposed (b,a) bank, re-normalize
    anti = lambda x: x[::-1, ::-1].T  # noqa: E731
    with np.errstate(invalid="ignore"):
        want = (
            np.nan_to_num(ab * num_ab) + anti(np.nan_to_num(ba * num_ba))
        ) / (num_ab + anti(num_ba))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-8, equal_nan=True)


def test_large_g_scatter_path():
    """capacity > 512 switches to scatter-add accumulation; must equal the
    one-hot matmul path."""
    rng = np.random.default_rng(0)
    S, W, B = 256, 5, 64
    K = 4
    tiles = rng.gamma(1.0, 1.0, (K + 1, B, B)).astype(np.float32)
    tiles[0] = 0
    nrow = 4
    grid = np.zeros((nrow + 1, nrow + 1), np.int32)
    grid[:nrow, :nrow] = rng.integers(0, K + 1, (nrow, nrow))
    n_bins = nrow * B
    valid = np.ones(n_bins + B, np.float32)
    evec = np.array([np.nan], np.float32)
    cov = np.zeros(8, np.float32)
    r1 = rng.integers(0, n_bins - W, S).astype(np.int32)
    r2 = rng.integers(0, n_bins - W, S).astype(np.int32)
    cid = rng.integers(0, 1024, S).astype(np.int32)
    args = (
        tiles, grid.ravel(), np.int32(nrow + 1), evec, valid, valid, cov, cov,
        r1, r2, (r1 - r2).astype(np.int32), cid, np.ones(S, bool),
    )
    outs = {}
    for large in (False, True):
        cfg = GatherConfig(
            W=W, B=B, S=S, block=128, capacity=1024, cis=True,
            ignore_diags=2, ooe=False, emit_expected=False, coverage=False,
            stripes=False, large_g=large,
        )
        outs[large] = make_pileup_step(cfg)(*args)
    for k in outs[False]:
        np.testing.assert_allclose(
            np.asarray(outs[False][k]), np.asarray(outs[True][k]),
            rtol=1e-5, atol=1e-5,
        )
