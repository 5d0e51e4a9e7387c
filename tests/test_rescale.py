"""Rescale path: area-resampler unit tests + end-to-end local rescaled
pileups (the reference's TAD use-case, coolpup.py:1193–1234) vs the oracle."""

import numpy as np
import pandas as pd
import pytest

from coolpuppy_tpu import CoordCreator, PileUpper

from fixtures import make_toy_cooler
from oracle import area_resize2d, oracle_rescale


def test_resize_matrix_matches_oracle():
    import jax.numpy as jnp
    from coolpuppy_tpu.ops.rescale import resize2d

    rng = np.random.default_rng(0)
    for h, w in [(5, 5), (13, 7), (31, 31), (8, 20)]:
        x = rng.normal(size=(h, w))
        Hmax = 32
        pad = np.zeros((Hmax, Hmax), np.float32)
        pad[:h, :w] = x
        got = np.asarray(
            resize2d(jnp.asarray(pad), jnp.int32(h), jnp.int32(w), 9, Hmax)
        )
        want = area_resize2d(x, 9)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_resize_preserves_mean():
    import jax.numpy as jnp
    from coolpuppy_tpu.ops.rescale import resize2d

    x = np.random.default_rng(1).uniform(size=(17, 17)).astype(np.float32)
    pad = np.zeros((32, 32), np.float32)
    pad[:17, :17] = x
    out = np.asarray(resize2d(jnp.asarray(pad), jnp.int32(17), jnp.int32(17), 9, 32))
    np.testing.assert_allclose(out.mean(), x.mean(), rtol=1e-5)


@pytest.fixture(scope="module")
def toy(tmp_path_factory):
    path = tmp_path_factory.mktemp("cool") / "toy.cool"
    return make_toy_cooler(
        str(path),
        chromsizes={"chr1": 60_000_000},
        binsize=1_000_000,
        seed=7,
        trans=False,
    )


def tads():
    # variable-size domains
    return pd.DataFrame(
        {
            "chrom": ["chr1"] * 4,
            "start": [5_000_000, 15_000_000, 30_000_000, 42_000_000],
            "end": [10_000_000, 24_000_000, 37_000_000, 55_000_000],
        }
    )


def test_local_rescale_vs_oracle(toy):
    clr, dense, weights = toy
    R = 9
    cc = CoordCreator(
        tads(),
        1_000_000,
        features_format="bed",
        local=True,
        rescale_flank=1.0,
        nshifts=0,
        mindist=0,
    )
    pu = PileUpper(
        clr,
        cc,
        expected=False,
        ooe=False,
        rescale=True,
        rescale_size=R,
        ignore_diags=2,
    )
    pup = pu.pileupsWithControl()
    got = pup.loc[pup["group"] == "all", "data"].iloc[0]
    assert got.shape == (R, R)

    # oracle
    csr = clr.fetch_coo(("chr1", 0, 60_000_000), balance="weight").tocsr()
    isnan = np.isnan(weights)
    n = 60
    accs = []
    num = np.zeros((R, R))
    for _, row in cc.intervals.iterrows():
        st, en = int(row["stBin"]), int(row["endBin"])
        if st < 0 or en > n:
            continue
        W = en - st
        data = csr[st:en, st:en].toarray().astype(float)
        data[isnan[st:en], :] = np.nan
        data[:, isnan[st:en]] = np.nan
        ii, jj = np.meshgrid(np.arange(W), np.arange(W), indexing="ij")
        data[np.abs(ii - jj) < 2] = np.nan
        rs = oracle_rescale(data, R, local=True)
        accs.append(np.nan_to_num(rs))
        num += np.isfinite(rs)
    want = np.sum(accs, axis=0) / num
    # final local symmetrization (reference coolpup.py:1602–1607)
    want = np.nanmean(np.dstack((want, want.T)), 2)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6, equal_nan=True)
