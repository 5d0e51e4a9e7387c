import numpy as np
import pandas as pd
import pytest

from coolpuppy_tpu.io import (
    Cooler,
    write_cool,
    read_viewframe_from_file,
    validate_csv,
    save_array_with_header,
    load_array_with_header,
)
from coolpuppy_tpu.genomics import make_viewframe, natsorted, sort_bedframe

from fixtures import make_toy_cooler, toy_regions, MM9_TOY_CHROMSIZES


@pytest.fixture(scope="module")
def toy(tmp_path_factory):
    path = tmp_path_factory.mktemp("cool") / "toy.cool"
    return make_toy_cooler(str(path))


def test_cooler_metadata(toy):
    clr, dense, weights = toy
    assert clr.binsize == 1_000_000
    assert clr.chromnames == ["chr1", "chr2"]
    assert clr.chromsizes["chr1"] == MM9_TOY_CHROMSIZES["chr1"]
    assert clr.n_bins == 198 + 182
    assert clr.offset("chr2") == 198
    assert clr.extent(("chr1", 100_000_000, 150_000_000)) == (100, 150)


def test_fetch_raw_cis(toy):
    clr, dense, weights = toy
    reg = ("chr1", 100_000_000, 150_000_000)
    mat = clr.matrix(sparse=True, balance=False).fetch(reg).toarray()
    np.testing.assert_allclose(mat, dense[("chr1", "chr1")][100:150, 100:150])


def test_fetch_raw_offdiag_rect(toy):
    clr, dense, weights = toy
    m = (
        clr.matrix(sparse=True, balance=False)
        .fetch(("chr1", 10_000_000, 30_000_000), ("chr1", 20_000_000, 60_000_000))
        .toarray()
    )
    np.testing.assert_allclose(m, dense[("chr1", "chr1")][10:30, 20:60])


def test_fetch_balanced(toy):
    clr, dense, weights = toy
    reg = ("chr1", 0, 50_000_000)
    m = clr.matrix(sparse=True, balance="weight").fetch(reg).toarray()
    w = np.nan_to_num(weights[0:50])
    expect = dense[("chr1", "chr1")][0:50, 0:50] * np.outer(w, w)
    np.testing.assert_allclose(m, expect)
    isnan = clr.bad_bin_mask(reg)
    np.testing.assert_array_equal(isnan, np.isnan(weights[0:50]))


def test_fetch_trans(toy):
    clr, dense, weights = toy
    m = (
        clr.matrix(sparse=True, balance=False)
        .fetch(("chr1", 0, 50_000_000), ("chr2", 10_000_000, 20_000_000))
        .toarray()
    )
    np.testing.assert_allclose(m, dense[("chr1", "chr2")][0:50, 10:20])
    # and the transposed query
    m2 = (
        clr.matrix(sparse=True, balance=False)
        .fetch(("chr2", 10_000_000, 20_000_000), ("chr1", 0, 50_000_000))
        .toarray()
    )
    np.testing.assert_allclose(m2, m.T)


def test_bins_fetch(toy):
    clr, dense, weights = toy
    w = clr.bins()["weight"].fetch(("chr2", 0, 5_000_000)).values
    np.testing.assert_allclose(w, weights[198:203], equal_nan=True)
    assert "weight" in clr.bins().columns


def test_natsort_and_viewframe():
    assert natsorted(["chr10", "chr2", "chr1"]) == ["chr1", "chr2", "chr10"]
    vf = make_viewframe(toy_regions())
    assert list(vf["name"]) == ["foo", "bar"]
    vf3 = make_viewframe(toy_regions()[["chrom", "start", "end"]])
    assert vf3["name"][0] == "chr1:100000000-150000000"


def test_sort_bedframe():
    df = pd.DataFrame(
        {
            "chrom": ["chr10", "chr2", "chr2"],
            "start": [5, 10, 1],
            "end": [6, 11, 2],
        }
    )
    out = sort_bedframe(df)
    assert list(out["chrom"]) == ["chr2", "chr2", "chr10"]
    assert list(out["start"]) == [1, 10, 5]


def test_viewframe_from_file(tmp_path, toy):
    clr, _, _ = toy
    p = tmp_path / "regions.bed"
    toy_regions().to_csv(p, sep="\t", header=False, index=False)
    vf = read_viewframe_from_file(str(p), verify_cooler=clr)
    assert list(vf["name"]) == ["foo", "bar"]


def test_validate_csv(tmp_path):
    p = tmp_path / "exp.tsv"
    p.write_text("x\n")
    assert validate_csv(f"{p}::balanced.avg") == (str(p), "balanced.avg")
    assert validate_csv(str(p)) == (str(p), "balanced.avg")
    with pytest.raises(ValueError):
        validate_csv("/nonexistent/exp.tsv")


def test_txt_header_roundtrip(tmp_path):
    p = tmp_path / "arr.txt"
    arr = np.arange(9, dtype=float).reshape(3, 3)
    header = {
        "flank": 100000,
        "local": False,
        "score": 1.5,
        "maxdist": np.inf,
        "groupby": ["strand1", "strand2"],
        "expected": None,
        "cool": "some.cool",
    }
    save_array_with_header(arr, header, str(p))
    out = load_array_with_header(str(p))
    np.testing.assert_allclose(out.pop("data"), arr)
    assert out["flank"] == 100000
    assert out["local"] is False
    assert out["maxdist"] == np.inf
    assert out["groupby"] == ["strand1", "strand2"]
    assert out["expected"] is None


def test_fetch_slab_tile_stack_matches_coo(toy):
    """build_tile_stack_slab (fused weights+mirror scatter over the stored
    triangle) == build_tile_stack over the materialized balanced COO, for
    cis (mirrored) and off-diagonal rectangle (two-read) fetches, with the
    native C++ path and the numpy fallback."""
    from coolpuppy_tpu.ops import tiles as tiles_mod
    from coolpuppy_tpu.ops.tiles import build_tile_stack, build_tile_stack_slab

    clr, dense, weights = toy
    rng = np.random.default_rng(0)

    for r1, r2 in [("chr1", "chr1"), (("chr1", 0, 30_000_000), ("chr1", 50_000_000, 100_000_000))]:
        slab = clr.fetch_slab(r1, r2, balance="weight")
        coo = clr.fetch_coo(r1, r2, balance="weight")
        assert slab.mirror == (r1 == r2)
        n1, n2 = coo.shape
        W = 5
        s1 = rng.integers(0, max(1, n1 - W), 40).astype(np.int32)
        s2 = rng.integers(0, max(1, n2 - W), 40).astype(np.int32)
        want = build_tile_stack(coo, 32, r1=s1, r2=s2, window1=W, window2=W)
        got = build_tile_stack_slab(slab, 32, r1=s1, r2=s2, window1=W, window2=W)
        np.testing.assert_array_equal(got.tile_map, want.tile_map)
        np.testing.assert_allclose(got.tiles, want.tiles, rtol=1e-5, atol=1e-5)
        if tiles_mod._native_tile_scatter_wtri is not None:
            saved = tiles_mod._native_tile_scatter_wtri
            try:
                tiles_mod._native_tile_scatter_wtri = None
                fb = build_tile_stack_slab(slab, 32, r1=s1, r2=s2, window1=W, window2=W)
            finally:
                tiles_mod._native_tile_scatter_wtri = saved
            np.testing.assert_allclose(fb.tiles, got.tiles, rtol=1e-5, atol=1e-5)

    # unbalanced
    slab = clr.fetch_slab("chr1", "chr1", balance=False)
    assert slab.weights is None
    coo = clr.fetch_coo("chr1", "chr1", balance=False)
    want = build_tile_stack(coo, 32)
    got = build_tile_stack_slab(slab, 32)
    np.testing.assert_array_equal(got.tile_map, want.tile_map)
    np.testing.assert_allclose(got.tiles, want.tiles, rtol=1e-5, atol=1e-5)


# -- pandas fixed-format annotation interop (reference lib/io.py:30–53) ------


def test_pandas_fixed_frame_roundtrip(tmp_path):
    import h5py

    from coolpuppy_tpu.io.pandas_hdf import read_fixed_frame, write_fixed_frame

    df = pd.DataFrame(
        {
            "group": ["+-", "-+", "all"],
            "n": np.array([3, 5, 8], dtype=np.int64),
            "score": np.array([0.5, np.nan, 2.0]),
            "flag": [True, False, True],
            "band": [(0, 50000), (50000, 100000), ()],
        }
    )
    path = tmp_path / "fixed.h5"
    with h5py.File(path, "w") as f:
        write_fixed_frame(f, "annotation", df)
    with h5py.File(path, "r") as f:
        back = read_fixed_frame(f, "annotation")
    assert list(back.columns) == list(df.columns)
    assert list(back["group"]) == list(df["group"])
    assert list(back["n"]) == list(df["n"])
    np.testing.assert_allclose(
        back["score"].astype(float), df["score"], equal_nan=True
    )
    assert list(back["flag"]) == list(df["flag"])
    assert list(back["band"]) == list(df["band"])


def test_clpy_loads_pandas_annotation_layout(tmp_path):
    """A .clpy whose annotation exists only in the reference's pandas layout
    (no annotation_json) loads through load_pileup_df."""
    import h5py

    from coolpuppy_tpu.io.clpy import load_pileup_df
    from coolpuppy_tpu.io.pandas_hdf import write_fixed_frame

    W = 5
    df = pd.DataFrame({"group": ["all"], "n": [4], "expected": [False]})
    path = tmp_path / "ref_style.clpy"
    with h5py.File(path, "w") as f:
        write_fixed_frame(f, "annotation", df)
        data = np.arange(W * W, dtype=np.float64).reshape(W, W)
        ds = f.create_dataset("data", shape=(W, W), dtype=np.float64)
        ds[:] = data
        attrs = f.create_group("attrs")
        attrs.attrs["nshifts"] = 0
        attrs.attrs["version"] = "ref"
    out = load_pileup_df(str(path))
    assert out.shape[0] == 1
    assert out["group"].iloc[0] == "all"
    assert int(out["n"].iloc[0]) == 4
    np.testing.assert_array_equal(out["data"].iloc[0], data)


def test_clpy_annotation_written_in_pandas_layout(tmp_path):
    """Files we save carry BOTH annotation_json and the reference-readable
    pandas fixed-format group (checked structurally; cross-read with real
    PyTables is covered by test_pandas_read_hdf_interop when available)."""
    import h5py

    from coolpuppy_tpu.io.clpy import save_pileup_df
    from coolpuppy_tpu.io.pandas_hdf import read_fixed_frame

    df = pd.DataFrame(
        {
            "group": ["all"],
            "data": [np.ones((5, 5))],
            "n": [7],
            "num": [np.ones((5, 5))],
        }
    )
    path = tmp_path / "ours.clpy"
    save_pileup_df(str(path), df, metadata={"nshifts": 0})
    with h5py.File(path, "r") as f:
        assert "annotation_json" in f
        ann = read_fixed_frame(f, "annotation")
        assert ann.attrs is not None
    assert list(ann["group"]) == ["all"]
    assert int(ann["n"].iloc[0]) == 7


def test_pandas_read_hdf_interop(tmp_path):
    """Cross-check against real pandas/PyTables when available."""
    tables = pytest.importorskip("tables")  # noqa: F841

    import h5py

    from coolpuppy_tpu.io.pandas_hdf import read_fixed_frame, write_fixed_frame

    df = pd.DataFrame(
        {"group": ["a", "b"], "n": np.array([1, 2], dtype=np.int64)}
    )
    ours = tmp_path / "ours.h5"
    with h5py.File(ours, "w") as f:
        write_fixed_frame(f, "annotation", df)
    back = pd.read_hdf(str(ours), "annotation")
    assert list(back["group"]) == ["a", "b"]

    theirs = tmp_path / "theirs.h5"
    df.to_hdf(str(theirs), key="annotation")
    with h5py.File(theirs, "r") as f:
        got = read_fixed_frame(f, "annotation")
    assert list(got["group"]) == ["a", "b"]
    assert list(got["n"]) == [1, 2]


def test_pandas_fixed_fixture_loads():
    """If a fixture generated by REAL pandas/PyTables is committed
    (tools/make_interop_fixture.py), our raw-h5py codec must read it. The
    development environment has no PyTables, so this is the only way to
    verify against genuine pandas bytes; the test skips until the fixture
    is generated on a machine that has `tables`."""
    import os

    import h5py

    from coolpuppy_tpu.io.pandas_hdf import read_fixed_frame

    path = os.path.join(
        os.path.dirname(__file__), "golden", "pandas_fixed_interop.h5"
    )
    if not os.path.exists(path):
        pytest.skip("pandas/PyTables fixture not generated in this env")
    with h5py.File(path, "r") as f:
        got = read_fixed_frame(f, "annotation")
    assert list(got["group"]) == ["++", "--", "all"]
    assert list(got["n"]) == [3, 5, 8]
    np.testing.assert_allclose(got["score"], [0.25, -1.5, 2.0])
