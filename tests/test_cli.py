"""End-to-end CLI tests: coolpup-tpu -> .clpy -> plotpup-tpu/dividepups-tpu,
mirroring the reference's CLI walkthrough smoke test (reference
.github/workflows/tests.yml runs the CLI notebook)."""

import numpy as np
import pytest

from coolpuppy_tpu.cli import coolpup_cli, dividepups_cli, plotpup_cli
from coolpuppy_tpu.io import load_pileup_df

from fixtures import make_toy_cooler, toy_features, toy_regions


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    clr, dense, weights = make_toy_cooler(str(d / "toy.cool"), seed=2)
    toy_features().to_csv(d / "features.bed", sep="\t", header=False, index=False)
    toy_regions().to_csv(d / "regions.bed", sep="\t", header=False, index=False)
    return d


def test_cli_end_to_end(setup):
    d = setup
    out = coolpup_cli.main(
        [
            str(d / "toy.cool"),
            str(d / "features.bed"),
            "--view",
            str(d / "regions.bed"),
            "--flank",
            "2000000",
            "--mindist",
            "0",
            "--nshifts",
            "1",
            "--by_strand",
            "--seed",
            "0",
            "-o",
            str(d / "out.clpy"),
        ]
    )
    pups = load_pileup_df(out)
    assert pups.shape[0] == 5  # 4 orientations + all
    assert set(pups["orientation"]) == {"++", "+-", "-+", "--", "all"}
    assert (
        pups.loc[pups["orientation"] == "all", "data"].iloc[0].shape == (5, 5)
    )
    assert sorted(pups["n"]) == [1, 1, 1, 3, 6]

    plotpup_cli.main(
        [
            "--input_pups",
            out,
            "--output",
            str(d / "pup.png"),
            "--rows",
            "orientation",
            "--no_score",  # 5x5 toy pileup is too small for the default score
        ]
    )
    assert (d / "pup.png").exists()

    # divide needs single-condition pups
    single = coolpup_cli.main(
        [
            str(d / "toy.cool"),
            str(d / "features.bed"),
            "--view",
            str(d / "regions.bed"),
            "--flank",
            "2000000",
            "--mindist",
            "0",
            "--nshifts",
            "0",
            "-o",
            str(d / "single.clpy"),
        ]
    )
    div = dividepups_cli.main([single, single, "-o", str(d / "div.clpy")])
    divpup = load_pileup_df(div)
    data = divpup["data"].iloc[0]
    finite = np.isfinite(data)
    assert np.allclose(data[finite], 1.0)


def test_cli_auto_name_and_stripes(setup, monkeypatch):
    d = setup
    monkeypatch.chdir(d)
    out = coolpup_cli.main(
        [
            str(d / "toy.cool"),
            str(d / "features.bed"),
            "--view",
            str(d / "regions.bed"),
            "--flank",
            "2000000",
            "--mindist",
            "0",
            "--nshifts",
            "0",
            "--clr_weight_name",
            "--store_stripes",
            "--ignore_diags",
            "0",
        ]
    )
    assert out.endswith(".clpy") and "noNorm" in out
    pups = load_pileup_df(out)
    assert "vertical_stripe" in pups.columns
    vs = pups["vertical_stripe"].iloc[0]
    assert vs.shape == (6, 5)

    plotpup_cli.main(
        [
            "--input_pups",
            out,
            "--output",
            str(d / "stripes.png"),
            "--stripe",
            "corner_stripe",
            "--no_score",
            "--out_sorted_bedpe",
            str(d / "sorted.bedpe"),
        ]
    )
    assert (d / "stripes.png").exists()
    assert (d / "sorted.bedpe").exists()
