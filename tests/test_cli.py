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


def test_plot_cbar_modes_and_wrapping(setup, tmp_path):
    """cbar_mode each/edge and manual n_cols wrapping (flags the reference
    sketches but never wired, plotpuppy_CLI.py:115–131)."""
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
            "--by_strand",
            "--seed",
            "0",
            "-o",
            str(d / "cb.clpy"),
        ]
    )
    for mode in ("each", "edge"):
        png = str(tmp_path / f"cb_{mode}.png")
        plotpup_cli.main(
            [
                "--input_pups",
                out,
                "--output",
                png,
                "--rows",
                "orientation",
                "--no_score",
                "--cbar_mode",
                mode,
            ]
        )
        import os

        assert os.path.getsize(png) > 0
    # n_cols wrapping of a single facet dimension
    png = str(tmp_path / "wrap.png")
    plotpup_cli.main(
        [
            "--input_pups",
            out,
            "--output",
            png,
            "--cols",
            "orientation",
            "--n_cols",
            "2",
            "--no_score",
        ]
    )
    import os

    assert os.path.getsize(png) > 0


def test_plot_stripes_multifacet_lineplot(setup, tmp_path):
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
            "--by_strand",
            "--store_stripes",
            "--seed",
            "0",
            "-o",
            str(d / "str.clpy"),
        ]
    )
    png = str(tmp_path / "stripes_line.png")
    plotpup_cli.main(
        [
            "--input_pups",
            out,
            "--output",
            png,
            "--rows",
            "orientation",
            "--stripe",
            "corner_stripe",
            "--lineplot",
            "--no_score",
        ]
    )
    import os

    assert os.path.getsize(png) > 0
