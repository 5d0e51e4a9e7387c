"""Pup (accumulated pileup) utilities — host-side post-processing on small
arrays and DataFrames (reference lib/puputils.py counterpart)."""

from __future__ import annotations

import logging
import warnings

import numpy as np
import pandas as pd

from .numutils import get_domain_score, get_enrichment, get_insulation_strength

logger = logging.getLogger("coolpuppy_tpu")


def empty_pup(shape):
    return {
        "data": np.zeros(shape),
        "horizontal_stripe": [],
        "vertical_stripe": [],
        "n": 0,
        "num": np.zeros(shape),
        "cov_start": np.zeros(shape[0]),
        "cov_end": np.zeros(shape[1]),
        "coordinates": [],
    }


def sum_pups(pup1, pup2, extra_funcs=None):
    """Monoid merge of two pups (reference lib/puputils.py:88–113)."""
    pup1 = dict(pup1)
    pup2 = dict(pup2)
    pup1["data"] = np.nan_to_num(pup1["data"])
    pup2["data"] = np.nan_to_num(pup2["data"])
    pup = {
        "data": pup1["data"] + pup2["data"],
        "cov_start": pup1["cov_start"] + pup2["cov_start"],
        "cov_end": pup1["cov_end"] + pup2["cov_end"],
        "n": pup1.get("n", 1) + pup2.get("n", 1),
        "num": pup1.get("num", np.isfinite(pup1["data"]).astype(int))
        + pup2.get("num", np.isfinite(pup2["data"]).astype(int)),
        "horizontal_stripe": list(pup1.get("horizontal_stripe", []))
        + list(pup2.get("horizontal_stripe", [])),
        "vertical_stripe": list(pup1.get("vertical_stripe", []))
        + list(pup2.get("vertical_stripe", [])),
        "coordinates": list(pup1.get("coordinates", []))
        + list(pup2.get("coordinates", [])),
    }
    for key in ("poison",):
        if key in pup1 or key in pup2:
            pup[key] = pup1.get(key, 0) + pup2.get(key, 0)
    if extra_funcs:
        for key, func in extra_funcs.items():
            pup = func(pup1, pup2)
    return pd.Series(pup)


def get_score(pup, center=3, ignore_central=3):
    """Dispatch a sensible score for the pileup kind (reference
    lib/puputils.py:44–85): central enrichment for off-diagonal, domain score
    for local rescaled, insulation strength for local."""
    if not pup["local"]:
        return get_enrichment(pup["data"], center)
    if pup["rescale"]:
        return get_domain_score(pup["data"], pup["rescale_flank"])
    return get_insulation_strength(pup["data"], ignore_central)


def divide_pups(pup1, pup2):
    """Ratio of two single-row pup DataFrames (reference
    lib/puputils.py:116–165)."""
    drop_columns = [
        "control_n",
        "control_num",
        "n",
        "num",
        "clr",
        "chroms",
        "minshift",
        "expected_file",
        "group",
        "maxshift",
        "mindist",
        "maxdist",
        "subset",
        "seed",
        "data",
        "horizontal_stripe",
        "vertical_stripe",
        "cooler",
        "features",
        "outname",
        "coordinates",
    ]
    if pup1.shape[0] > 1 or pup2.shape[0] > 1:
        raise ValueError("Pileups cannot contain multiple conditions")
    pup1 = pup1.reset_index(drop=True)
    pup2 = pup2.reset_index(drop=True)
    drop_columns = list(set(drop_columns) & set(pup1.columns))
    div_pup = pup1.drop(columns=drop_columns)
    for col in div_pup.columns:
        try:
            if np.all(np.sort(pup1[col]) != np.sort(pup2[col])):
                warnings.warn(
                    f"Note that {col} is different between the two pileups"
                )
        except Exception:
            pass
    div_pup["data"] = pup1["data"] / pup2["data"]
    div_pup["clrs"] = str(pup1.get("clr", [""])[0]) + "/" + str(
        pup2.get("clr", [""])[0]
    )
    div_pup["n"] = pup1["n"] + pup2["n"]
    if {"vertical_stripe", "horizontal_stripe"}.issubset(pup1.columns):
        same_coords = np.all(
            np.sort(np.asarray(pup1["coordinates"][0]).ravel())
            == np.sort(np.asarray(pup2["coordinates"][0]).ravel())
        )
        if same_coords:
            div_pup["coordinates"] = pup1["coordinates"]
            for stripe in ["vertical_stripe", "horizontal_stripe"]:
                div_pup[stripe] = pup1[stripe] / pup2[stripe]
                div_pup[stripe] = div_pup[stripe].apply(
                    lambda x: np.where(
                        np.isinf(x) | np.isnan(x), 0, x
                    )
                )
        else:
            logging.info(
                "Stripes cannot be divided, coordinates differ between pups"
            )
    return div_pup


def norm_coverage(snip):
    """Divide pup data by outer(cov_start, cov_end)/mean (reference
    lib/puputils.py:168–190)."""
    coverage = np.outer(snip["cov_start"], snip["cov_end"])
    coverage = coverage / np.nanmean(coverage)
    snip["data"] = snip["data"] / coverage
    snip["data"][np.isnan(snip["data"])] = 0
    return snip


def bin_distance(snip, band_edges="default"):
    """Per-snip distance band annotation (reference lib/puputils.py:193–215)."""
    if isinstance(band_edges, str) and band_edges == "default":
        band_edges = np.append([0], 50000 * 2 ** np.arange(30))
    i = np.searchsorted(band_edges, snip["distance"])
    snip["distance_band"] = tuple(band_edges[i - 1 : i + 1])
    return snip


def bin_distance_frame(frame, band_edges="default"):
    """Vectorized distance-band annotation for a snip frame."""
    from ..coords import bin_distance_intervals

    return bin_distance_intervals(frame, band_edges)


def group_by_region_frame(frame):
    """Frame-level analog of the reference's group_by_region postprocess
    (lib/puputils.py:218–223): each snip contributes to both of its anchors'
    groups, so the frame is duplicated with group = (chrom, start, end) of
    side 1 and side 2."""
    f1 = frame.copy()
    f1["group"] = list(
        zip(f1["chrom1"], f1["start1"], f1["end1"])
    )
    f2 = frame.copy()
    f2["group"] = list(
        zip(f2["chrom2"], f2["start2"], f2["end2"])
    )
    return pd.concat([f1, f2]).reset_index(drop=True)


# per-snip-dict name from the reference API (lib/puputils.py:218–223);
# the engine's frame-level hook is group_by_region_frame
group_by_region = group_by_region_frame


def accumulate_values(dict1, dict2, key):
    """extra_sum_funcs helper (reference lib/puputils.py:244–253)."""
    assert key in dict2, f"{key} not in dict2"
    if key in dict1:
        prev = dict1[key] if isinstance(dict1[key], list) else [dict1[key]]
        nxt = dict2[key] if isinstance(dict2[key], list) else [dict2[key]]
        dict1[key] = prev + nxt
    else:
        dict1[key] = [dict2[key]]
    return dict1
