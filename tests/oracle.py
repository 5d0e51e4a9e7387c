"""Numpy oracle: a literal, slow implementation of the reference pile-up
semantics (reference coolpup.py:1059–1358 and lib/puputils.py) used as ground
truth for the device engine. Per-snip Python loop over scipy CSR slices with
genuine NaN arithmetic — intentionally mirrors the reference's behavior, not
its API."""

import numpy as np


def oracle_snip(
    csr,
    r1,
    r2,
    W1,
    W2,
    isnan1,
    isnan2,
    dd0,
    ignore_diags=2,
    cis=True,
    evec=None,
    ooe=True,
    trans_exp=None,
):
    """One snip: dense window + NaN masking + diag mask + expected handling.
    Returns (data, exp_data or None)."""
    data = csr[r1 : r1 + W1, r2 : r2 + W2].toarray().astype(float)
    data[isnan1[r1 : r1 + W1], :] = np.nan
    data[:, isnan2[r2 : r2 + W2]] = np.nan

    exp_data = None
    if evec is not None or trans_exp is not None:
        if trans_exp is not None:
            exp_data = np.full(data.shape, trans_exp)
        else:
            ii, jj = np.meshgrid(
                np.arange(W1), np.arange(W2), indexing="ij"
            )
            d = np.abs(dd0 + ii - jj)
            padded = np.full(int(d.max()) + 1, np.nan)
            padded[: len(evec)] = evec[: len(padded)]
            exp_data = padded[d]

    if cis:
        ii, jj = np.meshgrid(np.arange(W1), np.arange(W2), indexing="ij")
        D = np.abs(dd0 + ii - jj) < ignore_diags
        data[D] = np.nan

    if exp_data is not None and ooe:
        with np.errstate(divide="ignore", invalid="ignore"):
            data = data / exp_data
        exp_data = None
    return data, exp_data


def oracle_accumulate(snips):
    """Accumulate a list of (data, cov_start, cov_end) with the reference's
    nansum semantics (_add_snip, lib/puputils.py:12–41)."""
    out = None
    for data, cov_s, cov_e in snips:
        if out is None:
            out = {
                "data": data.copy(),
                "num": np.isfinite(data).astype(int),
                "cov_start": np.asarray(cov_s, float).copy(),
                "cov_end": np.asarray(cov_e, float).copy(),
                "n": 1,
            }
        else:
            out["data"] = np.nansum([out["data"], data], axis=0)
            out["num"] += np.isfinite(data).astype(int)
            out["cov_start"] = np.nansum([out["cov_start"], cov_s], axis=0)
            out["cov_end"] = np.nansum([out["cov_end"], cov_e], axis=0)
            out["n"] += 1
    return out


def oracle_rescale(data, R, local=False):
    """Reference _rescale_snip semantics with an area-weighted resize
    (matching ops/rescale.py's operator instead of cooltools' spline zoom)."""
    if data.size == 0 or np.all(np.isnan(data)):
        return np.zeros((R, R))
    if local:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", category=RuntimeWarning)
            data = np.nanmean(np.dstack((data, data.T)), 2)
    nans = np.isnan(data) * 1.0
    filled = np.nan_to_num(data)
    out = area_resize2d(filled, R)
    nanz = area_resize2d(nans, R)
    out[nanz > 1e-6] = np.nan
    return out


def area_resize_matrix(h, R):
    L = np.zeros((R, h))
    cell = h / R
    for i in range(R):
        lo, hi = i * cell, (i + 1) * cell
        for k in range(int(np.floor(lo)), min(h, int(np.ceil(hi)))):
            L[i, k] = max(0.0, min(hi, k + 1) - max(lo, k))
    return L / cell


def area_resize2d(x, R):
    L = area_resize_matrix(x.shape[0], R)
    Rm = area_resize_matrix(x.shape[1], R)
    return L @ x @ Rm.T
