"""The pile-up engine: PileUpper + pileup().

API counterpart of the reference's PileUpper / pileup()
(reference coolpup.py:752–2279), re-architected for TPU: per region pair the
host builds a block-sparse tile stack and vectorized snip index arrays, the
device runs the fused gather/normalize/accumulate step (ops/gather.py), and
per-(kind, group) accumulators come back as fixed-shape arrays which the host
finishes with the reference's normalization algebra (division by shifted
controls or expected, coverage normalization, local symmetrization).
"""

from __future__ import annotations

import contextlib
import logging
import os
import pickle
import re as _re
import warnings
from functools import reduce, partial

import numpy as np
import pandas as pd

from ..coords import (
    CoordCreator,
    bin_distance_intervals,
    flip_mark_intervals,
    swap_paired_columns_for_flipped,
)
from ..genomics.intervals import (
    make_cooler_view,
    make_viewframe,
    natsorted,
    sort_bedframe,
    is_compatible_viewframe,
    is_valid_expected,
)
from ..lib.puputils import (
    empty_pup,
    group_by_region_frame,
    norm_coverage,
    sum_pups,
)
from ..ops.gather import GatherConfig, make_pileup_step, merge_flip_banks
from ..ops.tiles import build_tile_stack_slab
from ..ops.rescale import RescaleConfig, make_rescale_step
from .. import coverage as coverage_mod

logger = logging.getLogger("coolpuppy_tpu")


def _next_pow2(x):
    return 1 << max(0, int(np.ceil(np.log2(max(1, int(x))))))


class PileUpper:
    """See reference coolpup.py:752–836 for parameter semantics; the
    constructor surface is the same, plus device knobs (chunk_size,
    tile_size)."""

    def __init__(
        self,
        clr,
        CC,
        *,
        view_df=None,
        clr_weight_name="weight",
        expected=False,
        expected_value_col="balanced.avg",
        ooe=True,
        control=False,
        coverage_norm=False,
        rescale=False,
        rescale_size=99,
        flip_negative_strand=False,
        ignore_diags=2,
        store_stripes=False,
        nproc=1,
        chunk_size=32768,
        tile_size=None,
        checkpoint_dir=None,
        trace_dir=None,
        backend="auto",
    ):
        self.clr = clr
        self.resolution = clr.binsize
        self.CC = CC
        assert self.resolution == self.CC.resolution
        # mirrored CC attributes (reference coolpup.py:841 merges __dict__)
        for attr in (
            "flank",
            "rescale_flank",
            "minshift",
            "maxshift",
            "nshifts",
            "mindist",
            "maxdist",
            "local",
            "subset",
            "seed",
            "trans",
            "kind",
            "final_chroms",
        ):
            setattr(self, attr, getattr(CC, attr))
        self.clr_weight_name = clr_weight_name
        self.expected = expected
        self.expected_value_col = expected_value_col
        self.ooe = ooe
        self.control = control
        self.pad_bins = self.CC.flank // self.resolution
        self.coverage_norm = coverage_norm
        self.rescale = rescale
        self.rescale_size = rescale_size
        self.flip_negative_strand = flip_negative_strand
        self.ignore_diags = ignore_diags
        self.store_stripes = store_stripes
        self.nproc = nproc
        self.chunk_size = int(chunk_size)
        self.tile_size = tile_size
        self.checkpoint_dir = checkpoint_dir
        self.trace_dir = trace_dir
        self.backend = backend
        self._timers = None
        # warm the JAX backend off-thread: first jax.devices() sets up the
        # accelerator runtime (~10s through a TPU tunnel) and would otherwise
        # serialize after host-side coordinate generation
        if backend != "xla":
            import threading

            from ..jax_setup import ensure_jax_cache

            ensure_jax_cache()

            def _warm():
                try:
                    import jax

                    jax.devices()
                except Exception:
                    pass

            threading.Thread(
                target=_warm, name="jax-backend-warmup", daemon=True
            ).start()

        if view_df is None:
            self.view_df = make_cooler_view(clr)
        else:
            self.view_df = make_viewframe(view_df, check_bounds=clr.chromsizes)

        self.expected_vectors = {}
        self.expected_df = None
        if self.expected is not None and self.expected is not False:
            expected_df = self.expected
            expected_df = expected_df[
                expected_df["region1"].isin(self.view_df["name"])
                & expected_df["region2"].isin(self.view_df["name"])
            ].reset_index(drop=True)
            if self.control:
                warnings.warn(
                    "Can't do both expected and control shifts; "
                    "defaulting to expected",
                    stacklevel=2,
                )
                self.control = False
            if self.trans:
                is_valid_expected(
                    expected_df,
                    "trans",
                    self.view_df,
                    verify_cooler=clr,
                    expected_value_cols=[self.expected_value_col],
                    raise_errors=True,
                )
                self.expected_df = expected_df
            else:
                expected_df = expected_df[
                    expected_df["region1"] == expected_df["region2"]
                ].reset_index(drop=True)
                is_valid_expected(
                    expected_df,
                    "cis",
                    self.view_df,
                    verify_cooler=clr,
                    expected_value_cols=[self.expected_value_col],
                    raise_errors=True,
                )
                self.expected_df = expected_df
                for name, sub in expected_df.groupby("region1", observed=True):
                    sub = sub.sort_values("dist")
                    vec = np.full(int(sub["dist"].max()) + 1, np.nan)
                    vec[sub["dist"].astype(int).values] = sub[
                        self.expected_value_col
                    ].values
                    self.expected_vectors[name] = vec
            self.expected = True

        self.view_df = self.view_df.set_index("name")
        self.view_df_extents = {}
        for region_name, region in self.view_df.iterrows():
            lo, hi = self.clr.extent(region)
            chroffset = self.clr.offset(region.iloc[0])
            self.view_df_extents[region_name] = lo - chroffset, hi - chroffset

        self.chroms = natsorted(
            set(self.CC.final_chroms) & set(self.clr.chromnames)
        )
        self.view_df = self.view_df[self.view_df["chrom"].isin(self.chroms)]
        if self.view_df["chrom"].unique().shape[0] == 0:
            raise ValueError(
                "No chromosomes are in common between the coordinate "
                "file and the cooler file"
            )
        if self.trans and self.view_df["chrom"].unique().shape[0] < 2:
            raise ValueError("Trying to do trans with fewer than two chromosomes")

        if self.coverage_norm is True or self.coverage_norm == "total":
            self.coverage_norm = "cov_tot_raw"
        elif self.coverage_norm == "cis":
            self.coverage_norm = "cov_cis_raw"
        if self.coverage_norm and self.clr_weight_name:
            raise ValueError(
                "Can't do coverage normalization when clr_weight_name is provided"
            )
        if (
            self.coverage_norm
            and self.coverage_norm not in self.clr.bins().columns
        ):
            if self.coverage_norm in ("cov_cis_raw", "cov_tot_raw"):
                coverage_mod.coverage(
                    self.clr, store=True, ignore_diags=self.ignore_diags
                )
            else:
                raise ValueError(
                    f"coverage_norm {self.coverage_norm} not found in cooler bins"
                )

        if self.rescale:
            if self.rescale_flank is None:
                raise ValueError("Cannot use rescale without setting rescale_flank")
            if self.rescale_size % 2 == 0:
                raise ValueError("Please provide an odd rescale_size")
            iv = self.CC.intervals
            if self.CC.kind == "bed":
                self.max_extent_bins = int(
                    (iv["endBin"] - iv["stBin"]).max()
                )
            else:
                self.max_extent_bins = int(
                    max(
                        (iv["endBin1"] - iv["stBin1"]).max(),
                        (iv["endBin2"] - iv["stBin2"]).max(),
                    )
                )

        self.empty_outmap = self.make_outmap()

    # ------------------------------------------------------------------

    def make_outmap(self):
        if self.rescale:
            return np.zeros((self.rescale_size, self.rescale_size))
        return np.zeros((2 * self.pad_bins + 1, 2 * self.pad_bins + 1))

    def get_expected_trans(self, region1, region2):
        exp_value = self.expected_df.loc[
            (self.expected_df["region1"] == region1)
            & (self.expected_df["region2"] == region2),
            self.expected_value_col,
        ]
        return float(exp_value.iloc[0])

    # -- device plumbing ----------------------------------------------------

    def _region_device_inputs(self, region1, region2, minpad=512):
        """Fetch + stage everything per region pair that snips index into."""
        r1c = self.view_df.loc[region1]
        r2c = self.view_df.loc[region2] if region2 != region1 else r1c
        min1, max1 = self.view_df_extents[region1]
        min2, max2 = self.view_df_extents[region2]
        n1, n2 = max1 - min1, max2 - min2

        slab = self.clr.fetch_slab(r1c, r2c, balance=self.clr_weight_name)

        def padded(vec, fill=0.0):
            out = np.full(
                _next_pow2(len(vec) + minpad), fill, dtype=np.float32
            )
            out[: len(vec)] = vec
            return out

        valid1 = padded(
            (~self.clr.bad_bin_mask(r1c, self.clr_weight_name)).astype(np.float32)
        )
        valid2 = padded(
            (~self.clr.bad_bin_mask(r2c, self.clr_weight_name)).astype(np.float32)
        )

        if self.coverage_norm:
            cov1 = padded(
                self.clr.bins()[self.coverage_norm].fetch(r1c).values
            )
            cov2 = padded(
                self.clr.bins()[self.coverage_norm].fetch(r2c).values
            )
        else:
            cov1 = np.zeros(8, np.float32)
            cov2 = np.zeros(8, np.float32)

        if self.expected:
            if self.trans:
                evec = np.array(
                    [self.get_expected_trans(region1, region2)], np.float32
                )
            else:
                evec = padded(self.expected_vectors[region1], fill=np.nan)
        else:
            evec = np.array([np.nan], np.float32)

        return dict(
            slab=slab,
            min1=min1,
            min2=min2,
            n1=n1,
            n2=n2,
            valid1=valid1,
            valid2=valid2,
            cov1=cov1,
            cov2=cov2,
            evec=evec,
            cis=(not self.trans) and (region1 == region2),
        )

    def _window_bins(self):
        """Window size in bins for the non-rescaled path (reference
        make_outmap, coolpup.py:1007–1022)."""
        return 2 * self.pad_bins + 1

    def _use_pallas(self, dev, emit_expected, coverage, large_g, W):
        """Route the hot path through the Pallas quad kernel when supported:
        TPU backend, plain accumulation (no expected-emission / coverage /
        stripes), moderate group count, window fits a tile, and any expected
        is a cis vector (trans scalar expected stays on the XLA path)."""
        if self.backend == "xla":
            return False
        if emit_expected or coverage or large_g or self.store_stripes:
            return False
        if W > 120:  # pallas superwindow headroom limit
            return False
        if self.backend == "pallas":
            return True
        import jax

        platform = jax.devices()[0].platform
        return platform == "tpu" or "axon" in platform.lower()

    def _stage_region(self, region1, region2):
        """Fetch + stage one region pair's device inputs (prefetchable)."""
        timers = self._timers
        ctx = timers.phase("ingest") if timers else contextlib.nullcontext()
        with ctx:
            if self.rescale:
                Hmax = _next_pow2(self.max_extent_bins)
                return self._region_device_inputs(
                    region1, region2, minpad=Hmax + 8
                )
            return self._region_device_inputs(region1, region2)

    def pileup_region(
        self,
        region1,
        region2=None,
        groupby=None,
        modify_2Dintervals_func=None,
        postprocess_frame_func=None,
        extra_sum_funcs=None,
        dev=None,
    ):
        """Accumulate all snips of one region (pair) on device; returns
        {"ROI": {group: pup}, "control": {...}} (reference
        coolpup.py:1285-1358).

        Two phases: (1) host streams vectorized snip frames into flat index
        arrays (bounds-checked, group ids factorized); (2) one block-sparse
        tile stack is built for the whole region and staged on device once,
        then fixed-size sub-chunks run through the fused kernel (Pallas quad
        kernel on TPU, fused XLA step elsewhere)."""
        groupby = groupby or []
        if region2 is None:
            region2 = region1

        if dev is None:
            dev = self._stage_region(region1, region2)
        if self.rescale:
            R = self.rescale_size
            Hmax = _next_pow2(self.max_extent_bins)
            B = max(64, Hmax)
        else:
            W = self._window_bins()
            B = max(64, _next_pow2(W))
        shape = self.make_outmap().shape

        emit_expected = bool(self.expected and not self.ooe)
        use_expected = bool(self.expected)
        coverage = bool(self.coverage_norm)

        cid_of = {}

        def ensure_cid(kind, group):
            key = (kind, group)
            if key not in cid_of:
                cid_of[key] = len(cid_of)
            return cid_of[key]

        region1_coords = tuple(self.view_df.loc[region1])
        region2_coords = tuple(self.view_df.loc[region2])

        timers = self._timers

        # -- phase 1: host coordinate collection -----------------------
        cols = {k: [] for k in ("r1", "r2", "dd0", "cidl", "flip", "h1", "w2")}
        coord_strs = []
        for chunk in self.CC.batches(
            region1_coords,
            region2_coords if region2 != region1 else None,
            control=self.control,
            groupby=groupby,
            modify_2Dintervals_func=modify_2Dintervals_func,
        ):
            if postprocess_frame_func is not None:
                chunk = postprocess_frame_func(chunk)
            if len(chunk) == 0:
                continue
            r1 = chunk["stBin1"].values - dev["min1"]
            r2 = chunk["stBin2"].values - dev["min2"]
            e1 = chunk["endBin1"].values - dev["min1"]
            e2 = chunk["endBin2"].values - dev["min2"]
            inb = (r1 >= 0) & (e1 <= dev["n1"]) & (r2 >= 0) & (e2 <= dev["n2"])
            chunk = chunk.loc[inb]
            if len(chunk) == 0:
                continue
            h1 = (chunk["endBin1"].values - chunk["stBin1"].values).astype(
                np.int32
            )
            w2 = (chunk["endBin2"].values - chunk["stBin2"].values).astype(
                np.int32
            )
            if not self.rescale:
                assert (h1 == W).all() and (w2 == W).all(), (
                    "inconsistent window size; flank must be a multiple of "
                    "the resolution"
                )
            cols["r1"].append(
                (chunk["stBin1"].values - dev["min1"]).astype(np.int32)
            )
            cols["r2"].append(
                (chunk["stBin2"].values - dev["min2"]).astype(np.int32)
            )
            cols["dd0"].append(
                (chunk["stBin1"].values - chunk["stBin2"].values).astype(
                    np.int32
                )
            )
            if "flip" in chunk.columns:
                cols["flip"].append(chunk["flip"].values.astype(bool))
            else:
                cols["flip"].append(np.zeros(len(chunk), bool))
            # vectorized (kind, group) -> cid: python only per UNIQUE pair.
            # use_na_sentinel=False keeps a NaN group as a regular category
            # (the -1 sentinel would alias a legitimate (kind, group) code)
            kcode, kuniq = pd.factorize(chunk["kind"], use_na_sentinel=False)
            gcode, guniq = pd.factorize(chunk["group"], use_na_sentinel=False)
            pair = kcode.astype(np.int64) * max(len(guniq), 1) + gcode
            upair, inv = np.unique(pair, return_inverse=True)
            ucid = np.array(
                [
                    ensure_cid(
                        kuniq[p // max(len(guniq), 1)],
                        guniq[p % max(len(guniq), 1)],
                    )
                    for p in upair
                ],
                dtype=np.int32,
            )
            cols["cidl"].append(ucid[inv])
            cols["h1"].append(h1)
            cols["w2"].append(w2)
            if self.store_stripes:
                coord_strs.extend(
                    ".".join(str(v) for v in row)
                    for row in zip(
                        chunk["chrom1"],
                        chunk["start1"],
                        chunk["end1"],
                        chunk["chrom2"],
                        chunk["start2"],
                        chunk["end2"],
                    )
                )

        ntot = sum(len(a) for a in cols["r1"])
        acc = {}
        n_counts = {}
        stripes = {}

        if ntot > 0:
            arr = {k: np.concatenate(v) for k, v in cols.items()}
            if timers:
                timers.count("snips", ntot)

            Chalf = max(4, _next_pow2(len(cid_of)))
            C = 2 * Chalf
            cid_dev = (arr["cidl"] + Chalf * arr["flip"]).astype(np.int32)
            large_g = len(cid_of) > 512

            counts = np.bincount(arr["cidl"], minlength=len(cid_of))
            for i, c in enumerate(counts):
                n_counts[i] = int(c)

            # -- phase 2: one tile stack, device-resident sub-chunk loop
            tile_ctx = (
                timers.phase("tiles") if timers else contextlib.nullcontext()
            )
            dev_ctx = (
                timers.phase("device") if timers else contextlib.nullcontext()
            )
            use_pallas = (not self.rescale) and self._use_pallas(
                dev, emit_expected, coverage, large_g, W
            )

            with tile_ctx:
                from ..ops.pallas_gather import PALLAS_B

                tile_B = PALLAS_B if use_pallas else B
                tile_stack = build_tile_stack_slab(
                    dev["slab"],
                    tile_B,
                    r1=arr["r1"],
                    r2=arr["r2"],
                    window1=W if not self.rescale else arr["h1"],
                    window2=W if not self.rescale else arr["w2"],
                )

            S_sub = min(65536, max(256, _next_pow2(ntot)))
            if self.rescale:
                S_sub = min(4096, max(64, _next_pow2(ntot)))

            with dev_ctx:
                out_total = self._device_accumulate(
                    tile_stack,
                    dev,
                    arr,
                    cid_dev,
                    ntot,
                    S_sub,
                    C,
                    W if not self.rescale else None,
                    B,
                    use_pallas,
                    use_expected,
                    emit_expected,
                    coverage,
                    large_g,
                )
            out_total = merge_flip_banks(out_total, Chalf)
            for k, v in out_total.items():
                if k in ("horizontal_stripe", "vertical_stripe"):
                    continue
                acc[k] = v

            if self.store_stripes:
                hs = out_total["horizontal_stripe"]
                vs = out_total["vertical_stripe"]
                for i in range(ntot):
                    entry = stripes.setdefault(
                        int(arr["cidl"][i]), {"h": [], "v": [], "coords": []}
                    )
                    entry["h"].append(hs[i])
                    entry["v"].append(vs[i])
                    entry["coords"].append(coord_strs[i])

        # -- package into pup dicts ------------------------------------
        outdict = {"ROI": {}, "control": {}}
        for (kind, group), i in cid_of.items():
            if n_counts.get(i, 0) == 0:
                continue
            pup = {
                "data": acc["sum"][i],
                "num": acc["num"][i],
                "poison": acc["poison"][i],
                "n": n_counts[i],
                "cov_start": acc["cov_start"][i]
                if self.coverage_norm
                else np.zeros(shape[0]),
                "cov_end": acc["cov_end"][i]
                if self.coverage_norm
                else np.zeros(shape[1]),
                "horizontal_stripe": stripes.get(i, {}).get("h", []),
                "vertical_stripe": stripes.get(i, {}).get("v", []),
                "coordinates": stripes.get(i, {}).get("coords", []),
            }
            key = group if isinstance(group, str) else tuple(group)
            outdict[kind][key] = pup
            if emit_expected and kind == "ROI":
                epup = {
                    "data": acc["exp_sum"][i],
                    "num": acc["exp_num"][i],
                    "poison": np.zeros(shape),
                    "n": n_counts[i],
                    "cov_start": np.zeros(shape[0]),
                    "cov_end": np.zeros(shape[1]),
                    "horizontal_stripe": [],
                    "vertical_stripe": [],
                    "coordinates": [],
                }
                if key in outdict["control"]:
                    outdict["control"][key] = dict(
                        sum_pups(outdict["control"][key], epup)
                    )
                else:
                    outdict["control"][key] = epup

        sum_func = sum_pups
        if "all" not in outdict["ROI"]:
            outdict["ROI"]["all"] = dict(
                reduce(sum_func, outdict["ROI"].values(), empty_pup(shape))
            )
        if self.control or emit_expected:
            if "all" not in outdict["control"]:
                outdict["control"]["all"] = dict(
                    reduce(sum_func, outdict["control"].values(), empty_pup(shape))
                )
        if outdict["ROI"]["all"]["n"] > 0:
            logger.info(f"{region1, region2}: {outdict['ROI']['all']['n']}")
        return outdict

    def _device_accumulate(
        self,
        tile_stack,
        dev,
        arr,
        cid_dev,
        ntot,
        S_sub,
        C,
        W,
        B,
        use_pallas,
        use_expected,
        emit_expected,
        coverage,
        large_g,
    ):
        """Stage the tile stack once, loop fixed-size sub-chunks through the
        fused kernel, keeping a running on-device total (one accumulator set
        live regardless of chunk count; dispatches stay async so chunks still
        pipeline). Stripe planes are per-snip output data and are retained per
        chunk (device-side) until the single sync."""
        import jax
        import jax.numpy as jnp

        total = None
        stripe_h, stripe_v = [], []

        if use_pallas:
            from ..ops.pallas_gather import PallasPileupSession

            # a trash accumulator slot absorbs padding snips so every
            # sub-chunk has the same length (distinct lengths recompile)
            trash = C
            session = PallasPileupSession(
                tile_stack,
                dev["valid1"],
                dev["valid2"],
                dev["evec"],
                dict(
                    W=W,
                    capacity=C + 8,
                    cis=dev["cis"],
                    ignore_diags=int(self.ignore_diags),
                    ooe=bool(use_expected and self.ooe),
                ),
            )
            total_dev = None
            for lo in range(0, ntot, S_sub):
                sl = slice(lo, min(lo + S_sub, ntot))
                S = sl.stop - sl.start

                def padded(a, fill):
                    if S == S_sub:
                        return a[sl]
                    out = np.full(S_sub, fill, a.dtype)
                    out[:S] = a[sl]
                    return out

                # fetch=False: dispatches are async, chunks pipeline on the
                # device with no per-chunk host round-trip. A running
                # on-device total keeps exactly ONE accumulator set live
                # instead of O(n_chunks) [C, W, W] outputs.
                out = session.run(
                    padded(arr["r1"], 0),
                    padded(arr["r2"], 0),
                    padded(arr["dd0"], 0),
                    padded(cid_dev, trash),
                    fetch=False,
                )
                total_dev = (
                    out
                    if total_dev is None
                    else jax.tree.map(jnp.add, total_dev, out)
                )
            total = session.finalize([total_dev])
            return {k: v[:C] for k, v in total.items()}

        tiles_dev = jax.device_put(tile_stack.tiles)
        tmap_dev = jax.device_put(tile_stack.tile_map.ravel())
        ncolp = np.int32(tile_stack.tile_map.shape[1])
        common = tuple(
            jax.device_put(x)
            for x in (
                dev["evec"],
                dev["valid1"],
                dev["valid2"],
                dev["cov1"],
                dev["cov2"],
            )
        )

        rescale = self.rescale
        for lo in range(0, ntot, S_sub):
            sl = slice(lo, min(lo + S_sub, ntot))
            S = sl.stop - sl.start

            def pad(a, fill=0):
                out = np.full(S_sub, fill, a.dtype)
                out[:S] = a[sl]
                return out

            snipmask = np.zeros(S_sub, bool)
            snipmask[:S] = True
            if rescale:
                cfg = RescaleConfig(
                    R=self.rescale_size,
                    Hmax=_next_pow2(self.max_extent_bins),
                    B=B,
                    S=S_sub,
                    block=min(64, S_sub),
                    capacity=C,
                    cis=dev["cis"],
                    ignore_diags=int(self.ignore_diags),
                    ooe=bool(use_expected and self.ooe),
                    emit_expected=emit_expected,
                    coverage=coverage,
                    stripes=bool(self.store_stripes),
                    local=bool(self.local),
                    large_g=large_g,
                )
                step = make_rescale_step(cfg)
                out = step(
                    tiles_dev, tmap_dev, ncolp, *common,
                    pad(arr["r1"]), pad(arr["r2"]),
                    pad(arr["h1"], 1), pad(arr["w2"], 1),
                    pad(arr["dd0"]), pad(cid_dev), snipmask,
                )
            else:
                cfg = GatherConfig(
                    W=W,
                    B=B,
                    S=S_sub,
                    block=min(512, S_sub),
                    capacity=C,
                    cis=dev["cis"],
                    ignore_diags=int(self.ignore_diags),
                    ooe=bool(use_expected and self.ooe),
                    emit_expected=emit_expected,
                    coverage=coverage,
                    stripes=bool(self.store_stripes),
                    large_g=large_g,
                )
                step = make_pileup_step(cfg)
                out = step(
                    tiles_dev, tmap_dev, ncolp, *common,
                    pad(arr["r1"]), pad(arr["r2"]),
                    pad(arr["dd0"]), pad(cid_dev), snipmask,
                )
            if self.store_stripes:
                stripe_h.append((out.pop("horizontal_stripe"), S))
                stripe_v.append((out.pop("vertical_stripe"), S))
            total = (
                out
                if total is None
                else jax.tree.map(jnp.add, total, out)
            )
        # single sync point: all chunk dispatches above pipeline on the device
        total = {k: np.asarray(v, np.float64) for k, v in total.items()}
        if self.store_stripes:
            total["horizontal_stripe"] = np.concatenate(
                [np.asarray(h, np.float64)[:S] for h, S in stripe_h]
            )
            total["vertical_stripe"] = np.concatenate(
                [np.asarray(v, np.float64)[:S] for v, S in stripe_v]
            )
        return total

    # -- the full run (reference coolpup.py:1360–1654) ----------------------

    def pileupsWithControl(
        self,
        nproc=None,
        groupby=None,
        ignore_group_order=False,
        modify_2Dintervals_func=None,
        postprocess_frame_func=None,
        extra_sum_funcs=None,
    ):
        groupby = groupby or []
        self.ignore_group_order = ignore_group_order
        if nproc is None:
            nproc = self.nproc
        if len(self.chroms) == 0:
            return self.make_outmap(), 0
        sum_func = partial(sum_pups, extra_funcs=extra_sum_funcs)

        regions1, regions2 = [], []
        if self.trans:
            import itertools

            for region1, region2 in itertools.combinations(self.view_df.index, 2):
                if (
                    self.view_df.loc[region1, "chrom"]
                    != self.view_df.loc[region2, "chrom"]
                ):
                    regions1.append(region1)
                    regions2.append(region2)
        else:
            regions1 = list(self.view_df.index)
            regions2 = regions1

        # flip / group-order resolution (reference coolpup.py:1431–1493)
        flipby = None
        if self.flip_negative_strand:
            flipby = "strand"
            if self.ignore_group_order:
                if self.local:
                    raise ValueError(
                        "ignore_group_order doesn't make sense for local pileups"
                    )
                if self.kind == "bedpe":
                    raise ValueError(
                        "ignore_group_order doesn't make sense for bedpe files"
                    )
                if groupby:
                    warnings.warn(
                        "flip_negative_strand and ignore_group_order leads to "
                        "combining strands, not other groups"
                    )
        elif self.ignore_group_order and groupby:
            if self.local:
                raise ValueError(
                    "ignore_group_order doesn't make sense for local pileups"
                )
            if self.kind == "bedpe":
                raise ValueError(
                    "ignore_group_order doesn't make sense for bedpe files"
                )
            groups = np.array(groupby)
            filt = [
                f"{g}1" in groups and f"{g}2" in groups
                for g in [g[:-1] for g in groups]
            ]
            groups_filtered = np.sort(groups[filt])
            if self.ignore_group_order is True:
                flipby = list(set(g[:-1] for g in groups_filtered))
            elif isinstance(self.ignore_group_order, str):
                flipby = [self.ignore_group_order]
            elif len(self.ignore_group_order) == 1:
                flipby = list(self.ignore_group_order)
            else:
                flipby = list(set(g[:-1] for g in self.ignore_group_order))
            if len(flipby) == 1 and f"{flipby[0]}1" in groups_filtered:
                flipby = flipby[0]
            else:
                raise ValueError(
                    "Ambiguous ignore_group_order, please provide str or list "
                    "of two strings which are in groupby"
                )
        elif self.ignore_group_order and not groupby:
            warnings.warn("Need to specify groupby for ignore_group_order")

        if self.flip_negative_strand or (self.ignore_group_order and groupby):
            user_modify = modify_2Dintervals_func

            def modify_final(frame):
                frame = flip_mark_intervals(
                    frame, flipby, self.flip_negative_strand
                )
                if self.ignore_group_order:
                    frame = swap_paired_columns_for_flipped(
                        frame,
                        exclude_bases=(
                            "stBin",
                            "endBin",
                            "exp_start",
                            "exp_end",
                            "chrom",
                            "start",
                            "end",
                            "center",
                        ),
                    )
                if user_modify is not None:
                    frame = user_modify(frame)
                return frame

        else:
            modify_final = modify_2Dintervals_func

        # pipeline region ingest (HDF5 -> CSR -> staging) with device compute:
        # the reference's process pool over regions (coolpup.py:1502–1508)
        # becomes prefetch threads feeding one accelerator
        from concurrent.futures import ThreadPoolExecutor

        from ..observability import PhaseTimers, device_trace

        self._timers = timers = PhaseTimers()

        def _ckpt_path(r1, r2):
            safe = _re.sub(r"[^A-Za-z0-9_.-]", "_", f"{r1}__{r2}")
            return os.path.join(self.checkpoint_dir, safe + ".pkl")

        def _run_one(r1, r2, dev):
            # per-region-pair accumulator checkpointing: the natural resume
            # unit of the decomposition (SURVEY §5)
            if self.checkpoint_dir:
                path = _ckpt_path(r1, r2)
                if os.path.exists(path):
                    with open(path, "rb") as f:
                        return pickle.load(f)
            out = self.pileup_region(
                r1,
                r2,
                groupby=groupby,
                modify_2Dintervals_func=modify_final,
                postprocess_frame_func=postprocess_frame_func,
                extra_sum_funcs=extra_sum_funcs,
                dev=dev,
            )
            if self.checkpoint_dir:
                os.makedirs(self.checkpoint_dir, exist_ok=True)
                tmp = _ckpt_path(r1, r2) + ".tmp"
                with open(tmp, "wb") as f:
                    pickle.dump(out, f)
                os.replace(tmp, _ckpt_path(r1, r2))
            return out

        pairs = list(zip(regions1, regions2))
        n_prefetch = max(1, min(4, nproc if nproc > 0 else 4))
        pileups = []
        with device_trace(self.trace_dir), ThreadPoolExecutor(
            max_workers=n_prefetch
        ) as pool:
            futures = {}
            for idx, (r1, r2) in enumerate(pairs[:n_prefetch]):
                futures[idx] = pool.submit(self._stage_region, r1, r2)
            for idx, (r1, r2) in enumerate(pairs):
                dev = futures.pop(idx).result()
                nxt = idx + n_prefetch
                if nxt < len(pairs):
                    futures[nxt] = pool.submit(self._stage_region, *pairs[nxt])
                pileups.append(_run_one(r1, r2, dev))
        timers.log_summary()

        roi = (
            pd.DataFrame(
                [
                    {k: pd.Series(v) for k, v in pileup["ROI"].items()}
                    for pileup in pileups
                ]
            )
            .apply(lambda x: reduce(sum_func, x.dropna()))
            .T
        )
        have_control = self.control or (self.expected and not self.ooe)
        if have_control:
            ctrl = (
                pd.DataFrame(
                    [
                        {k: pd.Series(v) for k, v in pileup["control"].items()}
                        for pileup in pileups
                    ]
                )
                .apply(lambda x: reduce(sum_func, x.dropna()))
                .T
            )

        # poison pixels (reference: +inf sums from ooe division by zero,
        # coolpup.py:1154–1156) — restore the inf so downstream algebra and the
        # final inf→nan replacement behave identically
        def _apply_poison(table):
            if "poison" not in table.columns:
                return table
            datacol = table.columns.get_loc("data")
            poiscol = table.columns.get_loc("poison")
            for i in range(len(table)):
                pois = table.iat[i, poiscol]
                if pois is not None and np.any(np.asarray(pois) > 0):
                    data = table.iat[i, datacol].copy()
                    data[np.asarray(pois) > 0] = np.inf
                    table.iat[i, datacol] = data
            return table

        roi = _apply_poison(roi)
        if have_control:
            ctrl = _apply_poison(ctrl)

        if self.coverage_norm:
            roi = roi.apply(norm_coverage, axis=1)
            if self.control:
                ctrl = ctrl.apply(norm_coverage, axis=1)
            elif self.expected:
                warnings.warn(
                    "Expected can not be normalized to coverage", stacklevel=2
                )
        normalized_roi = pd.DataFrame(roi["data"] / roi["num"], columns=["data"])
        if have_control:
            normalized_control = pd.DataFrame(
                ctrl["data"] / ctrl["num"], columns=["data"]
            )
            normalized_roi = normalized_roi / normalized_control
            normalized_roi["control_n"] = ctrl["n"]
            normalized_roi["control_num"] = ctrl["num"]

        normalized_roi["data"] = normalized_roi["data"].apply(
            lambda x: np.where(x == np.inf, np.nan, x)
        )
        normalized_roi["n"] = roi["n"]
        normalized_roi["num"] = roi["num"]

        if self.store_stripes:
            from ..lib import numutils as _numutils

            normalized_roi["coordinates"] = roi["coordinates"]
            normalized_roi["coordinates"] = [
                [x.split(".") for x in y] for y in normalized_roi["coordinates"]
            ]
            normalized_roi["horizontal_stripe"] = roi["horizontal_stripe"]
            normalized_roi["vertical_stripe"] = roi["vertical_stripe"]
            if have_control:
                cntr = int(
                    np.floor(normalized_control["data"]["all"].shape[0] / 2)
                )
                control_h = np.array(
                    normalized_control["data"]["all"][cntr, :], dtype=float
                )
                control_v = np.array(
                    normalized_control["data"]["all"][:, cntr][::-1], dtype=float
                )
                normalized_roi["horizontal_stripe"] = normalized_roi.apply(
                    lambda row: np.divide(row["horizontal_stripe"], control_h),
                    axis=1,
                )
                normalized_roi["vertical_stripe"] = normalized_roi.apply(
                    lambda row: np.divide(row["vertical_stripe"], control_v),
                    axis=1,
                )
            normalized_roi["vertical_stripe"] = normalized_roi[
                "vertical_stripe"
            ].apply(np.vstack)
            normalized_roi["horizontal_stripe"] = normalized_roi[
                "horizontal_stripe"
            ].apply(np.vstack)
            normalized_roi["coordinates"] = normalized_roi["coordinates"].apply(
                np.vstack
            )
            if self.local:
                normalized_roi["vertical_stripe"] = normalized_roi[
                    "vertical_stripe"
                ].apply(_numutils._copy_array_halves)
                normalized_roi["horizontal_stripe"] = normalized_roi[
                    "horizontal_stripe"
                ].apply(_numutils._copy_array_halves)

        if self.local:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", category=RuntimeWarning)
                normalized_roi["data"] = normalized_roi["data"].apply(
                    lambda x: np.nanmean(np.dstack((x, x.T)), 2)
                )
        n = normalized_roi.loc["all", "n"]
        normalized_roi = normalized_roi.reset_index().rename(
            columns={"index": "group"}
        )
        if groupby:
            normalized_roi[groupby] = pd.DataFrame(
                [
                    ("all",) * len(groupby) if i == "all" else i
                    for i in normalized_roi["group"].to_list()
                ],
                columns=groupby,
            )
            for val in groupby:
                normalized_roi.insert(0, val, normalized_roi.pop(val))
        logger.info(f"Total number of piled up windows: {int(n)}")

        # annotation columns (reference coolpup.py:1628–1654)
        annot = {
            "clr": os.path.abspath(self.clr.filename),
            "resolution": self.resolution,
            "clr_weight_name": self.clr_weight_name,
            "expected": bool(self.expected),
            "expected_value_col": self.expected_value_col,
            "ooe": self.ooe,
            "control": self.control,
            "pad_bins": self.pad_bins,
            "coverage_norm": self.coverage_norm,
            "rescale": self.rescale,
            "rescale_size": self.rescale_size,
            "flip_negative_strand": self.flip_negative_strand,
            "ignore_diags": self.ignore_diags,
            "store_stripes": self.store_stripes,
            "nproc": self.nproc,
            "flank": self.flank,
            "rescale_flank": self.rescale_flank,
            "chroms": str(self.chroms),
            "minshift": self.minshift,
            "maxshift": self.maxshift,
            "nshifts": self.nshifts,
            "trans": self.trans,
            "mindist": self.mindist,
            "maxdist": self.maxdist,
            "local": self.local,
            "subset": self.subset,
            "seed": self.seed,
            "ignore_group_order": self.ignore_group_order,
        }
        for name, attr in annot.items():
            if isinstance(attr, list):
                attr = str(attr)
            normalized_roi[name] = [attr] * len(normalized_roi)
        return normalized_roi

    # -- grouped wrappers (reference coolpup.py:1656–1919) ------------------

    def pileupsByStrandWithControl(
        self, nproc=None, groupby=None, ignore_group_order=False
    ):
        groupby = groupby or []
        normalized_pileups = self.pileupsWithControl(
            nproc=nproc,
            groupby=["strand1", "strand2"] + groupby,
            ignore_group_order=ignore_group_order,
        )
        normalized_pileups.insert(
            0,
            "orientation",
            (
                normalized_pileups["strand1"] + normalized_pileups["strand2"]
            ).replace({"allall": "all"}),
        )
        return normalized_pileups

    def pileupsByWindowWithControl(self, nproc=None):
        if self.local:
            raise ValueError("Cannot do by-window pileups for local")
        normalized_pileups = self.pileupsWithControl(
            nproc=nproc, postprocess_frame_func=group_by_region_frame
        )
        groups = normalized_pileups["group"]
        coords = pd.DataFrame(
            [
                ("all", -1, -1) if g == "all" else tuple(g)
                for g in groups.to_list()
            ],
            index=normalized_pileups.index,
            columns=["chrom", "start", "end"],
        )
        normalized_pileups = pd.concat(
            [coords, normalized_pileups], axis=1
        ).drop(columns="group")
        normalized_pileups[["start", "end"]] = normalized_pileups[
            ["start", "end"]
        ].astype(int)
        normalized_pileups = sort_bedframe(
            normalized_pileups, view_df=self.view_df.reset_index()
        )
        return normalized_pileups

    def _resolve_distance_edges(self, distance_edges):
        if not (isinstance(distance_edges, str) and distance_edges == "default"):
            if not all(isinstance(n, (int, np.integer)) for n in distance_edges):
                raise ValueError("Distance edges must be integers")
            distance_edges = list(np.sort(distance_edges))
            for _ in range(len(distance_edges)):
                if np.min(distance_edges) < self.mindist:
                    distance_edges[int(np.argmin(distance_edges))] = self.mindist
                else:
                    break
        return distance_edges

    @staticmethod
    def _format_separation(pups):
        pups.insert(
            0,
            "separation",
            pups["distance_band"].apply(
                lambda x: (
                    x
                    if x == "all"
                    else (
                        f"{x[0]/1000000}Mb-\n{x[1]/1000000}Mb"
                        if len(x) == 2
                        else f"{x[0]/1000000}Mb+"
                    )
                )
            ),
        )
        return pups

    def pileupsByDistanceWithControl(
        self,
        nproc=None,
        distance_edges="default",
        groupby=None,
        ignore_group_order=False,
    ):
        groupby = groupby or []
        if self.trans:
            raise ValueError("Cannot do by-distance pileups for trans")
        if self.local:
            raise ValueError("Cannot do by-distance pileups for local")
        distance_edges = self._resolve_distance_edges(distance_edges)
        bin_func = partial(bin_distance_intervals, band_edges=distance_edges)
        pups = self.pileupsWithControl(
            nproc=nproc,
            modify_2Dintervals_func=bin_func,
            groupby=["distance_band"] + groupby,
            ignore_group_order=ignore_group_order,
        )
        pups = pups.loc[pups["distance_band"] != ()].reset_index(drop=True)
        pups = self._format_separation(pups)
        i = np.where(pups["separation"] == "all")[0]
        pups = pd.concat(
            [pups.drop(i).sort_values("distance_band"), pups.iloc[i, :]],
            ignore_index=True,
        ).reset_index(drop=True)
        return pups

    def pileupsByStrandByDistanceWithControl(
        self,
        nproc=None,
        distance_edges="default",
        groupby=None,
        ignore_group_order=False,
    ):
        groupby = groupby or []
        if self.trans:
            raise ValueError("Cannot do by-distance pileups for trans")
        distance_edges = self._resolve_distance_edges(distance_edges)
        bin_func = partial(bin_distance_intervals, band_edges=distance_edges)
        pups = self.pileupsWithControl(
            nproc=nproc,
            modify_2Dintervals_func=bin_func,
            groupby=["strand1", "strand2", "distance_band"] + groupby,
            ignore_group_order=ignore_group_order,
        )
        pups.insert(
            0,
            "orientation",
            (pups["strand1"] + pups["strand2"]).replace({"allall": "all"}),
        )
        pups = pups.loc[pups["distance_band"] != ()].reset_index(drop=True)
        pups = self._format_separation(pups)
        i = np.where(pups["separation"] == "all")[0]
        pups = pd.concat(
            [
                pups.drop(i).sort_values(["orientation", "distance_band"]),
                pups.iloc[i, :],
            ],
            ignore_index=True,
        ).reset_index(drop=True)
        return pups


def pileup(
    clr,
    features,
    features_format="bed",
    view_df=None,
    expected_df=None,
    expected_value_col="balanced.avg",
    clr_weight_name="weight",
    flank=100000,
    minshift=10**5,
    maxshift=10**6,
    nshifts=0,
    ooe=True,
    mindist="auto",
    maxdist=None,
    min_diag=2,
    subset=0,
    by_window=False,
    by_strand=False,
    by_distance=False,
    groupby=None,
    ignore_group_order=False,
    flip_negative_strand=False,
    local=False,
    coverage_norm=False,
    trans=False,
    rescale=False,
    rescale_flank=1,
    rescale_size=99,
    store_stripes=False,
    nproc=1,
    seed=None,
):
    """One-shot pileup API (reference coolpup.py:1922–2279; same parameters)."""
    groupby = groupby or []
    distance_edges = "default"
    if by_distance is not False:
        if local:
            raise ValueError(
                "Can't do local pileups by distance, please specify only one "
                "of those arguments"
            )
        if isinstance(by_distance, (list, np.ndarray)):
            try:
                distance_edges = [int(i) for i in by_distance]
            except Exception as e:
                raise ValueError(
                    "Distance bin edges have to be an iterable of integers"
                ) from e
            by_distance = True
        elif by_distance is True or by_distance == "default":
            by_distance = True
        else:
            raise ValueError(
                "Invalid by_distance value: True, 'default' or a list of "
                "integers"
            )

    if not rescale:
        rescale_flank = None

    if view_df is None:
        view_df = make_cooler_view(clr)
    else:
        is_compatible_viewframe(
            view_df, clr, check_sorting=True, raise_errors=True
        )

    control = nshifts > 0

    if expected_df is None:
        expected = None
        expected_value_col = None
    else:
        expected = True
        is_valid_expected(
            expected_df,
            "trans" if trans else "cis",
            view_df,
            verify_cooler=clr,
            expected_value_cols=[expected_value_col],
            raise_errors=True,
        )

    if mindist is None:
        mindist = "auto"
    if maxdist is None:
        maxdist = np.inf
    if rescale and rescale_size % 2 == 0:
        raise ValueError("Please provide an odd rescale_size")

    chroms = list(view_df["chrom"].unique())

    if by_window:
        if features_format != "bed":
            raise ValueError(
                "Can't make by-window pileups without making combinations"
            )
        if local:
            raise ValueError("Can't make local by-window pileups")

    CC = CoordCreator(
        features=features,
        resolution=clr.binsize,
        features_format=features_format,
        flank=flank,
        rescale_flank=rescale_flank,
        chroms=chroms,
        minshift=minshift,
        maxshift=maxshift,
        nshifts=nshifts,
        mindist=mindist,
        maxdist=maxdist,
        local=local,
        subset=subset,
        seed=seed,
        trans=trans,
    )
    PU = PileUpper(
        clr=clr,
        CC=CC,
        view_df=view_df,
        clr_weight_name=clr_weight_name,
        expected=expected_df if expected else False,
        expected_value_col=expected_value_col,
        ooe=ooe,
        control=control,
        coverage_norm=coverage_norm,
        rescale=rescale,
        rescale_size=rescale_size,
        flip_negative_strand=flip_negative_strand,
        ignore_diags=min_diag,
        store_stripes=store_stripes,
        nproc=nproc,
    )

    if by_window:
        pups = PU.pileupsByWindowWithControl()
        pups["by_window"] = True
        pups["by_strand"] = False
        pups["by_distance"] = False
        if groupby:
            warnings.warn("by-window not compatible with additional groupby")
    elif by_strand and by_distance:
        pups = PU.pileupsByStrandByDistanceWithControl(
            nproc=nproc,
            distance_edges=distance_edges,
            groupby=groupby,
            ignore_group_order=ignore_group_order,
        )
        pups["by_window"] = False
        pups["by_strand"] = True
        pups["by_distance"] = True
    elif by_strand:
        pups = PU.pileupsByStrandWithControl(
            groupby=groupby, ignore_group_order=ignore_group_order
        )
        pups["by_window"] = False
        pups["by_strand"] = True
        pups["by_distance"] = False
    elif by_distance:
        pups = PU.pileupsByDistanceWithControl(
            nproc=nproc,
            distance_edges=distance_edges,
            groupby=groupby,
            ignore_group_order=ignore_group_order,
        )
        pups["by_window"] = False
        pups["by_strand"] = False
        pups["by_distance"] = True
    else:
        pups = PU.pileupsWithControl(
            groupby=groupby, ignore_group_order=ignore_group_order
        )
        pups["by_window"] = False
        pups["by_strand"] = False
        pups["by_distance"] = False
    pups["groupby"] = [groupby] * pups.shape[0]
    pups["expected"] = pups["expected"].fillna(False)
    coolname = os.path.splitext(os.path.basename(clr.filename))[0]
    pups["cooler"] = coolname
    return pups
