"""Benchmark: fused pile-up throughput on one chip at 1M loci.

Workload (BASELINE.json): a synthetic 20k-bin chromosome (200 Mb @ 10 kb) with
distance-decaying sparse contacts, 1M loci pairs, 21x21 windows, OOE
normalization, 4 strand groups, random flips — the loop-APA shape.

Measures the full per-chunk pipeline the engine runs (host tile-stack scatter
+ device fused gather/normalize/accumulate) in steady state, and compares
against the reference's hot-loop equivalent (scipy CSR window slicing + NaN
masking + nansum accumulation, reference coolpup.py:1104–1191) measured on a
subset of the same snips.

Prints one JSON line:
  {"metric": "snippets_per_sec", "value": ..., "unit": "snips/s",
   "vs_baseline": <speedup over the scipy reference loop>} plus details.
"""

import argparse
import json
import time

import numpy as np


def make_workload(n_bins=20_000, nnz_target=12_000_000, n_loci=1_000_000,
                  W=21, seed=0):
    rng = np.random.default_rng(seed)
    # distance-decay sparse matrix (upper triangle), denser near the diagonal
    d = rng.zipf(1.35, nnz_target * 2)
    d = d[d < n_bins][:nnz_target]
    i = rng.integers(0, n_bins, len(d))
    j = np.minimum(i + d, n_bins - 1)
    vals = rng.gamma(1.0, 2.0, len(d)).astype(np.float32)
    from scipy import sparse as sp

    coo = sp.coo_matrix(
        (np.concatenate([vals, vals]),
         (np.concatenate([i, j]), np.concatenate([j, i]))),
        shape=(n_bins, n_bins),
    )
    coo.sum_duplicates()
    csr = coo.tocsr()

    # loci: loop-like anchors at 100kb-2Mb separations
    a1 = rng.integers(0, n_bins - 300, n_loci)
    sep = rng.integers(10, 200, n_loci)
    a2 = np.minimum(a1 + sep, n_bins - W - 1)
    r1 = a1.astype(np.int32)
    r2 = a2.astype(np.int32)
    gid = rng.integers(0, 4, n_loci).astype(np.int32)
    flip = rng.random(n_loci) < 0.25
    valid = (rng.random(n_bins) > 0.03).astype(np.float32)
    evec = (100.0 / (1.0 + np.arange(n_bins))).astype(np.float32)
    return csr, coo, r1, r2, gid, flip, valid, evec


def bench_tpu(csr, coo, r1, r2, gid, flip, valid, evec, W, chunk, repeats=3):
    import jax
    from coolpuppy_tpu.ops.gather import GatherConfig, make_pileup_step
    from coolpuppy_tpu.ops.tiles import build_tile_stack

    B = 64
    S = chunk
    cfg = GatherConfig(
        W=W, B=B, S=S, block=min(1024, S), capacity=8, cis=True,
        ignore_diags=2, ooe=True, emit_expected=False, coverage=False,
        stripes=False,
    )
    step = make_pileup_step(cfg)

    n_bins = csr.shape[0]
    pad = 1 << int(np.ceil(np.log2(n_bins + B)))
    validp = np.zeros(pad, np.float32)
    validp[:n_bins] = valid
    evecp = np.full(pad, np.nan, np.float32)
    evecp[:n_bins] = evec
    cov = np.zeros(8, np.float32)

    n_loci = len(r1)
    n_chunks = n_loci // S
    sm = np.ones(S, bool)

    # one tile stack for the whole loci set: the band of touched tiles is
    # shared across chunks, so host scatter + device transfer amortize out
    t0 = time.time()
    ts = build_tile_stack(coo, B, r1=r1, r2=r2, window1=W, window2=W)
    tiles_dev = jax.device_put(ts.tiles)
    tmap_dev = jax.device_put(ts.tile_map.ravel())
    stage_time = time.time() - t0
    ncolp = np.int32(ts.tile_map.shape[1])

    def run_all():
        outs = None
        for c in range(n_chunks):
            sl = slice(c * S, (c + 1) * S)
            out = step(
                tiles_dev, tmap_dev, ncolp,
                evecp, validp, validp, cov, cov,
                r1[sl], r2[sl], (r1[sl] - r2[sl]).astype(np.int32),
                gid[sl], sm,
            )
            outs = out
        jax.block_until_ready(outs)

    # warmup (compile)
    t0 = time.time()
    run_all()
    compile_time = time.time() - t0

    best = np.inf
    for _ in range(repeats):
        t0 = time.time()
        run_all()
        dt = time.time() - t0
        best = min(best, dt)
    snips = n_chunks * S
    gathered_nnz = int(ts.tiles.astype(bool).sum())
    return snips / (best + stage_time), best + stage_time, compile_time, snips


def bench_pallas(coo, r1, r2, gid, valid, evec, W, chunk, repeats=5):
    """Quad-sorted Pallas kernel path (ops/pallas_gather.py).

    Reports MEDIANS of >= ``repeats`` runs of two quantities (VERDICT r3
    #1 — the tunnel's dispatch latency drifts +-30%, so a one-shot
    best-of is a coin flip):

    - ``device``: kernel execution only — call args pre-staged on device,
      completion forced through a device-side reduction fetched as ONE
      scalar (jax.block_until_ready can return early on dispatched pallas
      outputs through the tunnel, and fetching the [C, W, W] accumulators
      would time the tunnel, not the chip).
    - ``e2e``: the full fresh-region pipeline — host upper-triangle tile
      scatter, global quad sort + packing, then the SLAB-PREFIX-PIPELINED
      upload/dispatch (PallasPileupSession.pipelined_run) and the single
      accumulator fetch."""
    import jax
    import jax.numpy as jnp

    from coolpuppy_tpu.ops.pallas_gather import (
        PALLAS_B,
        PallasGatherConfig,
        PallasPileupSession,
        make_pallas_pileup_step_flat,
        pack_call_args,
        pack_stream,
    )
    from coolpuppy_tpu.ops.tiles import build_tile_stack

    n_loci = len(r1)
    n_bins = coo.shape[0]
    # tile_f16="lossy": the synthetic values are balanced-like O(1) floats,
    # the same case the engine gates to scaled-f16 wire (<=4.9e-4 relative)
    cfg_kw = dict(
        W=W, capacity=8, cis=True, ignore_diags=2, ooe=True,
        tile_f16="lossy",
    )

    def stage():
        # upper-triangle build: half the scatter + half the tile upload for
        # this symmetric cis matrix (ops/tiles.SymTileStack)
        from coolpuppy_tpu.ops.tiles import build_tile_stack_sym

        ts = build_tile_stack_sym(
            coo, PALLAS_B, r1=r1, r2=r2, window1=W, window2=W
        )
        return PallasPileupSession(ts, valid, valid, evec[:n_bins], cfg_kw)

    session = stage()  # warm the normalize-kernel compile

    # -- device-only: pre-stage every packed call's args ------------------
    Q_CAP = 128
    CALL = 131072
    snips, packs = pack_stream(
        r1, r2, gid, session.tile_stack.tile_map, PALLAS_B, Q_CAP, CALL
    )
    staged = []
    for ks, qstart, qcount, lo, used in packs:
        staged.append(
            jax.device_put(
                pack_call_args(ks, qstart, qcount, snips, lo, used,
                               Q_CAP, CALL)
            )
        )
    # session.cfg_kw is cfg_kw minus the normalization keys the session
    # bakes into the tile stacks (cis/ooe/ignore_diags)
    cfg = PallasGatherConfig(Q=Q_CAP, **session.cfg_kw)
    step = make_pallas_pileup_step_flat(cfg, CALL)

    @jax.jit
    def reduce_probe(out):
        return jnp.float32(0) + sum(jnp.sum(v) for v in out.values())

    def run_device():
        total = None
        for flat in staged:
            out = step(flat, session.stiles_dev)
            total = (
                out if total is None else jax.tree.map(jnp.add, total, out)
            )
        # one-scalar fetch forces completion without timing the tunnel
        return float(jax.device_get(reduce_probe(total)))

    t0 = time.time()
    run_device()
    compile_time = time.time() - t0
    dev_times = []
    for _ in range(max(repeats, 5)):
        t0 = time.time()
        run_device()
        dev_times.append(time.time() - t0)
    device_t = float(np.median(dev_times))

    # -- end-to-end: fresh-region pipeline, slab-prefix pipelined ---------
    from coolpuppy_tpu.ops.tiles import build_tile_stack_sym

    def run_e2e():
        # fresh-region pipeline: upper-triangle scatter + quad sort
        # (sequential on the host), then slab-prefix PIPELINED upload —
        # early packed calls execute against already-uploaded tile
        # prefixes while later slabs are still in flight
        # (PallasPileupSession.pipelined_run)
        ts = build_tile_stack_sym(
            coo, PALLAS_B, r1=r1, r2=r2, window1=W, window2=W
        )
        sess, total = PallasPileupSession.pipelined_run(
            ts, valid, valid, evec[:n_bins], dict(cfg_kw),
            r1, r2, gid, chunk=CALL, n_slabs=8,
        )
        return sess.finalize([total])

    run_e2e()  # allocator warmup
    e2e_times = []
    for _ in range(max(repeats, 5)):
        t0 = time.time()
        run_e2e()
        e2e_times.append(time.time() - t0)
    e2e_t = float(np.median(e2e_times))
    return {
        "device_rate": n_loci / device_t,
        "device_t": device_t,
        "e2e_rate": n_loci / e2e_t,
        "e2e_t": e2e_t,
        "compile_t": compile_time,
        "snips": n_loci,
        "dev_times": [round(t, 3) for t in dev_times],
        "e2e_times": [round(t, 3) for t in e2e_times],
    }


def bench_engine(n_sites=20_000, binsize=10_000, maxdist=2_000_000, seed=0):
    """Full user-facing pipeline: synthetic .cool + stranded CTCF-like sites
    -> pileup(by_strand=True) through the engine (coords, ingest, kernels,
    normalization)."""
    import pandas as pd
    from coolpuppy_tpu import Cooler, pileup
    from coolpuppy_tpu.io import write_cool

    rng = np.random.default_rng(seed)
    n_bins = 20_000
    length = n_bins * binsize
    d = rng.zipf(1.35, 24_000_000)
    d = d[d < n_bins][:12_000_000]
    i = rng.integers(0, n_bins, len(d))
    j = np.minimum(i + d, n_bins - 1)
    vals = rng.poisson(3.0, len(d)) + 1
    keep = i <= j
    path = "/tmp/bench_engine.cool"
    weights = rng.uniform(0.5, 1.5, n_bins)
    weights[rng.random(n_bins) < 0.03] = np.nan
    write_cool(
        path,
        {"chr1": length},
        binsize,
        (i[keep], j[keep], vals[keep]),
        weights=weights,
    )
    clr = Cooler(path)
    starts = np.sort(rng.choice(length - 10_000, n_sites, replace=False))
    feats = pd.DataFrame(
        {
            "chrom": "chr1",
            "start": starts,
            "end": starts + 1_000,
            "name": ".",
            "score": 0,
            "strand": rng.choice(["+", "-"], n_sites),
        }
    )

    def run(f):
        t0 = time.time()
        pup = pileup(
            clr,
            f,
            features_format="bed",
            flank=100_000,
            maxdist=maxdist,
            nshifts=1,
            seed=0,
            by_strand=True,
        )
        wall = time.time() - t0
        n_snips = int(
            pup.loc[pup["orientation"] == "all", "n"].iloc[0]
        ) + int(pup.loc[pup["orientation"] == "all", "control_n"].iloc[0])
        return n_snips / wall, wall, n_snips

    # warmup: kernel shapes are pinned per window size, so a small run
    # compiles everything the measured run needs (steady-state measurement;
    # compiles are a once-per-machine cost via the persistent cache)
    run(feats.iloc[: max(200, n_sites // 20)])
    return run(feats)


def _bench_cooler(binsize=10_000, n_bins=20_000, seed=0, path="/tmp/bench_engine.cool"):
    """Synthetic 200 Mb chromosome cooler shared by the engine-level benches."""
    import os

    from coolpuppy_tpu.io import Cooler, write_cool

    rng = np.random.default_rng(seed)
    if not os.path.exists(path):
        d = rng.zipf(1.35, 24_000_000)
        d = d[d < n_bins][:12_000_000]
        i = rng.integers(0, n_bins, len(d))
        j = np.minimum(i + d, n_bins - 1)
        vals = rng.poisson(3.0, len(d)) + 1
        keep = i <= j
        weights = rng.uniform(0.5, 1.5, n_bins)
        weights[rng.random(n_bins) < 0.03] = np.nan
        write_cool(
            path,
            {"chr1": n_bins * binsize},
            binsize,
            (i[keep], j[keep], vals[keep]),
            weights=weights,
        )
    return Cooler(path)


def bench_rescale(n_tads=2_000, rescale_size=99, seed=0, ref_n=200):
    """Rescaled-TAD workload (BASELINE's 99x99 local rescaled pileup): engine
    throughput on variable-extent TADs (20–200 bins), vs the reference-style
    per-snip host loop (CSR slice + NaN-aware resize)."""
    import pandas as pd

    from coolpuppy_tpu import pileup

    clr = _bench_cooler()
    binsize = clr.binsize
    n_bins = clr.n_bins
    rng = np.random.default_rng(seed)
    starts = np.sort(
        rng.choice(np.arange(100, n_bins - 300), n_tads, replace=False)
    ) * binsize
    widths = rng.integers(20, 200, n_tads) * binsize
    feats = pd.DataFrame(
        {"chrom": "chr1", "start": starts, "end": starts + widths}
    )

    def run(f):
        t0 = time.time()
        pup = pileup(
            clr,
            f,
            features_format="bed",
            local=True,
            rescale=True,
            rescale_flank=1,
            rescale_size=rescale_size,
            mindist=0,
            seed=0,
        )
        return time.time() - t0, int(
            pup.loc[pup["group"] == "all", "n"].iloc[0]
        )

    # warmup with the FULL workload: the 2k TADs hit more pow2 extent
    # buckets than any subset, and each unseen bucket costs an XLA compile
    # that must not land in the measured wall; then best-of-2 steady state
    run(feats)
    wall, n_snips = run(feats)
    wall2, _ = run(feats)
    wall = min(wall, wall2)

    # reference-style loop: CSR slice -> dense, bad-bin NaN, diag mask,
    # symmetrize, NaN-aware resize (reference coolpup.py:1104–1234)
    from coolpuppy_tpu.ops.rescale import area_resize_host

    csr = clr.fetch_coo("chr1", balance="weight").tocsr()
    isnan = clr.bad_bin_mask("chr1")
    t0 = time.time()
    for k in range(min(ref_n, n_tads)):
        a = int(starts[k] // binsize)
        w = int(widths[k] // binsize)
        pad = w  # rescale_flank=1
        lo, hi = a - pad, a + w + pad
        if lo < 0 or hi > n_bins:
            continue
        data = csr[lo:hi, lo:hi].toarray().astype(float)
        data[isnan[lo:hi], :] = np.nan
        data[:, isnan[lo:hi]] = np.nan
        ii, jj = np.meshgrid(np.arange(hi - lo), np.arange(hi - lo), indexing="ij")
        data[np.abs(ii - jj) < 2] = np.nan
        import warnings as _w

        with _w.catch_warnings():
            _w.simplefilter("ignore")
            data = np.nanmean(np.dstack((data, data.T)), 2)
        nans = np.isnan(data).astype(float)
        rs = area_resize_host(np.nan_to_num(data), (rescale_size, rescale_size))
        nz = area_resize_host(nans, (rescale_size, rescale_size))
        rs[np.ceil(nz).astype(bool)] = np.nan
    ref_rate = min(ref_n, n_tads) / (time.time() - t0)
    return n_snips / wall, wall, n_snips, ref_rate


def bench_modes(n_sites=20_000, maxdist=2_000_000, seed=0):
    """Engine throughput of the previously-XLA-only modes (stripes,
    coverage_norm) relative to the plain run — the round-1 mode cliff."""
    import pandas as pd

    from coolpuppy_tpu import pileup

    clr = _bench_cooler()
    binsize = clr.binsize
    length = clr.n_bins * binsize
    rng = np.random.default_rng(seed)
    starts = np.sort(rng.choice(length - 10_000, n_sites, replace=False))
    feats = pd.DataFrame(
        {
            "chrom": "chr1",
            "start": starts,
            "end": starts + 1_000,
            "name": ".",
            "score": 0,
            "strand": rng.choice(["+", "-"], n_sites),
        }
    )

    def run(f, **kw):
        t0 = time.time()
        pup = pileup(
            clr,
            f,
            features_format="bed",
            flank=100_000,
            maxdist=maxdist,
            seed=0,
            **kw,
        )
        wall = time.time() - t0
        if kw.get("by_window"):
            n = int(pup.loc[pup["chrom"] == "all", "n"].iloc[0])
        else:
            n = int(pup.loc[pup["group"] == "all", "n"].iloc[0])
        return n / wall, n

    small = feats.iloc[: max(200, n_sites // 20)]
    results = {}
    for name, kw in (
        ("plain", {}),
        ("stripes", {"store_stripes": True}),
        ("coverage_norm", {"coverage_norm": True, "clr_weight_name": None}),
        # by-window: one group per anchor (2 x n_sites groups) — the blocked
        # large-G pallas path
        ("by_window", {"by_window": True}),
    ):
        run(small, **kw)  # warmup: pinned shapes compile once
        # best-of-2: tunnel dispatch latency is noisy at the ~20% level
        rate_a, n1 = run(feats, **kw)
        rate_b, _ = run(feats, **kw)
        results[name] = max(rate_a, rate_b)
    results["snips"] = n1

    # bedpe: explicit pair rows through the rectangle-predicate stream
    # (VERDICT r3 #8 done-criterion: within 20% of cis plain).
    # Coordinate-sorted like real BEDPE files (bedtools convention; the
    # reference's loop files are sorted) — unsorted input additionally
    # pays one lexsort + frame take (~0.5 s at 2M rows, coords._lex_sorted)
    n_pairs = min(2_000_000, n_sites * 100)
    a1 = rng.integers(0, clr.n_bins - 300, n_pairs)
    sep = rng.integers(12, 200, n_pairs)
    a2 = np.minimum(a1 + sep, clr.n_bins - 12)
    order = np.lexsort((a2, a1))
    a1, a2 = a1[order], a2[order]
    bedpe = pd.DataFrame(
        {
            "chrom1": "chr1",
            "start1": a1 * binsize,
            "end1": a1 * binsize + 1_000,
            "chrom2": "chr1",
            "start2": a2 * binsize,
            "end2": a2 * binsize + 1_000,
        }
    )

    def run_bedpe(f):
        t0 = time.time()
        pup = pileup(clr, f, features_format="bedpe", flank=100_000,
                     mindist=0, seed=0)
        wall = time.time() - t0
        return int(pup.loc[pup["group"] == "all", "n"].iloc[0]) / wall

    run_bedpe(bedpe.iloc[:10_000])
    results["bedpe"] = max(run_bedpe(bedpe), run_bedpe(bedpe))

    # trans: cross-chromosome feature products through the interval-product
    # predicate stream (second synthetic chromosome)
    clr2 = _bench_cooler2()
    n_t = 1_500
    t_starts1 = np.sort(rng.choice(
        clr2.chromsizes["chr1"] - 10_000, n_t, replace=False))
    t_starts2 = np.sort(rng.choice(
        clr2.chromsizes["chr2"] - 10_000, n_t, replace=False))
    tfeats = pd.DataFrame(
        {
            "chrom": ["chr1"] * n_t + ["chr2"] * n_t,
            "start": np.concatenate([t_starts1, t_starts2]),
            "end": np.concatenate([t_starts1, t_starts2]) + 1_000,
        }
    )

    def run_trans(f):
        t0 = time.time()
        pup = pileup(clr2, f, features_format="bed", flank=100_000,
                     trans=True, seed=0)
        wall = time.time() - t0
        return int(pup.loc[pup["group"] == "all", "n"].iloc[0]) / wall

    run_trans(tfeats.iloc[list(range(200)) + list(range(n_t, n_t + 200))])
    results["trans"] = max(run_trans(tfeats), run_trans(tfeats))
    return results


def _bench_cooler2(binsize=10_000, seed=1,
                   path="/tmp/bench_engine_trans.cool"):
    """Two-chromosome cooler for the trans benchmark."""
    import os

    from coolpuppy_tpu.io import Cooler, write_cool

    if not os.path.exists(path):
        rng = np.random.default_rng(seed)
        n1, n2 = 10_000, 8_000
        chromsizes = {"chr1": n1 * binsize, "chr2": n2 * binsize}
        pix1, pix2, cnt = [], [], []
        for lo, n, off in ((0, n1, 0), (n1, n2, n1)):
            d = rng.zipf(1.35, 8_000_000)
            d = d[d < n][:3_000_000]
            i = rng.integers(0, n, len(d)) + off
            j = np.minimum(i + d, off + n - 1)
            v = rng.poisson(3.0, len(d)) + 1
            pix1.append(i)
            pix2.append(j)
            cnt.append(v)
        # trans block
        ti = rng.integers(0, n1, 2_000_000)
        tj = rng.integers(n1, n1 + n2, 2_000_000)
        pix1.append(ti)
        pix2.append(tj)
        cnt.append(rng.poisson(1.0, 2_000_000) + 1)
        weights = rng.uniform(0.5, 1.5, n1 + n2)
        weights[rng.random(n1 + n2) < 0.03] = np.nan
        write_cool(
            path, chromsizes, binsize,
            (np.concatenate(pix1), np.concatenate(pix2),
             np.concatenate(cnt)),
            weights=weights,
        )
    return Cooler(path)


def bench_extension(n_sites=6_000, maxdist=1_000_000, seed=0):
    """Extension-hook throughput, all three routes (reference
    accumulate_stream + _add_snip extra_funcs, coolpup.py:1236–1283,
    puputils.py:39–41, 244–253):

    - ``frame_column``: the canonical accumulate_values pattern over a
      precomputed FRAME column — stays on the device kernel, extras are a
      per-group host regrouping (VERDICT r3 #4).
    - ``batch_hook``: postprocess_batch_func — per-snip DATA semantics,
      vectorized: the hook sees each chunk's [N, W, W] window stack
      aligned with the frame (VERDICT r4 #3's vectorized hook signature).
    - ``snip_hook``: a postprocess_snip_func that must see gathered pixel
      data one dict at a time — the per-snip Python host stream, priced
      honestly; its floor is numpy-call overhead per snip (~25-30 us on
      this 2-core host), not the gather (batched since round 5)."""
    from functools import partial

    import pandas as pd

    from coolpuppy_tpu import CoordCreator, PileUpper
    from coolpuppy_tpu.lib.puputils import accumulate_values

    clr = _bench_cooler()
    binsize = clr.binsize
    length = clr.n_bins * binsize
    rng = np.random.default_rng(seed)

    def make_feats(n):
        starts = np.sort(rng.choice(length - 10_000, n, replace=False))
        return pd.DataFrame(
            {
                "chrom": "chr1",
                "start": starts,
                "end": starts + 1_000,
                "name": ".",
                "score": rng.uniform(0, 1, n).round(4),
                "strand": rng.choice(["+", "-"], n),
            }
        )

    def post(snip):
        snip["center"] = float(np.nansum(snip["data"][8:13, 8:13]))
        yield snip

    def batch_post(frame, data):
        frame = frame.copy(deep=False)
        frame["center"] = np.nansum(data[:, 8:13, 8:13], axis=(1, 2))
        return frame

    def run(f, route):
        t0 = time.time()
        cc = CoordCreator(
            f, binsize, features_format="bed", flank=100_000,
            maxdist=maxdist, nshifts=0,
        )
        pu = PileUpper(clr, cc, expected=False, control=False)
        if route == "frame":
            kw = dict(
                extra_sum_funcs={
                    "score1": partial(accumulate_values, key="score1")
                }
            )
        elif route == "batch":
            kw = dict(
                postprocess_batch_func=batch_post,
                extra_sum_funcs={
                    "center": partial(accumulate_values, key="center")
                },
            )
        else:
            kw = dict(
                postprocess_snip_func=post,
                extra_sum_funcs={
                    "center": partial(accumulate_values, key="center")
                },
            )
        pups = pu.pileupsWithControl(**kw)
        n = int(pups.set_index("group").loc["all", "n"])
        return n / (time.time() - t0), n

    # frame-column pattern at the plain workload scale (device path)
    feats_big = make_feats(20_000)
    run(feats_big.iloc[:1_000], "frame")
    rate_a, n_frame = run(feats_big, "frame")
    rate_b, _ = run(feats_big, "frame")
    frame_rate = max(rate_a, rate_b)
    feats_small = make_feats(n_sites)
    # vectorized per-snip-data hook
    run(feats_small.iloc[:200], "batch")
    batch_a, n_batch = run(feats_small, "batch")
    batch_b, _ = run(feats_small, "batch")
    batch_rate = max(batch_a, batch_b)
    # per-snip dict hook (host stream)
    run(feats_small.iloc[:200], "snip")
    snip_rate, n_snip = run(feats_small, "snip")
    return frame_rate, n_frame, batch_rate, n_batch, snip_rate, n_snip


def bench_scaling(n_loci=262_144, W=21, seed=0):
    """Scaling efficiency of the loci-sharded engine step over 1/2/4/8
    devices (virtual CPU mesh in this environment; on hardware the same
    shard_map rides ICI). Fixed global workload, best-of-3."""
    import jax

    from coolpuppy_tpu.ops.gather import GatherConfig
    from coolpuppy_tpu.parallel.mesh import (
        make_engine_sharded_step,
        make_loci_mesh,
    )

    csr, coo, r1, r2, gid, flip, valid, evec = make_workload(
        n_loci=n_loci, W=W, seed=seed
    )
    from coolpuppy_tpu.ops.tiles import build_tile_stack

    B = 64
    ts = build_tile_stack(coo, B, r1=r1, r2=r2, window1=W, window2=W)
    n_bins = csr.shape[0]
    pad = 1 << int(np.ceil(np.log2(n_bins + B)))
    validp = np.zeros(pad, np.float32)
    validp[:n_bins] = valid
    evecp = np.full(pad, np.nan, np.float32)
    evecp[:n_bins] = evec
    cov = np.zeros(8, np.float32)
    dd0 = (r1 - r2).astype(np.int32)
    sm = np.ones(n_loci, bool)
    ncolp = np.int32(ts.tile_map.shape[1])
    tmap = ts.tile_map.ravel()

    devices = jax.devices()
    rates = {}
    sizes = [n for n in (1, 2, 4, 8) if n <= len(devices)]
    for n in sizes:
        mesh = make_loci_mesh(devices[:n])
        cfg = GatherConfig(
            W=W, B=B, S=n_loci // n, block=min(1024, n_loci // n),
            capacity=8, cis=True, ignore_diags=2, ooe=True,
            emit_expected=False, coverage=False, stripes=False,
        )
        step = make_engine_sharded_step(cfg, mesh)
        args = (ts.tiles, tmap, ncolp, evecp, validp, validp, cov, cov,
                r1, r2, dd0, gid, sm)
        jax.block_until_ready(step(*args))  # compile
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(step(*args))
            best = min(best, time.time() - t0)
        rates[n] = n_loci / best
    # row-partitioned tiles + ppermute halo exchange (parallel/rowshard.py):
    # same workload, but each device holds only its tile-row band — measure
    # throughput retention AND the per-device tile-memory reduction
    from coolpuppy_tpu.parallel.rowshard import (
        build_row_partition,
        make_row_sharded_step,
        route_snips,
    )

    row_rates = {}
    row_mem_frac = {}
    for n in sizes:
        mesh = make_loci_mesh(devices[:n])
        part = build_row_partition(ts, r1, n)
        if part is None:
            continue
        order, counts = route_snips(part, r1)
        maxcnt = int(counts.max())
        # pad the per-device shard to the scan-block multiple, not pow2 —
        # a max count just past a power of two would double the padded work
        S_dev = max(1024, -(-maxcnt // 1024) * 1024)
        cfg = GatherConfig(
            W=W, B=B, S=S_dev, block=min(1024, S_dev),
            capacity=8, cis=True, ignore_diags=2, ooe=True,
            emit_expected=False, coverage=False, stripes=False,
        )
        step = make_row_sharded_step(cfg, mesh)
        dev_items = np.split(order, np.cumsum(counts)[:-1])
        r1c = np.zeros((n, S_dev), np.int32)
        r2c = np.zeros((n, S_dev), np.int32)
        dd0c = np.zeros((n, S_dev), np.int32)
        cidc = np.zeros((n, S_dev), np.int32)
        smc = np.zeros((n, S_dev), bool)
        for d in range(n):
            sel = dev_items[d]
            r1c[d, : len(sel)] = r1[sel]
            r2c[d, : len(sel)] = r2[sel]
            dd0c[d, : len(sel)] = dd0[sel]
            cidc[d, : len(sel)] = gid[sel]
            smc[d, : len(sel)] = True
        args = (part.tiles, part.send_idx, part.tile_map, part.ncolp,
                evecp, validp, validp, cov, cov, r1c, r2c, dd0c, cidc, smc)
        jax.block_until_ready(step(*args))  # compile
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(step(*args))
            best = min(best, time.time() - t0)
        row_rates[n] = n_loci / best
        row_mem_frac[n] = part.tiles[0].nbytes / ts.tiles.nbytes
    # per-device PALLAS kernel on the mesh (parallel/pallas_mesh.py), in
    # interpret mode: Mosaic is unavailable on CPU, so this measures the
    # pallas path's mesh dispatch + halo + psum overhead — the retention of
    # the path the engine actually uses on multi-chip TPU (VERDICT r3 #6).
    # Small snip count: the interpreter is ~3 orders slower than Mosaic.
    from coolpuppy_tpu.ops.pallas_gather import PALLAS_B
    from coolpuppy_tpu.ops.tiles import build_tile_stack as _bts
    from coolpuppy_tpu.parallel.pallas_mesh import PallasMeshSession
    from coolpuppy_tpu.parallel.rowshard import (
        build_row_partition as _brp,
        route_snips as _rs,
    )

    n_p = 4096
    r1p, r2p, gidp = r1[:n_p], r2[:n_p], gid[:n_p]
    ts128 = _bts(coo, PALLAS_B, r1=r1p, r2=r2p, window1=W, window2=W)
    n_bins_v = csr.shape[0]
    cfg_kw = dict(
        W=W, capacity=16, cis=True, ignore_diags=2, ooe=True,
        interpret=True,
    )
    pallas_rates = {}
    for n in sizes:
        mesh = make_loci_mesh(devices[:n])
        part = _brp(ts128, r1p, n) if n > 1 else None
        if part is not None:
            order, counts = _rs(part, r1p)
        else:
            order = np.arange(n_p)
            counts = np.full(n, n_p // n, np.int64)
            counts[: n_p % n] += 1
        dev_items = np.split(order, np.cumsum(counts)[:-1])
        sess = PallasMeshSession(
            mesh, ts128, part, validp, validp, evecp, cfg_kw
        )
        S_dev = max(64, 1 << int(np.ceil(np.log2(max(1, counts.max())))))
        rows1 = [r1p[i] for i in dev_items]
        rows2 = [r2p[i] for i in dev_items]
        cids = [gidp[i] for i in dev_items]
        jax.block_until_ready(
            sess.run_chunk(rows1, rows2, cids, S_dev, 16)
        )  # compile
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(
                sess.run_chunk(rows1, rows2, cids, S_dev, 16)
            )
            best = min(best, time.time() - t0)
        pallas_rates[n] = n_p / best
    pallas_retention = {
        n: pallas_rates[n] / pallas_rates[1] for n in pallas_rates
    }

    # virtual CPU devices share one host's cores (total compute is FIXED), so
    # the measurable quantity is throughput RETENTION under n-way sharding:
    # 1 - (collective + partitioning overhead). On real chips, per-device
    # compute multiplies by n on top of this retention.
    retention = {n: rates[n] / rates[1] for n in sizes}
    row_retention = {n: row_rates[n] / rates[1] for n in row_rates}
    return rates, retention, row_retention, row_mem_frac, pallas_retention


def probe_tunnel():
    """Measure the host<->device link at bench time (8 MB each way): the
    axon tunnel's bandwidth drifts ~2x between runs, and every staged or
    fetched byte rides it — recording it makes each bench JSON
    self-describing about the link it ran over."""
    import jax
    import jax.numpy as jnp

    x = np.random.default_rng(0).random(2_000_000).astype(np.float32)

    def barrier(arr):
        # block_until_ready can return early on tunneled arrays; a scalar
        # device_get is the only reliable completion fence here
        return float(jax.device_get(jnp.sum(arr)))

    w = jax.device_put(x)
    barrier(w)  # warm path + compile the sum
    t0 = time.time()
    d = jax.device_put(x)
    barrier(d)
    up = x.nbytes / 1e6 / max(1e-9, time.time() - t0)
    y = d * np.float32(1.000001)
    barrier(y)  # y fully materialized on device before timing the fetch
    t0 = time.time()
    np.asarray(y)
    down = x.nbytes / 1e6 / max(1e-9, time.time() - t0)
    return round(up, 1), round(down, 1)


def bench_genome(n_chroms=20, bins_per=13_500, binsize=10_000,
                 n_sites=37_000, maxdist=2_000_000, nshifts=10, seed=0):
    """Reference-realistic GENOME-WIDE workload: ~2.7 Gbp over 20
    chromosomes at 10 kb (~150M stored contacts), 37k stranded CTCF-like
    sites (the scale of the reference's Bonev_CTCF beds and its
    loop_ref.np.txt golden: 10 kb, 10 shifts, by-strand) — exercises the
    multi-region pipeline (per-chrom staging prefetch + streams) rather
    than the single-region kernel loop."""
    import os

    import pandas as pd

    from coolpuppy_tpu import pileup
    from coolpuppy_tpu.io import Cooler, write_cool

    path = "/tmp/bench_genome.cool"
    chroms = [f"chr{i+1}" for i in range(n_chroms)]
    chromsizes = {c: bins_per * binsize for c in chroms}
    if not os.path.exists(path):
        # cooler generation uses its OWN rng: feature sampling below must
        # be identical whether the cooler came from cache or not
        rng = np.random.default_rng(seed)
        pix1, pix2, cnt = [], [], []
        off = 0
        for c in chroms:
            d = rng.zipf(1.35, 18_000_000)
            d = d[d < bins_per][:7_500_000]
            i = rng.integers(0, bins_per, len(d)) + off
            j = np.minimum(i + d, off + bins_per - 1)
            v = rng.poisson(3.0, len(d)) + 1
            pix1.append(i.astype(np.int64))
            pix2.append(j.astype(np.int64))
            cnt.append(v.astype(np.int32))
            off += bins_per
        n_bins = off
        weights = rng.uniform(0.5, 1.5, n_bins)
        weights[rng.random(n_bins) < 0.03] = np.nan
        write_cool(
            path, chromsizes, binsize,
            (np.concatenate(pix1), np.concatenate(pix2),
             np.concatenate(cnt)),
            weights=weights,
        )
    clr = Cooler(path)

    per = n_sites // n_chroms
    frames = []
    rng_f = np.random.default_rng(seed + 1)
    for c in chroms:
        # sample BIN positions (13.5k-element population) — replace=False
        # over the bp population permuted ~1e8 elements per chromosome
        bins_ok = np.arange(1, bins_per - 2)
        starts = np.sort(rng_f.choice(bins_ok, per, replace=False)) * binsize
        frames.append(pd.DataFrame({
            "chrom": c, "start": starts, "end": starts + 1_000,
            "name": ".", "score": 0,
            "strand": rng_f.choice(["+", "-"], per),
        }))
    feats = pd.concat(frames, ignore_index=True)

    def run(f):
        t0 = time.time()
        pup = pileup(clr, f, features_format="bed", flank=100_000,
                     maxdist=maxdist, nshifts=nshifts, seed=0,
                     by_strand=True)
        wall = time.time() - t0
        n = int(pup.loc[pup["orientation"] == "all", "n"].iloc[0]) + int(
            pup.loc[pup["orientation"] == "all", "control_n"].iloc[0]
        )
        import importlib

        _ep = importlib.import_module("coolpuppy_tpu.engine.pileup")
        phases = {
            k: round(v, 2)
            for k, v in getattr(
                getattr(_ep, "LAST_TIMERS", None), "seconds", {}
            ).items()
        }
        return n / wall, wall, n, phases

    run(feats.iloc[: per])  # warm compiles on one chrom's worth
    rate, wall, n, phases = run(feats)
    rate2, wall2, _, phases2 = run(feats)
    if rate2 > rate:
        rate, wall, phases = rate2, wall2, phases2
    return rate, wall, n, len(feats), phases


def bench_reference_loop(csr, r1, r2, valid, evec, W, n=20_000):
    """The reference's per-snip hot loop (coolpup.py:1104–1191): CSR slice ->
    dense, NaN bad rows/cols, diag mask, ooe divide, nansum-accumulate."""
    isnan = valid < 0.5
    acc = np.zeros((W, W))
    num = np.zeros((W, W), np.int64)
    ar = np.arange(W)
    ii, jj = np.meshgrid(ar, ar, indexing="ij")
    t0 = time.time()
    for s in range(n):
        a, b = int(r1[s]), int(r2[s])
        data = csr[a : a + W, b : b + W].toarray().astype(float)
        data[isnan[a : a + W], :] = np.nan
        data[:, isnan[b : b + W]] = np.nan
        D = np.abs(a - b + ii - jj)
        data[D < 2] = np.nan
        with np.errstate(divide="ignore", invalid="ignore"):
            exp = evec[np.minimum(D, len(evec) - 1)]
            data = data / exp
        acc = np.nansum([acc, data], axis=0)
        num += np.isfinite(data)
    dt = time.time() - t0
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--loci", type=int, default=1_000_000)
    ap.add_argument("--chunk", type=int, default=65_536)
    ap.add_argument("--ref-snips", type=int, default=20_000)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument(
        "--backend", choices=["xla", "pallas"], default="pallas"
    )
    ap.add_argument(
        "--engine",
        action="store_true",
        help="benchmark the full pileup() pipeline instead of the kernel",
    )
    ap.add_argument(
        "--rescale",
        action="store_true",
        help="benchmark the 99x99 rescaled-TAD workload",
    )
    ap.add_argument(
        "--modes",
        action="store_true",
        help="benchmark stripes / coverage_norm engine modes vs plain",
    )
    ap.add_argument(
        "--scaling",
        action="store_true",
        help="scaling efficiency over a 1/2/4/8-device loci mesh (CPU here)",
    )
    ap.add_argument(
        "--extension",
        action="store_true",
        help="host snip-stream throughput with per-snip extension hooks",
    )
    ap.add_argument(
        "--genome",
        action="store_true",
        help="genome-wide multi-chromosome workload (37k CTCF-scale sites"
        ", 20 chroms, 10 shifts, by-strand)",
    )
    args = ap.parse_args()
    if args.quick:
        args.loci, args.chunk, args.ref_snips = 131_072, 32_768, 2_000

    if args.scaling:
        # multi-chip hardware is unavailable here: the scaling bench always
        # runs on a virtual 8-device CPU mesh (must be set before jax inits)
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()

    from coolpuppy_tpu.jax_setup import ensure_jax_cache

    ensure_jax_cache()

    if args.scaling:
        import jax

        # this image's jax ignores JAX_PLATFORMS when the axon plugin is
        # present; force CPU through the config API
        jax.config.update("jax_platforms", "cpu")
        (rates, retention, row_retention, row_mem_frac,
         pallas_retention) = bench_scaling()
        top = max(retention)
        print(
            json.dumps(
                {
                    "metric": "sharding_throughput_retention_8dev",
                    "value": round(retention[top], 3),
                    "unit": "fraction",
                    "vs_baseline": None,
                    "detail": {
                        "platform": str(jax.devices()[0].platform),
                        "note": (
                            "virtual CPU mesh shares one host's cores: total "
                            "compute is fixed, so this measures throughput "
                            "retained under n-way loci sharding (collective "
                            "overhead); real chips multiply compute by n on "
                            "top of this"
                        ),
                        "snips_per_sec": {
                            str(k): round(v) for k, v in rates.items()
                        },
                        "retention": {
                            str(k): round(v, 3) for k, v in retention.items()
                        },
                        "rowshard_retention": {
                            str(k): round(v, 3)
                            for k, v in row_retention.items()
                        },
                        "rowshard_tile_mem_frac": {
                            str(k): round(v, 3)
                            for k, v in row_mem_frac.items()
                        },
                        "pallas_mesh_dispatch_check": {
                            str(k): round(v, 3)
                            for k, v in pallas_retention.items()
                        },
                        "pallas_mesh_note": (
                            "dispatch/collective OVERHEAD CHECK, not a "
                            "retention measurement: the per-device quad "
                            "kernel runs in interpret mode (Mosaic is "
                            "unavailable on CPU) over this host's 2 cores, "
                            "so values >1 only show the absence of a "
                            "dispatch/collective cliff on the engine's "
                            "multi-chip path. Real ICI scaling retention "
                            "is UNMEASURABLE in this environment (one "
                            "tunneled chip, no ICI)"
                        ),
                    },
                }
            )
        )
        return

    if args.genome:
        import jax

        rate, wall, n, n_feats, phases = bench_genome()
        up, down = probe_tunnel()
        print(
            json.dumps(
                {
                    "metric": "genome_snippets_per_sec",
                    "value": round(rate),
                    "unit": "snips/s",
                    "vs_baseline": None,
                    "detail": {
                        "device": str(jax.devices()[0]),
                        "snips": n,
                        "features": n_feats,
                        "chroms": 20,
                        "nshifts": 10,
                        "wall_s": round(wall, 2),
                        "phase_seconds": phases,
                        "phase_note": (
                            "ingest (HDF5 slab reads) and device overlap "
                            "via the region prefetch pipeline; wall < "
                            "their sum. The remainder is host "
                            "coordinate generation + staging/fetch "
                            "latency on the tunnel."
                        ),
                        "tunnel_mbps_up": up,
                        "tunnel_mbps_down": down,
                    },
                }
            )
        )
        return

    if args.extension:
        import jax

        (frame_rate, n_frame, batch_rate, n_batch, snip_rate,
         n_snip) = bench_extension()
        print(
            json.dumps(
                {
                    "metric": "extension_snippets_per_sec",
                    "value": round(frame_rate),
                    "unit": "snips/s",
                    "vs_baseline": None,
                    "detail": {
                        "device": str(jax.devices()[0]),
                        "frame_column_device_path": round(frame_rate),
                        "frame_column_snips": n_frame,
                        "batch_hook_path": round(batch_rate),
                        "batch_hook_snips": n_batch,
                        "snip_hook_host_path": round(snip_rate),
                        "snip_hook_snips": n_snip,
                    },
                }
            )
        )
        return

    if args.rescale:
        import jax

        rate, wall, n_snips, ref_rate = bench_rescale()
        print(
            json.dumps(
                {
                    "metric": "rescale_snippets_per_sec",
                    "value": round(rate),
                    "unit": "snips/s",
                    "vs_baseline": round(rate / ref_rate, 2),
                    "detail": {
                        "device": str(jax.devices()[0]),
                        "snips": n_snips,
                        "wall_s": round(wall, 2),
                        "ref_loop_snips_per_sec": round(ref_rate, 1),
                    },
                }
            )
        )
        return

    if args.modes:
        import jax

        res = bench_modes()
        print(
            json.dumps(
                {
                    "metric": "modes_snippets_per_sec",
                    "value": round(res["stripes"]),
                    "unit": "snips/s",
                    "vs_baseline": round(res["stripes"] / res["plain"], 3),
                    "detail": {
                        "device": str(jax.devices()[0]),
                        "plain": round(res["plain"]),
                        "stripes": round(res["stripes"]),
                        "coverage_norm": round(res["coverage_norm"]),
                        "by_window": round(res["by_window"]),
                        "bedpe": round(res["bedpe"]),
                        "trans": round(res["trans"]),
                        "snips": res["snips"],
                    },
                }
            )
        )
        return

    if args.engine:
        import jax

        rate, wall, n_snips = bench_engine()
        print(
            json.dumps(
                {
                    "metric": "engine_snippets_per_sec",
                    "value": round(rate),
                    "unit": "snips/s",
                    "vs_baseline": None,
                    "detail": {
                        "device": str(jax.devices()[0]),
                        "snips": n_snips,
                        "wall_s": round(wall, 2),
                    },
                }
            )
        )
        return

    W = 21
    csr, coo, r1, r2, gid, flip, valid, evec = make_workload(
        n_loci=args.loci, W=W
    )
    if args.backend == "pallas":
        res = bench_pallas(coo, r1, r2, gid, valid, evec, W, args.chunk)
        ref_rate = bench_reference_loop(
            csr, r1, r2, valid, evec, W, n=args.ref_snips
        )
        import jax

        # headline: the end-to-end median (honest pipeline number);
        # device_* carries the tunnel-immune kernel-only median
        up, down = probe_tunnel()
        print(
            json.dumps(
                {
                    "metric": "snippets_per_sec",
                    "value": round(res["e2e_rate"]),
                    "unit": "snips/s",
                    "vs_baseline": round(res["e2e_rate"] / ref_rate, 2),
                    "detail": {
                        "backend": args.backend,
                        "device": str(jax.devices()[0]),
                        "loci": res["snips"],
                        "window": W,
                        "tunnel_mbps_up": up,
                        "tunnel_mbps_down": down,
                        "accounting_note": (
                            "e2e now times the FULL fresh-region pipeline "
                            "per repeat (tile scatter + upload + normalize "
                            "+ sort + dispatch + fetch, overlapped where "
                            "possible). Rounds 1-3 timed staging "
                            "separately with async device_put, so the "
                            "tile-upload cost (~0.3-0.9 s/region on this "
                            "tunnel) never appeared in their 1.6-2.1M "
                            "headlines — those numbers are not comparable. "
                            "device_only_* is the tunnel-immune kernel "
                            "rate."
                        ),
                        "e2e_median_s": round(res["e2e_t"], 3),
                        "e2e_runs_s": res["e2e_times"],
                        "device_only_snips_per_sec": round(
                            res["device_rate"]
                        ),
                        "device_median_s": round(res["device_t"], 3),
                        "device_runs_s": res["dev_times"],
                        "compile_s": round(res["compile_t"], 2),
                        "ref_scipy_snips_per_sec": round(ref_rate),
                        "pixels_per_sec": round(res["e2e_rate"] * W * W),
                    },
                }
            )
        )
        return
    tpu_rate, best, compile_time, snips = bench_tpu(
        csr, coo, r1, r2, gid, flip, valid, evec, W, args.chunk
    )
    ref_rate = bench_reference_loop(
        csr, r1, r2, valid, evec, W, n=args.ref_snips
    )
    import jax

    print(
        json.dumps(
            {
                "metric": "snippets_per_sec",
                "value": round(tpu_rate),
                "unit": "snips/s",
                "vs_baseline": round(tpu_rate / ref_rate, 2),
                "detail": {
                    "backend": args.backend,
                    "device": str(jax.devices()[0]),
                    "loci": snips,
                    "window": W,
                    "wall_s": round(best, 3),
                    "compile_s": round(compile_time, 2),
                    "ref_scipy_snips_per_sec": round(ref_rate),
                    "pixels_per_sec": round(tpu_rate * W * W),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
