"""Pallas quad kernel vs the XLA fused step (interpret mode on CPU; the
compiled path is exercised on TPU by bench.py and scripts/tpu_check.py)."""

import numpy as np
import pytest

from coolpuppy_tpu.ops.gather import GatherConfig, make_pileup_step
from coolpuppy_tpu.ops.pallas_gather import run_pallas_pileup
from coolpuppy_tpu.ops.tiles import build_tile_stack
from scipy import sparse as sp


@pytest.mark.parametrize("ooe", [False, True])
def test_pallas_matches_xla(ooe):
    rng = np.random.default_rng(0)
    n = 300
    W, B = 11, 128
    dense = rng.gamma(1.0, 1.0, (n, n)) * (rng.random((n, n)) < 0.3)
    dense = np.triu(dense) + np.triu(dense, 1).T
    coo = sp.coo_matrix(dense)
    S = 256
    r1 = rng.integers(0, n - W, S).astype(np.int32)
    r2 = rng.integers(0, n - W, S).astype(np.int32)
    dd0 = (r1 - r2).astype(np.int32)
    cid = rng.integers(0, 6, S).astype(np.int32)
    valid = np.zeros(512, np.float32)
    valid[:n] = (rng.random(n) > 0.1).astype(np.float32)
    evec = np.full(512, np.nan, np.float32)
    evec[:n] = (10.0 / (1.0 + np.arange(n))).astype(np.float32)
    evec[rng.integers(0, n, 5)] = 0.0  # exercise poison

    ts = build_tile_stack(coo, B, r1=r1, r2=r2, window1=W, window2=W)

    got = run_pallas_pileup(
        ts, r1, r2, dd0, cid, valid[:n], valid[:n], evec[:n],
        dict(W=W, capacity=8, cis=True, ignore_diags=2, ooe=ooe,
             interpret=True),
    )

    cfg = GatherConfig(
        W=W, B=B, S=S, block=128, capacity=8, cis=True, ignore_diags=2,
        ooe=ooe, emit_expected=False, coverage=False, stripes=False,
    )
    step = make_pileup_step(cfg)
    want = step(
        ts.tiles, ts.tile_map.ravel(), np.int32(ts.tile_map.shape[1]),
        evec, valid, valid, np.zeros(8, np.float32), np.zeros(8, np.float32),
        r1, r2, dd0, cid, np.ones(S, bool),
    )
    # pallas folds poison into the sums as +inf (reference-style) and
    # reports a 0/1 indicator; the XLA step zeroes infs and counts events.
    # Downstream both produce NaN at poisoned pixels, so compare there only
    # on the poison set.
    pois = np.asarray(want["poison"]) > 0
    np.testing.assert_array_equal(got["poison"] > 0, pois)
    np.testing.assert_allclose(
        got["sum"][~pois], np.asarray(want["sum"])[~pois],
        rtol=1e-5, atol=1e-5,
    )
    assert np.all(np.isinf(got["sum"][pois]))
    np.testing.assert_allclose(
        got["num"], np.asarray(want["num"]), rtol=1e-5, atol=1e-5
    )


def test_device_normalize_matches_host_and_clips_padded_valid():
    """normalize_tile_stack_device == normalize_tile_stack, including when
    the caller passes valid/evec vectors pow2-padded past the tiled extent
    (the engine does this; regression for a broadcast crash)."""
    from coolpuppy_tpu.ops.tiles import (
        normalize_tile_stack,
        normalize_tile_stack_device,
    )

    rng = np.random.default_rng(1)
    n = 300
    W, B = 11, 128
    dense = rng.gamma(1.0, 1.0, (n, n)) * (rng.random((n, n)) < 0.3)
    dense = np.triu(dense) + np.triu(dense, 1).T
    coo = sp.coo_matrix(dense)
    r1 = rng.integers(0, n - W, 64).astype(np.int32)
    r2 = rng.integers(0, n - W, 64).astype(np.int32)
    ts = build_tile_stack(coo, B, r1=r1, r2=r2, window1=W, window2=W)

    valid = (rng.random(n) > 0.1).astype(np.float32)
    evec = (10.0 / (1.0 + np.arange(n))).astype(np.float32)

    want_s = normalize_tile_stack(
        ts, valid, valid, evec=evec, ooe=True, cis=True, ignore_diags=2
    )
    # pow2-padded inputs, longer than the tile extent
    vpad = np.zeros(16384, np.float32)
    vpad[:n] = valid
    epad = np.full(16384, np.nan, np.float32)
    epad[:n] = evec
    got_s = np.asarray(normalize_tile_stack_device(
        ts, vpad, vpad, evec=epad, ooe=True, cis=True, ignore_diags=2,
        slab=4,  # force the multi-slab path too
    ))
    np.testing.assert_array_equal(np.isnan(got_s), np.isnan(want_s))
    fin = ~np.isnan(want_s)
    np.testing.assert_allclose(
        got_s[fin], want_s[fin], rtol=1e-6, atol=1e-6
    )


def _oracle_sums(coo, r1, r2, cid, valid, evec, W, C, ignore_diags=2):
    """Dense nansum/finite-count oracle (reference coolpup.py:1104-1156)."""
    dense = np.asarray(coo.todense(), np.float64)
    n = dense.shape[0]
    mat = dense.copy()
    bad = valid[:n] == 0
    mat[bad, :] = np.nan
    mat[:, bad] = np.nan
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    mat[np.abs(ii - jj) < ignore_diags] = np.nan
    ev = np.full((n, n), np.nan)
    d = np.abs(ii - jj)
    ok = d < len(evec)
    ev[ok] = np.asarray(evec, np.float64)[d[ok]]
    with np.errstate(divide="ignore", invalid="ignore"):
        mat = mat / ev
    s = np.zeros((C, W, W))
    m = np.zeros((C, W, W))
    for a, b, g in zip(r1, r2, cid):
        win = mat[a : a + W, b : b + W]
        fin = np.isfinite(win)
        s[g] += np.where(fin, win, 0.0)
        m[g] += fin
    return s, m


def test_packed_dispatch_edges():
    """Greedy packing edges: one quad bigger than the snip budget (splits
    across calls), quads exceeding Q_CAP (spill into more calls), empty
    stream, and group ids above 512 (the packed int32's 17-bit field)."""
    from coolpuppy_tpu.ops.pallas_gather import PallasPileupSession

    rng = np.random.default_rng(7)
    n, W, B = 700, 11, 128
    dense = rng.gamma(1.0, 1.0, (n, n)) * (rng.random((n, n)) < 0.2)
    dense = np.triu(dense) + np.triu(dense, 1).T
    coo = sp.coo_matrix(dense)
    valid = (rng.random(n) > 0.05).astype(np.float32)
    evec = (5.0 / (1.0 + np.arange(n))).astype(np.float32)

    C = 600  # > 512: exercises the wide group-id bits
    S = 1500
    # heavy cluster in one quad + a thin spread over many quads
    r1 = np.concatenate([
        np.full(900, 3, np.int32) + rng.integers(0, 5, 900).astype(np.int32),
        rng.integers(0, n - W, S - 900).astype(np.int32),
    ])
    r2 = np.concatenate([
        np.full(900, 9, np.int32) + rng.integers(0, 5, 900).astype(np.int32),
        rng.integers(0, n - W, S - 900).astype(np.int32),
    ])
    cid = rng.integers(0, C, S).astype(np.int32)
    cid[:10] = C - 1

    ts = build_tile_stack(coo, B, r1=r1, r2=r2, window1=W, window2=W)
    session = PallasPileupSession(
        ts, valid, valid, evec,
        dict(W=W, capacity=C, cis=True, ignore_diags=2, ooe=True,
             interpret=True),
    )
    # chunk=128 forces the 900-snip quad to split across >=8 calls; the
    # spread snips exceed Q_CAP=64 quads per call
    got = session.run_many(r1, r2, cid, chunk=128)
    want_s, want_m = _oracle_sums(coo, r1, r2, cid, valid, evec, W, C)
    pois = np.isinf(got["sum"])
    assert not pois.any()
    np.testing.assert_allclose(got["sum"], want_s, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(got["num"], want_m)

    # empty stream still returns zeroed accumulators
    empty = session.run_many(
        np.array([], np.int32), np.array([], np.int32), np.array([], np.int32)
    )
    assert empty["sum"].shape == (C, W, W)
    assert float(empty["sum"].sum()) == 0.0 and float(empty["num"].sum()) == 0.0


def test_run_stripes_matches_oracle():
    """run_stripes (flat XLA gather from the normalized stacks): h/v planes
    in stream order vs a dense oracle (reference coolpup.py:1164-1188)."""
    from coolpuppy_tpu.ops.pallas_gather import PallasPileupSession

    rng = np.random.default_rng(3)
    n, W, B = 500, 11, 128
    dense = rng.gamma(1.0, 1.0, (n, n)) * (rng.random((n, n)) < 0.25)
    dense = np.triu(dense) + np.triu(dense, 1).T
    coo = sp.coo_matrix(dense)
    valid = (rng.random(n) > 0.08).astype(np.float32)
    evec = (4.0 / (1.0 + np.arange(n))).astype(np.float32)
    S = 900
    r1 = rng.integers(0, n - W, S).astype(np.int32)
    r2 = rng.integers(0, n - W, S).astype(np.int32)
    r1[:300] = 5  # heavy quad -> max_quad splitting inside run_stripes
    r2[:300] = 9

    ts = build_tile_stack(coo, B, r1=r1, r2=r2, window1=W, window2=W)
    session = PallasPileupSession(
        ts, valid, valid, evec,
        dict(W=W, capacity=8, cis=True, ignore_diags=2, ooe=True,
             interpret=True),
    )
    h = session.run_stripes(r1, r2)
    v = session.run_stripes(r1, r2, vertical=True)[:, ::-1]

    # dense oracle (reference hot-loop semantics)
    mat = dense.copy().astype(np.float64)
    bad = valid == 0
    mat[bad, :] = np.nan
    mat[:, bad] = np.nan
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    mat[np.abs(ii - jj) < 2] = np.nan
    with np.errstate(divide="ignore", invalid="ignore"):
        mat = mat / evec.astype(np.float64)[np.abs(ii - jj)]
    mid = W // 2
    for k in rng.integers(0, S, 40):
        a, b = int(r1[k]), int(r2[k])
        want_h = mat[a + mid, b : b + W]
        want_v = mat[a : a + W, b + mid][::-1]
        for got, want in ((h[k], want_h), (v[k], want_v)):
            fin = np.isfinite(want)
            np.testing.assert_array_equal(np.isfinite(got), fin)
            np.testing.assert_allclose(
                got[fin], want[fin], rtol=1e-5, atol=1e-5
            )


def test_pipelined_run_matches_session():
    """pipelined_run (slab-prefix upload pipelining) must produce the
    identical accumulators to the plain session dispatch."""
    from coolpuppy_tpu.ops.pallas_gather import PallasPileupSession
    from coolpuppy_tpu.ops.tiles import build_tile_stack_sym

    rng = np.random.default_rng(9)
    n, W, B = 900, 21, 128
    dense = rng.gamma(1.0, 1.0, (n, n)) * (rng.random((n, n)) < 0.2)
    dense = np.triu(dense) + np.triu(dense, 1).T
    coo = sp.coo_matrix(dense)
    valid = (rng.random(n) > 0.05).astype(np.float32)
    evec = (4.0 / (1.0 + np.arange(n))).astype(np.float32)
    S = 3000
    r1 = rng.integers(0, n - W, S).astype(np.int32)
    r2 = rng.integers(0, n - W, S).astype(np.int32)
    cid = rng.integers(0, 4, S).astype(np.int32)

    sym = build_tile_stack_sym(coo, B, r1=r1, r2=r2, window1=W, window2=W)
    cfg_kw = dict(W=W, capacity=8, cis=True, ignore_diags=2, ooe=True,
                  interpret=True)
    plain = PallasPileupSession(sym, valid, valid, evec, dict(cfg_kw))
    want = plain.run_many(r1, r2, cid)

    sess, total = PallasPileupSession.pipelined_run(
        sym, valid, valid, evec, dict(cfg_kw), r1, r2, cid, n_slabs=4
    )
    got = PallasPileupSession.finalize([total])
    for k in ("sum", "num", "poison"):
        np.testing.assert_allclose(
            got[k][:8], want[k][:8], rtol=1e-6, atol=1e-6, err_msg=k
        )
    # the returned session's stacks are the FULL normalized stacks
    h1 = sess.run_stripes(r1[:50], r2[:50])
    h2 = plain.run_stripes(r1[:50], r2[:50])
    np.testing.assert_allclose(np.nan_to_num(h1), np.nan_to_num(h2))


def test_pipelined_run_non_pow2_slabs():
    """Non-divisor n_slabs must still cover every upper tile (the naive
    Ku_pad // n_slabs split silently dropped the tail rows — wrong sums
    with no error)."""
    from coolpuppy_tpu.ops.pallas_gather import PallasPileupSession
    from coolpuppy_tpu.ops.tiles import build_tile_stack_sym

    rng = np.random.default_rng(13)
    n, W, B = 1290, 21, 128
    dense = rng.gamma(1.0, 1.0, (n, n)) * (rng.random((n, n)) < 0.15)
    dense = np.triu(dense) + np.triu(dense, 1).T
    coo = sp.coo_matrix(dense)
    valid = (rng.random(n) > 0.05).astype(np.float32)
    evec = (4.0 / (1.0 + np.arange(n))).astype(np.float32)
    S = 2000
    r1 = rng.integers(0, n - W, S).astype(np.int32)
    r2 = np.minimum(r1 + rng.integers(0, 60, S), n - W - 1).astype(np.int32)
    cid = rng.integers(0, 4, S).astype(np.int32)
    sym = build_tile_stack_sym(coo, B, r1=r1, r2=r2, window1=W, window2=W)
    cfg_kw = dict(W=W, capacity=8, cis=True, ignore_diags=2, ooe=True,
                  interpret=True)
    want = PallasPileupSession(
        sym, valid, valid, evec, dict(cfg_kw)
    ).run_many(r1, r2, cid)
    for n_slabs in (3, 5, 6, 7):
        _, total = PallasPileupSession.pipelined_run(
            sym, valid, valid, evec, dict(cfg_kw), r1, r2, cid,
            n_slabs=n_slabs,
        )
        got = PallasPileupSession.finalize([total])
        np.testing.assert_allclose(
            got["sum"][:8], want["sum"][:8], rtol=1e-6, atol=1e-6,
            err_msg=f"n_slabs={n_slabs}",
        )


def test_cast_tiles_f16_exact_and_lossy():
    """Wire-compression safety gates (ops/tiles.cast_tiles_f16):
    integer counts round-trip bit-exactly under the pow2 scale; lossy
    mode bounds the relative error at 2^-11; inexact payloads are
    REFUSED in exact mode (ship f32)."""
    from coolpuppy_tpu.ops.tiles import cast_tiles_f16

    rng = np.random.default_rng(3)
    # raw integer counts <= 2048: always exact
    counts = rng.poisson(5.0, (7, 32, 32)).astype(np.float32)
    wire, inv = cast_tiles_f16(counts, "exact")
    np.testing.assert_array_equal(
        wire.astype(np.float32) * inv, counts
    )
    # counts that need > 11 significand bits: exact mode must refuse
    big = counts.copy()
    big[0, 0, 0] = 30011.0  # odd, > 2^14 -> not f16-representable
    assert cast_tiles_f16(big, "exact") is None
    # ... but lossy mode ships them at bounded relative error
    wire, inv = cast_tiles_f16(big, "lossy")
    rt = wire.astype(np.float32) * inv
    err = np.abs(rt - big) / np.maximum(np.abs(big), 1e-30)
    assert float(err.max()) <= 2.0 ** -11 + 1e-7
    # balanced-like floats, tiny magnitudes: the pow2 scale keeps them in
    # f16's normal range (no subnormal precision collapse)
    small = (rng.gamma(1.0, 1.0, (5, 16, 16)) * 1e-6).astype(np.float32)
    wire, inv = cast_tiles_f16(small, "lossy")
    rt = wire.astype(np.float32) * inv
    nz = small > 0
    err = np.abs(rt[nz] - small[nz]) / small[nz]
    assert float(err.max()) <= 2.0 ** -11 + 1e-7
    # NaN pixels (NaN balancing weights fold into raw tiles) survive
    nanny = counts.copy()
    nanny[1, 2, 3] = np.nan
    wire, inv = cast_tiles_f16(nanny, "exact")
    rt = wire.astype(np.float32) * inv
    assert np.isnan(rt[1, 2, 3])
    np.testing.assert_array_equal(rt, nanny)
    # off switch
    assert cast_tiles_f16(counts, False) is None


def test_pipelined_run_f16_wire():
    """tile_f16 wire compression through the full pipelined dispatch:
    "exact" on integer counts is bit-identical to the f32 wire; "lossy"
    on float values stays within the f16 tolerance."""
    from coolpuppy_tpu.ops.pallas_gather import PallasPileupSession
    from coolpuppy_tpu.ops.tiles import build_tile_stack_sym

    rng = np.random.default_rng(17)
    n, W, B = 900, 21, 128
    S = 2000
    valid = (rng.random(n) > 0.05).astype(np.float32)
    evec = (4.0 / (1.0 + np.arange(n))).astype(np.float32)
    r1 = rng.integers(0, n - W, S).astype(np.int32)
    r2 = rng.integers(0, n - W, S).astype(np.int32)
    cid = rng.integers(0, 4, S).astype(np.int32)
    base_kw = dict(W=W, capacity=8, cis=True, ignore_diags=2, ooe=True,
                   interpret=True)

    def run(coo, **kw):
        sym = build_tile_stack_sym(
            coo, B, r1=r1, r2=r2, window1=W, window2=W
        )
        _, total = PallasPileupSession.pipelined_run(
            sym, valid, valid, evec, dict(base_kw, **kw), r1, r2, cid,
            n_slabs=4,
        )
        return PallasPileupSession.finalize([total])

    # integer counts (unbalanced cooler): exact mode, bit-identical
    dense = (rng.poisson(2.0, (n, n)) * (rng.random((n, n)) < 0.2)).astype(
        np.float32
    )
    dense = np.triu(dense) + np.triu(dense, 1).T
    coo = sp.coo_matrix(dense)
    want = run(coo)
    got = run(coo, tile_f16="exact")
    for k in ("sum", "num", "poison"):
        np.testing.assert_array_equal(got[k][:8], want[k][:8], err_msg=k)

    # float values (balanced cooler): lossy mode at f16 tolerance
    densef = rng.gamma(1.0, 1.0, (n, n)) * (rng.random((n, n)) < 0.2)
    densef = np.triu(densef) + np.triu(densef, 1).T
    coof = sp.coo_matrix(densef)
    wantf = run(coof)
    gotf = run(coof, tile_f16="lossy")
    np.testing.assert_array_equal(gotf["num"][:8], wantf["num"][:8])
    fin = np.isfinite(wantf["sum"][:8])
    np.testing.assert_allclose(
        gotf["sum"][:8][fin], wantf["sum"][:8][fin], rtol=2e-3, atol=1e-4
    )


def test_device_normalize_f16_wire():
    """f16 wire through normalize_tile_stack_device (the non-sym upload
    path bedpe/trans streams ride): exact on integer counts, bounded
    relative error on floats."""
    from coolpuppy_tpu.ops.tiles import (
        normalize_tile_stack,
        normalize_tile_stack_device,
    )

    rng = np.random.default_rng(21)
    n, W, B = 300, 11, 128
    dense = (rng.poisson(2.0, (n, n)) * (rng.random((n, n)) < 0.3)).astype(
        np.float32
    )
    dense = np.triu(dense) + np.triu(dense, 1).T
    coo = sp.coo_matrix(dense)
    r1 = rng.integers(0, n - W, 64).astype(np.int32)
    r2 = rng.integers(0, n - W, 64).astype(np.int32)
    ts = build_tile_stack(coo, B, r1=r1, r2=r2, window1=W, window2=W)
    valid = (rng.random(n) > 0.1).astype(np.float32)
    evec = (10.0 / (1.0 + np.arange(n))).astype(np.float32)
    want_s = normalize_tile_stack(
        ts, valid, valid, evec=evec, ooe=True, cis=True, ignore_diags=2
    )
    got_s = np.asarray(normalize_tile_stack_device(
        ts, valid, valid, evec=evec, ooe=True, cis=True, ignore_diags=2,
        f16_mode="exact",
    ))
    np.testing.assert_array_equal(np.isnan(got_s), np.isnan(want_s))
    fin = np.isfinite(want_s)
    np.testing.assert_allclose(
        got_s[fin], want_s[fin], rtol=1e-6, atol=1e-6
    )


def test_coo_tile_stack_matches_dense():
    """Sparse COO wire (CooTileStack + device scatter) must reproduce the
    dense slab scatter bit-for-bit at f32 (unique-pixel cooler slabs), and
    the session built from it must match the dense session."""
    from coolpuppy_tpu.io.cool import PixelSlab
    from coolpuppy_tpu.ops.pallas_gather import PallasPileupSession
    from coolpuppy_tpu.ops.tiles import (
        build_tile_stack_coo,
        build_tile_stack_slab,
    )

    rng = np.random.default_rng(31)
    n1, n2 = 700, 500
    nnz = 4000
    rows = rng.integers(0, n1, nnz).astype(np.int64)
    cols = rng.integers(0, n2, nnz).astype(np.int64)
    key = rows * n2 + cols
    _, first = np.unique(key, return_index=True)
    rows, cols = rows[first], cols[first]
    vals = (rng.poisson(3.0, len(rows)) + 1).astype(np.float32)
    weights = rng.uniform(0.5, 1.5, max(n1, n2))
    weights[rng.random(max(n1, n2)) < 0.05] = np.nan
    slab = PixelSlab(
        rows=rows, cols=cols, vals=vals, lo1=0, lo2=0,
        shape=(n1, n2), weights=weights, mirror=False,
    )
    B = 128
    nr, nc = -(-n1 // B), -(-n2 // B)
    want = np.arange(nr * nc, dtype=np.int64)

    dense = build_tile_stack_slab(slab, B, want=want)
    coo = build_tile_stack_coo(slab, B, want)
    np.testing.assert_array_equal(coo.tile_map, dense.tile_map)
    # f32 rounding-order only (COO folds weights in f64 then casts once;
    # the native scatter folds in f32)
    np.testing.assert_allclose(
        np.nan_to_num(coo.expand_host(), nan=-1.0),
        np.nan_to_num(dense.tiles, nan=-1.0),
        rtol=2e-6, atol=1e-6,
    )

    # full session parity (device scatter + normalize + kernel)
    W = 11
    S = 400
    r1 = rng.integers(0, n1 - W, S).astype(np.int32)
    r2 = rng.integers(0, n2 - W, S).astype(np.int32)
    cid = rng.integers(0, 4, S).astype(np.int32)
    valid1 = (~np.isnan(weights[:n1])).astype(np.float32)
    valid2 = (~np.isnan(weights[:n2])).astype(np.float32)
    evec = np.array([np.nan], np.float32)
    kw = dict(W=W, capacity=8, cis=False, ignore_diags=2, ooe=False,
              interpret=True)
    want_out = PallasPileupSession(
        dense, valid1, valid2, evec, dict(kw)
    ).run_many(r1, r2, cid)
    got_out = PallasPileupSession(
        coo, valid1, valid2, evec, dict(kw)
    ).run_many(r1, r2, cid)
    for k in ("sum", "num", "poison"):
        np.testing.assert_allclose(
            got_out[k][:8], want_out[k][:8], rtol=1e-6, atol=1e-6,
            err_msg=k,
        )

    # f16 wire on integer counts stays exact after the weight fold? No —
    # weighted values are floats; lossy tolerance applies
    coo16 = build_tile_stack_coo(slab, B, want, f16_mode="lossy")
    got16 = PallasPileupSession(
        coo16, valid1, valid2, evec, dict(kw)
    ).run_many(r1, r2, cid)
    np.testing.assert_array_equal(got16["num"][:8], want_out["num"][:8])
    fin = np.isfinite(want_out["sum"][:8])
    np.testing.assert_allclose(
        got16["sum"][:8][fin], want_out["sum"][:8][fin],
        rtol=2e-3, atol=1e-4,
    )


def test_int8_raw_wire_fold_weights_matches():
    """int8 raw-count wire + device weight fold == the host-folded f32
    path (f32 rounding order only): session-level parity through the
    full run_many dispatch."""
    from coolpuppy_tpu.io.cool import PixelSlab
    from coolpuppy_tpu.ops.pallas_gather import PallasPileupSession
    from coolpuppy_tpu.ops.tiles import (
        build_tile_stack_slab_sym,
        cast_tiles_int8,
    )

    rng = np.random.default_rng(41)
    n = 700
    W, B = 21, 128
    nnz = 9000
    rows = rng.integers(0, n, nnz).astype(np.int64)
    cols = rng.integers(0, n, nnz).astype(np.int64)
    lo = np.minimum(rows, cols)
    hi = np.maximum(rows, cols)
    key = lo * n + hi
    _, first = np.unique(key, return_index=True)
    rows, cols = lo[first], hi[first]  # stored upper triangle
    vals = (rng.poisson(3.0, len(rows)) + 1).astype(np.float32)
    weights = rng.uniform(0.5, 1.5, n)
    weights[rng.random(n) < 0.05] = np.nan
    wclean = np.nan_to_num(weights).astype(np.float32)

    S = 600
    r1 = rng.integers(0, n - W, S).astype(np.int32)
    r2 = rng.integers(0, n - W, S).astype(np.int32)
    cid = rng.integers(0, 4, S).astype(np.int32)
    valid = (wclean > 0).astype(np.float32)
    evec = (4.0 / (1.0 + np.arange(n))).astype(np.float32)
    kw = dict(W=W, capacity=8, cis=True, ignore_diags=2, ooe=True,
              interpret=True)

    slab_w = PixelSlab(rows=rows, cols=cols, vals=vals, lo1=0, lo2=0,
                       shape=(n, n), weights=wclean, mirror=True)
    sym_w = build_tile_stack_slab_sym(
        slab_w, B, r1=r1, r2=r2, window1=W, window2=W
    )
    want = PallasPileupSession(
        sym_w, valid, valid, evec, dict(kw)
    ).run_many(r1, r2, cid)

    slab_raw = PixelSlab(rows=rows, cols=cols, vals=vals, lo1=0, lo2=0,
                         shape=(n, n), weights=None, mirror=True)
    sym_raw = build_tile_stack_slab_sym(
        slab_raw, B, r1=r1, r2=r2, window1=W, window2=W
    )
    assert cast_tiles_int8(sym_raw.upper) is not None  # counts <= 127
    got = PallasPileupSession(
        sym_raw, wclean, wclean, evec,
        dict(kw, tile_f16="int8", fold_weights=True),
    ).run_many(r1, r2, cid)
    np.testing.assert_array_equal(got["num"][:8], want["num"][:8])
    fin = np.isfinite(want["sum"][:8])
    np.testing.assert_allclose(
        got["sum"][:8][fin], want["sum"][:8][fin], rtol=2e-6, atol=1e-6
    )
    # poison pixels agree
    np.testing.assert_array_equal(
        got["poison"][:8] > 0, want["poison"][:8] > 0
    )


def test_int8_wire_engine_parity():
    """Engine-level int8 wire: force the mode past the accelerator gate
    on a balanced cooler with SMALL integer counts (<= 127, the int8
    precondition) and compare the full pileup output (device weight fold
    vs host fold: f32 rounding only)."""
    import os
    import sys
    import tempfile

    import pandas as pd

    sys.path.insert(0, "tests")
    from coolpuppy_tpu import CoordCreator, PileUpper
    from coolpuppy_tpu.io import Cooler, write_cool

    rng = np.random.default_rng(23)
    binsize = 1_000_000
    n = 60
    d = tempfile.mkdtemp()
    path = os.path.join(d, "toy_i8.cool")
    i, j = np.triu_indices(n)
    lam = 10.0 / (1.0 + np.abs(i - j)) + 0.5
    vals = rng.poisson(lam)
    keep = vals > 0
    weights = rng.uniform(0.5, 1.5, n)
    weights[rng.random(n) < 0.05] = np.nan
    write_cool(
        path, {"chrT": n * binsize}, binsize,
        (i[keep], j[keep], vals[keep]), weights=weights,
    )
    clr = Cooler(path)
    assert clr.counts_are_int

    starts = np.sort(rng.choice(np.arange(5, n - 5), 12, replace=False))
    feats = pd.DataFrame({
        "chrom": "chrT", "start": starts * binsize,
        "end": (starts + 1) * binsize, "name": "x", "score": 0,
        "strand": rng.choice(["+", "-"], 12),
    })

    def run(force_int8):
        cc = CoordCreator(
            feats, binsize, features_format="bed",
            flank=3 * binsize, nshifts=0, mindist=0, seed=0,
        )
        pu = PileUpper(
            clr, cc, backend="pallas-interpret", expected=False,
            control=False,
        )
        if force_int8:
            pu.tile_int8 = True
            pu._tile_f16_mode = lambda: "lossy"  # past the CPU gate
            probe = {}
            orig = pu._tile_wire_plan

            def spy(dev):
                out = orig(dev)
                probe["mode"] = out[0]
                return out

            pu._tile_wire_plan = spy
            res = pu.pileupsWithControl()
            assert probe.get("mode") == "int8", probe
            return res.set_index("group").loc["all"]
        return pu.pileupsWithControl().set_index("group").loc["all"]

    a = run(False)
    b = run(True)
    assert a["n"] == b["n"] > 0
    np.testing.assert_array_equal(a["num"], b["num"])
    fin = np.isfinite(np.asarray(a["data"], float))
    np.testing.assert_allclose(
        np.asarray(b["data"], float)[fin],
        np.asarray(a["data"], float)[fin],
        rtol=2e-6, atol=1e-7,
    )
