"""Pallas TPU kernel: quad-sorted fused window-gather + accumulate.

The XLA path (ops/gather.py) materializes a 2Bx2B superwindow per snip, which
moves ~40x more HBM bytes than the windows themselves and tops out on
per-snip dynamic-slice overhead. This kernel exploits snip locality instead:

1. The host (or device) pre-normalizes the block-sparse tile stack ONCE
   per region (ops/tiles.py::normalize_tile_stack) into a SINGLE
   NaN-encoded stack: bad-bin masks, diagonal masks and OOE expected
   division baked in; masked-out/NaN pixels carry NaN, division-by-zero
   poison stays +inf (like the reference's accumulators,
   coolpup.py:1154–1156). One stack keeps the device kernel to ONE shape
   for every normalization mode, halves the DMA/VMEM traffic of the
   earlier (contribution, num) pair, and makes host work O(touched
   tiles), amortized over all snips.
2. The host sorts snips by their tile *quad* (the 2x2 block of B=128 tiles
   their window touches) — near-diagonal loci cluster heavily, so a quad
   averages tens-to-hundreds of snips.
3. Grid = one step per quad: 4 async DMAs stage the quad's tiles into a
   VMEM superwindow, then the per-snip inner loop is one window cut
   (aligned pow2 sublane over-slice + dynamic rolls — Mosaic requires
   provable 8/128 alignment and non-pow2 sublane rolls rotate into tile
   padding), an in-register not-NaN/isfinite split, and two
   dynamic-indexed accumulates into VMEM-resident [C, W, W] group
   accumulators, SOFTWARE-PIPELINED 16 snips wide: each snip's
   over-slice -> roll -> roll chain is ~135 cycles of serial latency and
   one-at-a-time processing capped the loop at ~7.1M snips/s regardless
   of vector-op count, DMA churn, or sequential unroll; issuing 16
   independent cut chains before their (snip-ordered, bit-identical)
   accumulates overlaps the chains for a measured 16.3M snips/s at W=21
   (see BENCH_REPORT roofline). The single stack additionally halves
   stack HBM/DMA and the normalize/staging work.
4. Per-snip and per-quad scalars ride in SMEM via scalar prefetch;
   accumulator blocks are constant across the sequential TPU grid, so
   accumulation needs no atomics.

Flips are handled by the caller via the flip-bank trick (ops/gather.py
merge_flip_banks) — no flip work in-kernel. Semantics are identical to
ops/gather.py (reference hot loop coolpup.py:1104–1191). Use
PallasPileupSession to keep the stacks device-resident across calls.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tiles import normalize_tile_stack

PALLAS_B = 128  # tile size: lane-aligned DMA destinations require this


def _ceil_pow2(x):
    return 1 << int(np.ceil(np.log2(max(1, int(x)))))


@dataclass(frozen=True)
class PallasGatherConfig:
    W: int
    Q: int  # quad slots (padded)
    capacity: int
    interpret: bool = False
    B: int = PALLAS_B
    # software-pipeline width: independent cut chains in flight per
    # inner-loop block (the knee is ~16 at W=21; see the kernel body)
    unroll: int = 16

    def __post_init__(self):
        # W + alignment headroom must fit the superwindow rows
        assert self.W <= self.B - 8


@lru_cache(maxsize=32)
def _make_pallas_call(cfg: PallasGatherConfig):
    """The raw pallas_call for one packed call (unjitted — wrapped by
    make_pallas_pileup_step for single-device dispatch, or embedded in
    parallel/pallas_mesh.make_sharded_pallas_step under shard_map)."""
    W, B, C = cfg.W, cfg.B, cfg.capacity

    def kernel(
        k00, k01, k10, k11, qstart, qcount, snip,
        stiles_ref,
        sum_ref, num_ref, ssup, sems,
    ):
        q = pl.program_id(0)

        @pl.when(q == 0)
        def _():
            sum_ref[...] = jnp.zeros_like(sum_ref)
            num_ref[...] = jnp.zeros_like(num_ref)

        cnt = qcount[q]

        @pl.when(cnt > 0)
        def _():
            # ONE NaN-encoded stack instead of (contribution, num) pairs:
            # 4 DMAs and one cut per snip, with num derived in-register
            # (isfinite) — the second cut was ~45% of the inner loop
            copies = [
                pltpu.make_async_copy(
                    stiles_ref.at[k00[q]], ssup.at[0:B, 0:B], sems.at[0]
                ),
                pltpu.make_async_copy(
                    stiles_ref.at[k01[q]], ssup.at[0:B, B : 2 * B],
                    sems.at[1],
                ),
                pltpu.make_async_copy(
                    stiles_ref.at[k10[q]], ssup.at[B : 2 * B, 0:B],
                    sems.at[2],
                ),
                pltpu.make_async_copy(
                    stiles_ref.at[k11[q]], ssup.at[B : 2 * B, B : 2 * B],
                    sems.at[3],
                ),
            ]
            for c in copies:
                c.start()
            for c in copies:
                c.wait()

            # sublane dynamic offsets must be 8-aligned: load an aligned
            # pow2 over-slice and rotate into place (non-pow2 sublane rolls
            # rotate into tile padding on hardware)
            WA = 1 << int(np.ceil(np.log2(W + 8)))
            SMAX = snip.shape[0] - 1

            def cut(j):
                # clamped read: past-cnt lanes of the last pipeline block
                # read the zero-padded call buffer (decodes to offsets 0,
                # group 0) — their accumulates are guarded below
                s = jnp.minimum(qstart[q] + j, SMAX)
                # per-snip scalars ride ONE packed int32 in SMEM:
                # bits [24:31)=row offset, [17:24)=col offset, [0:17)=group id
                # (one upload + one SMEM read per snip instead of three; the
                # top bit stays clear so int32 shifts are sign-safe)
                v = snip[s]
                a = v >> 24
                b = (v >> 17) & 0x7F
                g = v & 0x1FFFF
                a_al = pl.multiple_of((a // 8) * 8, 8)
                a_off = a - a_al
                rows = ssup[pl.ds(a_al, WA), :]  # [WA, 2B]
                rows = pltpu.roll(rows, -a_off, 0)
                return g, pltpu.roll(rows, -b, 1)[0:W, 0:W]

            def acc(g, sw):
                # NaN -> contributes 0, counts 0; +inf poison -> sum only
                fin = sw == sw  # not-NaN (cheaper than isnan+not)
                sum_ref[g] = sum_ref[g] + jnp.where(fin, sw, 0.0)
                num_ref[g] = num_ref[g] + (
                    fin & (jnp.abs(sw) != jnp.inf)
                ).astype(jnp.float32)

            # SOFTWARE PIPELINING, the round-5 2.3x: issue U independent
            # cut chains back-to-back, THEN their accumulates. Each
            # snip's over-slice -> roll -> roll chain is ~135 cycles of
            # serial latency; one-at-a-time processing (any unroll) never
            # overlapped them (7.1M snips/s). With the chains interleaved
            # the measured rate scales 10.8M (U=2) -> 13.8M (4) -> 16.5M
            # (16, the knee) at W=21, bit-identical outputs. Accumulates
            # stay in snip order, so flip-bank/group semantics and float
            # summation order are unchanged.
            U = cfg.unroll

            def body(blk, _):
                js = [blk * U + u for u in range(U)]
                cuts = [cut(j) for j in js]
                for j, (g, sw) in zip(js, cuts):

                    @pl.when(j < cnt)
                    def _(g=g, sw=sw):
                        acc(g, sw)

                return 0

            jax.lax.fori_loop(0, (cnt + U - 1) // U, body, 0)

    out_specs = [
        pl.BlockSpec((C, W, W), lambda *_: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C, W, W), lambda *_: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((C, W, W), jnp.float32),
        jax.ShapeDtypeStruct((C, W, W), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((2 * B, 2 * B), jnp.float32),  # ssup
    ]
    scratch.append(pltpu.SemaphoreType.DMA((4,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(cfg.Q,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # stiles (HBM)
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=cfg.interpret,
    )


@lru_cache(maxsize=32)
def make_pallas_pileup_step(cfg: PallasGatherConfig):
    call = _make_pallas_call(cfg)

    @jax.jit
    def step(k00, k01, k10, k11, qstart, qcount, snip, stiles):
        s, n = call(k00, k01, k10, k11, qstart, qcount, snip, stiles)
        return {"sum": s, "num": n}

    return step


@lru_cache(maxsize=32)
def _make_coo_scatter(K_pad, B):
    """jitted sparse materialization: scatter-add the COO wire payload
    into the dense [K_pad, B, B] f32 raw stack (CooTileStack; ~45M nnz/s
    measured on-chip — the dense host scatter AND its tile upload never
    happen)."""

    @jax.jit
    def f(idx, vals, inv):
        z = jnp.zeros(K_pad * B * B, jnp.float32)
        z = z.at[idx].add(vals.astype(jnp.float32) * inv)
        return z.reshape(K_pad, B, B)

    return f


def pack_call_args(ks, qstart, qcount, snips, lo, used, Q, chunk):
    """Concatenate one packed call's 7 scalar arrays into ONE int32 buffer
    of length 6*Q + chunk — a single device_put per call instead of seven.
    Through a ~20 ms-latency tunnel the per-transfer LATENCY (not bytes)
    dominated dispatch: 7 transfers x calls serialized ~1 s per 1M-snip
    stream (VERDICT r3 #1)."""
    flat = np.zeros(6 * Q + chunk, np.int32)
    for i, a in enumerate((*ks, qstart, qcount)):
        flat[i * Q : (i + 1) * Q] = a
    flat[6 * Q : 6 * Q + used] = snips[lo : lo + used]
    return flat


@lru_cache(maxsize=32)
def make_pallas_pileup_step_flat(cfg: PallasGatherConfig, chunk: int):
    """make_pallas_pileup_step over the fused flat scalar buffer
    (see pack_call_args); the XLA-side slices are free."""
    call = _make_pallas_call(cfg)
    Q = cfg.Q

    @jax.jit
    def step(flat, stiles):
        parts = [flat[i * Q : (i + 1) * Q] for i in range(6)]
        snip = flat[6 * Q : 6 * Q + chunk]
        s, n = call(*parts, snip, stiles)
        return {"sum": s, "num": n}

    return step


@lru_cache(maxsize=32)
def make_stripe_gather(W, B, f16, vertical):
    """Per-snip stripe rows as ONE flat XLA gather from the normalized
    stack: element j of snip (a, b)'s horizontal stripe is
    M[a+mid, b+j] = stiles[tile_map[(a+mid)//B, (b+j)//B], (a+mid)%B,
    (b+j)%B]; vertical swaps the roles (rows a+i, column b+mid; callers
    reverse). n*W gathered elements replace the stripe VARIANT of the quad
    kernel, whose per-snip dynamic single-row VMEM stores ran ~50x slower
    than the plain kernel (round-4 profile: 0.9 s per 131k snips).
    The NaN-encoded stack already carries the reference semantics (masked
    & zero-count -> NaN, poison +inf kept, coolpup.py:1164–1188), so the
    gathered rows ARE the planes."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(stiles, tmap_flat, ncolp, r1, r2):
        # ROW gather + in-row take_along_axis: whole 128-lane tile rows
        # gather contiguously (2.8x the elementwise flat gather on TPU —
        # XLA scalar gathers are slow), then the W-lane window cuts out of
        # the materialized [n, 2B] rows. Vertical stripes run over the
        # TRANSPOSED per-tile layout implicitly by gathering tile COLUMNS:
        # M[a+i, b+mid] — roles of the axes swap.
        mid = W // 2
        if vertical:
            anchor = r2 + mid  # fixed column
            t1 = anchor // B
            along = r1  # varying row
        else:
            anchor = r1 + mid  # fixed row
            t1 = anchor // B
            along = r2
        o1 = anchor % B
        tA = along // B
        if vertical:
            kL = jnp.take(tmap_flat, tA * ncolp + t1)
            kR = jnp.take(tmap_flat, (tA + 1) * ncolp + t1)
            # column extraction: gather the fixed column's lane from each
            # tile ROW of the two stacked tiles -> operate on the
            # transposed per-tile view so the gather stays row-contiguous
            st2 = jnp.swapaxes(stiles, 1, 2).reshape(-1, B)
        else:
            kL = jnp.take(tmap_flat, t1 * ncolp + tA)
            kR = jnp.take(tmap_flat, t1 * ncolp + tA + 1)
            st2 = stiles.reshape(-1, B)
        rows = jnp.concatenate(
            [
                jnp.take(st2, kL * B + o1, axis=0),
                jnp.take(st2, kR * B + o1, axis=0),
            ],
            axis=1,
        )  # [n, 2B]
        idx = (along % B)[:, None] + jnp.arange(W, dtype=along.dtype)[
            None, :
        ]
        out = jnp.take_along_axis(rows, idx, axis=1)
        return out.astype(jnp.float16) if f16 else out

    return f


@lru_cache(maxsize=32)
def make_stripe_gather_hv(W, B, f16):
    """Both orientations fused in one jit: ONE dispatch and ONE [n, 2W]
    device->host payload per chunk (h = [:, :W], v unreversed =
    [:, W:])."""
    import jax
    import jax.numpy as jnp

    fh = make_stripe_gather(W, B, False, False)
    fv = make_stripe_gather(W, B, False, True)

    @jax.jit
    def f(stiles, tmap_flat, ncolp, r1, r2):
        h = fh(stiles, tmap_flat, ncolp, r1, r2)
        v = fv(stiles, tmap_flat, ncolp, r1, r2)
        out = jnp.concatenate([h, v], axis=1)
        return out.astype(jnp.float16) if f16 else out

    return f


def pack_snips(o1, o2, cid):
    """Pack per-snip (row offset < 128, col offset < 128, group id < 2^17)
    into the kernel's single int32 SMEM word (layout in the kernel body).
    Out-of-range fields would overflow into adjacent fields and decode as
    wrong offsets/groups with no error — fail loudly instead."""
    o1 = np.asarray(o1, np.int32)
    o2 = np.asarray(o2, np.int32)
    cid = np.asarray(cid, np.int32)
    if len(o1):
        assert o1.max(initial=0) < 128 and o1.min(initial=0) >= 0, (
            "pack_snips: row offset out of the 7-bit field (B must be 128)"
        )
        assert o2.max(initial=0) < 128 and o2.min(initial=0) >= 0, (
            "pack_snips: col offset out of the 7-bit field (B must be 128)"
        )
        assert cid.max(initial=0) < (1 << 17) and cid.min(initial=0) >= 0, (
            "pack_snips: group id out of the 17-bit field"
        )
    return (o1 << 24) | (o2 << 17) | cid


def pack_stream(r1, r2, cid, tile_map, B, Q_CAP, chunk):
    """Globally quad-sort a snip stream and greedily pack it into
    fixed-shape kernel calls.

    One counting sort (native C++; numpy keysort fallback) orders the
    packed per-snip words by tile quad; consecutive quads then pack into
    calls bounded by ``chunk`` snips and ``Q_CAP`` quad slots, so each quad
    is DMA-staged once per stream and the grid length tracks real work. A
    quad larger than the snip budget splits across calls (its tiles
    re-stage). Returns ``(snips, packs)`` — ``snips`` is the sorted
    packed-word array and each pack is ``([k00, k01, k10, k11], qstart,
    qcount, snip_offset, snip_count)`` with qstart relative to the call's
    snip slice. An empty stream yields one all-empty call (zeroed
    accumulators)."""
    from .. import native

    ncol = tile_map.shape[1]
    n = len(r1)
    r1a = np.asarray(r1)
    r2a = np.asarray(r2)
    packed = pack_snips(r1a % B, r2a % B, cid)
    nbuckets = int(tile_map.shape[0] - 1) * ncol + 1
    q32 = ((r1a // B).astype(np.int64) * ncol + (r2a // B)).astype(np.int32)
    if native.quad_sort is not None and nbuckets <= (1 << 23) and n > 0:
        snips, counts_full = native.quad_sort(q32, packed, nbuckets)
        uniq = np.flatnonzero(counts_full)
        counts = counts_full[uniq]
    else:
        # 47-bit key: quad id above the 31 packed payload bits
        key = (q32.astype(np.int64) << 31) | packed.astype(np.int64)
        key.sort(kind="stable")
        snips = (key & 0x7FFFFFFF).astype(np.int32)
        qs = (key >> 31).astype(np.int32)
        if len(snips):
            bnd = np.flatnonzero(np.diff(qs)) + 1
            starts = np.concatenate([[0], bnd])
            counts = np.diff(np.concatenate([starts, [len(qs)]]))
            uniq = qs[starts.astype(np.int64)]
        else:
            uniq = counts = np.array([], np.int64)
    ut1 = uniq // ncol
    ut2 = uniq % ncol
    qk = (
        tile_map[ut1, ut2].astype(np.int32),
        tile_map[ut1, ut2 + 1].astype(np.int32),
        tile_map[ut1 + 1, ut2].astype(np.int32),
        tile_map[ut1 + 1, ut2 + 1].astype(np.int32),
    )

    packs = []
    qi, pos, base = 0, 0, 0
    nu = len(uniq)
    if nu == 0:
        packs.append((
            [np.zeros(Q_CAP, np.int32) for _ in range(4)],
            np.zeros(Q_CAP, np.int32), np.zeros(Q_CAP, np.int32), 0, 0,
        ))
    while qi < nu:
        ks = [np.zeros(Q_CAP, np.int32) for _ in range(4)]
        qstart = np.zeros(Q_CAP, np.int32)
        qcount = np.zeros(Q_CAP, np.int32)
        nq, used = 0, 0
        while qi < nu and nq < Q_CAP and used < chunk:
            take = min(counts[qi] - pos, chunk - used)
            for a, src in zip(ks, qk):
                a[nq] = src[qi]
            qstart[nq] = used
            qcount[nq] = take
            nq += 1
            used += take
            pos += take
            if pos == counts[qi]:
                qi += 1
                pos = 0
        packs.append((ks, qstart, qcount, base, used))
        base += used
    return snips, packs




def fold_expected(evec, pad):
    """evec2[x] = evec[|x - pad|] (NaN outside), as an [2*pad, 1] array.
    Retained for callers that need a fold; the kernel itself now consumes
    host-normalized tiles."""
    out = np.full(2 * pad, np.nan, np.float32)
    n = min(len(evec), pad)
    out[pad : pad + n] = evec[:n]
    out[pad - n + 1 : pad + 1] = evec[:n][::-1]
    return out.reshape(-1, 1)


class _LazyPlanes:
    """Handle for an async-fetched device array (run_stripes
    async_fetch=True): .get() materializes the numpy planes."""

    def __init__(self, dev_array):
        self._dev = dev_array

    def get(self):
        return np.asarray(self._dev)


class PallasPileupSession:
    """Device-resident state for repeated kernel invocations over one region:
    the raw tile stack is transferred once and normalized ON DEVICE
    (ops/tiles.py::normalize_tile_stack_device — halves tunnel bytes and moves
    the O(K·B²) mask/toeplitz work to the VPU); each run() quad-sorts one snip
    sub-chunk and dispatches the kernel WITHOUT a host sync, so successive
    chunks pipeline. Call finalize() on the collected outputs (or pass
    fetch=True) to block and materialize float64 totals + the poison plane."""

    def __init__(
        self, tile_stack, valid1, valid2, evec, cfg_kw, device_normalize=True
    ):
        import jax

        from ..jax_setup import ensure_jax_cache
        from .tiles import (
            SymTileStack,
            TileStack,
            expand_sym_device,
            normalize_tiles_device,
        )

        ensure_jax_cache()

        B = tile_stack.B
        assert B == PALLAS_B
        from .tiles import CooTileStack

        if isinstance(tile_stack, CooTileStack):
            # sparse wire: upload (idx, vals) pairs, scatter-add into the
            # dense raw stack ON DEVICE, then normalize there — for sparse
            # rectangles (trans products) the dense tile payload was
            # 10-30x the pixel payload
            from .tiles import normalize_tiles_device

            self.tile_stack = tile_stack
            cfg_kw = dict(cfg_kw)
            ooe = cfg_kw.pop("ooe", False)
            cis = cfg_kw.pop("cis", True)
            ignore_diags = cfg_kw.pop("ignore_diags", 2)
            frame_shift = cfg_kw.pop("frame_shift", 0)
            cfg_kw.pop("tile_f16", None)  # baked into the wire values
            cfg_kw.pop("fold_weights", None)  # COO folds weights on host
            self.cfg_kw = cfg_kw
            K_pad = max(64, _ceil_pow2(tile_stack.k1))
            nnz = tile_stack.nnz
            nnz_pad = max(64, _ceil_pow2(max(1, nnz)))
            idx = np.zeros(nnz_pad, np.int32)  # pad -> slot 0 (re-zeroed)
            idx[:nnz] = tile_stack.idx
            vals = np.zeros(nnz_pad, tile_stack.vals.dtype)
            vals[:nnz] = tile_stack.vals
            idx_d, vals_d = jax.device_put((idx, vals))
            tiles_dev = _make_coo_scatter(K_pad, B)(
                idx_d, vals_d, tile_stack.inv_scale
            )
            self.stiles_dev = normalize_tiles_device(
                tiles_dev,
                tile_stack.tile_map,
                B,
                valid1,
                valid2,
                evec=evec,
                ooe=ooe,
                cis=cis,
                ignore_diags=ignore_diags,
                frame_shift=frame_shift,
            )
            return
        if isinstance(tile_stack, SymTileStack):
            # upper-triangle upload: only ~half the tiles cross the link;
            # the full raw stack materializes on device (transpose/sym) and
            # normalizes there (VERDICT r3 #1 — tile upload dominated
            # fresh-region staging). tile_f16 halves the wire bytes again
            # (scaled f16; cast_tiles_f16 gates safety)
            self.tile_stack = tile_stack
            cfg_kw = dict(cfg_kw)
            ooe = cfg_kw.pop("ooe", False)
            cis = cfg_kw.pop("cis", True)
            ignore_diags = cfg_kw.pop("ignore_diags", 2)
            frame_shift = cfg_kw.pop("frame_shift", 0)
            tile_f16 = cfg_kw.pop("tile_f16", False)
            fold_weights = cfg_kw.pop("fold_weights", False)
            self.cfg_kw = cfg_kw
            K1 = tile_stack.n_tiles + 1
            K_pad = max(64, 1 << int(np.ceil(np.log2(max(1, K1)))))
            tiles_dev = expand_sym_device(
                tile_stack, k_pad=K_pad, f16_mode=tile_f16
            )
            self.stiles_dev = normalize_tiles_device(
                tiles_dev,
                tile_stack.tile_map,
                B,
                valid1,
                valid2,
                evec=evec,
                ooe=ooe,
                cis=cis,
                ignore_diags=ignore_diags,
                frame_shift=frame_shift,
                fold_weights=fold_weights,
            )
            return
        # pad the stack depth to pow2: K rides the kernel's input signature,
        # so a raw K would force one Mosaic recompile per region (padding
        # slots are never referenced by tile_map)
        K1 = tile_stack.tiles.shape[0]
        K_pad = max(64, 1 << int(np.ceil(np.log2(max(1, K1)))))
        if K_pad != K1:
            tile_stack = TileStack(
                tiles=np.concatenate(
                    [
                        tile_stack.tiles,
                        np.zeros((K_pad - K1, B, B), np.float32),
                    ]
                ),
                tile_map=tile_stack.tile_map,
                B=B,
                shape=tile_stack.shape,
            )
        self.tile_stack = tile_stack
        cfg_kw = dict(cfg_kw)
        ooe = cfg_kw.pop("ooe", False)
        cis = cfg_kw.pop("cis", True)
        ignore_diags = cfg_kw.pop("ignore_diags", 2)
        frame_shift = cfg_kw.pop("frame_shift", 0)
        tile_f16 = cfg_kw.pop("tile_f16", False)
        cfg_kw.pop("fold_weights", None)  # dense non-sym folds on host
        self.cfg_kw = cfg_kw
        if device_normalize:
            from .tiles import normalize_tile_stack_device

            self.stiles_dev = normalize_tile_stack_device(
                tile_stack,
                valid1,
                valid2,
                evec=evec,
                ooe=ooe,
                cis=cis,
                ignore_diags=ignore_diags,
                frame_shift=frame_shift,
                f16_mode=tile_f16,
            )
        else:
            stiles = normalize_tile_stack(
                tile_stack,
                valid1,
                valid2,
                evec=evec,
                ooe=ooe,
                cis=cis,
                ignore_diags=ignore_diags,
                frame_shift=frame_shift,
            )
            self.stiles_dev = jax.device_put(stiles)

    @classmethod
    def _from_stacks(cls, tile_stack, stiles_dev, cfg_kw):
        """Session over an ALREADY-device-resident normalized stack."""
        self = cls.__new__(cls)
        self.tile_stack = tile_stack
        cfg_kw = dict(cfg_kw)
        for k in (
            "ooe", "cis", "ignore_diags", "frame_shift", "tile_f16",
            "fold_weights",
        ):
            cfg_kw.pop(k, None)
        self.cfg_kw = cfg_kw
        self.stiles_dev = stiles_dev
        return self

    @classmethod
    def pipelined_run(cls, sym, valid1, valid2, evec, cfg_kw, r1, r2, cid,
                      chunk=131072, n_slabs=8):
        """Fresh-region dispatch with the tile upload PIPELINED against
        kernel execution: the upper-triangle tiles upload in equal slabs
        (async), and each packed call dispatches against the normalized
        expansion of the smallest upper-slab PREFIX that covers its quads
        — so early calls run while later slabs are still in flight.

        Prefixes are self-contained because both slot orders are row-major
        and a full slot's upper source sits at row min(tr, tc) <= tr, i.e.
        never AFTER it; zero-filled not-yet-uploaded slots are only ever
        referenced by later calls. One region-staging upload no longer
        serializes in front of the whole kernel stream (the round-4 e2e
        floor through a ~25 MB/s link).

        Returns ``(session, total_dev)`` — the session holds the FULL
        normalized stacks (for stripes/finalize), total_dev the summed
        {sum, num} device accumulators."""
        import jax
        import jax.numpy as jnp

        from ..jax_setup import ensure_jax_cache
        from .tiles import (
            SymTileStack,
            _make_expand_sym_fn,
            normalize_prep_device,
            normalize_tiles_from_prep,
        )

        ensure_jax_cache()
        assert isinstance(sym, SymTileStack)
        B = sym.B
        assert B == PALLAS_B
        cfg_kw = dict(cfg_kw)
        interpret = bool(cfg_kw.get("interpret"))
        ooe = cfg_kw.pop("ooe", False)
        cis = cfg_kw.pop("cis", True)
        ignore_diags = cfg_kw.pop("ignore_diags", 2)
        frame_shift = cfg_kw.pop("frame_shift", 0)
        tile_f16 = cfg_kw.pop("tile_f16", False)
        fold_weights = cfg_kw.pop("fold_weights", False)
        Q_CAP = 64 if interpret else 128
        if interpret:
            chunk = min(chunk, max(64, _ceil_pow2(max(1, len(r1)))))

        K1 = sym.n_tiles + 1
        K_pad = max(64, _ceil_pow2(K1))
        Ku = sym.upper.shape[0]
        Ku_pad = max(64, _ceil_pow2(Ku))
        # n_slabs must DIVIDE Ku_pad or the tail rows would never upload
        # (silent corruption); Ku_pad is pow2, so round down to a pow2
        n_slabs = 1 << int(np.floor(np.log2(max(1, n_slabs))))
        n_slabs = min(n_slabs, Ku_pad)
        slab_rows = Ku_pad // n_slabs
        # f16 wire: halves every slab in flight. The scale is planned with
        # one cheap scan; the expensive multiply+f16 cast runs PER SLAB so
        # it overlaps the previous slab's async transfer — casting the
        # whole stack up front serialized ~0.2-0.3 s in front of the
        # upload and ate most of the wire win
        from .tiles import cast_slab_f16, cast_tiles_int8, f16_wire_plan

        inv = np.float32(1.0)
        upper = np.zeros((Ku_pad, B, B), np.float32)
        upper[:Ku] = sym.upper
        slabs = []
        if tile_f16 == "int8":
            # engine-proven exact integer counts <= 127: quarter of the
            # f32 wire, cast per slab like the f16 path
            for i in range(n_slabs):
                wire = cast_tiles_int8(
                    upper[i * slab_rows : (i + 1) * slab_rows]
                )
                if wire is None:
                    slabs = []
                    break
                slabs.append(jax.device_put(wire))
            if slabs:
                tile_f16 = False  # wire settled
            else:
                tile_f16 = "exact"  # misjudged: raw ints still f16-exact
        plan = f16_wire_plan(sym.upper, tile_f16) if tile_f16 else None
        if slabs:
            plan = None
        if plan is not None:
            scale, inv = plan
            for i in range(n_slabs):
                wire = cast_slab_f16(
                    upper[i * slab_rows : (i + 1) * slab_rows], scale,
                    tile_f16,
                )
                if wire is None:  # exact-mode mismatch: restart as f32
                    plan = None
                    inv = np.float32(1.0)
                    slabs = []
                    break
                slabs.append(jax.device_put(wire))
        if plan is None and not slabs:
            slabs = [
                jax.device_put(upper[i * slab_rows : (i + 1) * slab_rows])
                for i in range(n_slabs)
            ]

        # quad sort + packing AFTER the device_puts are queued: the slab
        # transfers stream through the link while the host sorts
        snips, packs = pack_stream(
            r1, r2, cid, sym.tile_map, B, Q_CAP, chunk
        )

        src = np.zeros(K_pad, np.int32)
        src[:K1] = sym.src
        flip = np.zeros(K_pad, bool)
        flip[:K1] = sym.flip
        diag = np.zeros(K_pad, bool)
        diag[:K1] = sym.diag
        prefix_max_src = np.maximum.accumulate(src)
        # upload the expansion metadata ONCE (each prefix rebuild would
        # otherwise re-ship three small arrays through the ~20 ms link)
        src_d, flip_d, diag_d = jax.device_put((src, flip, diag))
        expand_f = _make_expand_sym_fn(B, bool(sym.diag_full))
        # upload the per-bin vectors ONCE: each normalize over a prefix
        # would otherwise re-upload ~6 small arrays (a link round trip
        # each), serializing ~1 s of latency in front of the pipeline
        prep = normalize_prep_device(
            sym.tile_map, B, valid1, valid2, evec=evec, ooe=ooe,
            frame_shift=frame_shift, k_pad=K_pad,
        )

        # only the LARGEST prefix built so far is kept: prefixes are
        # supersets (extra uploaded slots are simply unreferenced by
        # earlier calls), and retaining every prefix would hold up to
        # n_slabs full normalized stacks in HBM at once
        built = {"s": -1, "stacks": None}

        def stacks_for(s):
            if s > built["s"]:
                parts = list(slabs[: s + 1])
                rest = (n_slabs - s - 1) * slab_rows
                if rest:
                    parts.append(jnp.zeros((rest, B, B), slabs[0].dtype))
                up = (
                    jnp.concatenate(parts) if len(parts) > 1 else parts[0]
                )
                full = expand_f(up, src_d, flip_d, diag_d, inv)
                built["s"] = s
                built["stacks"] = normalize_tiles_from_prep(
                    full, prep, B, ooe=ooe, cis=cis,
                    ignore_diags=ignore_diags, frame_shift=frame_shift,
                    fold_weights=fold_weights,
                )
            return built["stacks"]

        cfg = PallasGatherConfig(Q=Q_CAP, **cfg_kw)
        step = make_pallas_pileup_step_flat(cfg, chunk)
        total = None
        for ks, qstart, qcount, lo, used in packs:
            m_c = int(max(int(a.max(initial=0)) for a in ks))
            u_c = int(prefix_max_src[m_c])
            s_c = min(u_c // slab_rows, n_slabs - 1)
            st = stacks_for(s_c)
            flat = jax.device_put(
                pack_call_args(ks, qstart, qcount, snips, lo, used,
                               Q_CAP, chunk)
            )
            out = step(flat, st)
            total = (
                out if total is None else jax.tree.map(jnp.add, total, out)
            )
        st = stacks_for(n_slabs - 1)
        session = cls._from_stacks(sym, st, dict(cfg_kw))
        return session, total

    def run(self, r1, r2, dd0=None, cid=None, fetch=True):
        """One snip batch through the packed dispatch (dd0 unused: distance
        banding is encoded in cid by the engine)."""
        return self.run_many(r1, r2, cid, fetch=fetch)

    def run_many(self, r1, r2, cid, chunk=131072, pad_cid=None, fetch=True):
        """All snips via GLOBALLY quad-sorted, greedily packed kernel calls.

        One counting sort over the whole stream (native C++; numpy keysort
        fallback) sorts the packed per-snip words by tile quad, then
        consecutive quads are packed into fixed-shape calls bounded by
        ``chunk`` snips (the SMEM scalar-prefetch budget) and ``Q_CAP`` quad
        slots. Because each call covers a CONTIGUOUS run of quads, every quad
        is DMA-staged once per stream instead of once per chunk — the old
        per-chunk local sort re-staged ~every touched quad for all chunks
        (16× the HBM traffic at 1M snips) and padded each chunk's quads to a
        1024-step grid (~20 µs per empty step). Call shapes stay pinned
        (Q_CAP, chunk), so each window size still compiles once per process.
        Padding snips are simply never covered by any quad's [qstart,
        qstart+qcount) span, so no trash-slot work is dispatched for them
        (``pad_cid`` is retained for API compatibility)."""
        import jax.numpy as jnp

        interpret = bool(self.cfg_kw.get("interpret"))
        if interpret:
            # CPU tests: bound the padded chunk to the workload size
            chunk = min(chunk, max(64, _ceil_pow2(max(1, len(r1)))))
        Q_CAP = 64 if interpret else 128
        snips, packs = pack_stream(
            r1, r2, cid, self.tile_stack.tile_map, self.tile_stack.B,
            Q_CAP, chunk,
        )

        def prep(c):
            # ONE fused async upload per call (pack_call_args): the tunnel's
            # per-transfer latency, not bytes, dominated multi-array preps
            ks, qstart, qcount, lo, used = packs[c]
            return jax.device_put(
                pack_call_args(ks, qstart, qcount, snips, lo, used,
                               Q_CAP, chunk)
            )

        cfg = PallasGatherConfig(Q=Q_CAP, **self.cfg_kw)
        step = make_pallas_pileup_step_flat(cfg, chunk)

        # a single worker preps call c+1 while the device runs call c
        from concurrent.futures import ThreadPoolExecutor

        total = None
        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(prep, 0)
            for c in range(len(packs)):
                flat = fut.result()
                if c + 1 < len(packs):
                    fut = pool.submit(prep, c + 1)
                out = step(flat, self.stiles_dev)
                total = (
                    out
                    if total is None
                    else jax.tree.map(jnp.add, total, out)
                )
        if not fetch:
            return total
        return self.finalize([total])

    def run_stripes(self, r1, r2, chunk=131072, f16=False,
                    async_fetch=False, vertical=False, hv=False):
        """Per-snip stripe planes in ORIGINAL stream order (reference
        coolpup.py:1164–1188): horizontal = center row, ``vertical=True`` =
        center column rows (callers reverse), ``hv=True`` = both fused as
        [n, 2W]. ONE row-wise XLA gather per chunk from the session's
        normalized device stacks (make_stripe_gather) — no kernel pass, no
        sorting. ``async_fetch=True`` starts the device->host copy and
        returns a handle (.get()), so plane transfers overlap later
        work."""
        import jax.numpy as jnp

        B = self.tile_stack.B
        W = int(self.cfg_kw["W"])
        n = len(r1)
        if n == 0:
            out = np.zeros((0, 2 * W if hv else W), np.float32)
            return _LazyPlanes(out) if async_fetch else out
        if not hasattr(self, "_tmap_dev"):
            tm = self.tile_stack.tile_map
            self._tmap_dev = jax.device_put(
                np.ascontiguousarray(tm.ravel().astype(np.int32))
            )
            self._tmap_ncol = np.int32(tm.shape[1])
        g = (
            make_stripe_gather_hv(W, B, bool(f16))
            if hv
            else make_stripe_gather(W, B, bool(f16), bool(vertical))
        )
        parts = []
        for lo in range(0, n, chunk):
            sl = slice(lo, min(lo + chunk, n))
            m = sl.stop - sl.start
            mp = max(64, _ceil_pow2(m)) if m < chunk else chunk
            r1p = np.zeros(mp, np.int32)
            r1p[:m] = r1[sl]
            r2p = np.zeros(mp, np.int32)
            r2p[:m] = r2[sl]
            out = g(
                self.stiles_dev, self._tmap_dev,
                self._tmap_ncol, jax.device_put(r1p), jax.device_put(r2p),
            )
            parts.append(out[:m] if m != mp else out)
        gathered = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        if async_fetch:
            # start the device->host transfer now and materialize later:
            # stripe planes are the dominant stripes-mode payload, and the
            # async copy overlaps subsequent collection/kernel work
            try:
                gathered.copy_to_host_async()
            except Exception:
                pass
            return _LazyPlanes(gathered)
        return np.asarray(gathered)

    @staticmethod
    def finalize(outs, compact=None):
        """Block on a list of run(fetch=False) outputs and reduce them to
        float64 host totals. The reduction happens ON DEVICE with a single
        device->host fetch at the end — fetching each chunk's [C, W, W]
        accumulators individually costs one tunnel round-trip per array and
        dominated wall time at 15+ chunks. Poison rides the sums as +inf
        (contributions are nonnegative, so inf never cancels); expose it as
        the explicit plane the engine expects, once for the whole stream.

        ``compact=(G, half)`` slices the used accumulator rows ON DEVICE
        before the fetch — the kernel's capacity-pinned banks hold 1032
        rows per key while typical runs use ~10 ([0:G] unflipped +
        [half:half+G] flip bank; callers then merge with half=G). At
        genome scale the full-bank fetches were ~3.6 MB x 20 regions of
        pure padding."""
        total_dev = outs[0]
        for o in outs[1:]:
            total_dev = jax.tree.map(jnp.add, total_dev, o)
        if compact is not None:
            G, half = compact

            def cut(v):
                return jnp.concatenate([v[:G], v[half : half + G]])

            total_dev = {k: cut(v) for k, v in total_dev.items()}
        total = {
            k: np.asarray(jax.device_get(v), np.float64)
            for k, v in total_dev.items()
        }
        total["poison"] = np.isinf(total["sum"]).astype(np.float64)
        return total


def run_pallas_pileup(
    tile_stack, r1, r2, dd0, cid, valid1, valid2, evec, cfg_kw
):
    """One-shot wrapper around PallasPileupSession (tests / small runs)."""
    session = PallasPileupSession(tile_stack, valid1, valid2, evec, cfg_kw)
    return session.run(r1, r2, dd0, cid)
