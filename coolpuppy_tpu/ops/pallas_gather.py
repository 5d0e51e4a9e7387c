"""Pallas TPU kernel: quad-sorted fused window-gather + accumulate.

The XLA path (ops/gather.py) materializes a 2Bx2B superwindow per snip, which
moves ~40x more HBM bytes than the windows themselves and tops out on
per-snip dynamic-slice overhead. This kernel exploits snip locality instead:

1. Host sorts snips by their tile *quad* (the 2x2 block of B=128 tiles their
   window touches) — near-diagonal loci cluster heavily, so a quad averages
   tens-to-hundreds of snips.
2. Grid = one step per quad. Each step DMAs the quad's 4 tiles from HBM into
   a VMEM superwindow once, then pre-normalizes the WHOLE superwindow:
   bad-bin mask outer product (column->row transpose + broadcast multiply —
   rank-1 dot_general miscompiles on hardware), diagonal mask from iota +
   the quad's constant diagonal offset, and OOE division by an expected
   toeplitz plane built from a *pre-folded* expected vector
   (evec2[x] = expected[|x - n0|], so no abs() in any index) via a
   lane-strided roll. Division-by-zero poison stays in the plane as +inf,
   exactly like the reference's accumulators (coolpup.py:1154–1156); the
   host recovers it as isinf(sum).
3. The per-snip inner loop is then just two window cuts (aligned pow2
   sublane over-slice + dynamic rolls — Mosaic requires provable 8/128
   alignment, and non-pow2 sublane rolls rotate into tile padding) and two
   dynamic-indexed accumulates into the VMEM-resident [C, W, W] group
   accumulators, manually unrolled. Measured ~28M snips/s in isolation.
4. Per-snip scalars (o1, o2, cid) and per-quad scalars ride in SMEM via
   scalar prefetch; accumulator blocks are constant across the sequential
   TPU grid, so accumulation needs no atomics.

Flips are handled by the caller via the flip-bank trick (ops/gather.py
merge_flip_banks) — no flip work in-kernel. Semantics are identical to
ops/gather.py (same mask planes; reference hot loop coolpup.py:1104–1191).
Use PallasPileupSession to keep the tile stack device-resident across calls.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PALLAS_B = 128  # tile size: lane-aligned DMA destinations require this


@dataclass(frozen=True)
class PallasGatherConfig:
    W: int
    Q: int  # quad slots (padded)
    capacity: int
    cis: bool
    ignore_diags: int
    ooe: bool
    interpret: bool = False
    B: int = PALLAS_B
    unroll: int = 2  # inner-loop unroll; compile time grows sharply with it

    def __post_init__(self):
        # W + alignment headroom must fit the superwindow rows
        assert self.W <= self.B - 8


def prep_quads(r1, r2, tile_map, B):
    """Sort snips by tile quad; returns (order, quad scalar arrays dict)."""
    t1, t2 = r1 // B, r2 // B
    ncol = tile_map.shape[1]
    q = t1.astype(np.int64) * ncol + t2
    order = np.argsort(q, kind="stable")
    qs = q[order]
    uniq, starts, counts = np.unique(qs, return_index=True, return_counts=True)
    ut1 = (uniq // ncol).astype(np.int64)
    ut2 = (uniq % ncol).astype(np.int64)
    quads = {
        "k00": tile_map[ut1, ut2].astype(np.int32),
        "k01": tile_map[ut1, ut2 + 1].astype(np.int32),
        "k10": tile_map[ut1 + 1, ut2].astype(np.int32),
        "k11": tile_map[ut1 + 1, ut2 + 1].astype(np.int32),
        "qb1": (ut1 * B).astype(np.int32),
        "qb2": (ut2 * B).astype(np.int32),
        "qstart": starts.astype(np.int32),
        "qcount": counts.astype(np.int32),
    }
    return order, quads


def pad_quads(quads, Q):
    out = {}
    n = len(quads["qstart"])
    assert n <= Q, f"too many quads ({n}) for Q={Q}"
    for k, v in quads.items():
        arr = np.zeros(Q, np.int32)
        arr[:n] = v
        out[k] = arr
    return out


@lru_cache(maxsize=32)
def make_pallas_pileup_step(cfg: PallasGatherConfig):
    W, B, C = cfg.W, cfg.B, cfg.capacity
    E = 2 * W - 1  # toeplitz span per snip

    def kernel(
        k00, k01, k10, k11, qb1, qb2, qdd0, qstart, qcount, o1, o2, cid,
        n0ref,
        tiles_ref, valid1_ref, valid2_ref, evec2_ref,
        sum_ref, num_ref,
        sup, msup, v1s, v2s, fs, sems,
    ):
        q = pl.program_id(0)

        @pl.when(q == 0)
        def _():
            sum_ref[...] = jnp.zeros_like(sum_ref)
            num_ref[...] = jnp.zeros_like(num_ref)

        cnt = qcount[q]

        @pl.when(cnt > 0)
        def _():
            # quad origins are tile-aligned; tell Mosaic so the dynamic
            # offsets below are provably aligned
            base1 = pl.multiple_of(qb1[q], B)
            base2 = pl.multiple_of(qb2[q], B)
            copies = [
                pltpu.make_async_copy(
                    tiles_ref.at[k00[q]], sup.at[0:B, 0:B], sems.at[0]
                ),
                pltpu.make_async_copy(
                    tiles_ref.at[k01[q]], sup.at[0:B, B : 2 * B], sems.at[1]
                ),
                pltpu.make_async_copy(
                    tiles_ref.at[k10[q]], sup.at[B : 2 * B, 0:B], sems.at[2]
                ),
                pltpu.make_async_copy(
                    tiles_ref.at[k11[q]], sup.at[B : 2 * B, B : 2 * B],
                    sems.at[3],
                ),
                # per-bin vectors live in HBM as [N, 128] with data in lane
                # 0 (VMEM-resident column vectors lane-pad to the same 128x,
                # but in 16 GB of HBM that's cheap, and HBM DMA slices must
                # be 128-wide); DMA the quad's row segments into scratch
                pltpu.make_async_copy(
                    valid1_ref.at[pl.ds(base1, 2 * B), :], v1s, sems.at[4]
                ),
                pltpu.make_async_copy(
                    valid2_ref.at[pl.ds(base2, 2 * B), :], v2s, sems.at[5]
                ),
            ]
            if cfg.ooe:
                dq = n0ref[0] + qdd0[q]
                fbase = dq - (2 * B - 1)
                fb_al = pl.multiple_of((fbase // 8) * 8, 8)
                f_off = fbase - fb_al
                copies.append(
                    pltpu.make_async_copy(
                        evec2_ref.at[pl.ds(fb_al, 8 * B), :], fs, sems.at[6]
                    )
                )
            for c in copies:
                c.start()
            for c in copies:
                c.wait()

            # quad bad-bin mask plane: broadcast outer product (NOTE: the
            # rank-1 dot_general formulation miscompiles on hardware;
            # column->row transposes and broadcast multiplies are verified)
            v1seg = v1s[:, 0:1]  # [2B, 1]
            v2seg = v2s[:, 0:1]  # [2B, 1]
            mask_plane = v1seg * v2seg.T
            if cfg.cis and cfg.ignore_diags > 0:
                # diagonal index of plane cell (x, y) is qdd0 + x - y
                xx = jax.lax.broadcasted_iota(jnp.int32, (2 * B, 2 * B), 0)
                yy = jax.lax.broadcasted_iota(jnp.int32, (2 * B, 2 * B), 1)
                absd = jnp.abs(qdd0[q] + xx - yy)
                mask_plane = mask_plane * (
                    absd >= cfg.ignore_diags
                ).astype(jnp.float32)

            if cfg.ooe:
                # per-quad expected plane: esup[x, y] = evec2[dq + x - y]
                # (dq = quad-origin diagonal in folded coords). Build the
                # transposed staircase with a lane roll whose shift strides
                # along sublanes (Mosaic only strides non-minor axes), then
                # transpose once per quad.
                # pow2 over-slice (see WA note): 8B rows covers 4B + align
                f = pltpu.roll(fs[:, 0:1], -f_off, 0)[0 : 4 * B, :]
                # NaN (missing expected) would poison the plane algebra;
                # ride through as a negative sentinel, restored below
                f = jnp.where(jnp.isfinite(f), f, -1.0)
                fb = jnp.broadcast_to(f.T, (2 * B, 4 * B))
                # planeT[y, x] = f[(x - (2B+1) - y) mod 4B] = f[x - y + 2B-1]
                planeT = pltpu.roll(
                    fb, 2 * B + 1, 1, stride=1, stride_axis=0
                )[:, 0 : 2 * B]
                ew_plane = planeT.T
                ew_plane = jnp.where(ew_plane >= 0.0, ew_plane, jnp.nan)

            # pre-normalize the whole superwindow ONCE per quad: per-snip
            # work then reduces to two window cuts + two accumulates.
            # Poison (ooe division by an expected of 0) is folded into the
            # contribution plane as +inf, exactly like the reference's sums
            # (coolpup.py:1154–1156); the host recovers it as isinf(sum).
            if cfg.ooe:
                val_plane = sup[...] / ew_plane
                fin = jnp.isfinite(val_plane)
                num_plane = fin.astype(jnp.float32) * mask_plane
                keep = jnp.where(jnp.isnan(val_plane), 0.0, val_plane)
                contrib_plane = jnp.where(mask_plane > 0, keep, 0.0)
            else:
                num_plane = mask_plane
                contrib_plane = sup[...] * mask_plane
            sup[...] = contrib_plane
            msup[...] = num_plane

            # sublane dynamic offsets must be 8-aligned: load an aligned
            # over-slice and rotate into place. NOTE: dynamic sublane rolls
            # require power-of-two row counts on hardware (non-pow2 sizes
            # rotate into the tile padding) — hence next_pow2, not round8.
            WA = 1 << int(np.ceil(np.log2(W + 8)))

            U = cfg.unroll  # dynamic trip count forbids lax unroll

            def one_snip(j):
                s = qstart[q] + j
                a = o1[s]
                b = o2[s]
                g = cid[s]

                a_al = pl.multiple_of((a // 8) * 8, 8)
                a_off = a - a_al

                def cut(ref):
                    rows = ref[pl.ds(a_al, WA), :]  # [WA, 2B]
                    rows = pltpu.roll(rows, -a_off, 0)
                    return pltpu.roll(rows, -b, 1)[0:W, 0:W]

                sum_ref[g] = sum_ref[g] + cut(sup)
                num_ref[g] = num_ref[g] + cut(msup)

            def body(blk, _):
                for u in range(U):
                    j = blk * U + u

                    @pl.when(j < cnt)
                    def _(j=j):
                        one_snip(j)

                return 0

            jax.lax.fori_loop(0, (cnt + U - 1) // U, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=13,
        grid=(cfg.Q,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # tiles stay in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # valid1 [N,1] (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),  # valid2 [N,1] (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),  # evec2 [2N,1] (HBM)
        ],
        out_specs=[
            pl.BlockSpec((C, W, W), lambda *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, W, W), lambda *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * B, 2 * B), jnp.float32),  # sup
            pltpu.VMEM((2 * B, 2 * B), jnp.float32),  # msup
            pltpu.VMEM((2 * B, 128), jnp.float32),  # v1s
            pltpu.VMEM((2 * B, 128), jnp.float32),  # v2s
            pltpu.VMEM((8 * B, 128), jnp.float32),  # fs
            pltpu.SemaphoreType.DMA((7,)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((C, W, W), jnp.float32),
            jax.ShapeDtypeStruct((C, W, W), jnp.float32),
        ],
        interpret=cfg.interpret,
    )

    @jax.jit
    def step(k00, k01, k10, k11, qb1, qb2, qdd0, qstart, qcount,
             o1, o2, cid, n0, tiles, valid1, valid2, evec2):
        s, n = call(
            k00, k01, k10, k11, qb1, qb2, qdd0, qstart, qcount, o1, o2, cid,
            n0, tiles, valid1, valid2, evec2,
        )
        return {"sum": s, "num": n}

    return step


def fold_expected(evec, pad):
    """evec2[x] = evec[|x - pad|] (NaN outside), as an [2*pad, 1] array —
    removes the abs() from the in-kernel toeplitz index."""
    out = np.full(2 * pad, np.nan, np.float32)
    n = min(len(evec), pad)
    out[pad : pad + n] = evec[:n]
    out[pad - n + 1 : pad + 1] = evec[:n][::-1]
    return out.reshape(-1, 1)


class PallasPileupSession:
    """Device-resident state for repeated kernel invocations over one region:
    the tile stack, validity vectors and folded expected vector are
    transferred once (the axon tunnel makes per-call re-transfer the
    dominant cost otherwise); each run() quad-sorts one snip sub-chunk and
    invokes the kernel."""

    def __init__(self, tile_stack, valid1, valid2, evec, cfg_kw):
        import jax

        B = tile_stack.B
        assert B == PALLAS_B
        self.tile_stack = tile_stack
        self.cfg_kw = dict(cfg_kw)
        # margin: quad valid slices need +2B, the expected row slice reads
        # 8B past fbase (pow2 over-slice), keep headroom for both
        npad = 1 << int(
            np.ceil(np.log2(max(len(valid1), len(valid2)) + 12 * B))
        )
        self.npad = npad
        # [N, 128] with data in lane 0: HBM DMA slices must be 128-wide
        v1 = np.zeros((npad, 128), np.float32)
        v1[: len(valid1), 0] = valid1
        v2 = np.zeros((npad, 128), np.float32)
        v2[: len(valid2), 0] = valid2
        evec2 = np.zeros((2 * npad, 128), np.float32)
        evec2[:, 0:1] = fold_expected(np.asarray(evec, np.float32), npad)
        self.tiles_dev = jax.device_put(tile_stack.tiles)
        self.v1_dev = jax.device_put(v1)
        self.v2_dev = jax.device_put(v2)
        self.evec2_dev = jax.device_put(evec2)
        self.n0 = np.array([npad], np.int32)

    def run(self, r1, r2, dd0, cid):
        B = self.tile_stack.B
        order, quads = prep_quads(r1, r2, self.tile_stack.tile_map, B)
        nq = len(quads["qstart"])
        # fixed Q floor: zero-count quads cost ~nothing at run time, while
        # every distinct Q is a multi-minute Mosaic compile on this stack
        Q = 1 << int(np.ceil(np.log2(max(256, nq))))
        quads = pad_quads(quads, Q)
        cfg = PallasGatherConfig(Q=Q, **self.cfg_kw)
        step = make_pallas_pileup_step(cfg)

        o1 = (r1[order] % B).astype(np.int32)
        o2 = (r2[order] % B).astype(np.int32)
        dd0s = np.asarray(dd0)[order].astype(np.int64)
        # per-quad diagonal offset: dd0 - o1 + o2 is constant within a quad
        st = quads["qstart"]
        qdd0 = np.zeros_like(quads["qstart"])
        qdd0[:nq] = (dd0s[st[:nq]] - o1[st[:nq]] + o2[st[:nq]]).astype(
            np.int32
        )
        out = step(
            quads["k00"], quads["k01"], quads["k10"], quads["k11"],
            quads["qb1"], quads["qb2"], qdd0, quads["qstart"],
            quads["qcount"],
            o1, o2, np.asarray(cid)[order].astype(np.int32),
            self.n0,
            self.tiles_dev, self.v1_dev, self.v2_dev, self.evec2_dev,
        )
        out = {k: np.asarray(v) for k, v in out.items()}
        # poison rides in the sums as +inf (like the reference's
        # accumulators); expose the explicit plane the engine expects
        out["poison"] = np.isinf(out["sum"]).astype(np.float32)
        return out


def run_pallas_pileup(
    tile_stack, r1, r2, dd0, cid, valid1, valid2, evec, cfg_kw
):
    """One-shot wrapper around PallasPileupSession (tests / small runs)."""
    session = PallasPileupSession(tile_stack, valid1, valid2, evec, cfg_kw)
    return session.run(r1, r2, dd0, cid)
