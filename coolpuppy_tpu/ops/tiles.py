"""Block-sparse tile stack: the device-resident matrix representation.

Replaces the scipy CSR whose per-snip window slicing is the reference's hot
inner loop (reference coolpup.py:1077, 1115–1121). The host scatters COO
pixels into dense B×B tiles — only tiles touched by at least one window are
materialized — plus a dense (tile-row, tile-col) → stack-index lookup whose
entry 0 is a shared all-zero tile. With B ≥ window size every window straddles
at most 2×2 tiles, so the device gather is pure integer indexing +
dynamic_slice with static shapes (see ops/gather.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

try:  # optional native scatter (coolpuppy_tpu/native)
    from ..native import tile_scatter as _native_tile_scatter
except Exception:  # pragma: no cover - native ext is optional
    _native_tile_scatter = None


@dataclass
class TileStack:
    tiles: np.ndarray  # [K, B, B] float32; tiles[0] is all zeros
    tile_map: np.ndarray  # [nr+1, nc+1] int32 -> stack index (0 = empty)
    B: int
    shape: tuple  # logical (n1, n2) of the region matrix

    @property
    def nbytes(self):
        return self.tiles.nbytes + self.tile_map.nbytes

    @property
    def n_tiles(self):
        return self.tiles.shape[0] - 1


def touched_tiles(r1, r2, window1, window2, B, shape):
    """Set of (tile_row, tile_col) touched by windows starting at (r1, r2)
    with heights window1 and widths window2 (arrays or scalars)."""
    n1, n2 = shape
    nr, nc = -(-n1 // B), -(-n2 // B)
    w1 = np.broadcast_to(np.asarray(window1), np.shape(r1))
    w2 = np.broadcast_to(np.asarray(window2), np.shape(r2))
    t1a = np.asarray(r1) // B
    t1b = (np.asarray(r1) + w1 - 1) // B
    t2a = np.asarray(r2) // B
    t2b = (np.asarray(r2) + w2 - 1) // B
    # windows span at most 2 tiles per axis (B >= max window), enumerate corners
    pairs = set()
    for rr, cc in (
        (t1a, t2a),
        (t1a, t2b),
        (t1b, t2a),
        (t1b, t2b),
    ):
        ids = np.unique(rr.astype(np.int64) * nc + cc.astype(np.int64))
        pairs.update(int(i) for i in ids)
    pairs = np.array(sorted(pairs), dtype=np.int64)
    return pairs, nr, nc


def build_tile_stack(coo, B, r1=None, r2=None, window1=None, window2=None):
    """Scatter a scipy COO region matrix into a TileStack.

    If (r1, r2, window sizes) are given, only tiles touched by those windows
    are materialized; otherwise all nonzero tiles are.
    One O(nnz) pass: tile-id per pixel, filter to touched, bincount-scatter.
    """
    n1, n2 = coo.shape
    nr, nc = -(-n1 // B), -(-n2 // B)

    rows = np.asarray(coo.row, dtype=np.int64)
    cols = np.asarray(coo.col, dtype=np.int64)
    vals = np.asarray(coo.data, dtype=np.float64)

    if r1 is not None:
        want, nr, nc = touched_tiles(r1, r2, window1, window2, B, (n1, n2))
    else:
        want = np.unique((rows // B) * nc + cols // B)

    K = len(want)
    # +1 for the shared zero tile at stack index 0
    tile_map = np.zeros((nr + 1, nc + 1), dtype=np.int32)
    tr, tc = want // nc, want % nc
    tile_map[tr, tc] = np.arange(1, K + 1, dtype=np.int32)

    if K == 0 or len(rows) == 0:
        tiles = np.zeros((K + 1, B, B), dtype=np.float32)
        return TileStack(tiles=tiles, tile_map=tile_map, B=B, shape=(n1, n2))

    if _native_tile_scatter is not None:
        tiles = _native_tile_scatter(rows, cols, vals, tile_map, B, K, nc)
    else:
        pix_tile = tile_map[rows // B, cols // B].astype(np.int64)
        keep = pix_tile > 0
        rows, cols, vals, pix_tile = (
            rows[keep],
            cols[keep],
            vals[keep],
            pix_tile[keep],
        )
        flat_idx = pix_tile * (B * B) + (rows % B) * B + (cols % B)
        flat = np.bincount(flat_idx, weights=vals, minlength=(K + 1) * B * B)
        tiles = flat.reshape(K + 1, B, B).astype(np.float32)
    return TileStack(tiles=tiles, tile_map=tile_map, B=B, shape=(n1, n2))
