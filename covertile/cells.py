"""Hierarchical cell codes over (x, y): 64-bit interleaved quadkey (Morton).

H3/S2-style cell partitioning, pure numpy (no native geo dependency).  The
world is a fixed square box; at resolution R the grid is 2^R x 2^R cells and
the cell code is the Morton (z-order) interleave of (ix, iy).  Sorting cells
by code gives a space-filling-curve order, so contiguous code ranges are
spatially coherent — that is what makes range-partitioning by cell prefix a
locality-preserving shuffle key (north rule: "range-partitioned via
groupby-aggregate shuffle on cell prefix").

Replaces the reference's static block partition + greedy hub->rank assignment
(/root/reference/src/Point.cpp:78-86, src/DistCoverTree.cpp:726-758) with a
data-dependent, stateless, shuffle-friendly key.
"""

from __future__ import annotations

import numpy as np

WORLD_MIN = -16.0
WORLD_MAX = 16.0
WORLD_SIDE = WORLD_MAX - WORLD_MIN


def cell_side(resolution: int) -> float:
    return WORLD_SIDE / (1 << resolution)


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of v into even bit positions (uint64)."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _compact1by1(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def morton_encode(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """(ix, iy) int grid coords -> uint64 Morton code."""
    return _part1by1(ix) | (_part1by1(iy) << np.uint64(1))


def morton_decode(code: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    code = code.astype(np.uint64)
    return (
        _compact1by1(code).astype(np.int64),
        _compact1by1(code >> np.uint64(1)).astype(np.int64),
    )


def grid_coords(x: np.ndarray, y: np.ndarray, resolution: int) -> tuple[np.ndarray, np.ndarray]:
    """float coords -> clipped (ix, iy) grid coords at `resolution`."""
    n = 1 << resolution
    cs = cell_side(resolution)
    ix = np.clip(np.floor((x.astype(np.float64) - WORLD_MIN) / cs), 0, n - 1).astype(np.int64)
    iy = np.clip(np.floor((y.astype(np.float64) - WORLD_MIN) / cs), 0, n - 1).astype(np.int64)
    return ix, iy


def cell_of(x: np.ndarray, y: np.ndarray, resolution: int) -> np.ndarray:
    """float coords -> uint64 Morton cell code at `resolution`."""
    ix, iy = grid_coords(x, y, resolution)
    return morton_encode(ix, iy)


def parent_cell(code: np.ndarray) -> np.ndarray:
    """Cell at resolution R -> containing cell at R-1 (drop 2 low bits)."""
    return code.astype(np.uint64) >> np.uint64(2)


def children_cells(code: np.ndarray) -> np.ndarray:
    """Cell at resolution R -> its 4 children at R+1; shape (n, 4)."""
    base = (code.astype(np.uint64) << np.uint64(2))[:, None]
    return base + np.arange(4, dtype=np.uint64)[None, :]


def halo_cells(
    x: np.ndarray, y: np.ndarray, radius: float, resolution: int
) -> tuple[np.ndarray, np.ndarray]:
    """All cells whose area intersects the closed disc (x_i, y_i, radius).

    Conservative axis-aligned bound: every cell overlapping the bounding
    square of the disc.  Returns (repeat_index, cell_code) flat arrays:
    point i contributes the cells `cell_code[repeat_index == i]` — a
    vectorized flat_map.  This is the halo-expansion step of the partitioned
    radius self-join (replaces the reference's allgather-everything query
    plumbing, /root/reference/src/DistCoverTree.cpp:694-724).
    """
    n = 1 << resolution
    cs = cell_side(resolution)
    xf = x.astype(np.float64)
    yf = y.astype(np.float64)
    ix_lo = np.clip(np.floor((xf - radius - WORLD_MIN) / cs), 0, n - 1).astype(np.int64)
    ix_hi = np.clip(np.floor((xf + radius - WORLD_MIN) / cs), 0, n - 1).astype(np.int64)
    iy_lo = np.clip(np.floor((yf - radius - WORLD_MIN) / cs), 0, n - 1).astype(np.int64)
    iy_hi = np.clip(np.floor((yf + radius - WORLD_MIN) / cs), 0, n - 1).astype(np.int64)

    nx = ix_hi - ix_lo + 1
    ny = iy_hi - iy_lo + 1
    counts = nx * ny
    total = int(counts.sum())
    rep = np.repeat(np.arange(len(xf), dtype=np.int64), counts)
    # local offset 0..counts[i]-1 for each expanded slot
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    local = np.arange(total, dtype=np.int64) - starts[rep]
    dx = local % nx[rep]
    dy = local // nx[rep]
    return rep, morton_encode(ix_lo[rep] + dx, iy_lo[rep] + dy)
