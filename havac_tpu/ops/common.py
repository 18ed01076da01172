"""Shared kernel configuration and shape bookkeeping for the SSV kernels."""

from __future__ import annotations

from dataclasses import dataclass


def hit_sort_order(rows, positions):
    """Ordering permutation for (row, position) hit pairs.

    One composite int64 key instead of np.lexsort's two passes: on this
    host lexsort over two 10M-element keys measured 4.5 s vs 0.35 s for a
    single-key stable argsort. Falls back to lexsort if the composite key
    would overflow int64 (rows ~> 2^37 with a 2^26 position span — never
    in practice)."""
    import numpy as np

    if rows.size == 0:
        return np.empty(0, dtype=np.int64)
    span = np.int64(positions.max()) + 1
    # rows.max()*span + (span-1) must fit int64, hence the -(span-1) slack
    # in the guard (a bare iinfo.max // span admits an off-by-one overflow).
    limit = (np.iinfo(np.int64).max - int(span) + 1) // max(int(span), 1)
    if int(rows.max()) > limit:
        return np.lexsort((positions, rows))  # pragma: no cover
    return np.argsort(rows * span + positions, kind="stable")


def sort_hit_pairs(rows, positions):
    """Sorted-by-(row, position) copies of a freshly-owned hit pair.

    numpy's composite-key argsort is the fast path here: the native
    multithreaded sorter (`native.sort_hits_native`) wins standalone but
    measured ~5x slower INSIDE a live engine process on this host (its
    std::threads and ~170 MB of key scratch contend with the device
    runtime), while the single-allocation argsort stays ~2 s for 10M
    pairs in-engine."""
    if rows.size == 0:
        return rows, positions
    order = hit_sort_order(rows, positions)
    return rows[order], positions[order]


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


@dataclass(frozen=True)
class SsvKernelConfig:
    """Geometry of the Pallas SSV kernel.

    ``block_width``: sequence positions per block (the analog of the
    reference's 12,288-cell segment, `device/PublicDefines.h:18-22`), must be a
    multiple of 1024 (8 sublanes × 128 lanes).
    ``rows_per_strip``: model rows per hit-bitmap strip (bitmap depth, ≤ 32
    since bitmaps pack strips into int32 words).
    ``max_hit_tiles``: capacity of the compact hit-tile output buffer; a tile
    is one (strip × block) region with ≥ 1 hit. Overflow is detected and
    reported (the analog of the reference's 3.5 GiB hit-buffer bound,
    `host/HavacHwClient.hpp:94`).
    ``interpret``: run the kernel in the Pallas interpreter (CPU testing).
    ``packing``: DP cells per 32-bit VPU lane — 1 selects the unpacked kernel
    (ops/ssv_pallas.py), 3 the SWAR kernel (ops/ssv_swar.py, ~1.6× faster on
    TPU v5e; requires block_width % 3072 == 0 and rows_per_strip == 30).
    """

    block_width: int = 32768
    rows_per_strip: int = 32
    max_hit_tiles: int = 512
    interpret: bool = False
    packing: int = 1
    # HBM budget for the dirty-tile buffer in the pipelined engine path
    # (which sizes the buffer to the grid when it fits, making overflow
    # impossible; the reference's fixed 3.5 GiB hit buffer analog).
    tile_budget_bytes: int = 6 << 30

    def __post_init__(self) -> None:
        if self.packing == 1:
            if self.block_width % 1024:
                raise ValueError("block_width must be a multiple of 1024")
            if not (1 <= self.rows_per_strip <= 32):
                raise ValueError("rows_per_strip must be in [1, 32]")
        elif self.packing == 3:
            if self.block_width % 3072:
                raise ValueError(
                    "block_width must be a multiple of 3072 when packing=3")
            if self.rows_per_strip != 30:
                raise ValueError("rows_per_strip must be 30 when packing=3")
        else:
            raise ValueError("packing must be 1 or 3")

    @staticmethod
    def swar(block_width: int = 387072, max_hit_tiles: int = 512,
             interpret: bool = False,
             tile_budget_bytes: int = None) -> "SsvKernelConfig":
        """Default geometry for the SWAR kernel (measured best on v5e)."""
        kw = {}
        if tile_budget_bytes is not None:
            kw["tile_budget_bytes"] = tile_budget_bytes
        return SsvKernelConfig(block_width=block_width, rows_per_strip=30,
                               max_hit_tiles=max_hit_tiles,
                               interpret=interpret, packing=3, **kw)

    @property
    def sublane_rows(self) -> int:
        """Rows of 128 lanes per block vector (WS)."""
        return self.block_width // 128


class HitTileOverflow(RuntimeError):
    """More dirty hit tiles than the kernel's output buffer holds; retry with
    a larger ``max_hit_tiles`` (the analog of exceeding the reference's
    3.5 GiB hit buffer, `host/HavacHwClient.hpp:94`)."""
