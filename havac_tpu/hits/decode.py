"""Hit bitmap decoding and hit resolution to (sequence, model) coordinates.

Replaces the reference's hierarchical FIFO hit-filter tree + host decode
(`device/HitReporting.cpp`, `host/Havac.cpp:145-187`). Kernels emit hit
*bitmaps* (dense per strip, or compact per dirty tile); decode recovers exact
(global row, global position) pairs on the host with vectorized numpy, then
resolution maps them to (sequence_index, position_in_sequence, phmm_index,
position_in_phmm), dropping hits on separator/pad positions.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np


def decode_dense_bitmaps(
    bitmaps: np.ndarray, rows_per_strip: int, row_offset: int = 0, pos_offset: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Dense (S, L) int32 bitmaps → (rows, positions), sorted by (row, pos).

    Bit (K-1-k) of bitmaps[s, i] = hit at row s*K + k, position i.
    """
    bm = np.asarray(bitmaps).view(np.uint32).reshape(bitmaps.shape)
    K = rows_per_strip
    strip_idx, pos_idx = np.nonzero(bm)
    if strip_idx.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    words = bm[strip_idx, pos_idx]
    rows_out = []
    pos_out = []
    for k in range(K):
        mask = (words >> np.uint32(K - 1 - k)) & np.uint32(1)
        sel = mask.astype(bool)
        if sel.any():
            rows_out.append(strip_idx[sel].astype(np.int64) * K + k + row_offset)
            pos_out.append(pos_idx[sel].astype(np.int64) + pos_offset)
    rows = np.concatenate(rows_out)
    positions = np.concatenate(pos_out)
    order = np.lexsort((positions, rows))
    return rows[order], positions[order]


def decode_hit_tiles(
    tile_ids: np.ndarray,
    tile_bitmaps: np.ndarray,
    count: int,
    num_strips: int,
    block_width: int,
    rows_per_strip: int,
    row_offset: int = 0,
    pos_offset: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Compact tiles (from the Pallas kernel) → (rows, positions).

    ``tile_ids[t] = block * num_strips + strip`` for the t-th dirty tile;
    ``tile_bitmaps[t]`` is the (block_width,) int32 bitmap of that tile (bit
    layout as in :func:`decode_dense_bitmaps`).
    """
    if count == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    ids = np.asarray(tile_ids[:count], dtype=np.int64)
    bm = np.asarray(tile_bitmaps[:count]).view(np.uint32).reshape(count, -1)
    K = rows_per_strip
    tile_idx, pos_idx = np.nonzero(bm)
    if tile_idx.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    words = bm[tile_idx, pos_idx]
    blocks = ids[tile_idx] // num_strips
    strips = ids[tile_idx] % num_strips
    rows_out = []
    pos_out = []
    for k in range(K):
        sel = ((words >> np.uint32(K - 1 - k)) & np.uint32(1)).astype(bool)
        if sel.any():
            rows_out.append(strips[sel] * K + k + row_offset)
            pos_out.append(blocks[sel] * block_width + pos_idx[sel] + pos_offset)
    rows = np.concatenate(rows_out)
    positions = np.concatenate(pos_out)
    order = np.lexsort((positions, rows))
    return rows[order], positions[order]


@dataclass
class ResolvedHits:
    """Vectorized resolved hit table (columns, not per-hit objects).

    ``strand``: '+' per hit unless reverse-complement scanning produced it
    ('-'); sequence_position is always in forward-strand coordinates.
    """

    sequence_index: np.ndarray
    sequence_position: np.ndarray
    phmm_index: np.ndarray
    phmm_position: np.ndarray
    strand: np.ndarray = None

    def __post_init__(self):
        if self.strand is None:
            self.strand = np.full(self.sequence_index.shape[0], "+",
                                  dtype="U1")

    def __len__(self) -> int:
        return int(self.sequence_index.shape[0])

    def as_tuples(self):
        return list(
            zip(
                self.sequence_index.tolist(),
                self.sequence_position.tolist(),
                self.phmm_index.tolist(),
                self.phmm_position.tolist(),
            )
        )

    def as_tuples_stranded(self):
        return list(
            zip(
                self.sequence_index.tolist(),
                self.sequence_position.tolist(),
                self.phmm_index.tolist(),
                self.phmm_position.tolist(),
                self.strand.tolist(),
            )
        )


def concat_hits(parts):
    """Concatenate ResolvedHits tables."""
    parts = [p for p in parts if len(p)]
    if not parts:
        return ResolvedHits(*(np.empty(0, dtype=np.int64),) * 4)
    return ResolvedHits(
        sequence_index=np.concatenate([p.sequence_index for p in parts]),
        sequence_position=np.concatenate([p.sequence_position for p in parts]),
        phmm_index=np.concatenate([p.phmm_index for p in parts]),
        phmm_position=np.concatenate([p.phmm_position for p in parts]),
        strand=np.concatenate([p.strand for p in parts]),
    )


def resolve_hits(
    hit_rows: np.ndarray,
    hit_positions: np.ndarray,
    sequence_db,
    phmm_prefix_sums: np.ndarray,
) -> ResolvedHits:
    """Global (row, position) → local coordinates, dropping padding hits.

    Mirrors `Havac::getHitsFromFinishedRun` (`host/Havac.cpp:145-187`):
    sequence side via the FastaVector-style global→local map (invalid =
    separator/pad → dropped), model side via model-length prefix sums +
    binary search.
    """
    hit_rows = np.asarray(hit_rows, dtype=np.int64)
    hit_positions = np.asarray(hit_positions, dtype=np.int64)
    seq_idx, seq_pos, valid = sequence_db.global_to_local(hit_positions)

    prefix = np.asarray(phmm_prefix_sums, dtype=np.int64)
    model_idx = np.searchsorted(prefix, hit_rows, side="right") - 1
    in_range = (model_idx >= 0) & (hit_rows < prefix[-1])
    model_idx_clamped = np.clip(model_idx, 0, len(prefix) - 2)
    model_pos = hit_rows - prefix[model_idx_clamped]

    keep = valid & in_range
    return ResolvedHits(
        sequence_index=seq_idx[keep],
        sequence_position=seq_pos[keep],
        phmm_index=model_idx_clamped[keep],
        phmm_position=model_pos[keep],
    )


def decode_flat_records(
    tile_ids_per_entry: np.ndarray,
    word_idx: np.ndarray,
    words: np.ndarray,
    num_strips: int,
    block_width: int,
    rows_per_strip: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Flat record decode for the unpacked kernel's tiles: entry e is bitmap
    word ``words[e]`` at in-tile position ``word_idx[e]`` of tile
    ``tile_ids_per_entry[e]`` (id = block·num_strips + strip)."""
    if words.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    words = np.asarray(words).view(np.uint32)
    ids = np.asarray(tile_ids_per_entry, dtype=np.int64)
    word_idx = np.asarray(word_idx, dtype=np.int64)
    K = rows_per_strip
    blocks = ids // num_strips
    strips = ids % num_strips
    rows_out, pos_out = [], []
    for k in range(K):
        sel = ((words >> np.uint32(K - 1 - k)) & np.uint32(1)).astype(bool)
        if sel.any():
            rows_out.append(strips[sel] * K + k)
            pos_out.append(blocks[sel] * block_width + word_idx[sel])
    rows = np.concatenate(rows_out)
    positions = np.concatenate(pos_out)
    order = np.lexsort((positions, rows))
    return rows[order], positions[order]
