"""Batch hit verification: bounded re-SSV of every reported hit.

The reference's live API *claims* hits are "verified via bounded reference
SSV checks" (`host/Havac.hpp:74-77`) but the implementation only exists in
the stale tree (`host/host/HitVerifier.cpp:68-113`) and is never called.
Here the claim is made true: ``Havac(verify_hits=True)`` (or ``--verify`` on
the CLI) re-derives every raw hit after the sweep by replaying the SSV
recurrence along the hit's diagonal and flags any whose pre-reset sum fails
to reach the 256 threshold — a kernel or decode regression cannot silently
ship wrong coordinates.

Vectorized escalation: all hits are replayed together over a bounded
diagonal window (one numpy gather per step, hits in chunks); hits that fail
the bounded replay escalate to exponentially longer windows and finally to a
full-diagonal replay, so verification is *exact*: a hit is flagged iff the
true recurrence does not produce it. (A bounded window can only understate
the incoming state — replaying from state 0 mid-chain — so it can produce
false negatives of verification, never false positives; escalation removes
the false negatives.)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class VerificationReport:
    """Outcome of re-deriving every hit."""

    num_hits: int
    num_verified: int
    reached: np.ndarray  # per-hit pre-reset sum at the hit cell
    unverified_indices: np.ndarray  # indices into the input hit arrays

    @property
    def all_verified(self) -> bool:
        return self.num_verified == self.num_hits


def _replay_window(
    rows: np.ndarray,
    positions: np.ndarray,
    symbols: np.ndarray,
    scores: np.ndarray,
    reset_rows: Optional[np.ndarray],
    bound: int,
) -> np.ndarray:
    """Replay the diagonal of each hit over the last ``bound`` steps ending
    at the hit cell; returns the pre-reset sum at the hit cell."""
    n = rows.shape[0]
    state = np.zeros(n, dtype=np.int64)
    s_final = np.full(n, -(1 << 30), dtype=np.int64)
    T = int(min(bound, int(np.minimum(rows, positions).max()) + 1))
    for t in range(T):
        d = T - 1 - t  # distance from the hit cell along the diagonal
        jt = rows - d
        it = positions - d
        live = (jt >= 0) & (it >= 0)
        jc = np.where(live, jt, 0)
        ic = np.where(live, it, 0)
        if reset_rows is not None:
            state = np.where(live & reset_rows[jc], 0, state)
        m = np.where(live, scores[jc, symbols[ic]], 0)
        s = state + m
        if t == T - 1:
            s_final = s
        state = np.where((s < 0) | (s >= 256), 0, s)
    return s_final


def verify_hits(
    hit_rows: np.ndarray,
    hit_positions: np.ndarray,
    symbols: np.ndarray,
    scores: np.ndarray,
    reset_rows: Optional[np.ndarray] = None,
    initial_bound: int = 64,
    chunk: int = 1 << 20,
) -> VerificationReport:
    """Re-derive every (global row, global position) hit; exact.

    ``symbols``: the same padded 2-bit codes the sweep ran over;
    ``scores``: the concatenated (P, 4) int8 projected scores;
    ``reset_rows``: model-isolation reset rows, when the sweep used them.

    Hits whose diagonal chain crosses the left/top matrix edge are replayed
    from the edge (incoming carry is zero there for a whole-database sweep,
    which is the only place verification runs).
    """
    rows = np.asarray(hit_rows, dtype=np.int64)
    positions = np.asarray(hit_positions, dtype=np.int64)
    symbols = np.asarray(symbols, dtype=np.int64)
    scores = np.asarray(scores, dtype=np.int64)
    reset = (np.asarray(reset_rows, dtype=bool)
             if reset_rows is not None else None)
    n = rows.shape[0]
    reached = np.empty(n, dtype=np.int64)
    if n == 0:
        return VerificationReport(0, 0, reached, np.empty(0, dtype=np.int64))

    for lo in range(0, n, chunk):
        hi = min(n, lo + chunk)
        r, p = rows[lo:hi], positions[lo:hi]
        got = _replay_window(r, p, symbols, scores, reset, initial_bound)
        pending = np.nonzero(got < 256)[0]
        bound = initial_bound
        while pending.size:
            full = int(np.minimum(r[pending], p[pending]).max()) + 1
            if bound >= full:
                break  # already replayed the full diagonal for all pending
            bound = min(bound * 4, full)
            got[pending] = _replay_window(r[pending], p[pending], symbols,
                                          scores, reset, bound)
            pending = pending[got[pending] < 256]
        reached[lo:hi] = got

    unverified = np.nonzero(reached < 256)[0]
    return VerificationReport(
        num_hits=n,
        num_verified=int(n - unverified.size),
        reached=reached,
        unverified_indices=unverified,
    )


class HitVerificationError(RuntimeError):
    """Raised when verify_hits finds hits the recurrence does not produce."""

    def __init__(self, report: VerificationReport, rows: np.ndarray,
                 positions: np.ndarray):
        self.report = report
        examples: List[Tuple[int, int, int]] = [
            (int(rows[i]), int(positions[i]), int(report.reached[i]))
            for i in report.unverified_indices[:8]
        ]
        super().__init__(
            f"{report.num_hits - report.num_verified} of {report.num_hits} "
            f"hits failed bounded re-SSV verification (reached < 256); "
            f"first (row, position, reached): {examples}")
