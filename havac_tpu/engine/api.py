"""Public driver API — the TPU-native equivalent of `class Havac`.

Mirrors the reference facade (`host/Havac.hpp:42-107`): construct with a
p-value, load a pHMM collection and a sequence database, run the SSV sweep
(synchronously or asynchronously with state polling and abort), then retrieve
resolved hits as (sequence_index, position_in_sequence, phmm_index,
position_in_phmm) — `Havac::getHitsFromFinishedRun` (`host/Havac.cpp:145-187`).

TPU-native redesign notes:
  * The FPGA runs one monolithic async sweep; we execute a *chunked* stream of
    kernel dispatches over sequence-axis chunks (each a whole number of kernel
    blocks), chaining the boundary-column carry between chunks — the same
    mechanism as the reference's on-chip score queue, lifted to the host loop.
    Chunking is what makes `abort()` responsive (the reference aborts via XRT,
    `host/Havac.cpp:100-102`) and bounds device memory for arbitrarily large
    databases (the reference's 4 GiB sequence / 3.5 GiB hit-buffer limits,
    `host/HavacHwClient.cpp:92-97`, `host/HavacHwClient.hpp:94`, become soft
    chunking parameters instead of hard capacity errors).
  * The pipelined fast path sizes hit buffers so overflow is impossible and
    adapts its record caps; the serial path retries overflow with a doubled
    buffer instead of a fatal capacity error.
  * `run_async` returns immediately; progress is observable via `state` and
    `progress` (fraction of chunks completed).
"""

from __future__ import annotations

import dataclasses
import enum
import logging
import os
import threading
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from havac_tpu.hits.decode import ResolvedHits, decode_dense_bitmaps, resolve_hits
from havac_tpu.io.fasta import SequenceDatabase, load_fasta_database
from havac_tpu.io.hmm import ProfileHmm, model_length_prefix_sums, read_hmm, read_hmm_text
from havac_tpu.ops.common import HitTileOverflow, SsvKernelConfig, round_up
from havac_tpu.scoring.reprojection import project_models

DEFAULT_P_VALUE = 0.02  # `README.md:39`, `benchmark/benchmark.cpp:13`

log = logging.getLogger("havac_tpu.engine")


class HavacRunState(enum.Enum):
    """Run lifecycle, the analog of `havac_cmd_state` (`host/Havac.hpp:16-26`).

    The reference re-exports XRT's ERT command states; ours are the states a
    chunked dispatch loop can actually be in.
    """

    IDLE = "idle"  # no run issued yet (ERT_CMD_STATE_NEW analog)
    RUNNING = "running"
    COMPLETED = "completed"
    ABORTED = "aborted"
    ERROR = "error"


class HavacUsageError(RuntimeError):
    """API misuse (run before load, hits before completion, ...)."""


@dataclass
class RunStats:
    """Phase timing + throughput, the analog of the reference benchmark's
    phase timers (`benchmark/benchmark.cpp:43-71`)."""

    num_chunks: int = 0
    cells: int = 0
    sweep_seconds: float = 0.0
    decode_seconds: float = 0.0
    num_raw_hits: int = 0
    overflow_retries: int = 0
    # Pipelined backend only: per-phase wall-clock attribution
    # (see PipelinedSweep.prof).
    pipeline_prof: Optional[Dict[str, float]] = None
    num_unverified: int = 0  # populated when verify_hits=True
    # Provenance (VERDICT r3 weak #3): whether the native host core was
    # loaded for this run's decode/sort/resolve — a silent numpy fallback
    # once shipped an invalid benchmark artifact, so the state is recorded
    # on the run itself. None until a run completes.
    native_active: Optional[bool] = None
    # Pipelined backend only: the resolved chunk geometry, so artifacts
    # explain their own dispatch counts (n_col, n_row, chunk symbols,
    # chunk rows, maxt tiles/chunk, final record cap).
    chunk_geometry: Optional[Dict[str, int]] = None

    @property
    def gcups(self) -> float:
        return self.cells / self.sweep_seconds / 1e9 if self.sweep_seconds else 0.0


def _pick_backend(requested: str) -> str:
    if requested != "auto":
        return requested
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "xla"


class Havac:
    """TPU-native SSV search engine (the `class Havac` equivalent).

    Usage::

        engine = Havac(p_value=0.02)
        engine.load_phmm("models.hmm")
        engine.load_sequence("db.fasta")
        engine.run()                      # or run_async(); wait()
        hits = engine.hits()              # ResolvedHits columns

    Single-chip runs route to the pipelined path (`engine/pipeline.py`);
    passing ``mesh=`` selects the wavefront mesh paths. The default is a
    measurement, not a guess: raced on the same dense 150k workload the
    round-4 mesh-step path lost ~10× on this rig (warm 20.8 s vs 201.7 s) —
    NOT because of bitmap pulls (records compact on device since round 3)
    but because it pulled a cap-sized packed record vector per wavefront
    step per shard plus one tunnel dispatch per step
    (`benchmarks/race_paths_v5e.json` phases: 137–145 s of the 200 s run
    was `pull`). Round 5 ported the pipelined path's batched pull
    discipline to the mesh path (HAVAC_MESH_PULL_BATCH, delta16 wire);
    the single-chip default remains the pipelined path, re-raced in
    `benchmarks/race_paths_r5_v5e.json`.
    """

    def __init__(
        self,
        p_value: float = DEFAULT_P_VALUE,
        config: Optional[SsvKernelConfig] = None,
        backend: str = "auto",
        chunk_symbols: int = 1 << 24,
        chunk_rows: int = 8160,
        strand: str = "forward",
        isolate_models: bool = False,
        seed: int = 0x5A5A,
        checkpoint_path: Optional[str] = None,
        verify_hits: bool = False,
        mesh=None,
        mesh_axis: str = "seq",
        dist_rows_per_step: int = 128,
        dist_hit_capacity: int = 1 << 16,
        dist_step_dispatch: bool = True,
    ) -> None:
        self.p_value = float(p_value)
        self.backend = _pick_backend(backend)
        self._config_defaulted = config is None
        if config is None:
            # SWAR (3 cells/lane) is the fastest TPU kernel; unpacked
            # elsewhere (interpret mode favors the simpler kernel).
            config = (SsvKernelConfig.swar()
                      if self.backend == "pallas" else SsvKernelConfig())
        self.config = config
        self.alphabet = "dna"  # set by load_phmm from the models
        # Chunks must cut on kernel-block boundaries for carry chaining
        # (ssv_pallas chunk-chaining contract).
        self.chunk_symbols = round_up(max(chunk_symbols, self.config.block_width),
                                      self.config.block_width)
        # Row chunks cut the model stream so the kernel's SMEM carry buffer
        # stays small for ~1M-position collections (the reference's pHMM
        # limit, host/HavacHwClient.cpp:121-125, becomes a chunk parameter);
        # must cut on strip boundaries for row-state chaining.
        K = self.config.rows_per_strip
        self.chunk_rows = round_up(max(chunk_rows, K), K)
        # Strand handling (parity-plus over the reference, which is
        # forward-only like nhmmer --watson, benchmark/readme.txt:63):
        # "both" appends each record's reverse complement to the database and
        # sweeps once; minus-strand hits map back to forward coordinates.
        if strand not in ("forward", "both"):
            raise HavacUsageError("strand must be 'forward' or 'both'")
        self.strand = strand
        # Model isolation (parity-plus): zero the incoming diagonal at every
        # model's first row, so DP chains never cross model boundaries (the
        # reference's concatenated stream lets them, an artifact of
        # host/phmm/PhmmPreprocessor.cpp:9-31). Also makes model-axis
        # sharding cuts exact.
        self.isolate_models = isolate_models
        self.reset_rows: Optional[np.ndarray] = None
        self.seed = seed
        # Shard-level resume (new scope vs the reference's one-shot runs,
        # SURVEY.md §5): after every completed column chunk the run state
        # (carry column + accumulated hits) is persisted; an interrupted run
        # restarted with the same inputs continues from the last chunk.
        self.checkpoint_path = checkpoint_path
        self.resumed_chunks = 0
        # Batch hit verification (HitVerifier analog): after the sweep,
        # re-derive every raw hit by bounded re-SSV and fail the run if any
        # hit is not reproduced — the claim the reference's live API makes
        # but never honors (`host/Havac.hpp:74-77`; the real implementation
        # is the stale `host/host/HitVerifier.cpp:68-113`).
        self.verify_hits = verify_hits
        self.verification = None  # VerificationReport after a verified run
        # Multi-chip path (BASELINE config 3): sequence-sharded wavefront
        # pipeline over a jax Mesh, exact across shard seams. Column chunking
        # and checkpointing don't apply (the database lives sharded in HBM).
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self.dist_rows_per_step = dist_rows_per_step
        # Mesh sweeps dispatch per wavefront step by default so abort() works
        # mid-sweep; False uses the single monolithic lax.scan dispatch
        # (measured ~17% faster on the high-latency axon rig, uncancelable).
        self.dist_step_dispatch = dist_step_dispatch
        self.dist_hit_capacity = dist_hit_capacity

        self.models: Optional[List[ProfileHmm]] = None
        self.scores: Optional[np.ndarray] = None  # (P, 4) int8 concatenated
        self.phmm_prefix: Optional[np.ndarray] = None
        self.database: Optional[SequenceDatabase] = None

        self._state = HavacRunState.IDLE
        self._state_lock = threading.Lock()
        self._abort_event = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None
        self._hit_rows = np.empty(0, dtype=np.int64)
        self._hit_positions = np.empty(0, dtype=np.int64)
        self._raw_sorted = True
        self._raw_parts = None  # unmaterialized per-chunk raw coordinates
        self._resolved = None  # pool-resolved table (pipelined path)
        self._chunks_done = 0
        self._chunks_total = 0
        self.stats = RunStats()
        self._warm_sweep = None  # staged+compiled sweep from warmup()

    # ------------------------------------------------------------------ load

    def load_phmm(self, src: Union[str, ProfileHmm, Sequence[ProfileHmm]],
                  is_text: bool = False) -> "Havac":
        """Load + reproject a pHMM collection (`Havac::loadPhmm`,
        `host/Havac.cpp:42-55`). ``src`` is a path, .hmm text (is_text=True),
        a ProfileHmm, or a sequence of them."""
        if isinstance(src, str):
            models = read_hmm_text(src) if is_text else read_hmm(src)
        elif isinstance(src, ProfileHmm):
            models = [src]
        else:
            models = list(src)
        if not models:
            raise HavacUsageError("no models to load")
        # The reference is nucleotide-only (`README.md:2`); round 5 extends
        # the SWAR kernel to amino models (20 symbols in the 10-bit fields,
        # 19 indicator planes — ssv_swar card parameter). One collection must
        # be one alphabet, and amino requires the SWAR kernel (packing 3) on
        # the single-chip engine.
        cards = {m.alphabet_cardinality for m in models}
        if len(cards) > 1:
            raise HavacUsageError(
                f"mixed alphabets in one collection: cardinalities {sorted(cards)}")
        card = cards.pop()
        if card == 20:
            if self.mesh is not None:
                raise HavacUsageError(
                    "amino models are supported on the single-chip engine "
                    "only (the mesh wavefront paths are nucleotide-only)")
            if self.strand == "both":
                raise HavacUsageError(
                    "strand='both' (reverse complement) is meaningless for "
                    "amino sequences")
            if self._config_defaulted and self.config.packing != 3:
                # The defaulted unpacked config (interpret backends) cannot
                # run amino; switch to the SWAR geometry sized so the 19
                # indicator planes fit VMEM (19 x WS x 128 x 4 B = 5 MB at
                # block_width 196608 against the ~16 MB/core budget).
                self.config = dataclasses.replace(
                    SsvKernelConfig.swar(), block_width=196608,
                    interpret=self.config.interpret)
            elif (self._config_defaulted
                  and self.config.block_width > 196608):
                self.config = dataclasses.replace(
                    self.config, block_width=196608)
            if self.config.packing != 3 and self.backend != "xla":
                raise HavacUsageError(
                    "amino models require the SWAR kernel (packing=3) or "
                    "the xla backend")
            # Re-cut chunks on the (possibly new) block boundary.
            self.chunk_symbols = round_up(
                max(self.chunk_symbols, self.config.block_width),
                self.config.block_width)
            self.alphabet = "amino"
        elif card != 4:
            raise HavacUsageError(
                f"model {models[0].name!r} has alphabet cardinality {card}; "
                "supported: 4 (dna/rna) and 20 (amino)")
        else:
            self.alphabet = "dna"
        self.models = models
        self.scores = project_models(models, self.p_value)
        self.phmm_prefix = model_length_prefix_sums(models)
        self._warm_sweep = None
        if self.isolate_models:
            self.reset_rows = np.zeros(self.scores.shape[0], dtype=bool)
            self.reset_rows[self.phmm_prefix[:-1]] = True
        log.info("loaded %d models, %d total positions (p=%g)",
                 len(models), self.scores.shape[0], self.p_value)
        return self

    def load_sequence(self, src: Union[str, SequenceDatabase],
                      is_text: bool = False) -> "Havac":
        """Load + 2-bit encode a FASTA database (`Havac::loadSequence`,
        `host/Havac.cpp:57-77`)."""
        if isinstance(src, SequenceDatabase):
            self.database = src
        else:
            self.database = load_fasta_database(
                src, pad_multiple=self.config.block_width, seed=self.seed,
                is_text=is_text, alphabet=self.alphabet)
        if getattr(self.database, "alphabet", "dna") != self.alphabet:
            raise HavacUsageError(
                f"database alphabet {self.database.alphabet!r} does not "
                f"match the loaded models ({self.alphabet!r}); call "
                "load_phmm before load_sequence so the encoder matches")
        if self.strand == "both":
            from havac_tpu.io.fasta import augment_with_reverse_complement

            self._n_forward = self.database.num_sequences
            self.database = augment_with_reverse_complement(
                self.database, pad_multiple=self.config.block_width)
        log.info("loaded %d sequences, %d positions (padded %d)",
                 self.database.num_sequences,
                 int(self.database.lengths.sum()),
                 self.database.padded_length)
        self._warm_sweep = None
        return self

    def warmup(self) -> "Havac":
        """Stage the database in HBM and compile the sweep's kernels now.

        Cold start on remote-compile rigs is dominated by a 30-180 s
        remote compile of the fused kernel+compaction executable; warmup
        runs it now and caches the staged sweep, so
        the next :meth:`run` starts sweeping immediately. Call after
        :meth:`load_phmm` + :meth:`load_sequence` — e.g. from a thread,
        overlapping other host work. No-op for the mesh / non-pipelined
        backends (the reference has no warm path at all; its ~6 s fixed
        overhead is xclbin programming, `benchmark/runtime_table.py:8`)."""
        if self.scores is None or self.database is None:
            raise HavacUsageError(
                "load_phmm + load_sequence before warmup()")
        if (self.mesh is not None
                or self.backend not in ("pallas", "pallas_interpret")):
            return self
        sweep = self._build_pipelined_sweep()
        # Since the kernel+compaction fusion there is ONE executable to
        # warm: dispatch the first chunk's exact shapes with zero state and
        # discard the result (~tens of ms of compute once warm).
        sweep.warm_compact()
        self._warm_sweep = sweep
        return self

    def _build_pipelined_sweep(self):
        from havac_tpu.engine.pipeline import PipelinedSweep
        from havac_tpu.hits.decode import resolve_block_with_keys

        cfg = self.config
        if self.backend == "pallas_interpret" and not cfg.interpret:
            cfg = dataclasses.replace(cfg, interpret=True)
        codes = self.database.codes
        W = cfg.block_width
        if codes.shape[0] % W:
            codes = np.pad(codes,
                           (0, round_up(codes.shape[0], W) - codes.shape[0]))
        # Per-chunk resolution in the collector pool (overlaps the device
        # sweep; single-threaded numpy per chunk — the pool provides the
        # parallelism, and workers must stay jax-free).
        db, prefix = self.database, self.phmm_prefix

        def resolve_fn(rows, pos):
            return resolve_block_with_keys(rows, pos, db, prefix)

        # Raw tables alongside the callback: with the native core built the
        # sweep runs the fused key-form hit path (chunk records → sorted
        # uint64 keys → int32 resolved columns in one native pass per chunk)
        # and only falls back to resolve_fn when it can't.
        tables = (np.asarray(db.starts, dtype=np.int64),
                  np.asarray(db.lengths, dtype=np.int64),
                  np.asarray(prefix, dtype=np.int64))
        return PipelinedSweep(codes, self.scores, cfg, self.chunk_symbols,
                              self.chunk_rows, reset_rows=self.reset_rows,
                              resolve_fn=resolve_fn, resolve_tables=tables)

    def scan_files(self, fasta_paths: Sequence[str], prefetch: int = 1):
        """Streaming scan over many FASTA files (BASELINE config 5).

        Yields ``(path, ResolvedHits)`` per file. A background thread parses
        and 2-bit-encodes file i+1 while file i sweeps on the device (the
        host-side prefetch the reference lacks, SURVEY.md §2.5). Each file is
        an independent database: the DP carry does not flow across files, and
        hit coordinates are local to the yielded file. Compiled kernels are
        reused across files with matching chunk shapes.
        """
        import queue as queue_mod

        if self.scores is None:
            raise HavacUsageError("load_phmm must be called before scan_files")
        q: "queue_mod.Queue" = queue_mod.Queue(maxsize=max(1, prefetch))
        stop = threading.Event()
        _END = object()

        def put(item) -> bool:
            # Bounded put that gives up when the consumer is gone, so an
            # abandoned generator never leaves the producer (and a parsed
            # multi-GB database) blocked forever.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue_mod.Full:
                    continue
            return False

        def producer():
            try:
                for path in fasta_paths:
                    if stop.is_set():
                        return
                    db = load_fasta_database(
                        path, pad_multiple=self.config.block_width,
                        seed=self.seed)
                    if self.strand == "both":
                        from havac_tpu.io.fasta import (
                            augment_with_reverse_complement)

                        n_fwd = db.num_sequences
                        db = augment_with_reverse_complement(
                            db, pad_multiple=self.config.block_width)
                        db._n_forward = n_fwd
                    if not put((path, db)):
                        return
            except BaseException as exc:  # surfaced on the consumer side
                put((None, exc))
            finally:
                put(_END)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                path, db = item
                if path is None:
                    raise db  # producer exception
                self.database = db
                self._warm_sweep = None  # a warmed sweep staged other codes
                if self.strand == "both":
                    self._n_forward = db._n_forward
                self.run()
                yield path, self.hits()
        finally:
            stop.set()
            while not q.empty():  # unblock a producer waiting on put()
                try:
                    q.get_nowait()
                except queue_mod.Empty:
                    break

    # ------------------------------------------------------------------- run

    @property
    def state(self) -> HavacRunState:
        """Run-state query (`Havac::currentHardwareState`,
        `host/Havac.cpp:190-192`)."""
        with self._state_lock:
            return self._state

    @property
    def progress(self) -> float:
        total = self._chunks_total
        return self._chunks_done / total if total else 0.0

    def run(self) -> "Havac":
        """Synchronous sweep (`Havac::runHardwareClient`, `host/Havac.cpp:80-83`)."""
        self.run_async()
        self.wait()
        if self._error is not None:
            raise self._error
        return self

    def run_async(self) -> "Havac":
        """Dispatch the sweep on a worker thread and return immediately
        (`Havac::runHardwareClientAsync`, `host/Havac.cpp:85-92`)."""
        if self.scores is None or self.database is None:
            raise HavacUsageError("load_phmm and load_sequence must be called before run")
        # Check-and-transition atomically: two threads racing run_async must
        # not both pass the RUNNING check and spawn two workers.
        with self._state_lock:
            if self._state == HavacRunState.RUNNING:
                raise HavacUsageError("a run is already in flight")
            self._state = HavacRunState.RUNNING
        self._abort_event.clear()
        self._error = None
        self._hit_rows = np.empty(0, dtype=np.int64)
        self._hit_positions = np.empty(0, dtype=np.int64)
        self._raw_sorted = True
        self._raw_parts = None
        self._resolved = None
        self._chunks_done = 0
        self.stats = RunStats()
        self._thread = threading.Thread(target=self._run_loop, daemon=True)
        self._thread.start()
        return self

    def wait(self, timeout: Optional[float] = None) -> HavacRunState:
        """Block until the sweep finishes (`Havac::waitHardwareClient`,
        `host/Havac.cpp:94-98`)."""
        if self._thread is not None:
            self._thread.join(timeout)
        return self.state

    def abort(self) -> None:
        """Request cancellation; takes effect at the next chunk boundary
        (`Havac::abortHardwareClient`, `host/Havac.cpp:100-102`)."""
        self._abort_event.set()

    # ------------------------------------------------------------------ hits

    def _materialize_raw(self) -> None:
        """Concatenate the pipelined path's retained per-chunk raw parts
        into the flat (rows, positions) arrays (lazy: the resolved table is
        built without them, and most callers never ask for raw hits)."""
        if self._hit_rows is not None:
            return
        parts = self._raw_parts or []
        if parts and parts[0][1] is None:
            # Key-form parts (uint64 composite keys, round 5): split back to
            # int64 (rows, positions) once, threaded native when built.
            keys = [k for k, _ in parts if k.size]
            allk = (np.concatenate(keys) if keys
                    else np.empty(0, dtype=np.uint64))
            pair = None
            try:
                from havac_tpu import native

                pair = native.keys_to_pairs_native(allk)
            except Exception:  # pragma: no cover - lib vanished mid-run
                pass
            if pair is None:
                pair = ((allk >> np.uint64(38)).astype(np.int64),
                        (allk & np.uint64((1 << 38) - 1)).astype(np.int64))
            self._hit_rows, self._hit_positions = pair
            self._raw_parts = None
            return
        rows = [r for r, _ in parts if r.size]
        pos = [p for _, p in parts if p.size]
        self._hit_rows = (np.concatenate(rows) if rows
                          else np.empty(0, dtype=np.int64))
        self._hit_positions = (np.concatenate(pos) if pos
                               else np.empty(0, dtype=np.int64))
        self._raw_parts = None

    def _sorted_raw(self) -> Tuple[np.ndarray, np.ndarray]:
        """Materialized, (row, position)-sorted raw hits. Guarded by the
        state lock: the lazy sort swaps two attributes, and an unlocked
        reader racing it could pair new rows with old positions."""
        with self._state_lock:
            self._materialize_raw()
            if not self._raw_sorted:
                from havac_tpu.ops.common import sort_hit_pairs

                self._hit_rows, self._hit_positions = sort_hit_pairs(
                    self._hit_rows, self._hit_positions)
                self._raw_sorted = True
            return self._hit_rows, self._hit_positions

    def raw_hits(self) -> Tuple[np.ndarray, np.ndarray]:
        """Unresolved global (phmm_row, sequence_position) hit coordinates —
        the analog of the device's u64 hit records before host decode.
        Sorted by (row, position); materialization and sort are lazy (first
        query) on the pipelined path, whose hot loop needs neither."""
        self._require_completed()
        return self._sorted_raw()

    def hits(self) -> ResolvedHits:
        """Resolved hits (`Havac::getHitsFromFinishedRun`,
        `host/Havac.cpp:145-187`): padding/separator hits dropped, model
        coordinates recovered via prefix sums. With strand="both",
        minus-strand hits are reported in forward coordinates with
        strand '-'."""
        self._require_completed()
        if self._resolved is not None:
            # Pipelined runs resolve in the collector pool during the sweep.
            resolved = self._resolved
        else:
            # Resolve from the SORTED raw hits so the table's row order does
            # not depend on whether raw_hits() happened to be called first.
            rows, positions = self._sorted_raw()
            resolved = resolve_hits(rows, positions,
                                    self.database, self.phmm_prefix)
        if self.strand == "both":
            n = self._n_forward
            minus = resolved.sequence_index >= n
            idx = np.where(minus, resolved.sequence_index - n,
                           resolved.sequence_index)
            lens = self.database.lengths[resolved.sequence_index]
            pos = np.where(minus, lens - 1 - resolved.sequence_position,
                           resolved.sequence_position)
            resolved = ResolvedHits(
                sequence_index=idx,
                sequence_position=pos,
                phmm_index=resolved.phmm_index,
                phmm_position=resolved.phmm_position,
                strand=np.where(minus, "-", "+").astype("U1"),
            )
        return resolved

    def verify(self, initial_bound: int = 64):
        """Re-derive every raw hit by bounded re-SSV (exact, with
        escalation); returns a ``VerificationReport``. Runs automatically at
        the end of the sweep when constructed with ``verify_hits=True``
        (where a failure turns the run into an ERROR)."""
        self._require_completed()
        # Pipelined runs keep raw hits as per-chunk parts until queried;
        # go through the locked accessor so a concurrent raw_hits() sort
        # cannot tear the (rows, positions) pairing under us.
        rows, positions = self._sorted_raw()
        return self._verify_raw(rows, positions, initial_bound=initial_bound)

    def _verify_raw(self, rows: np.ndarray, positions: np.ndarray,
                    initial_bound: int = 64):
        from havac_tpu.hits.verify import verify_hits as _vh

        codes = self.database.codes
        if positions.size and int(positions.max()) >= codes.shape[0]:
            # Sweep paths pad the database with zero codes up to a block
            # multiple; extend identically so pad-region raw hits replay
            # over the same symbols the kernel saw.
            codes = np.pad(codes,
                           (0, int(positions.max()) + 1 - codes.shape[0]))
        return _vh(rows, positions, codes, self.scores,
                   reset_rows=self.reset_rows, initial_bound=initial_bound)

    def _maybe_verify(self) -> None:
        """Auto-verification hook, called by every run loop just before the
        COMPLETED transition; raises HitVerificationError on failure."""
        # Every run loop passes through here, so this is also where the
        # native-core provenance is stamped onto the run's stats (a silent
        # numpy fallback once shipped an invalid benchmark artifact,
        # VERDICT r3 weak #3).
        try:
            from havac_tpu import native as _native

            self.stats.native_active = _native.available()
        except Exception:  # pragma: no cover - diagnostics only
            self.stats.native_active = False
        if not self.verify_hits:
            return
        from havac_tpu.hits.verify import HitVerificationError

        self._materialize_raw()
        report = self._verify_raw(self._hit_rows, self._hit_positions)
        self.verification = report
        self.stats.num_unverified = report.num_hits - report.num_verified
        if not report.all_verified:
            raise HitVerificationError(report, self._hit_rows,
                                       self._hit_positions)
        log.info("verified %d/%d raw hits by bounded re-SSV",
                 report.num_verified, report.num_hits)

    def _require_completed(self) -> None:
        state = self.state
        if state == HavacRunState.ERROR and self._error is not None:
            raise self._error
        if state != HavacRunState.COMPLETED:
            raise HavacUsageError(
                f"hits requested in state {state.value}; run must complete first "
                "(mirrors the reference's completed-run check, host/Havac.cpp:147-153)")

    # ------------------------------------------------------------- internals

    def _run_loop(self) -> None:
        import time

        if self.mesh is not None:
            self._run_loop_distributed()
            return
        if (self.backend in ("pallas", "pallas_interpret")
                and not getattr(self, "_force_serial", False)):
            # Fast path: depth-1 pipelined dispatch — hit decode of chunk i
            # overlaps the device sweep of chunk i+1, chain state stays on
            # device (the reference's DATAFLOW hit-drain overlap, SURVEY §2.5).
            self._run_loop_pipelined()
            return
        try:
            scores = self.scores
            codes = self.database.codes
            W = self.config.block_width
            if codes.shape[0] % W:
                # Prebuilt databases may be padded to a different multiple;
                # re-pad so every chunk cuts on a kernel-block boundary (pad
                # hits are dropped at resolution, like separator hits).
                codes = np.pad(codes, (0, round_up(codes.shape[0], W) - codes.shape[0]))
            L = codes.shape[0]
            P = scores.shape[0]
            chunk = self.chunk_symbols
            rchunk = self.chunk_rows
            n_col = max(1, -(-L // chunk))
            n_row = max(1, -(-P // rchunk))
            self._chunks_total = n_col * n_row

            # carry[j] = S[j-1][right edge of the columns swept so far];
            # row_state = S[last swept row][*] within the current column chunk.
            carry = np.zeros(P + 1, dtype=np.int32)
            all_rows: List[np.ndarray] = []
            all_pos: List[np.ndarray] = []

            start_ci = 0
            fingerprint = self._fingerprint(L, P, chunk, rchunk)
            if self.checkpoint_path:
                loaded = self._load_checkpoint(fingerprint)
                if loaded is not None:
                    start_ci, carry, rows0, pos0 = loaded
                    all_rows.append(rows0)
                    all_pos.append(pos0)
                    self.resumed_chunks = start_ci * n_row
                    self._chunks_done = self.resumed_chunks

            t_sweep = 0.0
            t_decode = 0.0
            done = start_ci * n_row
            for ci in range(start_ci, n_col):
                lo = ci * chunk
                hi = min(L, lo + chunk)
                row_state = None  # zeros: S[-1][*] = 0
                next_carry = np.zeros(P + 1, dtype=np.int32)
                for ri in range(n_row):
                    if self._abort_event.is_set():
                        with self._state_lock:
                            self._state = HavacRunState.ABORTED
                        return
                    r0 = ri * rchunk
                    r1 = min(P, r0 + rchunk)
                    t0 = time.perf_counter()
                    rr = (self.reset_rows[r0:r1]
                          if self.reset_rows is not None else None)
                    rows, pos, carry_out, row_state = self._sweep_chunk(
                        codes[lo:hi], scores[r0:r1], carry[r0:r1 + 1],
                        row_state, rr)
                    t_sweep += time.perf_counter() - t0
                    next_carry[r0:r1 + 1] = carry_out
                    all_rows.append(rows + r0)
                    all_pos.append(pos + lo)
                    done += 1
                    self._chunks_done = done
                carry = next_carry
                if self.checkpoint_path and ci + 1 < n_col:
                    self._save_checkpoint(fingerprint, ci + 1, carry,
                                          all_rows, all_pos)

            t0 = time.perf_counter()
            if all_rows:
                self._hit_rows = np.concatenate(all_rows)
                self._hit_positions = np.concatenate(all_pos)
                # Chunk-major concatenation interleaves row ranges across
                # column chunks; raw_hits() sorts lazily on first query.
                self._raw_sorted = False
            t_decode = time.perf_counter() - t0

            self.stats.num_chunks = self._chunks_total
            self.stats.cells = L * P
            self.stats.sweep_seconds = t_sweep
            self.stats.decode_seconds = t_decode
            self.stats.num_raw_hits = int(self._hit_rows.shape[0])
            if self.checkpoint_path and os.path.exists(self.checkpoint_path):
                os.remove(self.checkpoint_path)
            log.info("sweep complete: %d raw hits, %.3fs (%.1f GCUPS)",
                     self.stats.num_raw_hits, self.stats.sweep_seconds,
                     self.stats.gcups)
            self._maybe_verify()
            with self._state_lock:
                self._state = HavacRunState.COMPLETED
        except BaseException as exc:  # surfaced on wait()/hits()
            self._error = exc
            with self._state_lock:
                self._state = HavacRunState.ERROR

    def _run_loop_pipelined(self) -> None:
        try:
            sweep = self._warm_sweep  # staged + compiled by warmup()
            self._warm_sweep = None
            if sweep is None:
                sweep = self._build_pipelined_sweep()
            self._chunks_total = sweep.n_col * sweep.n_row

            def progress(done):
                self._chunks_done = done

            checkpoint_cb = None
            resume = None
            if self.checkpoint_path:
                fingerprint = self._fingerprint(sweep.L,
                                                self.scores.shape[0],
                                                sweep.chunk, sweep.rchunk)
                loaded = self._load_checkpoint_pipelined(fingerprint,
                                                         sweep.n_row,
                                                         sweep.rchunk)
                if loaded is not None:
                    resume = loaded
                    self.resumed_chunks = loaded[0] * sweep.n_row

                def checkpoint_cb(next_ci, carries, rows_s, pos_s):
                    tmp = self.checkpoint_path + ".tmp"
                    np.savez(tmp, fingerprint=np.int64(fingerprint),
                             next_ci=np.int64(next_ci), carries=carries,
                             hit_rows=rows_s, hit_positions=pos_s)
                    os.replace(tmp + ".npz"
                               if os.path.exists(tmp + ".npz") else tmp,
                               self.checkpoint_path)

            log.info("pipelined sweep: %d column x %d row chunks, backend=%s",
                     sweep.n_col, sweep.n_row, self.backend)
            result = sweep.run(self._abort_event, progress,
                               checkpoint_cb=checkpoint_cb, resume=resume)
            self.stats.overflow_retries = sweep.overflow_retries
            self.stats.pipeline_prof = dict(sweep.prof)
            log.info("pipeline phases (s): %s",
                     {k: round(v, 3) for k, v in sweep.prof.items()})
            try:  # compile accounting (remote compiles dominate cold start)
                log.info("compiled executables this process: fused=%d "
                         "kernel=%s",
                         len(sweep._fused),
                         sweep._mod._ssv_swar_jit._cache_size()
                         if hasattr(sweep._mod, "_ssv_swar_jit") else "n/a")
            except Exception:  # pragma: no cover - diagnostics only
                pass
            if result is None:
                with self._state_lock:
                    self._state = HavacRunState.ABORTED
                return
            self._hit_rows, self._hit_positions, resolved, t_sweep = result
            # Raw hits come back as unmaterialized per-chunk parts when the
            # pool resolved them chunk-by-chunk; concatenate + sort lazily
            # on the first raw_hits() query.
            self._raw_sorted = resolved is None
            self._resolved = resolved
            if self._hit_rows is None:
                self._raw_parts = sweep.raw_parts
                n_raw = sum(int(r.shape[0]) for r, _ in sweep.raw_parts)
            else:
                n_raw = int(self._hit_rows.shape[0])
            self.stats.num_chunks = self._chunks_total
            self.stats.cells = sweep.L * self.scores.shape[0]
            self.stats.sweep_seconds = t_sweep
            self.stats.num_raw_hits = n_raw
            self.stats.chunk_geometry = {
                "n_col": sweep.n_col, "n_row": sweep.n_row,
                "chunk_symbols": sweep.chunk, "chunk_rows": sweep.rchunk,
                "maxt": sweep._chunk_maxt(), "record_cap": sweep.record_cap,
                "lookahead": sweep._lookahead,
                "pull_batch": sweep._pull_batch,
            }
            if self.checkpoint_path and os.path.exists(self.checkpoint_path):
                os.remove(self.checkpoint_path)
            self._maybe_verify()
            with self._state_lock:
                self._state = HavacRunState.COMPLETED
        except BaseException as exc:
            self._error = exc
            with self._state_lock:
                self._state = HavacRunState.ERROR

    def _finish_distributed(self, rows, pos, P: int, t_sweep: float,
                            prof: Optional[Dict[str, float]] = None) -> None:
        self._hit_rows = rows
        self._hit_positions = pos
        self._chunks_done = 1
        self.stats.num_chunks = 1
        self.stats.cells = self.database.padded_length * P
        self.stats.sweep_seconds = t_sweep
        self.stats.num_raw_hits = int(rows.shape[0])
        if prof is not None:
            self.stats.pipeline_prof = dict(prof)
            log.info("distributed phases (s): %s",
                     {k: round(v, 3) for k, v in prof.items()})
        self._maybe_verify()
        with self._state_lock:
            self._state = HavacRunState.COMPLETED

    def _run_loop_distributed(self) -> None:
        import time

        try:
            scores = self.scores
            P = scores.shape[0]
            is_swar = (self.backend in ("pallas", "pallas_interpret")
                       and self.config.packing == 3)
            if (is_swar and "model" in getattr(self.mesh, "axis_names", ())
                    and dict(self.mesh.shape).get("model", 1) > 1):
                # 2D (sequence × model) sharding (BASELINE config 4): model
                # groups across one axis (cuts at model boundaries, exact
                # under isolation), sequence wavefront across the other.
                if not self.isolate_models:
                    raise HavacUsageError(
                        "2D (sequence × model) sharding requires "
                        "isolate_models=True: model-axis cuts stop DP "
                        "chains at group boundaries")
                from havac_tpu.parallel.swar_dist2d import Swar2DSweep

                sweep2d = Swar2DSweep(
                    self.database.codes, self.mesh, self.mesh_axis, "model",
                    block_width=self.config.block_width,
                    rows_per_step=self._dist_rows_per_step_swar(),
                    tile_budget_bytes=self.config.tile_budget_bytes,
                    interpret=(self.backend == "pallas_interpret"
                               or self.config.interpret))

                def dist2d_progress(step, total):
                    self._chunks_total = total
                    self._chunks_done = step

                checkpoint_cb, resume, ck_path = (
                    self._mesh2d_checkpoint_hooks(sweep2d, P))
                t0 = time.perf_counter()
                result = sweep2d.run(scores, self.phmm_prefix,
                                     self.reset_rows,
                                     abort_event=self._abort_event,
                                     progress=dist2d_progress,
                                     monolithic=not self.dist_step_dispatch,
                                     checkpoint_cb=checkpoint_cb,
                                     resume=resume, ckpt_every=4)
                if result is None:
                    with self._state_lock:
                        self._state = HavacRunState.ABORTED
                    return
                rows, pos = result
                if ck_path and os.path.exists(ck_path):
                    os.remove(ck_path)
                self._finish_distributed(rows, pos, P,
                                         time.perf_counter() - t0,
                                         prof=getattr(sweep2d, "prof", None))
                return

            if is_swar:
                # Production path: Pallas SWAR kernel per shard inside the
                # shard_map wavefront (parallel/swar_dist.py), which handles
                # arbitrarily large per-chip shards itself via per-step
                # column chunking. The XLA wavefront below remains only as a
                # guard for invalid SWAR geometry (block_width not a
                # multiple of 3072 / rows_per_step not a multiple of 30 —
                # possible only with a hand-built config).
                from havac_tpu.parallel.swar_dist import SwarDistributedSweep

                try:
                    sweep = SwarDistributedSweep(
                        self.database.codes, self.mesh, self.mesh_axis,
                        block_width=self.config.block_width,
                        rows_per_step=self._dist_rows_per_step_swar(),
                        tile_budget_bytes=self.config.tile_budget_bytes,
                        interpret=(self.backend == "pallas_interpret"
                                   or self.config.interpret))
                except ValueError as exc:
                    log.warning("SWAR mesh path unavailable (%s); falling "
                                "back to the XLA wavefront", exc)
                    sweep = None
                if sweep is not None:
                    # Per-wavefront-step dispatch with device-resident
                    # carries: abort() takes effect between steps, not just
                    # before the sweep (the reference aborts a running
                    # kernel via XRT, host/HavacHwClient.cpp:159-165).
                    def dist_progress(step, total):
                        self._chunks_total = total
                        self._chunks_done = step

                    checkpoint_cb, resume, ck_path = (
                        self._mesh_checkpoint_hooks(sweep, P))
                    t0 = time.perf_counter()
                    result = sweep.run(
                        scores, self.reset_rows,
                        abort_event=self._abort_event,
                        progress=dist_progress,
                        monolithic=not self.dist_step_dispatch,
                        checkpoint_cb=checkpoint_cb, resume=resume,
                        ckpt_every=4)
                    if result is None:
                        with self._state_lock:
                            self._state = HavacRunState.ABORTED
                        return
                    rows, pos = result
                    if ck_path and os.path.exists(ck_path):
                        os.remove(ck_path)
                    self._finish_distributed(rows, pos, P,
                                             time.perf_counter() - t0,
                                             prof=sweep.prof)
                    return

            if self.isolate_models:
                raise NotImplementedError(
                    "isolate_models on a mesh requires the SWAR path "
                    "(backend='pallas', packing=3); the XLA wavefront does "
                    "not support model isolation yet")
            from havac_tpu.parallel.engine_dist import DistributedSweep

            cap = self.dist_hit_capacity
            while True:
                sweep = DistributedSweep(
                    self.database.codes, self.mesh, self.mesh_axis,
                    rows_per_step=self.dist_rows_per_step,
                    rows_per_call=self.chunk_rows, hit_capacity=cap)
                n_row = max(1, -(-P // sweep.rows_per_call))
                self._chunks_total = n_row
                all_rows: List[np.ndarray] = []
                all_pos: List[np.ndarray] = []
                t_sweep = 0.0
                try:
                    for ri in range(n_row):
                        if self._abort_event.is_set():
                            with self._state_lock:
                                self._state = HavacRunState.ABORTED
                            return
                        r0 = ri * sweep.rows_per_call
                        r1 = min(P, r0 + sweep.rows_per_call)
                        t0 = time.perf_counter()
                        rows, pos = sweep.sweep_rows(scores[r0:r1], r0)
                        t_sweep += time.perf_counter() - t0
                        all_rows.append(rows)
                        all_pos.append(pos)
                        self._chunks_done = ri + 1
                    break
                except HitTileOverflow:
                    self.stats.overflow_retries += 1
                    cap *= 2

            if all_rows:
                self._hit_rows = np.concatenate(all_rows)
                self._hit_positions = np.concatenate(all_pos)
                # Shard-major decode order is not (row, pos)-sorted;
                # raw_hits() sorts lazily on first query.
                self._raw_sorted = False
            self.stats.num_chunks = self._chunks_total
            self.stats.cells = self.database.padded_length * P
            self.stats.sweep_seconds = t_sweep
            self.stats.num_raw_hits = int(self._hit_rows.shape[0])
            with self._state_lock:
                self._state = HavacRunState.COMPLETED
        except BaseException as exc:
            self._error = exc
            with self._state_lock:
                self._state = HavacRunState.ERROR

    def _mesh_checkpoint_hooks(self, sweep, P: int):
        """(checkpoint_cb, resume, local_path) for the SWAR mesh path.

        Wavefront-step-granularity checkpointing (VERDICT r2 #5): every
        process persists ITS shards of the device-resident scan carry
        (row state + seam) plus the hits it decoded, to
        ``checkpoint_path[.pK]`` — a killed multi-host run resumes from the
        per-host files with the same full-CRC fingerprint discipline as the
        single-chip paths. Step-dispatch mode only (monolithic is one
        uncancelable dispatch)."""
        if not (self.checkpoint_path and self.dist_step_dispatch):
            return None, None, None
        import zlib

        import jax

        fp = self._fingerprint(self.database.padded_length, P,
                               sweep.shard_width, sweep.R)
        fp = zlib.crc32(
            f"mesh:{sweep.D}:{self.mesh_axis}:{jax.process_count()}".encode(),
            fp)
        path = self.checkpoint_path
        if jax.process_count() > 1:
            path += f".p{jax.process_index()}"

        resume = None
        try:
            with np.load(path) as ck:
                if int(ck["fingerprint"]) == fp:
                    resume = (int(ck["next_t"]), ck["istate"], ck["seam"],
                              ck["hit_rows"], ck["hit_positions"])
                else:
                    self._warn_stale_checkpoint(path)
        except (FileNotFoundError, KeyError, OSError, ValueError):
            resume = None

        if jax.process_count() > 1:
            # Every wavefront step is a collective (shard_map ppermute +
            # replicated overflow sync): processes resuming at DIFFERENT
            # steps would dispatch mismatched collective programs and
            # deadlock or corrupt the run. All hosts must agree on next_t;
            # a kill can land between two hosts' checkpoint writes (or eat
            # one host's file), so on any disagreement every host restarts
            # from scratch — correctness over salvaged progress.
            from jax.experimental import multihost_utils

            t_local = resume[0] if resume is not None else -1
            ts = np.asarray(
                multihost_utils.process_allgather(np.int64(t_local)))
            if int(ts.min()) < 0 or int(ts.min()) != int(ts.max()):
                if resume is not None:
                    log.warning(
                        "mesh checkpoint resume: per-host next_t disagree "
                        "(%s); restarting from step 0 on all hosts",
                        ts.tolist())
                resume = None
        if resume is not None:
            self.resumed_chunks = resume[0]
            self._chunks_done = self.resumed_chunks

        def checkpoint_cb(t_next, il, ilo, sl, slo, rows_s, pos_s):
            # ilo/slo (this host's shard offsets) are derived state —
            # stage_sharded recomputes placement from the mesh on resume —
            # so they are not persisted.
            del ilo, slo
            tmp = path + ".tmp"
            np.savez(tmp, fingerprint=np.int64(fp), next_t=np.int64(t_next),
                     istate=il, seam=sl, hit_rows=rows_s,
                     hit_positions=pos_s)
            os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp,
                       path)

        return checkpoint_cb, resume, path

    def _mesh2d_checkpoint_hooks(self, sweep2d, P: int):
        """(checkpoint_cb, resume, path) for the 2D (seq × model) mesh path.

        Same wavefront-step discipline as :meth:`_mesh_checkpoint_hooks`,
        but the 2D scan state is sharded over BOTH axes, so the snapshot
        persists the full (small: D_m × shards of istate/seam) arrays —
        single-process only; multi-host 2D runs get no checkpointing (the
        1D path is the multi-host workhorse)."""
        if not (self.checkpoint_path and self.dist_step_dispatch):
            return None, None, None
        import zlib

        import jax

        if jax.process_count() > 1:
            log.warning("2D mesh checkpointing is single-process only; "
                        "this multi-host run proceeds WITHOUT checkpoints")
            return None, None, None
        fp = self._fingerprint(self.database.padded_length, P,
                               sweep2d.shard_width, sweep2d.R)
        fp = zlib.crc32(
            f"mesh2d:{sweep2d.D_seq}x{sweep2d.D_model}:"
            f"{self.mesh_axis}".encode(), fp)
        path = self.checkpoint_path

        resume = None
        try:
            with np.load(path) as ck:
                if int(ck["fingerprint"]) == fp:
                    resume = (int(ck["next_t"]), ck["istate"], ck["seam"],
                              ck["hit_rows"], ck["hit_positions"])
                    self.resumed_chunks = int(ck["next_t"])
                    self._chunks_done = self.resumed_chunks
                else:
                    self._warn_stale_checkpoint(path)
        except (FileNotFoundError, KeyError, OSError, ValueError):
            resume = None

        def checkpoint_cb(t_next, istate, seam, rows_s, pos_s):
            tmp = path + ".tmp"
            np.savez(tmp, fingerprint=np.int64(fp), next_t=np.int64(t_next),
                     istate=istate, seam=seam, hit_rows=rows_s,
                     hit_positions=pos_s)
            os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp,
                       path)

        return checkpoint_cb, resume, path

    def _dist_rows_per_step_swar(self) -> int:
        """Rows per wavefront step for the SWAR distributed path, sized so
        the per-step tile count fits the tile budget on each shard."""
        from havac_tpu.ops.ssv_swar import ROWS_PER_FLUSH, ROWS_PER_STRIP

        W = self.config.block_width
        D = self.mesh.shape[self.mesh_axis]
        blocks_total = -(-self.database.padded_length // W)
        shard_blocks = max(1, -(-blocks_total // D))
        tile_bytes = (W // 3) * 4
        nflush = ROWS_PER_STRIP // ROWS_PER_FLUSH
        budget_tiles = max(nflush, self.config.tile_budget_bytes
                           // (3 * tile_bytes))
        strips = max(1, budget_tiles // (shard_blocks * nflush))
        rows = strips * ROWS_PER_STRIP
        # Never pad the model stream beyond one step, and keep the per-step
        # carry/seam vectors modest.
        P2 = round_up(self.scores.shape[0], ROWS_PER_STRIP)
        return max(ROWS_PER_STRIP, min(rows, P2, 8160))

    def _fingerprint(self, L: int, P: int, chunk: int, rchunk: int) -> int:
        import zlib

        h = zlib.crc32(self.scores.tobytes())
        # Full-database CRC: a prefix hash would silently resume a stale
        # checkpoint after an edit beyond the prefix (same padded length).
        # zlib.crc32 runs ~0.5-1.5 GB/s single-threaded, so this costs
        # seconds per GB — but only on checkpointed runs (opt-in, and those
        # are the long ones), and only once per loaded database: the digest
        # is cached on the database object across runs of a warm engine.
        db_crc = getattr(self.database, "_codes_crc32", None)
        if db_crc is None:
            db_crc = zlib.crc32(np.ascontiguousarray(self.database.codes))
            self.database._codes_crc32 = db_crc
        h = zlib.crc32(db_crc.to_bytes(4, "little"), h)
        h = zlib.crc32(
            np.asarray([L, P, chunk, rchunk, self.database.padded_length],
                       dtype=np.int64).tobytes(), h)
        # Semantic knobs that change hit sets must invalidate checkpoints.
        h = zlib.crc32(
            f"{self.strand}:{self.isolate_models}:{self.p_value}".encode(), h)
        return h

    @staticmethod
    def _warn_stale_checkpoint(path: str) -> None:
        """A checkpoint file exists but does not match this run. Usually the
        inputs changed — but the fingerprint formula itself changed once
        (round 3 switched the database term from chained bytes to a cached
        CRC-of-CRC), which invalidates older checkpoints too. Either way the
        run silently restarting from chunk 0 is worth a visible warning."""
        log.warning(
            "checkpoint %s does not match this run's inputs/geometry "
            "(or predates a fingerprint-format change); starting from "
            "scratch — it will be overwritten", path)

    def _load_checkpoint_pipelined(self, fingerprint: int, n_row: int,
                                   rchunk: int):
        try:
            with np.load(self.checkpoint_path) as ck:
                if (int(ck["fingerprint"]) != fingerprint
                        or "carries" not in ck
                        or ck["carries"].shape != (n_row, rchunk + 1)):
                    self._warn_stale_checkpoint(self.checkpoint_path)
                    return None
                return (int(ck["next_ci"]), ck["carries"].astype(np.int32),
                        ck["hit_rows"], ck["hit_positions"])
        except FileNotFoundError:
            return None
        except (KeyError, OSError, ValueError):
            self._warn_stale_checkpoint(self.checkpoint_path)
            return None

    def _load_checkpoint(self, fingerprint: int):
        try:
            with np.load(self.checkpoint_path) as ck:
                if int(ck["fingerprint"]) != fingerprint:
                    self._warn_stale_checkpoint(self.checkpoint_path)
                    return None
                return (int(ck["next_ci"]), ck["carry"].astype(np.int32),
                        ck["hit_rows"], ck["hit_positions"])
        except FileNotFoundError:
            return None
        except (KeyError, OSError, ValueError):
            self._warn_stale_checkpoint(self.checkpoint_path)
            return None

    def _save_checkpoint(self, fingerprint: int, next_ci: int,
                         carry: np.ndarray, all_rows, all_pos) -> None:
        rows = (np.concatenate(all_rows) if all_rows
                else np.empty(0, dtype=np.int64))
        pos = (np.concatenate(all_pos) if all_pos
               else np.empty(0, dtype=np.int64))
        tmp = self.checkpoint_path + ".tmp"
        np.savez(tmp, fingerprint=np.int64(fingerprint),
                 next_ci=np.int64(next_ci), carry=carry,
                 hit_rows=rows, hit_positions=pos)
        os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp,
                   self.checkpoint_path)

    def _sweep_chunk(
        self,
        codes: np.ndarray,
        scores: np.ndarray,
        carry: np.ndarray,
        row_state: Optional[np.ndarray],
        reset_rows: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """One kernel dispatch over (row chunk × column chunk); returns
        (hit rows, hit positions, final carry slice, final row state)."""
        if self.backend in ("pallas", "pallas_interpret"):
            cfg = self.config
            if self.backend == "pallas_interpret" and not cfg.interpret:
                cfg = dataclasses.replace(cfg, interpret=True)
            while True:
                try:
                    if cfg.packing == 3:
                        from havac_tpu.ops.ssv_swar import ssv_swar

                        rows, pos, state_out, carry_out = ssv_swar(
                            codes, scores, init_state=row_state,
                            init_carry=carry,
                            block_width=cfg.block_width,
                            max_hit_tiles=cfg.max_hit_tiles,
                            interpret=cfg.interpret,
                            reset_rows=reset_rows)
                    else:
                        from havac_tpu.ops.ssv_pallas import ssv_pallas

                        if reset_rows is not None:
                            raise NotImplementedError(
                                "isolate_models requires the SWAR kernel "
                                "(packing=3) or the XLA backend")
                        rows, pos, state_out, carry_out = ssv_pallas(
                            codes, scores, init_state=row_state,
                            init_carry=carry, config=cfg)
                    return (rows, pos, carry_out.astype(np.int32),
                            state_out.astype(np.int32))
                except HitTileOverflow:
                    self.stats.overflow_retries += 1
                    cfg = dataclasses.replace(
                        cfg, max_hit_tiles=cfg.max_hit_tiles * 2)
        elif self.backend == "xla":
            import jax.numpy as jnp

            from havac_tpu.ops.ssv_xla import ssv_scan_xla

            K = self.config.rows_per_strip
            P = scores.shape[0]
            P2 = round_up(max(P, 1), K)
            scores_p = np.full((P2, 4), -128, dtype=np.int8)
            scores_p[:P] = scores
            carry_p = np.zeros(P2 + 1, dtype=np.int32)
            carry_p[: P + 1] = carry
            if row_state is None:
                row_state = np.zeros(codes.shape[0], dtype=np.int32)
            reset_p = None
            if reset_rows is not None:
                rr = np.zeros(P2, dtype=np.int32)
                rr[:P] = np.asarray(reset_rows, dtype=np.int32)
                reset_p = jnp.asarray(rr)
            bitmaps, state_out, carry_out = ssv_scan_xla(
                jnp.asarray(codes), jnp.asarray(scores_p),
                jnp.asarray(row_state.astype(np.int32)),
                jnp.asarray(carry_p), reset_p, rows_per_strip=K)
            rows, pos = decode_dense_bitmaps(np.asarray(bitmaps), K)
            keep = rows < P
            return (rows[keep], pos[keep], np.asarray(carry_out)[: P + 1],
                    np.asarray(state_out))
        else:
            raise HavacUsageError(f"unknown backend {self.backend!r}")
