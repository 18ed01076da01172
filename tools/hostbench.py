"""Host-side collector-pool benchmark: per-chunk record decode + resolve.

Measures the pure-CPU work the pipelined engine's collector pool does per
chunk — native SWAR record decode + coordinate resolution — under the
production 4-worker fan-out, A/B'ing the native decode's internal thread
count and the per-chunk sort. Measured on an idle VM
(benchmarks/hostbench_v5e.json, 83k hits/chunk genomic density): nt4 and
nt1 tie under the 4-worker pool (~19.7 ms/chunk), so the fan-aware
nthreads rule (CLAUDE.md) costs nothing here — the catastrophic
oversubscription it guards against (8 jobs × 8 native threads: 8–24 s vs
0.7 s) bites at the wider drain-tail fan-out, not this pool. The in-decode
sort is ~44% of the per-chunk cost (11.0 ms unsorted vs 19.7 sorted) but
runs in collector threads overlapped with the ~30 ms device step, so it is
off the critical path at production density.

Runs entirely on CPU (no jax, no TPU): synthesizes decode inputs at a
given hit density and replays them through a ThreadPoolExecutor.

    python tools/hostbench.py                     # genomic density defaults
    python tools/hostbench.py --hits-per-chunk 20000 --json out.json
"""
import argparse
import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, ".")

from havac_tpu.hits.decode import resolve_block_with_keys  # noqa: E402
from havac_tpu.io.fasta import SequenceDatabase  # noqa: E402


def make_chunk(seed, n_entries, bits_per_word, strips, block_words):
    """Synthetic decode input: entries at ~bits_per_word set bits each
    (clustered-hit regimes emit denser bitmap words)."""
    r = np.random.default_rng(seed)
    ids = r.integers(0, 22 * strips * 3, size=n_entries, dtype=np.int64)
    word_idx = r.integers(0, block_words, size=n_entries, dtype=np.int64)
    words = np.zeros(n_entries, dtype=np.uint32)
    for _ in range(bits_per_word):
        f = r.integers(0, 3, size=n_entries).astype(np.uint32)
        b = r.integers(0, 10, size=n_entries).astype(np.uint32)
        words |= np.uint32(1) << (10 * f + b)
    return ids, word_idx, words


def fake_db(rng, nseq=24_000):
    """A chr22-shaped database surrogate: ~24k sequences, ~50 Mb total."""
    lens = rng.integers(500, 4000, size=nseq, dtype=np.int64)
    starts = np.zeros(nseq + 1, dtype=np.int64)
    np.cumsum(lens + 1, out=starts[1:])
    db = SequenceDatabase(codes=np.empty(0, dtype=np.uint8), starts=starts,
                          lengths=lens, names=[""] * nseq, seed=0)
    return db, int(starts[-1])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--hits-per-chunk", type=int, default=83_000,
                    help="~42M genomic hits / 510 chunks at the 150k point")
    ap.add_argument("--bits-per-word", type=int, default=3)
    ap.add_argument("--chunks", type=int, default=64,
                    help="chunks replayed per timing (cycled from 8 inputs)")
    ap.add_argument("--workers", type=int, default=4,
                    help="collector-pool width (engine uses 4)")
    ap.add_argument("--rows", type=int, default=150_043)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args(argv)

    from havac_tpu import native

    if native._load() is None:
        print("native library unavailable — build havac_tpu/native first",
              file=sys.stderr)
        return 1

    W3, strips = 129024, 272
    nent = max(1, args.hits_per_chunk // max(args.bits_per_word, 1))
    chunks = [make_chunk(i, nent, args.bits_per_word, strips, W3)
              for i in range(8)]
    rng = np.random.default_rng(0)
    db, total = fake_db(rng)
    prefix = np.concatenate(
        [[0], np.cumsum(rng.integers(50, 200, size=1400))]).astype(np.int64)
    prefix = prefix * (args.rows // int(prefix[-1]) + 1)

    def job(i, nthreads, sort):
        ids, wi, wo = chunks[i % len(chunks)]
        out = native.decode_swar_flat_native(ids, wi, wo, strips, W3,
                                             sort=sort, nthreads=nthreads)
        rows, pos = out
        rows = rows % args.rows
        pos = pos % total
        _res, kr, _kp = resolve_block_with_keys(rows, pos, db, prefix)
        return kr.size

    results = {"hits_per_chunk": args.hits_per_chunk,
               "workers": args.workers, "variants": {}}
    for label, nthreads, sort in (("pool_nt4_sorted", 4, True),
                                  ("pool_nt1_sorted", 1, True),
                                  ("pool_nt1_unsorted", 1, False)):
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=args.workers) as pool:
            list(pool.map(lambda i: job(i, nthreads, sort),
                          range(args.chunks)))
        per = (time.perf_counter() - t0) / args.chunks
        results["variants"][label] = {"ms_per_chunk": round(per * 1e3, 2)}
        print(f"{label:20s} {per * 1e3:8.2f} ms/chunk "
              f"({per * 510:6.1f} s over a 510-chunk sweep)")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
        print(f"# wrote {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
