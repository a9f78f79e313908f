"""Size-derived fan-out for bucketed exchanges.

Every bucketed shuffle in the engine (user-hash event exchanges, the
dedup component actors, int-key hash joins, top-k merge buckets) needs a
bucket count.  A fixed constant is wrong at scale in both directions: too
few buckets caps parallelism on a big cluster AND puts ~rows/B rows in
one task (a per-task memory ceiling at 100x data); too many buckets on a
laptop pays fixed per-task cost for kilobyte groups.

The rule here mirrors pipeline.compute_plan's discipline for the spatial
side: derive the count from cluster CPUs and (when the caller can get it
cheaply, e.g. parquet metadata) an input row estimate.

  buckets = next_pow2(max(4 * cluster_CPUs, rows / TARGET_ROWS_PER_BUCKET))

clamped to [MIN_BUCKETS, MAX_BUCKETS].  Powers of two so routing stays a
shift off the top bits of a Fibonacci hash (the high bits are the
well-mixed ones).  Bucket count only affects parallelism, never results —
tests/test_sizing.py asserts bitwise-identical operator output at two
counts.
"""

from __future__ import annotations

import os

__all__ = ["cluster_cpus", "fanout", "fanout_bits", "bucket_shift",
           "table_rows", "TARGET_ROWS_PER_BUCKET"]

#: ~4M projected rows (a few int64 columns) per bucket task ~= 128-256 MB
#: of task heap -- comfortably inside a worker with room for the sort.
TARGET_ROWS_PER_BUCKET = 4_000_000

MIN_BITS = 3       # 8 buckets: never fewer tasks than a small node's cores
MAX_BITS = 16      # 65536 buckets: per-task fixed cost stays amortized


def cluster_cpus() -> int:
    """Logical CPUs visible to Ray (cluster-wide when initialised), else
    the host count.  Never raises; falls back to 8."""
    try:
        import ray
        if ray.is_initialized():
            n = ray.cluster_resources().get("CPU")
            if n:
                return max(1, int(n))
    except Exception:
        pass
    return os.cpu_count() or 8


def fanout_bits(rows: int | None = None,
                target_rows: int = TARGET_ROWS_PER_BUCKET) -> int:
    """Bucket-count bits for a hash exchange: enough buckets for 4 tasks
    per CPU (straggler smoothing) and for <= target_rows rows per bucket
    when the caller knows the input size."""
    need = 4 * cluster_cpus()
    if rows:
        need = max(need, -(-int(rows) // int(target_rows)))
    bits = max(MIN_BITS, min(MAX_BITS, int(need - 1).bit_length()))
    return bits


def fanout(rows: int | None = None,
           target_rows: int = TARGET_ROWS_PER_BUCKET) -> int:
    """Power-of-two bucket count (see fanout_bits)."""
    return 1 << fanout_bits(rows, target_rows)


def bucket_shift(nbuckets: int | None = None, rows: int | None = None):
    """Top-bits shift (np.uint64) for a Fibonacci-hash bucket route:
    bucket = (key * PHI) >> shift.  nbuckets=None derives the count from
    cluster size (and `rows` when given); an explicit power-of-two pins
    it (tests pin small counts).  The high bits of the multiply are the
    well-mixed ones, hence shift rather than modulo."""
    import numpy as np
    b = int(nbuckets) if nbuckets else fanout(rows)
    bits = max(1, (b - 1).bit_length())
    return np.uint64(64 - bits)


def table_rows(sf_dir: str, name: str) -> int | None:
    """Cheap row-count estimate for a dataset-directory table: parquet
    footer metadata (no data read).  None when unavailable (e.g. a Lance
    table without the library, or a missing file) -- callers fall back to
    the CPU-derived fan-out."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        import pyarrow.parquet as pq
        if os.path.isdir(path):
            total = 0
            for f in os.listdir(path):
                if f.endswith(".parquet"):
                    total += pq.ParquetFile(
                        os.path.join(path, f)).metadata.num_rows
            return total or None
        return pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return None
