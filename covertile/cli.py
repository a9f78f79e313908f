"""Command-line entry points mirroring the reference's programs.

    python -m covertile.cli create-points -n 100000 -V 10 -s 5 -o pts.fvecs
    python -m covertile.cli build-graph   -i pts.fvecs -r 0.15 -o graph.txt
    python -m covertile.cli check-graph   -n 50000 -r 0.15 -V 10 -s 5

* create-points ~ /root/reference/programs/create_points.cpp:50-69 (S1+S4):
  seeded Gaussian cloud written in the reference's binary fvecs format.
* build-graph ~ programs/build_graph.cpp (S3 -> T1 -> J1 -> S6): read a
  point file, build the partitioned cover-tree index, run the epsilon
  radius self-join, write the reference's 1-indexed sorted text format.
* check-graph ~ programs/epsilon_graph.cpp:109-163 — the reference's own
  conformance harness: build the epsilon graph twice (engine vs O(n^2)
  brute force) and compare exactly; prints the reference's success line.

These own the Ray session (the only places outside bench.py/tests that
do); flags match the reference CLI where meaningful (-n -V -s -r -C -o -i).
"""

from __future__ import annotations

import argparse
import os
import struct
import sys

import numpy as np


def _ray_session():
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")
    return ray


def size_int(s: str) -> int:
    """'1K'/'2M'/'4G' binary-suffix integer parse (M8; semantics of
    /root/reference/src/read_args.cpp:7-19: strtod prefix, case-
    insensitive suffix, x + 0.499 rounding)."""
    s = s.strip()
    mult = 1
    if s and s[-1].upper() in "KMG":
        mult = 1 << {"K": 10, "M": 20, "G": 30}[s[-1].upper()]
        s = s[:-1]
    return int(float(s) * mult + 0.499)


def gaussian_points(n: int, var: float, seed: int) -> np.ndarray:
    """Seeded 2-D Gaussian cloud (reference src/Point.cpp:45-60 uses
    default_random_engine(17*seed); bit parity with libstdc++ is not a
    contract — correctness is checked against brute force)."""
    rng = np.random.default_rng(17 * seed)
    return rng.normal(0.0, np.sqrt(var), (n, 2)).astype(np.float32)


def cmd_create_points(args) -> int:
    pts = gaussian_points(args.n, args.var, args.seed)
    with open(args.output, "wb") as f:
        dims = np.full((len(pts), 1), 2, np.int32).view(np.float32)
        np.hstack([dims, pts]).astype(np.float32).tofile(f)
    print(f"wrote {len(pts)} points (dim=2) to {args.output}")
    return 0


def _index_points(xy: np.ndarray, ckpt: str, base: float):
    import pyarrow as pa
    import ray.data as rd

    from covertile import cells
    from covertile.pipeline import auto_resolution, build_index

    n = len(xy)
    # normalize into the engine's cell world-box if points fall outside
    res = auto_resolution(n, None, target_cell_points=max(64, n // 256))
    t = pa.table({
        "doc_id": np.arange(n, dtype=np.int64),
        "x": xy[:, 0], "y": xy[:, 1],
        "cell": cells.cell_of(xy[:, 0], xy[:, 1], res).astype(np.int64),
    })
    blocks = max(4, min(256, n // 10_000 + 1))
    pts = rd.from_arrow(t).repartition(blocks)
    idx = build_index(pts, ckpt, res,
                      target_points=max(2000, min(32_000, n // 64)),
                      min_partitions=4, base=base)
    return idx, pts


def cmd_build_graph(args) -> int:
    import tempfile

    _ray_session()
    from covertile.queries import epsilon_graph
    from covertile.sources import fvecs_dim_count, read_fvecs, \
        write_graph_text_single

    dim, n = fvecs_dim_count(args.input)
    assert dim == 2, f"dim={dim}: the spatial engine indexes 2-D points"
    tbl = read_fvecs(args.input).to_pandas().sort_values("point_id")
    xy = np.stack(tbl["coords"].to_numpy()).astype(np.float32)
    ckpt = args.ckpt or tempfile.mkdtemp(prefix="covertile-cli-")
    idx, pts = _index_points(xy, ckpt, args.base)
    edges = epsilon_graph(idx, pts, args.radius)
    n_edges = write_graph_text_single(edges, args.output, n_verts=n)
    print(f"n={n} radius={args.radius} -> {n_edges} edges "
          f"(avg deg {n_edges / n:.2f}) -> {args.output}")
    return 0


def cmd_check_graph(args) -> int:
    import tempfile

    _ray_session()
    from covertile.covertree import brute_force_radius
    from covertile.queries import epsilon_graph

    xy = gaussian_points(args.n, args.var, args.seed)
    ckpt = tempfile.mkdtemp(prefix="covertile-check-")
    idx, pts = _index_points(xy, ckpt, args.base)
    got = (epsilon_graph(idx, pts, args.radius).to_pandas()
           .sort_values(["src_id", "dst_id"]).reset_index(drop=True))
    qi, pi, di = brute_force_radius(xy, xy, args.radius)
    order = np.lexsort((pi, qi))
    ok = (len(got) == len(qi)
          and np.array_equal(got["src_id"].to_numpy(), qi[order])
          and np.array_equal(got["dst_id"].to_numpy(), pi[order])
          and np.array_equal(got["dist"].to_numpy().view(np.int64),
                             di[order].view(np.int64)))
    # the reference's own verdict line (programs/epsilon_graph.cpp:133-140)
    print("Graph construction was successful" if ok
          else "Graph construction was NOT successful")
    return 0 if ok else 1


def cmd_curate(args) -> int:
    """Training-data curation front door: documents parquet -> quality/
    lang/dedup gate (textops.corpus_filter) -> deterministic train/val/
    test assignment -> partitioned parquet (one split=... directory per
    assignment).  Idempotent: a completed output (marked by a _DONE
    sentinel written after the parquet) is left untouched on re-run —
    pass --overwrite to redo.  The whole path streams; only per-split
    row counts reach the driver."""
    _ray_session()
    import shutil

    import ray.data as rd
    import pyarrow as pa

    from . import textops as T

    done_mark = os.path.join(args.output, "_DONE")
    if os.path.exists(done_mark) and not args.overwrite:
        print(f"{args.output} already complete (found _DONE); "
              f"use --overwrite to redo")
        return 0
    if os.path.isdir(args.output):
        # only clear a directory we can attribute to this command: an
        # explicit --overwrite, or the debris of a prior partial run
        # (split=* subdirs / _DONE).  Anything else is someone else's
        # data — refuse instead of deleting it.
        import glob as _glob
        ours = (os.path.exists(done_mark)
                or _glob.glob(os.path.join(args.output, "split=*")))
        if not (args.overwrite or ours):
            print(f"refusing to clobber existing non-curate directory "
                  f"{args.output}; pass --overwrite to delete it")
            return 1
        shutil.rmtree(args.output)

    docs = rd.read_parquet(args.input, columns=["doc_id", "text"])
    kept = T.corpus_filter(docs, min_tokens=args.min_tokens)

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        import numpy as np
        names = sorted(T.SPLIT_PCT)
        edges = np.cumsum([T.SPLIT_PCT[n] for n in names])
        sel = np.searchsorted(edges, T._sample_bucket(ids), side="right")
        return batch.append_column(
            "split", pa.array(np.array(names, dtype=object)[sel],
                              pa.string()))

    out = kept.map_batches(assign, batch_format="pyarrow")
    out.write_parquet(args.output, partition_cols=["split"])
    with open(done_mark, "w") as f:
        f.write("ok\n")
    import glob
    import pyarrow.parquet as pq
    for d in sorted(glob.glob(os.path.join(args.output, "split=*"))):
        n = sum(pq.ParquetFile(f).metadata.num_rows
                for f in glob.glob(os.path.join(d, "*.parquet")))
        print(f"{os.path.basename(d)}: {n} docs")
    return 0


def cmd_profile(args) -> int:
    """Data-quality profile of a parquet table: per-column rows / nulls /
    exact distinct (curation.table_profile), printed as a table."""
    _ray_session()
    import pyarrow.parquet as pq
    import ray.data as rd

    from . import curation

    cols = (args.columns.split(",") if args.columns
            else pq.ParquetFile(args.input).schema_arrow.names)
    ds = rd.read_parquet(args.input, columns=list(cols))
    df = curation.table_profile(ds, columns=tuple(cols)).to_pandas()
    print(df.to_string(index=False))
    return 0


def cmd_bm25(args) -> int:
    """BM25 top-k lexical search over a documents parquet; --store uses
    (building on first use) the hive-partitioned postings store, so
    repeated queries read only their terms' buckets."""
    import os

    _ray_session()
    import ray.data as rd

    from . import search

    terms = tuple(args.query.split())
    if args.store:
        if not os.path.exists(os.path.join(args.store, "stats.json")):
            docs = rd.read_parquet(args.input, columns=["doc_id", "text"])
            search.bm25_build_store(docs, args.store)
            print(f"postings store built -> {args.store}")
        df = search.bm25_topk_store(args.store, terms=terms,
                                    k=args.k).to_pandas()
    else:
        docs = rd.read_parquet(args.input, columns=["doc_id", "text"])
        df = search.bm25_topk(docs, terms=terms, k=args.k).to_pandas()
    print(df.to_string(index=False))
    return 0


def cmd_dump_gml(args) -> int:
    """Reference-parity GML dumps (S8, OldCoverTree.cpp:383-417): one
    pid=N.gml per completed partition in a checkpoint dir.  Local parquet
    reads only — no Ray session needed."""
    import os

    from .sources import write_tree_gml
    from .store import done_pids

    os.makedirs(args.output, exist_ok=True)
    pids = sorted(done_pids(args.ckpt))
    for pid in pids:
        nv = write_tree_gml(args.ckpt, pid,
                            os.path.join(args.output, f"pid={pid}.gml"))
        print(f"pid={pid}: {nv} vertices")
    print(f"{len(pids)} partition trees -> {args.output}")
    return 0 if pids else 1


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m covertile.cli")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("create-points")
    p.add_argument("-n", type=size_int, required=True)
    p.add_argument("-V", "--var", type=float, default=10.0)
    p.add_argument("-s", "--seed", type=int, default=0)
    p.add_argument("-o", "--output", required=True)
    p.set_defaults(fn=cmd_create_points)

    p = sub.add_parser("build-graph")
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-r", "--radius", type=float, required=True)
    p.add_argument("-C", "--base", type=float, default=2.0)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--ckpt", default=None)
    p.set_defaults(fn=cmd_build_graph)

    p = sub.add_parser("check-graph")
    p.add_argument("-n", type=size_int, required=True)
    p.add_argument("-r", "--radius", type=float, required=True)
    p.add_argument("-V", "--var", type=float, default=10.0)
    p.add_argument("-s", "--seed", type=int, default=0)
    p.add_argument("-C", "--base", type=float, default=2.0)
    p.set_defaults(fn=cmd_check_graph)

    p = sub.add_parser("curate")
    p.add_argument("-i", "--input", required=True,
                   help="documents parquet (doc_id, text)")
    p.add_argument("-o", "--output", required=True,
                   help="output dir; one split=train|val|test partition each")
    p.add_argument("--min-tokens", type=size_int, default=40)
    p.add_argument("--overwrite", action="store_true")
    p.set_defaults(fn=cmd_curate)

    p = sub.add_parser("profile")
    p.add_argument("-i", "--input", required=True, help="parquet file")
    p.add_argument("-c", "--columns", default=None,
                   help="comma-separated column subset (default: all)")
    p.set_defaults(fn=cmd_profile)

    p = sub.add_parser("bm25")
    p.add_argument("-i", "--input", required=True,
                   help="documents parquet (doc_id, text)")
    p.add_argument("-q", "--query", required=True,
                   help="space-separated query terms")
    p.add_argument("-k", type=size_int, default=10)
    p.add_argument("--store", default=None,
                   help="postings-store dir: built on first use, then "
                        "queried via the partition-pruned path")
    p.set_defaults(fn=cmd_bm25)

    p = sub.add_parser("dump-gml")
    p.add_argument("--ckpt", required=True,
                   help="checkpoint dir from a build (plan.json/trees/)")
    p.add_argument("-o", "--output", required=True,
                   help="output dir; one pid=N.gml per partition")
    p.set_defaults(fn=cmd_dump_gml)

    args = ap.parse_args(argv)
    rc = args.fn(args)
    import ray
    if ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
