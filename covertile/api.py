"""Driver-facing query API: one function per operator, plus its oracle SQL.

Each query function takes ``sf_dir`` (a directory of parquet tables) and
returns a ray.data.Dataset whose rows/columns/values exactly match the
oracle SQL run by DuckDB over the same parquet files (bitwise for floats —
see geometry.py).  Ray sessions are owned by the caller.

Indexes are checkpointed under /tmp keyed by (input, config) so the build
cost is shared across queries in one driver run and across resumed runs.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from . import geometry, shapes
from .pipeline import (
    DEFAULT_TARGET_PARTITION_POINTS, Index, auto_resolution, build_index,
    config_hash, derive_points,
)
from .queries import epsilon_graph, knn_join, pip_join, tile_assign

EPS_RADIUS = 0.5
KNN_K = 8
CELL_STATS_RES = 4
MIN_PARTITIONS = 8
CKPT_ROOT = os.environ.get("COVERTILE_CKPT", "/tmp/covertile-ckpt")


def _read_docs(sf_dir: str, columns=("doc_id",)):
    from .sources import read_table
    return read_table(sf_dir, "documents", columns)


def partition_target(n: int) -> int:
    """Per-partition point target for the driver-surface index build.

    Constant ceiling, NOT n // MIN_PARTITIONS: an uncapped linear target
    means one build task holds n/8 points at any n — a per-task memory
    ceiling and an 8-way parallelism cap at 100x data.  Clamped, the
    partition count grows with n past the clamp (the per-hub
    load-balance intent of reference src/DistCoverTree.cpp:726-758);
    MIN_PARTITIONS only keeps tiny test inputs multi-partition."""
    return min(max(256, n // MIN_PARTITIONS),
               DEFAULT_TARGET_PARTITION_POINTS)


def _index_for(sf_dir: str, radius: float | None):
    """Build (or load) the partitioned cover-tree index for sf_dir."""
    docs = _read_docs(sf_dir)
    n = docs.count()
    resolution = auto_resolution(n, radius,
                                 target_cell_points=max(64, n // 64))
    target = partition_target(n)
    ckpt = os.path.join(
        CKPT_ROOT,
        config_hash(sf=os.path.abspath(sf_dir), n=n,
                    resolution=resolution, target=target))
    points = derive_points(docs, resolution)
    idx = build_index(points, ckpt, resolution, target_points=target,
                      min_partitions=MIN_PARTITIONS)
    return idx, points, n


# ------------------------------------------------------------ epsilon graph

def q_epsilon_graph(sf_dir: str):
    idx, points, _ = _index_for(sf_dir, EPS_RADIUS)
    return epsilon_graph(idx, points, EPS_RADIUS).materialize().sort(["src_id", "dst_id"])


def sql_epsilon_graph() -> str:
    d = geometry.dist_sql("a.x", "a.y", "b.x", "b.y")
    return f"""
WITH pts AS ({geometry.pts_cte()})
SELECT a.doc_id AS src_id, b.doc_id AS dst_id, {d} AS dist
FROM pts a, pts b
WHERE {d} <= {EPS_RADIUS}
ORDER BY src_id, dst_id
"""


# ----------------------------------------------------------------- kNN join

def q_knn_join(sf_dir: str):
    idx, points, n = _index_for(sf_dir, None)
    return knn_join(idx, points, KNN_K, n_points_hint=n).materialize().sort(
        ["query_id", "rank"])


def sql_knn_join() -> str:
    d = geometry.dist_sql("a.x", "a.y", "b.x", "b.y")
    return f"""
WITH pts AS ({geometry.pts_cte()}),
cand AS (
  SELECT a.doc_id AS query_id, b.doc_id AS neighbor_id, {d} AS dist
  FROM pts a, pts b WHERE a.doc_id != b.doc_id
),
ranked AS (
  SELECT query_id, neighbor_id, dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, rank, neighbor_id, dist FROM ranked
WHERE rank <= {KNN_K} ORDER BY query_id, rank
"""


KNN_RADIUS_QS = (25, 50, 75, 90, 99)


def q_knn_radius_quantiles(sf_dir: str):
    """Exact discrete quantiles of the distance to the K-th nearest
    neighbor — the standard diagnostic for choosing an epsilon radius
    before a density query.  Distances are continuous floats (all
    distinct at scale), so a single-group histogram merge would funnel
    a point-sized table into one task; instead the k-th distances map
    to their IEEE-754 bit patterns (order-preserving int64 for
    non-negative doubles — no value arithmetic, so exactness is
    untouched) and the qstats two-phase coarse-bucket scheme answers
    the rank queries with metadata-sized driver combines."""
    import pyarrow.compute as pc
    import ray.data as _rd

    from .joins import mat
    from .qstats import histogram_quantiles
    idx, points, n = _index_for(sf_dir, None)
    kd = knn_join(idx, points, KNN_K, n_points_hint=n)

    def part(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["rank"], KNN_K))
        bits = t["dist"].to_numpy().view(np.int64)  # dist >= 0 always
        uv, c = np.unique(bits, return_counts=True)
        return pa.table({"v": uv, "c": c.astype(np.int64)})

    # coarse_bits=40: exponent + top-12-mantissa buckets (each spans a
    # ~0.02% relative range of distances, so target-bucket slivers are
    # tiny even on tightly clustered radii)
    n_, qv, _mx = histogram_quantiles(
        mat(kd.map_batches(part, batch_format="pyarrow")),
        KNN_RADIUS_QS, coarse_bits=40)
    cols = {"n_points": pa.array([n_], pa.int64())}
    for pq in KNN_RADIUS_QS:
        val = (float(np.array([qv[pq]], np.int64).view(np.float64)[0])
               if qv[pq] is not None else None)
        cols[f"p{pq}"] = pa.array([val], pa.float64())
    return _rd.from_arrow(pa.table(cols))


def sql_knn_radius_quantiles() -> str:
    base = sql_knn_join().strip()
    base = base[: base.rindex("ORDER BY")]
    qs = ",\n       ".join(
        f"quantile_disc(dist, {pq / 100.0}) AS p{pq}"
        for pq in KNN_RADIUS_QS)
    return f"""
WITH knn AS ({base})
SELECT CAST(count(*) AS BIGINT) AS n_points,
       {qs}
FROM knn WHERE rank = {KNN_K}
"""


# ---------------------------------------------------------------- PIP join

def q_pip_join(sf_dir: str):
    docs = _read_docs(sf_dir)
    points = derive_points(docs, 1)
    edges, offs, ids = shapes.make_polygons()
    return pip_join(points, edges, offs, ids).materialize().sort(["doc_id", "polygon_id"])


def sql_pip_join() -> str:
    return shapes.pip_oracle_sql(geometry.pts_cte())


# ------------------------------------------------------------------- tiles

def q_tile_assign(sf_dir: str):
    docs = _read_docs(sf_dir)
    points = derive_points(docs, 1)
    return tile_assign(points, shapes.TILE_MIN, shapes.TILE_MIN,
                       shapes.TILE_SIDE, shapes.TILE_G).materialize().sort(
        ["tile_id", "doc_id"])


def sql_tile_assign() -> str:
    return shapes.tile_assign_oracle_sql(geometry.pts_cte())


def q_tile_agg(sf_dir: str):
    """Per-tile aggregate with in-batch partial aggregation before the
    (tiny) groupby shuffle — the A3/pre-aggregation pattern."""
    docs = _read_docs(sf_dir, columns=("doc_id", "n_chars"))

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        x, y = geometry.derive_xy(ids)
        ix = np.floor((x.astype(np.float64) - shapes.TILE_MIN)
                      / shapes.TILE_SIDE).astype(np.int64)
        iy = np.floor((y.astype(np.float64) - shapes.TILE_MIN)
                      / shapes.TILE_SIDE).astype(np.int64)
        tile = iy * shapes.TILE_G + ix
        nch = batch["n_chars"].to_numpy()
        uniq, inv = np.unique(tile, return_inverse=True)
        cnt = np.bincount(inv)
        sch = np.bincount(inv, weights=nch).astype(np.int64)
        return pa.table({"tile_id": uniq, "n": cnt.astype(np.int64),
                         "sc": sch})

    parts = docs.map_batches(partial, batch_format="pyarrow")
    agg = parts.groupby("tile_id").sum(["n", "sc"])

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch["sum(n)"].to_numpy()
        sc = batch["sum(sc)"].to_numpy()
        return pa.table({
            "tile_id": batch["tile_id"],
            "n_docs": n,
            "sum_chars": sc,
            "avg_chars": sc.astype(np.float64) / n.astype(np.float64),
        })

    return agg.map_batches(finalize, batch_format="pyarrow").materialize().sort("tile_id")


def sql_tile_agg() -> str:
    return f"""
WITH pts AS ({geometry.pts_cte()}),
t AS (
  SELECT CAST(floor((CAST(p.y AS DOUBLE) - {shapes.TILE_MIN!r}) / {shapes.TILE_SIDE!r}) AS BIGINT)
           * {shapes.TILE_G}
       + CAST(floor((CAST(p.x AS DOUBLE) - {shapes.TILE_MIN!r}) / {shapes.TILE_SIDE!r}) AS BIGINT)
         AS tile_id,
         d.n_chars AS n_chars
  FROM pts p JOIN documents d ON p.doc_id = d.doc_id
)
SELECT tile_id, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
FROM t GROUP BY tile_id ORDER BY tile_id
"""


# -------------------------------------------------------------- cell stats

def q_cell_stats(sf_dir: str):
    """Per-cell document counts at a fixed resolution — the skew-detection
    aggregate (reference per-hub counts, src/DistCoverTree.cpp:45-83)."""
    from . import cells as C
    docs = _read_docs(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        x, y = geometry.derive_xy(ids)
        cell = C.cell_of(x, y, CELL_STATS_RES)
        uniq, cnt = np.unique(cell, return_counts=True)
        return pa.table({"cell": uniq.astype(np.int64),
                         "n": cnt.astype(np.int64)})

    agg = (docs.map_batches(partial, batch_format="pyarrow")
           .groupby("cell").sum("n"))

    def finalize(batch: pa.Table) -> pa.Table:
        from . import cells as C2
        code = batch["cell"].to_numpy().astype(np.uint64)
        ix, iy = C2.morton_decode(code)
        return pa.table({"ix": ix, "iy": iy,
                         "n_docs": batch["sum(n)"]})

    return agg.map_batches(finalize, batch_format="pyarrow").materialize().sort(
        ["ix", "iy"])


# -------------------------------------------------------------- span table

def q_span_stats(sf_dir: str):
    """Derive the interleaved span table (north-rule input shape), then
    report per-doc span structure computed from the ACTUAL nested column —
    proving derivation, not just re-evaluating the formula the SQL uses."""
    from . import spans as S
    import pyarrow.compute as pc
    docs = _read_docs(sf_dir, columns=("doc_id", "text", "source", "n_chars"))
    tbl = S.span_table(docs)

    def stats(batch: pa.Table) -> pa.Table:
        col = batch["spans"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = np.asarray(pc.list_value_length(col), np.int64)
        flat = col.flatten()
        is_text = np.asarray(pc.equal(flat.field("kind"), "text"))
        tlen = np.asarray(pc.utf8_length(flat.field("text")), np.int64)
        off = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=off[1:])
        cs_text = np.concatenate(([0], np.cumsum(is_text)))
        cs_tlen = np.concatenate(([0], np.cumsum(tlen * is_text)))
        n_text = cs_text[off[1:]] - cs_text[off[:-1]]
        text_len = cs_tlen[off[1:]] - cs_tlen[off[:-1]]
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_spans": lens,
            "n_text_spans": n_text.astype(np.int64),
            "n_media_spans": (lens - n_text).astype(np.int64),
            "text_len": text_len.astype(np.int64),
        })

    return tbl.map_batches(stats, batch_format="pyarrow").materialize().sort("doc_id")


def sql_span_stats() -> str:
    from .spans import MEDIA_MOD, TEXT_CHUNK
    nt = f"GREATEST(1, CAST(ceil(n_chars / {TEXT_CHUNK}.0) AS BIGINT))"
    return f"""
SELECT doc_id,
       {nt} + doc_id % {MEDIA_MOD} AS n_spans,
       {nt} AS n_text_spans,
       doc_id % {MEDIA_MOD} AS n_media_spans,
       n_chars AS text_len
FROM documents ORDER BY doc_id
"""


def q_span_transitions(sf_dir: str):
    """Corpus-wide counts of ADJACENT span-kind pairs: (prev_kind,
    next_kind, n).  Read off the ACTUAL nested spans column in offset
    order, so this is the end-to-end machine check of the north rule's
    span-sequence invariant — a reorder, drop or duplication anywhere in
    the derive -> nested-Arrow -> flatten path changes these counts,
    while per-doc tallies (span_stats) would not notice a swap.

    Scale shape: pure per-batch pass over the span table into <= 4
    partial rows per block, one 4-key exchange."""
    import pyarrow.compute as pc

    from . import spans as S
    from .joins import mat
    docs = _read_docs(sf_dir,
                      columns=("doc_id", "text", "source", "n_chars"))
    tbl = S.span_table(docs)
    names = np.array(["text", "media"], dtype=object)

    def part(batch: pa.Table) -> pa.Table:
        col = batch["spans"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = np.asarray(pc.list_value_length(col), np.int64)
        flat = col.flatten()
        k = np.asarray(pc.equal(flat.field("kind"), "media")) \
            .astype(np.int64)
        off = np.asarray(flat.field("offset"), np.int64)
        row = np.repeat(np.arange(len(lens)), lens)
        order = np.lexsort((off, row))   # offset order within each doc
        r_s, k_s = row[order], k[order]
        same = r_s[1:] == r_s[:-1] if len(r_s) else np.zeros(0, bool)
        code = k_s[:-1][same] * 2 + k_s[1:][same]
        n = np.bincount(code, minlength=4).astype(np.int64)
        return pa.table({
            "prev_kind": pa.array(names[[0, 0, 1, 1]], pa.string()),
            "next_kind": pa.array(names[[0, 1, 0, 1]], pa.string()),
            "n": n,
        })

    agg = (mat(tbl.map_batches(part, batch_format="pyarrow"))
           .groupby(["prev_kind", "next_kind"]).sum("n"))

    def finish(batch: pa.Table) -> pa.Table:
        keep = batch["sum(n)"].to_numpy() > 0  # oracle GROUP BY emits
        return pa.table({                      # only occurring pairs
            "prev_kind": batch["prev_kind"],
            "next_kind": batch["next_kind"],
            "n": batch["sum(n)"],
        }).filter(pa.array(keep))

    return (agg.map_batches(finish, batch_format="pyarrow")
            .materialize().sort(["prev_kind", "next_kind"]))


def sql_span_transitions() -> str:
    """Mirrors interleave_spans' position formulas (spans.py): text i
    sits at i + min(i, M), media j at min(j+1, T) + j; adjacency via a
    per-doc lead() over pos."""
    from .spans import MEDIA_MOD, TEXT_CHUNK
    return f"""
WITH d AS (
  SELECT doc_id,
         GREATEST(1, CAST(ceil(n_chars / {TEXT_CHUNK}.0) AS BIGINT)) AS t_n,
         CAST(doc_id % {MEDIA_MOD} AS BIGINT) AS m_n
  FROM documents),
tx AS (SELECT doc_id, CAST(i + LEAST(i, m_n) AS BIGINT) AS pos,
              'text' AS kind
       FROM (SELECT doc_id, m_n, unnest(range(t_n)) AS i FROM d)),
md AS (SELECT doc_id, CAST(LEAST(j + 1, t_n) + j AS BIGINT) AS pos,
              'media' AS kind
       FROM (SELECT doc_id, t_n, unnest(range(m_n)) AS j FROM d)),
s AS (SELECT * FROM tx UNION ALL SELECT * FROM md),
p AS (SELECT doc_id, kind AS prev_kind,
             lead(kind) OVER (PARTITION BY doc_id ORDER BY pos)
               AS next_kind
      FROM s)
SELECT prev_kind, next_kind, count(*) AS n
FROM p WHERE next_kind IS NOT NULL
GROUP BY prev_kind, next_kind
ORDER BY prev_kind, next_kind
"""


# ---------------------------------------------------- flagship: doc enrich

def q_doc_enrich(sf_dir: str):
    """Flagship composition: span table + epsilon-graph degree, re-joined
    by doc_id via the bucketed hash join (spans never transit the spatial
    shuffle).  Output flat columns so the oracle can mirror it."""
    from . import spans as S
    import pyarrow.compute as pc
    from .joins import hash_join_int_key

    idx, points, _ = _index_for(sf_dir, EPS_RADIUS)
    edges = epsilon_graph(idx, points, EPS_RADIUS)

    def partial_deg(batch: pa.Table) -> pa.Table:
        u, c = np.unique(batch["src_id"].to_numpy(), return_counts=True)
        return pa.table({"doc_id": u, "c": c.astype(np.int64)})

    deg = (edges.map_batches(partial_deg, batch_format="pyarrow")
           .groupby("doc_id").sum("c"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["doc_id"],
                         "eps_degree": batch["sum(c)"]})

    deg = deg.map_batches(rename, batch_format="pyarrow")

    docs = _read_docs(sf_dir, columns=("doc_id", "text", "source", "n_chars"))
    tbl = S.span_table(docs)

    def nspans(batch: pa.Table) -> pa.Table:
        col = batch["spans"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_spans": np.asarray(pc.list_value_length(col), np.int64),
        })

    stats = tbl.map_batches(nspans, batch_format="pyarrow")
    # deg is lazy over the whole epsilon-graph pipeline: inferring its
    # schema would run that pipeline once extra — declare it instead
    return hash_join_int_key(
        stats, deg, "doc_id",
        left_schema=pa.schema([("doc_id", pa.int64()),
                               ("n_spans", pa.int64())]),
        right_schema=pa.schema([("doc_id", pa.int64()),
                                ("eps_degree", pa.int64())]),
    ).materialize().sort("doc_id")


def flagship(sf_dir: str):
    """Full north-rule pipeline, nested output: documents -> interleaved
    span table -> geometry/cell derivation -> partitioned cover-tree build
    (checkpointed) -> epsilon radius self-join -> per-doc degree -> spans
    re-joined by doc_id.  Output: (doc_id, spans, eps_degree) with the
    span sequence byte-identical to the derived input (tested)."""
    from . import spans as S
    from .joins import hash_join_int_key

    idx, points, _ = _index_for(sf_dir, EPS_RADIUS)
    edges = epsilon_graph(idx, points, EPS_RADIUS)

    def partial_deg(batch: pa.Table) -> pa.Table:
        u, c = np.unique(batch["src_id"].to_numpy(), return_counts=True)
        return pa.table({"doc_id": u, "c": c.astype(np.int64)})

    deg = (edges.map_batches(partial_deg, batch_format="pyarrow")
           .groupby("doc_id").sum("c")
           .map_batches(lambda b: pa.table(
               {"doc_id": b["doc_id"], "eps_degree": b["sum(c)"]}),
               batch_format="pyarrow"))

    docs = _read_docs(sf_dir, columns=("doc_id", "text", "source", "n_chars"))
    tbl = S.span_table(docs)
    # tbl's nested span schema is inferred (one cheap block); deg's would
    # cost a full epsilon-graph execution — declared instead
    return hash_join_int_key(
        tbl, deg, "doc_id", how="left",
        right_schema=pa.schema([("doc_id", pa.int64()),
                                ("eps_degree", pa.int64())]))


def sql_doc_enrich() -> str:
    d = geometry.dist_sql("a.x", "a.y", "b.x", "b.y")
    from .spans import MEDIA_MOD, TEXT_CHUNK
    nt = f"GREATEST(1, CAST(ceil(d.n_chars / {TEXT_CHUNK}.0) AS BIGINT))"
    return f"""
WITH pts AS ({geometry.pts_cte()}),
deg AS (
  SELECT a.doc_id, count(*) AS eps_degree
  FROM pts a, pts b WHERE {d} <= {EPS_RADIUS} GROUP BY a.doc_id
)
SELECT d.doc_id, {nt} + d.doc_id % {MEDIA_MOD} AS n_spans, deg.eps_degree
FROM documents d JOIN deg ON d.doc_id = deg.doc_id
ORDER BY d.doc_id
"""


def sql_cell_stats() -> str:
    from . import cells as C
    cs = C.cell_side(CELL_STATS_RES)
    return f"""
WITH pts AS ({geometry.pts_cte()})
SELECT CAST(floor((CAST(x AS DOUBLE) - {C.WORLD_MIN!r}) / {cs!r}) AS BIGINT) AS ix,
       CAST(floor((CAST(y AS DOUBLE) - {C.WORLD_MIN!r}) / {cs!r}) AS BIGINT) AS iy,
       count(*) AS n_docs
FROM pts GROUP BY ix, iy ORDER BY ix, iy
"""


# ------------------------------------------------------------------ lineage

def q_index_lineage(sf_dir: str):
    """Per-partition build lineage/metrics records (north rule) as a
    Dataset: one row per completed partition with counts, tree stats and
    wall time — the Ray-native analogue of the reference's timing report
    and dump_info (src/CoverTree.cpp:344-352, src/DistCoverTree.cpp:975-
    1047).  Rows-only driver check (values are runtime-dependent)."""
    import ray.data as rd

    idx, _, _ = _index_for(sf_dir, EPS_RADIUS)
    rows = idx.lineage()
    keep = ["pid", "n_points", "n_vertices", "n_levels", "niters"]
    return rd.from_items(
        [{k: int(r[k]) for k in keep} for r in
         sorted(rows, key=lambda r: r["pid"])])


# ------------------------------------------------- triangle counting

#: the triangle query runs the epsilon join at double the headline
#: radius: at EPS_RADIUS the sf graphs are triangle-free (verified in
#: DuckDB), which would make the driver row vacuous evidence.
TRI_RADIUS = 2 * EPS_RADIUS


def q_triangle_counts(sf_dir: str):
    from .graphops import triangle_counts
    idx, points, _ = _index_for(sf_dir, TRI_RADIUS)
    return triangle_counts(epsilon_graph(idx, points, TRI_RADIUS))


def sql_triangle_counts() -> str:
    d = geometry.dist_sql("a.x", "a.y", "b.x", "b.y")
    return f"""
WITH pts AS ({geometry.pts_cte()}),
e AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM pts a, pts b
  WHERE {d} <= {TRI_RADIUS} AND a.doc_id < b.doc_id
),
t AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1 JOIN e e2 ON e2.u = e1.v
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
x AS (SELECT a AS p FROM t UNION ALL SELECT b FROM t
      UNION ALL SELECT c FROM t)
SELECT p AS point_id, count(*) AS n_triangles
FROM x GROUP BY p ORDER BY p
"""


def q_spatial_components(sf_dir: str):
    """Connected components over the engine's epsilon graph at
    TRI_RADIUS -> (point_id, component_id = min point_id reachable),
    for every point in at least one edge.  Reuses the edge-resident
    min-label propagation actors (textops.dup_components): the graph
    family composes — any pair-producing join feeds the same component
    machinery."""
    from .textops import dup_components
    idx, points, _ = _index_for(sf_dir, TRI_RADIUS)
    edges = epsilon_graph(idx, points, TRI_RADIUS)

    def canon(batch: pa.Table) -> pa.Table:
        s = batch["src_id"].to_numpy()
        d = batch["dst_id"].to_numpy()
        keep = s < d
        return pa.table({"a_id": s[keep], "b_id": d[keep]})

    out = dup_components(edges.map_batches(canon, batch_format="pyarrow"))
    return out.map_batches(
        lambda t: t.rename_columns(["point_id", "component_id"]),
        batch_format="pyarrow")


def sql_spatial_components() -> str:
    d = geometry.dist_sql("a.x", "a.y", "b.x", "b.y")
    return f"""
WITH RECURSIVE pts AS ({geometry.pts_cte()}),
e0 AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM pts a, pts b
  WHERE {d} <= {TRI_RADIUS} AND a.doc_id < b.doc_id
),
e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
lab(node, lbl) AS (
  SELECT u, u FROM e
  UNION
  SELECT e.v, lab.lbl FROM e JOIN lab ON lab.node = e.u
)
SELECT node AS point_id, min(lbl) AS component_id FROM lab GROUP BY node
ORDER BY point_id
"""


def q_degree_histogram(sf_dir: str):
    """Degree distribution of the engine's epsilon graph at EPS_RADIUS
    -> (degree, n_vertices): the connectivity profile read before
    choosing an epsilon (pairs with knn_radius_quantiles, which answers
    the same question from the kNN side)."""
    from .graphops import degree_histogram
    idx, points, _ = _index_for(sf_dir, EPS_RADIUS)
    return degree_histogram(epsilon_graph(idx, points, EPS_RADIUS))


def sql_degree_histogram() -> str:
    d = geometry.dist_sql("a.x", "a.y", "b.x", "b.y")
    return f"""
WITH pts AS ({geometry.pts_cte()}),
deg AS (
  SELECT a.doc_id AS pid, count(*) AS degree
  FROM pts a, pts b
  WHERE {d} <= {EPS_RADIUS} AND a.doc_id != b.doc_id
  GROUP BY a.doc_id
)
SELECT degree, count(*) AS n_vertices
FROM deg GROUP BY degree ORDER BY degree
"""
