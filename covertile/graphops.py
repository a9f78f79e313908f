"""Distributed graph analytics over engine-produced edge tables.

The reference stops at emitting the epsilon graph (programs/
build_graph.cpp writes edges and exits); a data-processing engine that
replaces it should also ANALYZE the graphs it builds.  First member:
exact per-vertex triangle counting with the classic degree-orientation
discipline, expressed Ray-Data-first:

1. degree pass — per-block partial degree counts, one vertex-bucket
   exchange; the vertex->degree table broadcasts once (vertices are
   orders of magnitude fewer than edges; the token_rarity cap
   precedent applies).
2. orient each undirected edge from its (degree, id)-smaller endpoint —
   max out-degree becomes O(sqrt m), the wedge volume O(m^1.5) instead
   of Sum deg^2 on hub vertices.
3. ONE exchange groups oriented edges by source; each group enumerates
   its wedges vectorized (prefix-pair arithmetic, no Python loop).
4. wedges and canonical edges route by a mixed hash of the closing
   (v, w) pair — the second and last all-to-all — and each bucket
   resolves membership with a searchsorted against its own edge keys.
   Matched wedges credit ALL THREE corners; per-vertex partials
   tree-combine in a final vertex-bucket groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .joins import mat

#: broadcast cap for the vertex->degree table (rows); beyond this the
#: degree attach needs the token_rarity-style hash-join fallback.
DEGREE_BROADCAST_MAX = 4_000_000


def _canon(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Canonical undirected edges u < v from a directed edge table (the
    epsilon graph emits each directed pair exactly once, so u < v keeps
    exactly one copy per undirected edge and drops self-loops)."""
    s = batch["src_id"].to_numpy()
    d = batch["dst_id"].to_numpy()
    keep = s < d
    return s[keep], d[keep]


def triangle_counts(edges_ds):
    """Per-vertex exact triangle counts over an undirected graph given
    as a directed (src_id, dst_id) edge Dataset -> (point_id,
    n_triangles) for every vertex in at least one triangle, sorted."""
    import ray as _ray

    from .eventops import _mix64
    from .textops import _coarse_bucket
    from .sizing import bucket_shift
    _shift = bucket_shift()

    # ---- phase 1: degrees
    def deg_part(batch: pa.Table) -> pa.Table:
        u, v = _canon(batch)
        ids, cnt = np.unique(np.concatenate([u, v]), return_counts=True)
        return pa.table({"vid": ids, "d": cnt.astype(np.int64),
                         "bk": _coarse_bucket(ids)})

    def deg_combine(g: pa.Table) -> pa.Table:
        vid = g["vid"].to_numpy()
        ids, inv = np.unique(vid, return_inverse=True)
        d = np.bincount(inv, weights=g["d"].to_numpy(),
                        minlength=len(ids)).astype(np.int64)
        return pa.table({"vid": ids, "d": d})

    deg = (mat(edges_ds.map_batches(deg_part, batch_format="pyarrow"))
           .groupby("bk").map_groups(deg_combine, batch_format="pyarrow")
           .materialize())
    n_verts = deg.count()
    if n_verts == 0:
        return deg.map_batches(
            lambda _: pa.table({"point_id": pa.array([], pa.int64()),
                                "n_triangles": pa.array([], pa.int64())}),
            batch_format="pyarrow")
    assert n_verts <= DEGREE_BROADCAST_MAX, (
        f"{n_verts} vertices exceed the degree-broadcast cap; "
        f"add the hash-join degree attach (token_rarity fallback shape)")
    vids, degs = [np.zeros(0, np.int64)], [np.zeros(0, np.int64)]
    for b in deg.iter_batches(batch_size=None, batch_format="pyarrow"):
        vids.append(b["vid"].to_numpy())
        degs.append(b["d"].to_numpy())
    vid_all, deg_all = np.concatenate(vids), np.concatenate(degs)
    o = np.argsort(vid_all)
    ref = _ray.put((vid_all[o], deg_all[o]))

    def _pack(v: np.ndarray, w: np.ndarray) -> np.ndarray:
        assert len(v) == 0 or int(max(v.max(), w.max())) < (1 << 31), \
            "triangle_counts packs (v, w) into int64: ids must be < 2^31"
        return (v << np.int64(31)) | w

    # ---- phase 2: orient + group by source
    def orient(batch: pa.Table) -> pa.Table:
        u, v = _canon(batch)
        vv, dd = _ray.get(ref)
        du = dd[np.searchsorted(vv, u)]
        dv = dd[np.searchsorted(vv, v)]
        u_first = (du < dv) | ((du == dv) & (u < v))
        a = np.where(u_first, u, v)
        b = np.where(u_first, v, u)
        return pa.table({"a": a, "b": b, "bk": _coarse_bucket(a)})

    def wedges(g: pa.Table) -> pa.Table:
        a = g["a"].to_numpy()
        b = g["b"].to_numpy()
        # in-group sort by RANK (deg, id): wedge pairs (v, w) then have
        # rank(v) < rank(w), which is exactly the orientation the
        # closing edge (if it exists) was stored under — an id-ordered
        # pair would miss every triangle whose closing edge ranks the
        # id-larger endpoint first
        vv, dd = _ray.get(ref)
        db = dd[np.searchsorted(vv, b)]
        order = np.lexsort((b, db, a))
        a_s, b_s = a[order], b[order]
        new = np.concatenate(([True], a_s[1:] != a_s[:-1]))
        grp_start = np.maximum.accumulate(
            np.where(new, np.arange(len(a_s)), 0))
        o = np.arange(len(a_s)) - grp_start      # in-group offset
        total = int(o.sum())
        # element p (in-group offset o[p]) pairs as SECOND with each of
        # its o[p] predecessors as FIRST: firsts are arange(p-o[p], p)
        second = np.repeat(np.arange(len(b_s)), o)
        within = np.arange(total) - np.repeat(np.cumsum(o) - o, o)
        first = np.repeat(np.arange(len(b_s)) - o, o) + within
        v, w = b_s[first], b_s[second]           # v < w (b sorted in-group)
        apex = a_s[second]
        wkey = _pack(v, w)
        rows = {
            "key": wkey,
            "u": apex, "v": v, "w": w,
            "kind": np.ones(total, np.int8),
        }
        ekey = _pack(a_s, b_s)                   # canonical edges ride along
        edge_rows = {
            "key": ekey,
            "u": a_s, "v": b_s, "w": np.zeros(len(a_s), np.int64),
            "kind": np.zeros(len(a_s), np.int8),
        }
        out = {c: np.concatenate([rows[c], edge_rows[c]])
               for c in rows}
        out["bk2"] = ((_mix64(out["key"].astype(np.uint64))
                       >> np.uint64(_shift)).astype(np.int64))
        return pa.table(out)

    def close_check(g: pa.Table) -> pa.Table:
        kind = g["kind"].to_numpy()
        key = g["key"].to_numpy()
        ek = np.sort(key[kind == 0])
        wk = key[kind == 1]
        if len(ek) == 0 or len(wk) == 0:
            return pa.table({"vid": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "bk3": pa.array([], pa.int64())})
        pos = np.searchsorted(ek, wk)
        pos_c = np.minimum(pos, len(ek) - 1)
        hit = ek[pos_c] == wk
        tri = g.filter(pa.array(kind == 1)).filter(pa.array(hit))
        corners = np.concatenate([tri["u"].to_numpy(),
                                  tri["v"].to_numpy(),
                                  tri["w"].to_numpy()])
        ids, cnt = np.unique(corners, return_counts=True)
        return pa.table({"vid": ids, "n": cnt.astype(np.int64),
                         "bk3": _coarse_bucket(ids)})

    def vertex_combine(g: pa.Table) -> pa.Table:
        vid = g["vid"].to_numpy()
        ids, inv = np.unique(vid, return_inverse=True)
        n = np.bincount(inv, weights=g["n"].to_numpy(),
                        minlength=len(ids)).astype(np.int64)
        return pa.table({"point_id": ids, "n_triangles": n})

    oriented = mat(edges_ds.map_batches(orient, batch_format="pyarrow"))
    wedge_rows = mat(oriented.groupby("bk").map_groups(
        wedges, batch_format="pyarrow"))
    closed = mat(wedge_rows.groupby("bk2").map_groups(
        close_check, batch_format="pyarrow"))
    return (closed.groupby("bk3").map_groups(vertex_combine,
                                             batch_format="pyarrow")
            .materialize()  # mat() rule: sort re-executes a lazy exchange
            .sort("point_id"))


def degree_histogram(edges_ds):
    """Degree distribution of an undirected graph given as a directed
    (src_id, dst_id) edge Dataset (each undirected edge present in both
    directions, self-loops allowed and ignored) -> (degree,
    n_vertices) sorted by degree, for every vertex with degree >= 1.

    Two domain-bounded exchanges: per-block partial degree counts merge
    in one vertex-sized groupby; per-block (degree, count) histogram
    partials merge in one degree-domain-sized groupby.  The edge table
    itself never shuffles."""
    def deg_part(batch: pa.Table) -> pa.Table:
        s = batch["src_id"].to_numpy()
        d = batch["dst_id"].to_numpy()
        m = s != d
        u, inv = np.unique(s[m], return_inverse=True)
        return pa.table({
            "point_id": u,
            "c": np.bincount(inv, minlength=len(u)).astype(np.int64),
        })

    deg = (mat(edges_ds.map_batches(deg_part, batch_format="pyarrow"))
           .groupby("point_id").sum("c"))

    def hist_part(batch: pa.Table) -> pa.Table:
        dg, cnt = np.unique(batch["sum(c)"].to_numpy(),
                            return_counts=True)
        return pa.table({"degree": dg.astype(np.int64),
                         "n": cnt.astype(np.int64)})

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({"degree": batch["degree"],
                         "n_vertices": batch["sum(n)"]})

    return (mat(deg.map_batches(hist_part, batch_format="pyarrow"))
            .groupby("degree").sum("n")
            .map_batches(finalize, batch_format="pyarrow")
            .materialize()  # mat() rule: sort re-executes a lazy exchange
            .sort("degree"))
