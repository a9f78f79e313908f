"""Numpy cover-tree: hub-chain build + vectorized batch queries.

Semantically faithful, from-scratch reimplementation of the reference's
sequential cover-tree (build: /root/reference/src/CoverTree.cpp:56-342;
radius query: :354-372; epsilon graph: :374-384), re-expressed as vectorized
numpy over struct-of-arrays state instead of per-point C++ loops.  One
instance indexes ONE partition's points; it is built inside a Ray task /
actor and never does cross-process communication (SURVEY.md §4.3).

Invariants maintained (verified in tests/test_covertree.py):
  * nesting   — a hub's own point reappears as its own child when the hub
                expands, so one point may be several vertices; queries dedup.
  * covering  — every point assigned to hub v lies within
                max_radius * base**(-level(v)) of v's point; hence every
                descendant vertex point of v does too (the DFS prune bound).
  * separation — a hub splits only once its farthest point is within
                ball(hub)/base, so sibling hub points at level l+1 are
                pairwise farther than max_radius * base**-(l+1) apart.

Classification rule per active hub, given its farthest point at normalized
distance f = farthest / max_radius (reference :151-171):
    f == 0                     -> leaf  (singleton / duplicates)
    f <= base**-(level+1)      -> split (separation satisfied)
    else                       -> extend chain with the farthest point

Distances: float64 accumulation over float32 coords, sqrt at the end
(reference metric src/Point.cpp:27-38), with float64 subtraction for bit
parity with the DuckDB oracle (see geometry.dist_sql).
"""

from __future__ import annotations

import numpy as np

__all__ = ["CoverTree", "brute_force_radius", "brute_force_knn"]


def _dists_to(xy: np.ndarray, q: np.ndarray) -> np.ndarray:
    """float64 distances from each row of xy (n,d f32) to q (d, f32).

    Accumulated SEQUENTIALLY in column order — bit parity with a SQL
    oracle's left-to-right (a1-b1)^2 + ... + (ad-bd)^2, and identical to
    the historical dx*dx + dy*dy at d=2 (numpy's axis-sum switches to
    pairwise accumulation above 8 terms, which would break parity)."""
    acc = None
    for j in range(xy.shape[1]):
        dj = xy[:, j].astype(np.float64) - np.float64(q[j])
        acc = dj * dj if acc is None else acc + dj * dj
    return np.sqrt(acc)


def _pair_dists(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """float64 rowwise distances between a (m,d f32) and b (m,d f32),
    sequential column-order accumulation (see _dists_to)."""
    acc = None
    for j in range(a.shape[1]):
        dj = a[:, j].astype(np.float64) - b[:, j].astype(np.float64)
        acc = dj * dj if acc is None else acc + dj * dj
    return np.sqrt(acc)


class CoverTree:
    """Cover tree over a (n, d) float32 point array under Euclidean L2.

    Dimension-general (the reference's VectorIO reads arbitrary-dim
    vectors, /root/reference/src/VectorIO.cpp:25-67, and its cover tree
    is a generic metric index); d=2 is the spatial pipeline's case and
    keeps bit-identical behavior."""

    def __init__(self, xy: np.ndarray, base: float = 2.0):
        xy = np.ascontiguousarray(xy, dtype=np.float32)
        assert xy.ndim == 2 and xy.shape[1] >= 1
        self.xy = xy
        self.dim = xy.shape[1]
        self.base = float(base)
        self.n = xy.shape[0]
        # tree SoA, filled by build()
        self.pt: np.ndarray | None = None       # vertex -> point id
        self.level: np.ndarray | None = None    # vertex -> depth
        self.child_off: np.ndarray | None = None  # CSR offsets (nv+1)
        self.child_ids: np.ndarray | None = None  # CSR child vertex ids
        self.max_radius: float = 0.0
        self.niters: int = 0

    # ---------------------------------------------------------------- build

    def build(self) -> "CoverTree":
        n = self.n
        assert n > 0
        base = self.base
        xy = self.xy

        # growing vertex arrays (amortized chunk append)
        pt_chunks = [np.zeros(1, np.int64)]        # root = point 0 (ref :64)
        lvl_chunks = [np.zeros(1, np.int64)]
        par_chunks = [np.full(1, -1, np.int64)]
        nv = 1

        # per-point state (ref: dists / hub_vtx_ids / hub_pt_ids)
        dists = _dists_to(xy, xy[0])
        hub_vtx = np.zeros(n, np.int64)
        hub_pt = np.zeros(n, np.int64)
        self.max_radius = float(dists.max())

        term_chunks = [np.zeros(1, bool)]  # terminal (leaf-event) vertices

        if self.max_radius == 0.0:
            # all points coincide with the root: one leaf hub
            ids = np.arange(n, dtype=np.int64)
            pt_chunks.append(ids)
            lvl_chunks.append(np.ones(n, np.int64))
            par_chunks.append(np.zeros(n, np.int64))
            term_chunks.append(np.ones(n, bool))
            self._finalize(pt_chunks, lvl_chunks, par_chunks, term_chunks,
                           nv + n)
            return self

        # active hub state: vertex-id keyed
        hub_chains: dict[int, list[int]] = {0: [0]}
        # dense per-vertex arrays sized generously and regrown on demand
        cap = max(16, int(2.5 * n) + 8)
        hub_level = np.zeros(cap, np.int64)
        chain_tail = np.full(cap, -1, np.int64)
        chain_tail[0] = 0

        active_idx = np.arange(n, dtype=np.int64)  # points with hub_vtx >= 0

        while hub_chains:
            self.niters += 1
            if nv + 4 * n > cap:  # regrow dense per-vertex maps
                newcap = cap * 2
                hl = np.zeros(newcap, np.int64); hl[:cap] = hub_level; hub_level = hl
                ct = np.full(newcap, -1, np.int64); ct[:cap] = chain_tail; chain_tail = ct
                cap = newcap

            hv = hub_vtx[active_idx]
            dv = dists[active_idx]

            # ---- compute_farthest_hub_pts (ref :93-131): grouped (arg)max,
            # first-index tie-break like the reference's strict-> scan
            gmax = np.full(nv, -1.0)
            np.maximum.at(gmax, hv, dv)
            is_max = dv == gmax[hv]
            garg = np.full(nv, n, np.int64)
            np.minimum.at(garg, hv[is_max], active_idx[is_max])

            hub_ids = np.fromiter(hub_chains.keys(), np.int64, len(hub_chains))
            f_dist = gmax[hub_ids]
            f_arg = garg[hub_ids]
            lev = hub_level[hub_ids]

            # ---- update_hub_chains (ref :133-179): classify
            fnorm = f_dist / self.max_radius
            leaf_m = fnorm == 0.0
            split_m = (~leaf_m) & (fnorm <= base ** (-(lev + 1)).astype(np.float64))
            ext_m = ~(leaf_m | split_m)

            # ---- extend chains
            for h, p in zip(hub_ids[ext_m].tolist(), f_arg[ext_m].tolist()):
                hub_chains[h].append(p)
                chain_tail[h] = p

            # ---- process_leaf_chains (ref :181-213)
            leaf_hubs = hub_ids[leaf_m]
            if len(leaf_hubs):
                flag = np.zeros(nv, bool)
                flag[leaf_hubs] = True
                sel_m = flag[hv]
                sel = active_idx[sel_m]
                pt_chunks.append(sel)
                lvl_chunks.append(hub_level[hub_vtx[sel]] + 1)
                par_chunks.append(hub_vtx[sel])
                term_chunks.append(np.ones(len(sel), bool))
                nv += len(sel)
                hub_vtx[sel] = -1
                hub_pt[sel] = -1
                dists[sel] = 0.0
                for h in leaf_hubs.tolist():
                    del hub_chains[h]
                active_idx = active_idx[~sel_m]

            # ---- process_split_chains (ref :215-277)
            split_hubs = hub_ids[split_m]
            if len(split_hubs):
                chains = [hub_chains.pop(h) for h in split_hubs.tolist()]
                lens = np.fromiter((len(c) for c in chains), np.int64, len(chains))
                new_pts = np.concatenate(
                    [np.asarray(c, np.int64) for c in chains])
                new_par = np.repeat(split_hubs, lens)
                new_vtx = np.arange(nv, nv + len(new_pts), dtype=np.int64)
                new_lvl = hub_level[new_par] + 1
                pt_chunks.append(new_pts)
                lvl_chunks.append(new_lvl)
                par_chunks.append(new_par)
                term_chunks.append(np.zeros(len(new_pts), bool))
                nv += len(new_pts)
                hub_level[new_vtx] = new_lvl
                chain_tail[new_vtx] = new_pts
                for v, p in zip(new_vtx.tolist(), new_pts.tolist()):
                    hub_chains[v] = [p]
                # Voronoi repoint: point's nearest-chain-point became a hub
                pt2vtx = np.full(n, -1, np.int64)
                pt2vtx[new_pts] = new_vtx
                hp = hub_pt[active_idx]
                re_m = pt2vtx[hp] >= 0
                hub_vtx[active_idx[re_m]] = pt2vtx[hp[re_m]]

            # ---- update_dists_and_pointers (ref :279-312)
            if len(active_idx):
                tails = chain_tail[hub_vtx[active_idx]]
                cur = _pair_dists(xy[active_idx], xy[tails])
                upd = cur <= dists[active_idx]
                ui = active_idx[upd]
                dists[ui] = cur[upd]
                hub_pt[ui] = tails[upd]

        self._finalize(pt_chunks, lvl_chunks, par_chunks, term_chunks, nv)
        return self

    def _finalize(self, pt_chunks, lvl_chunks, par_chunks, term_chunks, nv):
        self.pt = np.concatenate(pt_chunks)
        self.level = np.concatenate(lvl_chunks)
        self.terminal = np.concatenate(term_chunks)
        parent = np.concatenate(par_chunks)
        assert len(self.pt) == nv
        counts = np.bincount(parent[1:], minlength=nv)
        self.child_off = np.concatenate(
            ([0], np.cumsum(counts))).astype(np.int64)
        order = np.argsort(parent[1:], kind="stable") + 1
        self.child_ids = order.astype(np.int64)
        # per-vertex prune radius: max_radius * base^(-level)
        self._ball = self.max_radius * np.power(
            self.base, -self.level.astype(np.float64))
        # float64 vertex coords, pre-cast once for the query hot path
        self._v = self.xy[self.pt].astype(np.float64)
        self._vxy = self.xy[self.pt]  # float32 view kept for invariant tests

    @property
    def num_vertices(self) -> int:
        return len(self.pt)

    @property
    def num_levels(self) -> int:
        return int(self.level.max()) + 1

    # ---------------------------------------------------------------- query

    def radius_query_batch(
        self,
        qxy: np.ndarray,
        radii: np.ndarray,
        chunk: int = 2048,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Batch closed-ball radius query (d <= r), vectorized level BFS.

        qxy: (m, 2) float32 queries; radii: (m,) float64 per-query radii.
        Returns (query_idx, point_id, dist) with each (query, point) pair
        exactly once; dists float64.

        The reference's per-query DFS (:354-372) becomes a joint frontier
        BFS: all (query, vertex) candidate pairs at a level are evaluated in
        one vectorized distance computation; a child v survives iff
        d(q, v) <= r_q + max_radius * base**(-level(v))  (reference :367).

        Dedup-free exactness: instead of inserting every matching vertex's
        point into a set (reference :356,:371 — needed because nesting
        repeats point ids across vertices), we report a hit only at a
        point's unique *terminal* vertex (created by its one leaf-chain
        deactivation).  Soundness: if d(q, p) <= r, every ancestor a of p's
        terminal vertex has d(p, pt[a]) <= ball(a) (covering invariant), so
        d(q, pt[a]) <= r + ball(a) by the triangle inequality and the whole
        ancestor path survives the prune — the terminal vertex is always
        visited.  Verified against brute force in tests.
        """
        qxy = np.ascontiguousarray(qxy, np.float32)
        radii = np.asarray(radii, np.float64)
        m = len(qxy)
        out_q: list[np.ndarray] = []
        out_p: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        for s in range(0, m, chunk):
            e = min(m, s + chunk)
            self._radius_chunk(qxy[s:e], radii[s:e], s, out_q, out_p, out_d)
        if not out_q:
            z = np.zeros(0, np.int64)
            return z, z, np.zeros(0, np.float64)
        return (np.concatenate(out_q), np.concatenate(out_p),
                np.concatenate(out_d))

    def _radius_chunk(self, qxy, radii, qoff, out_q, out_p, out_d):
        mq = len(qxy)
        ndim = qxy.shape[1]
        qf = qxy.astype(np.float64)  # (mq, d) per-column gathers below
        qi = np.arange(mq, dtype=np.int64)
        v = np.zeros(mq, np.int64)  # root vertex
        acc = None
        for j in range(ndim):
            dj = qf[:, j] - self._v[0, j]
            acc = dj * dj if acc is None else acc + dj * dj
        d = np.sqrt(acc)
        coff, cids = self.child_off, self.child_ids
        term, ball, pt = self.terminal, self._ball, self.pt
        while len(qi):
            hit = term[v] & (d <= radii[qi])
            if hit.any():
                out_q.append(qi[hit] + qoff)
                out_p.append(pt[v[hit]])
                out_d.append(d[hit])
            # expand children of the current frontier
            starts = coff[v]
            cnt = coff[v + 1] - starts
            exp = cnt > 0
            if not exp.any():
                return
            qi_e, cnt_e = qi[exp], cnt[exp]
            starts_e = starts[exp]
            rep = np.repeat(np.arange(len(qi_e)), cnt_e)
            offs = np.zeros(len(cnt_e) + 1, np.int64)
            np.cumsum(cnt_e, out=offs[1:])
            pos = np.arange(offs[-1], dtype=np.int64) - offs[rep]
            cv = cids[starts_e[rep] + pos]
            cq = qi_e[rep]
            acc = None
            for j in range(ndim):
                dj = qf[cq, j] - self._v[cv, j]
                acc = dj * dj if acc is None else acc + dj * dj
            cd = np.sqrt(acc)
            keep = cd <= radii[cq] + ball[cv]
            qi, v, d = cq[keep], cv[keep], cd[keep]

    def knn_batch(
        self,
        qxy: np.ndarray,
        k: int,
        exclude_pt: np.ndarray | None = None,
        init_radius: float | None = None,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Exact k-nearest-neighbors within this partition's point set.

        North-rule extension (no reference implementation, SURVEY.md J7):
        adaptive doubling radius query, then per-query top-k by (dist, id).
        exclude_pt[i]: point id to exclude for query i (self-exclusion).
        Returns (query_idx, point_id, dist, kth_dist_per_query) where
        kth_dist_per_query is +inf when the partition holds < k neighbors
        (caller must then widen the cross-partition search).
        """
        qxy = np.ascontiguousarray(qxy, np.float32)
        m = len(qxy)
        if m == 0:
            z = np.zeros(0, np.int64)
            return z, z, np.zeros(0, np.float64), np.zeros(0, np.float64)
        if init_radius is None:
            # density-based guess: radius of a ball expected to hold ~2k
            # points at this partition's bounding-box density (a max_radius-
            # based guess overshoots badly for multi-cell partitions).
            # General-d: r = (2k * vol / (n * unit_ball_vol(d)))^(1/d);
            # at d=2 this is the historical sqrt(2k*area/(pi*n)).
            import math
            ext = (self.xy.max(0).astype(np.float64)
                   - self.xy.min(0).astype(np.float64))
            vol = float(np.prod(ext))
            if vol > 0 and self.n > k:
                ubv = math.pi ** (self.dim / 2.0) / math.gamma(
                    self.dim / 2.0 + 1.0)
                init_radius = float(
                    (2.0 * k * vol / (ubv * self.n)) ** (1.0 / self.dim))
            else:
                init_radius = max(1e-3, self.max_radius * np.sqrt(
                    min(1.0, 4.0 * k / max(1, self.n))))
        radii = np.full(m, init_radius, np.float64)
        max_r = 2.0 * self.max_radius + 1e-9  # covers the whole partition
        pending = np.arange(m, dtype=np.int64)
        res_q: list[np.ndarray] = []
        res_p: list[np.ndarray] = []
        res_d: list[np.ndarray] = []
        while len(pending):
            qi, pi, di = self.radius_query_batch(qxy[pending], radii[pending])
            qi = pending[qi]
            if exclude_pt is not None:
                keep = pi != exclude_pt[qi]
                qi, pi, di = qi[keep], pi[keep], di[keep]
            cnts = np.bincount(qi, minlength=m)
            done_m = (cnts[pending] >= k) | (radii[pending] >= max_r)
            done_set = pending[done_m]
            if len(done_set):
                flag = np.zeros(m, bool)
                flag[done_set] = True
                sel = flag[qi]
                res_q.append(qi[sel]); res_p.append(pi[sel]); res_d.append(di[sel])
            radii[pending[~done_m]] *= 2.0
            pending = pending[~done_m]
        qi = np.concatenate(res_q) if res_q else np.zeros(0, np.int64)
        pi = np.concatenate(res_p) if res_p else np.zeros(0, np.int64)
        di = np.concatenate(res_d) if res_d else np.zeros(0, np.float64)
        # per-query top-k by (dist, id)
        order = np.lexsort((pi, di, qi))
        qi, pi, di = qi[order], pi[order], di[order]
        starts = np.searchsorted(qi, np.arange(m))
        ends = np.searchsorted(qi, np.arange(m), side="right")
        pos = np.arange(len(qi), dtype=np.int64)
        topk_m = (pos - starts[qi]) < k
        qk, pk, dk = qi[topk_m], pi[topk_m], di[topk_m]
        kth = np.full(m, np.inf)
        have = ends - starts
        full_m = have >= k
        kth[full_m] = di[(starts + k - 1)[full_m]]
        return qk, pk, dk, kth

    # ------------------------------------------------------------ serialize

    def to_state(self) -> dict:
        """Checkpointable pure-numpy state (stored as one parquet row group)."""
        return {
            "pt": self.pt,
            "level": self.level,
            "terminal": self.terminal,
            "child_off": self.child_off,
            "child_ids": self.child_ids,
            "xy": self.xy,
            "max_radius": self.max_radius,
            "base": self.base,
            "niters": self.niters,
        }

    @classmethod
    def from_state(cls, st: dict) -> "CoverTree":
        t = cls.__new__(cls)
        t.xy = np.ascontiguousarray(st["xy"], np.float32)
        t.n = t.xy.shape[0]
        t.dim = t.xy.shape[1]
        t.base = float(st["base"])
        t.max_radius = float(st["max_radius"])
        t.niters = int(st["niters"])
        t.pt = np.asarray(st["pt"], np.int64)
        t.level = np.asarray(st["level"], np.int64)
        t.terminal = np.asarray(st["terminal"], bool)
        t.child_off = np.asarray(st["child_off"], np.int64)
        t.child_ids = np.asarray(st["child_ids"], np.int64)
        t._ball = t.max_radius * np.power(t.base, -t.level.astype(np.float64))
        t._v = t.xy[t.pt].astype(np.float64)
        t._vxy = t.xy[t.pt]
        return t


# ------------------------------------------------------------------ oracles

def _cross_dists(qxy: np.ndarray, xy: np.ndarray) -> np.ndarray:
    """(m, n) float64 all-pairs distances, sequential column-order
    accumulation (see _dists_to)."""
    acc = None
    for j in range(xy.shape[1]):
        dj = (qxy[:, None, j].astype(np.float64)
              - xy[None, :, j].astype(np.float64))
        acc = dj * dj if acc is None else acc + dj * dj
    return np.sqrt(acc)


def brute_force_radius(xy: np.ndarray, qxy: np.ndarray, radii) -> tuple:
    """O(n*m) oracle, same metric — the reference's own correctness contract
    (/root/reference/programs/epsilon_graph.cpp:109-163)."""
    xy = np.asarray(xy, np.float32)
    qxy = np.asarray(qxy, np.float32)
    radii = np.broadcast_to(np.asarray(radii, np.float64), (len(qxy),))
    d = _cross_dists(qxy, xy)
    qi, pi = np.nonzero(d <= radii[:, None])
    return qi.astype(np.int64), pi.astype(np.int64), d[qi, pi]


def brute_force_knn(xy, qxy, k, exclude_pt=None):
    xy = np.asarray(xy, np.float32)
    qxy = np.asarray(qxy, np.float32)
    d = _cross_dists(qxy, xy)
    if exclude_pt is not None:
        d[np.arange(len(qxy)), np.asarray(exclude_pt, np.int64)] = np.inf
    out_q, out_p, out_d = [], [], []
    ids = np.arange(xy.shape[0])
    for i in range(len(qxy)):
        order = np.lexsort((ids, d[i]))[: k]
        order = order[np.isfinite(d[i][order])]
        out_q.append(np.full(len(order), i, np.int64))
        out_p.append(order.astype(np.int64))
        out_d.append(d[i][order])
    return (np.concatenate(out_q), np.concatenate(out_p),
            np.concatenate(out_d))
