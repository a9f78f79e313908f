"""Query pipelines over a built index: epsilon graph, kNN join, PIP, tiles.

Each is Dataset -> Dataset, composed from: halo routing (vectorized
expansion to every partition whose cells intersect the query disc), ONE
shuffle keyed by pid, and a vectorized per-partition kernel.  Three
execution strategies share the kernels (covertile/kernels.py):

  mode="groups" (default) — groupby(pid).map_groups, tree loaded per task;
  mode="actors"           — sort(pid) -> stateful actor pool (LRU cache),
                            the serving path for repeated query batches;
  mode="self" / *_self    — self-joins answered from each partition's own
                            checkpointed points; only the boundary sliver
                            shuffles (the multi-node scale path).

No stage materializes the full input on the driver.  Replaces the
reference's distributed query path — allgather all points to every rank +
one collective per query point (/root/reference/src/DistCoverTree.cpp:
679-724) — with shuffle-routed queries answered from per-partition trees
(SURVEY.md §2.4 J1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .joins import mat

from . import cells, kernels, store
from .actors import KnnCandidateActor, RadiusQueryActor
from .pipeline import Index

KNN_RADIUS_CAP = 64.0  # > world-box diameter: "search everything" sentinel


# ------------------------------------------------------------------ routing

def _route_batch(batch: pa.Table, plan, with_home: bool) -> pa.Table:
    """Expand each query row to one row per target partition.

    Targets = partitions of every cell intersecting the query's closed disc
    (own + halo); (query, pid) pairs deduped so each partition sees a query
    at most once.
    """
    src = batch["src_id"].to_numpy()
    x = batch["x"].to_numpy()
    y = batch["y"].to_numpy()
    radius = batch["radius"].to_numpy()
    rep, halo = cells.halo_cells(x, y, radius, plan.resolution)
    crep, pids = plan.pids_of_cells(halo)
    rows = rep[crep]          # query-row index per (query, pid) candidate
    # dedup (query row, pid)
    key = rows * np.int64(plan.num_partitions + 1) + pids
    _, first = np.unique(key, return_index=True)
    rows, pids = rows[first], pids[first]
    cols = {
        "pid": pids,
        "src_id": src[rows],
        "x": x[rows],
        "y": y[rows],
        "radius": radius[rows],
    }
    if with_home:
        own = plan.pid_of_points(
            cells.cell_of(x, y, plan.resolution), src)
        cols["home_pid"] = own[rows]
    return pa.table(cols)


def route_queries(queries_ds, plan, with_home: bool = False):
    return queries_ds.map_batches(
        lambda b: _route_batch(b, plan, with_home), batch_format="pyarrow")


# ------------------------------------------------------------ epsilon graph

def _pids_ds(index: Index):
    """One row per pid, block count derived from cluster size (4 dispatch
    tasks per CPU for straggler smoothing): per-pid work is dispatched as
    a few pids per task (amortizes task overhead) and downstream shuffles
    see a block count that scales with the cluster — a fixed cap (the old
    256) starves a 4N-node cluster, while thousands of tiny blocks on a
    laptop pay per-block costs that dwarf the data."""
    import ray.data as rd

    from .sizing import cluster_cpus
    n = index.plan.num_partitions
    return rd.range(
        n, override_num_blocks=min(n, 4 * cluster_cpus())).map_batches(
        lambda b: pa.table({"pid": b["id"]}), batch_format="pyarrow")


def epsilon_graph_self(index: Index, radius: float):
    """Radius SELF-join over the indexed point set itself — the shuffle-free
    fast path.  The build shuffle already colocated every partition's
    points in the checkpoint store, so the 'queries' of partition P are
    P's own stored points:

      part A (no shuffle): one task per pid loads its tree and answers its
      own points — the bulk of the work.
      part B (boundary sliver only): points whose closed disc crosses into
      other partitions' cells are routed to those pids; ONE groupby over
      ~the boundary fraction of rows instead of the whole point set.

    Same output contract as epsilon_graph (each (src, dst) exactly once).
    This is the 'reuse the partitioning across stages' discipline: the
    only all-to-all ever paid on the full table is the build shuffle.
    """
    ck = index.ckpt_dir
    plan = index.plan

    def local_edges(batch: pa.Table) -> pa.Table:
        outs = []
        for pid in batch["pid"].to_numpy():
            tree, doc_ids = store.load_tree(ck, int(pid))
            r = np.full(len(doc_ids), radius)
            s, d, dist = kernels.radius_kernel(
                tree, doc_ids, doc_ids, tree.xy[:, 0], tree.xy[:, 1], r)
            outs.append(pa.table({"src_id": s, "dst_id": d, "dist": dist}))
        return pa.concat_tables(outs) if outs else pa.table(
            {"src_id": pa.array([], pa.int64()),
             "dst_id": pa.array([], pa.int64()),
             "dist": pa.array([], pa.float64())})

    def boundary_rows(batch: pa.Table) -> pa.Table:
        outs = []
        for pid in batch["pid"].to_numpy():
            tree, doc_ids = store.load_tree(ck, int(pid))
            x, y = tree.xy[:, 0], tree.xy[:, 1]
            r = np.full(len(doc_ids), radius)
            rep, halo = cells.halo_cells(x, y, r, plan.resolution)
            crep, pids = plan.pids_of_cells(halo)
            rows, tgt = rep[crep], pids
            keep = tgt != pid          # home handled by part A
            rows, tgt = rows[keep], tgt[keep]
            key = rows * np.int64(plan.num_partitions + 1) + tgt
            _, first = np.unique(key, return_index=True)
            rows, tgt = rows[first], tgt[first]
            outs.append(pa.table({
                "pid": tgt,
                "src_id": doc_ids[rows],
                "x": x[rows],
                "y": y[rows],
                "radius": r[rows],
            }))
        return pa.concat_tables(outs) if outs else pa.table(
            {"pid": pa.array([], pa.int64()),
             "src_id": pa.array([], pa.int64()),
             "x": pa.array([], pa.float32()),
             "y": pa.array([], pa.float32()),
             "radius": pa.array([], pa.float64())})

    def halo_group(group: pa.Table) -> pa.Table:
        pid = int(group["pid"][0].as_py())
        tree, doc_ids = store.load_tree(ck, pid)
        s, d, dist = kernels.radius_kernel(
            tree, doc_ids, group["src_id"].to_numpy(),
            group["x"].to_numpy(), group["y"].to_numpy(),
            group["radius"].to_numpy())
        return pa.table({"src_id": s, "dst_id": d, "dist": dist})

    pids = _pids_ds(index)
    part_a = pids.map_batches(local_edges, batch_format="pyarrow")
    # the boundary sliver is materialized before its shuffle: it is a small
    # fraction of the table (only points whose disc crosses a partition
    # boundary), and feeding the groupby from a settled block set avoids
    # re-executing the extract inside the all-to-all and interleaving badly
    # with part A under the union
    boundary = pids.map_batches(
        boundary_rows, batch_format="pyarrow").materialize()
    part_b = boundary.groupby("pid").map_groups(
        halo_group, batch_format="pyarrow")
    return part_a.union(part_b)


def epsilon_graph(index: Index, points_ds, radius: float,
                  concurrency: int | tuple = (2, 8),
                  batch_size: int = 8192,
                  mode: str = "groups"):
    """All-pairs radius self-join: every (src, dst) with d <= radius,
    self-loops included (closed ball, reference contract
    src/CoverTree.cpp:363,374-384).  Output: (src_id, dst_id, dist).

    Exactly-once by construction: each query targets each pid at most once
    and each dst point is owned by exactly one pid — no dedup shuffle
    (replaces allgather_distinct, src/DistCoverTree.cpp:657-677).

    mode="groups" (default for bulk self-joins): ONE groupby(pid) shuffle;
    each group task loads its partition tree from the checkpoint store and
    answers the whole group vectorized — no actor pool, no extra sort.
    mode="actors": route -> sort(pid) -> stateful actor pool with LRU tree
    cache — the serving path for repeated query batches against a
    long-lived index.
    """
    def add_radius(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "src_id": batch["doc_id"],
            "x": batch["x"],
            "y": batch["y"],
            "radius": pa.array(np.full(n, radius), pa.float64()),
        })

    queries = points_ds.map_batches(add_radius, batch_format="pyarrow")
    routed = mat(route_queries(queries, index.plan))
    if mode == "groups":
        ck = index.ckpt_dir

        def radius_group(group: pa.Table) -> pa.Table:
            pid = int(group["pid"][0].as_py())
            tree, doc_ids = store.load_tree(ck, pid)
            s, d, dist = kernels.radius_kernel(
                tree, doc_ids, group["src_id"].to_numpy(),
                group["x"].to_numpy(), group["y"].to_numpy(),
                group["radius"].to_numpy())
            return pa.table({"src_id": s, "dst_id": d, "dist": dist})

        return routed.groupby("pid").map_groups(
            radius_group, batch_format="pyarrow")
    return routed.sort("pid").map_batches(
        RadiusQueryActor,
        fn_constructor_kwargs={"ckpt_dir": index.ckpt_dir},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ----------------------------------------------------------------- kNN join

def _knn_merge(group: pa.Table, k: int) -> pa.Table:
    """Fully vectorized per-home-partition merge: top-k by (dist, id) per
    query, or a widened pending row when fewer than k candidates were found
    inside the search radius (sentinel rows dst=-1 keep empty queries
    visible)."""
    src = group["src_id"].to_numpy()
    dst = group["dst_id"].to_numpy()
    dist = group["dist"].to_numpy()
    radius = group["radius"].to_numpy()
    order = np.lexsort((dst, dist, src))  # sentinels (inf) sort last
    src, dst, dist, radius = src[order], dst[order], dist[order], radius[order]
    uniq, starts = np.unique(src, return_index=True)
    ends = np.append(starts[1:], len(src))
    real = dst >= 0
    creal = np.cumsum(real)  # inclusive
    real_before = creal[starts] - real[starts]
    n_real = (creal[ends - 1] - real_before).astype(np.int64)
    done_g = (n_real >= k) | (radius[starts] >= KNN_RADIUS_CAP)

    # done queries: first k real rows per group
    idx_real = np.flatnonzero(real)
    grp = np.searchsorted(starts, idx_real, side="right") - 1
    rank0 = (creal[idx_real] - 1) - real_before[grp]
    take = (rank0 < k) & done_g[grp]
    ti = idx_real[take]
    res = pa.table({
        "query_id": src[ti],
        "rank": rank0[take] + 1,
        "neighbor_id": dst[ti],
        "dist": dist[ti],
        "radius": radius[ti],
        "done": np.ones(len(ti), bool),
    })
    pend_g = np.flatnonzero(~done_g)
    if len(pend_g):
        ps = starts[pend_g]
        pend = pa.table({
            "query_id": uniq[pend_g],
            "rank": np.zeros(len(pend_g), np.int64),
            "neighbor_id": np.full(len(pend_g), -1, np.int64),
            "dist": np.full(len(pend_g), np.inf),
            "radius": np.minimum(radius[ps] * 2.0, KNN_RADIUS_CAP),
            "done": np.zeros(len(pend_g), bool),
        })
        res = pa.concat_tables([res, pend])
    return res


#: Approximate Arrow width of one phase-1 done row (3 int64 ids + 2
#: float64 + bool, plus block overhead).
KNN_DONE_ROW_BYTES = 48
#: Fraction of the cluster object store the phase-1 done set may pin
#: before the parquet spill engages.  1/16 leaves the store to the live
#: pipeline (pending sliver, phase-2 exchange, downstream consumers).
KNN_SPILL_STORE_FRACTION = 1 / 16
#: Fallback row threshold when the object-store size is unavailable
#: (Ray not initialised): the measured comfortable-residency point on a
#: 40 GB store, kept only as the no-information default.
KNN_SPILL_FALLBACK_ROWS = 32_000_000


def knn_spill_threshold_rows() -> int:
    """Done-row count above which knn_join's auto spill engages, derived
    from the CLUSTER object store (ray.cluster_resources) rather than a
    host-tuned constant — on a 256-node store the in-memory path stays
    viable proportionally longer; on a small store it spills sooner."""
    try:
        import ray
        if ray.is_initialized():
            store = ray.cluster_resources().get("object_store_memory")
            if store:
                return int(store * KNN_SPILL_STORE_FRACTION
                           // KNN_DONE_ROW_BYTES)
    except Exception:
        pass
    return KNN_SPILL_FALLBACK_ROWS


def _log_spill_decision(index, k, n_hint, threshold_rows, spill) -> None:
    """Lineage record for the auto-spill decision (decisions.jsonl beside
    the index checkpoint manifest) so a post-mortem can see WHY a run
    spilled — best-effort, never fails the query."""
    try:
        import json
        import os
        with open(os.path.join(index.ckpt_dir, "decisions.jsonl"),
                  "a") as f:
            f.write(json.dumps({
                "stage": "knn_join", "k": int(k),
                "n_points_hint": None if n_hint is None else int(n_hint),
                "spill_threshold_rows": int(threshold_rows),
                "spill": bool(spill)}) + "\n")
    except Exception:
        pass


def knn_join(index: Index, points_ds, k: int,
             concurrency: int | tuple = (2, 8),
             batch_size: int = 8192,
             init_radius: float | None = None,
             n_points_hint: int | None = None,
             mode: str = "groups",
             spill_dir: str | None = None,
             spill: str | bool = "auto"):
    """Exact k-nearest-neighbor self-join (self excluded by doc id).

    North-rule extension (SURVEY.md J7, no reference implementation).
    Deterministic TWO-phase refinement (no data-dependent round loop):

      Phase 1 — each query goes only to its HOME partition; the actor
      computes the exact local top-k, giving a per-query upper bound d_k on
      the global kth distance.  Queries whose closed disc (q, d_k) stays
      inside home-partition cells are final (most interior queries).

      Phase 2 — the remaining boundary queries re-route with radius d_k to
      every partition intersecting their disc; all global top-k candidates
      have dist <= d_k, so one halo sweep + per-home-partition merge is
      exact.  Ties at the kth distance break by neighbor id, matching the
      oracle's row_number() ORDER BY dist, neighbor_id.

    Output: (query_id, rank, neighbor_id, dist), rank 1..k by (dist, id).

    Phase-1 DONE rows — the n*k bulk of the job — are spilled to
    partitioned parquet (spill_dir, one zstd file per producing task)
    INSIDE the phase-1 tasks; only the boundary-sliver pending rows are
    materialized in the object store.  The returned Dataset unions a
    parquet read of the spill with the phase-2 merge, so the job's
    largest intermediate never sits in memory end-to-end (scale fix for
    the round-1 full-phase-1 Materialize).  spill_dir defaults to a
    fresh `knn-spill-*` directory under Index.ckpt_dir — the storage
    every worker on a cluster already shares, so the default is
    cluster-correct.  It is per-run scratch, not a resume unit
    (outputs.knn_self_to_store is the resumable sink); callers may GC
    `knn-spill-*` dirs after consuming the result.  Spill file names
    derive from the done rows' content, so a Ray re-execution of a
    phase-1 task rewrites the SAME file instead of double-counting
    under a second random name.

    spill="auto" (default): the parquet spill engages only when the
    expected n*k done rows would pin more than a fixed fraction of the
    CLUSTER object store (knn_spill_threshold_rows) — below that the
    whole intermediate is a small slice of the store and holding it as
    object-store blocks skips a parquet write+read round trip measured
    at ~2.3s of the 500k-point bench stage.  Unknown size (no
    n_points_hint) spills, the safe-at-scale default.  True/False
    force.  Results are bitwise identical either way; the decision is
    logged to <ckpt>/decisions.jsonl.

    mode="groups"/"actors": see epsilon_graph.
    """
    import os
    import uuid

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from .actors import KnnHomeActor

    if spill == "auto":
        thr = knn_spill_threshold_rows()
        spill = (n_points_hint is None or n_points_hint * k > thr)
        _log_spill_decision(index, k, n_points_hint, thr, spill)
    if spill:
        if spill_dir is None:
            spill_dir = os.path.join(index.ckpt_dir,
                                     f"knn-spill-{uuid.uuid4().hex}")
        os.makedirs(spill_dir, exist_ok=True)

    def spill_done(t: pa.Table) -> pa.Table:
        """Write this task's done rows (rank>0) to the spill, return only
        the pending sliver (rank==0).  Fused into the phase-1 task."""
        done_t = t.filter(pc.greater(t["rank"], 0))
        if len(done_t):
            # content-derived name: re-executed tasks (lineage
            # reconstruction, retries) os.replace the identical file
            q = done_t["query_id"].to_numpy()
            nb = done_t["neighbor_id"].to_numpy()
            P1 = np.uint64(0x9E3779B97F4A7C15)
            P2 = np.uint64(0xC2B2AE3D27D4EB4F)
            # per-ROW diffusion (multiply after the xor): a bare
            # q*P ^ nb would cancel q's term in pairs whenever a query
            # contributes an even number of rows (always true for even k)
            ck = int(np.bitwise_xor.reduce(
                ((q.astype(np.uint64) * P1) ^ (nb.astype(np.uint64) * P2))
                * P1))
            path = os.path.join(
                spill_dir,
                f"part-{q[0]}-{q[-1]}-{len(q)}-{ck:016x}.parquet")
            tmp = f"{path}.tmp.{uuid.uuid4().hex}"
            pq.write_table(done_t, tmp, compression="zstd")
            os.replace(tmp, path)
        return t.filter(pc.equal(t["rank"], 0))

    def add_home(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        src = batch["doc_id"].to_numpy()
        pid = index.plan.pid_of_points(
            cells.cell_of(x, y, index.plan.resolution), src)
        return pa.table({"pid": pid, "src_id": src,
                         "x": batch["x"], "y": batch["y"]})

    if mode == "self":
        # SELF-join fast path: each partition's phase-1 queries are its own
        # checkpointed points — no input shuffle at all (see
        # epsilon_graph_self).
        ck = index.ckpt_dir
        plan = index.plan

        def local_knn(batch: pa.Table) -> pa.Table:
            outs = []
            for pid in batch["pid"].to_numpy():
                tree, doc_ids = store.load_tree(ck, int(pid))
                outs.append(pa.table(kernels.knn_home_kernel(
                    tree, doc_ids, int(pid), doc_ids,
                    tree.xy[:, 0], tree.xy[:, 1], k, plan,
                    KNN_RADIUS_CAP)))
            return pa.concat_tables(outs)

        phase1 = _pids_ds(index).map_batches(
            local_knn, batch_format="pyarrow")
    elif mode == "groups":
        ck = index.ckpt_dir
        plan = index.plan

        def home_group(group: pa.Table) -> pa.Table:
            pid = int(group["pid"][0].as_py())
            tree, doc_ids = store.load_tree(ck, pid)
            return pa.table(kernels.knn_home_kernel(
                tree, doc_ids, pid, group["src_id"].to_numpy(),
                group["x"].to_numpy(), group["y"].to_numpy(), k, plan,
                KNN_RADIUS_CAP))

        home_routed = mat(points_ds.map_batches(add_home,
                                                batch_format="pyarrow"))
        phase1 = home_routed.groupby("pid").map_groups(
            home_group, batch_format="pyarrow")
    else:
        home_routed = mat(points_ds.map_batches(add_home,
                                                batch_format="pyarrow"))
        phase1 = home_routed.sort("pid").map_batches(
            KnnHomeActor,
            fn_constructor_kwargs={"ckpt_dir": index.ckpt_dir, "k": k,
                                   "plan": index.plan,
                                   "radius_cap": KNN_RADIUS_CAP},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )

    # done rows carry rank 1..k; the single pending row per undecided query
    # has rank == 0 (dist = its d_k search bound).
    if spill:
        # the materialize pins ONLY the pending sliver (and runs the
        # spill side effect exactly once — the sliver must not be lazily
        # re-executed per consumer)
        pending = phase1.map_batches(
            spill_done, batch_format="pyarrow").materialize()

        def read_spill():
            files = [os.path.join(spill_dir, f)
                     for f in os.listdir(spill_dir)
                     if f.endswith(".parquet")]
            return rd.read_parquet(files) if files else None

        done = read_spill()
    else:
        # sub-threshold job: the whole phase-1 output fits comfortably in
        # the object store; filters over the materialized blocks replace
        # the parquet round trip
        full = phase1.materialize()
        done = full.map_batches(
            lambda t: t.filter(pc.greater(t["rank"], 0)),
            batch_format="pyarrow")
        pending = full.map_batches(
            lambda t: t.filter(pc.equal(t["rank"], 0)),
            batch_format="pyarrow").materialize()
    # count on the tiny materialized sliver is free (block metadata)
    if pending.count() == 0:
        return done if done is not None else pending.select_columns(
            ["query_id", "rank", "neighbor_id", "dist"])

    def rehydrate(batch: pa.Table) -> pa.Table:
        x, y = kernels.unpack_xy(batch["neighbor_id"].to_numpy())
        return pa.table({
            "src_id": batch["query_id"],
            "x": x,
            "y": y,
            "radius": batch["dist"],  # the phase-1 d_k bound
        })

    queries = pending.map_batches(rehydrate, batch_format="pyarrow")
    if mode != "actors":
        # ZERO exchanges for the whole of phase 2.  Each pending row is a
        # COMPLETE query (the task generates candidates across every pid
        # its disc touches, loading trees from the shared checkpoint
        # store via the per-worker LRU), so any row partition is correct
        # — no colocation-by-home groupby is needed.  Pending blocks
        # also arrive HOME-COHERENT from phase 1 (each producing group /
        # spill task is one home pid), so per-task tree loads match the
        # old groupby(home_pid) granularity WITHOUT its sort barrier —
        # measured ~0.6s of fixed all-to-all floor on a 41k-row sliver
        # at the 500k-point bench, and one fewer all-to-all at any
        # scale.  (History: round 1 paid three exchanges here, round 4
        # one, now none.)
        ck2 = index.ckpt_dir
        plan2 = index.plan

        _P2_EMPTY = pa.table({
            "query_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "dist": pa.array([], pa.float64()),
            "radius": pa.array([], pa.float64()),
            "done": pa.array([], pa.bool_()),
        })

        def phase2_batch(group: pa.Table) -> pa.Table:
            if len(group) == 0:
                return _P2_EMPTY
            src = group["src_id"].to_numpy()
            x = group["x"].to_numpy()
            y = group["y"].to_numpy()
            radius = group["radius"].to_numpy()
            home = plan2.pid_of_points(
                cells.cell_of(x, y, plan2.resolution), src)
            rep, halo = cells.halo_cells(x, y, radius, plan2.resolution)
            crep, pids = plan2.pids_of_cells(halo)
            rows = rep[crep]
            key = rows * np.int64(plan2.num_partitions + 1) + pids
            _, first = np.unique(key, return_index=True)
            rows, pids = rows[first], pids[first]
            order = np.argsort(pids, kind="stable")
            rows, pids = rows[order], pids[order]
            starts = np.flatnonzero(np.concatenate(
                ([True], pids[1:] != pids[:-1])))
            bounds = np.append(starts, len(pids))
            outs = []
            for si, ei in zip(bounds[:-1], bounds[1:]):
                pid = int(pids[si])
                sel = rows[si:ei]
                tree, doc_ids = store.load_tree_cached(ck2, pid)
                outs.append(pa.table(kernels.knn_candidate_kernel(
                    tree, doc_ids, src[sel], x[sel], y[sel],
                    radius[sel], home[sel])))
            cand = pa.concat_tables(outs)
            return _knn_merge(cand, k)

        # batch_size=None: one call per block, preserving phase-1's
        # home-coherent block layout for tree-load locality
        phase2 = queries.map_batches(phase2_batch, batch_format="pyarrow",
                                     batch_size=None)
    else:
        routed = mat(route_queries(
            queries.repartition(64), index.plan, with_home=True))
        cands = routed.sort("pid").map_batches(
            KnnCandidateActor,
            fn_constructor_kwargs={"ckpt_dir": index.ckpt_dir, "k": k},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
        phase2 = mat(cands).groupby("home_pid").map_groups(
            lambda g: _knn_merge(g, k), batch_format="pyarrow")
    phase2 = (phase2
              .map_batches(lambda t: t.filter(pc.greater(t["rank"], 0)),
                           batch_format="pyarrow")
              .select_columns(["query_id", "rank", "neighbor_id", "dist"]))
    return done.union(phase2) if done is not None else phase2


# -------------------------------------------------------------- PIP + tiles

def pip_join(points_ds, edges: np.ndarray, poly_offsets: np.ndarray,
             poly_ids: np.ndarray):
    """Point-in-polygon join via crossing-number test, broadcast small side.

    edges: (E, 4) float64 [x1, y1, x2, y2], grouped by polygon;
    poly_offsets: (P+1,) edge-range offsets per polygon; poly_ids: (P,).
    Output: (doc_id, polygon_id) for every point strictly inside by the
    crossing rule (identical float64 expression to the SQL oracle).
    SURVEY.md J6 — north-rule extension.
    """
    x1, y1, x2, y2 = edges[:, 0], edges[:, 1], edges[:, 2], edges[:, 3]
    n_poly = len(poly_ids)
    poly_of_edge = np.repeat(np.arange(n_poly),
                             np.diff(poly_offsets)).astype(np.int64)

    def pip_batch(batch: pa.Table) -> pa.Table:
        px = batch["x"].to_numpy().astype(np.float64)
        py = batch["y"].to_numpy().astype(np.float64)
        ids = batch["doc_id"].to_numpy()
        n = len(px)
        # loop over EDGES (a few hundred), vectorized over points: keeps
        # the working set O(batch) instead of O(batch x edges) — the
        # (batch, edges) broadcast matrix anti-scales past ~8 concurrent
        # tasks on shared cache/bandwidth
        counts = np.zeros((n, n_poly), np.int64)
        for e in range(len(x1)):
            cond = (y1[e] > py) != (y2[e] > py)
            with np.errstate(divide="ignore", invalid="ignore"):
                t = (x2[e] - x1[e]) * (py - y1[e]) / (y2[e] - y1[e]) + x1[e]
            counts[:, poly_of_edge[e]] += cond & (px < t)
        inside = (counts % 2) == 1
        qi, pj = np.nonzero(inside)
        return pa.table({
            "doc_id": ids[qi],
            "polygon_id": poly_ids[pj].astype(np.int64),
        })

    return points_ds.map_batches(pip_batch, batch_format="pyarrow",
                                 batch_size=16384)


def tile_assign(points_ds, x_min: float, y_min: float, tile: float, g: int):
    """Uniform-grid raster-tile assignment: tile_id = iy*g + ix, half-open
    [min, max) bins.  SURVEY.md J6 — north-rule extension."""
    def assign(batch: pa.Table) -> pa.Table:
        px = batch["x"].to_numpy().astype(np.float64)
        py = batch["y"].to_numpy().astype(np.float64)
        ix = np.floor((px - x_min) / tile).astype(np.int64)
        iy = np.floor((py - y_min) / tile).astype(np.int64)
        return pa.table({
            "tile_id": iy * g + ix,
            "doc_id": batch["doc_id"],
        })
    return points_ds.map_batches(assign, batch_format="pyarrow")
