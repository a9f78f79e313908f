"""End-to-end pipeline tests through the driver surface (__ray_entry__):
oracle equality vs DuckDB, span-sequence invariant, checkpoint/resume."""

import os
import shutil

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["documents", "embeddings", "events"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


def assert_matches(got_ds, sql, con):
    got = got_ds.to_pandas()
    want = con.execute(sql).df()
    assert len(got) == len(want)
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        assert a.dtype == b.dtype, (c, a.dtype, b.dtype)
        if a.dtype.kind == "f":
            assert np.array_equal(a.view(np.int64), b.view(np.int64)), c
        else:
            assert np.array_equal(a, b), c


@pytest.mark.parametrize("name", [
    "epsilon_graph", "knn_join", "pip_join", "tile_assign",
    "tile_agg", "cell_stats", "span_stats", "span_transitions",
    "doc_enrich", "knn_radius_quantiles",
])
def test_query_matches_oracle(ray_session, con, name):
    import __ray_entry__ as E
    assert_matches(E.queries()[name](SF), E.oracle_sql()[name], con)


def test_entry_flagship_and_span_invariant(ray_session):
    import pyarrow as pa
    import __ray_entry__ as E
    from covertile import spans as S

    out = E.entry()
    # consume as Arrow — pandas would mangle the nested struct column
    tbl = pa.concat_tables(
        out.iter_batches(batch_size=4096, batch_format="pyarrow"),
        promote_options="permissive")
    assert tbl.num_rows == 500
    assert set(tbl.column_names) == {"doc_id", "spans", "eps_degree"}
    # span-sequence invariant vs a fresh derivation of the input table
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{SF}/documents.parquet")
    fresh = S.interleave_spans(docs)
    assert S.span_sequences_equal(
        tbl.select(["doc_id", "spans"]), fresh)
    # every doc has a degree >= 1 (self-loop)
    assert (tbl["eps_degree"].to_numpy(zero_copy_only=False) >= 1).all()


def test_build_resume_idempotent(ray_session, tmp_path):
    """Kill-after-K-partitions resume: second build skips done partitions
    and the final tree set is byte-identical to a fresh full build."""
    import ray.data as rd
    from covertile import store
    from covertile.pipeline import build_index, derive_points

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    res = 3
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    idx_a = build_index(derive_points(docs, res), a, res,
                        target_points=64, min_partitions=4)
    nparts = idx_a.plan.num_partitions
    assert nparts >= 4

    # simulate a crashed run: full build, then delete half the manifests +
    # trees (as if those partitions never completed)
    idx_b = build_index(derive_points(docs, res), b, res,
                        target_points=64, min_partitions=4)
    killed = sorted(store.done_pids(b))[::2]
    for pid in killed:
        os.remove(store.manifest_path(b, pid))
        os.remove(store.tree_path(b, pid))
    assert len(store.done_pids(b)) < nparts

    build_index(derive_points(docs, res), b, res,
                target_points=64, min_partitions=4)  # resume
    assert store.done_pids(b) == store.done_pids(a)
    for pid in sorted(store.done_pids(a)):
        ta, ia = store.load_tree(a, pid)
        tb, ib = store.load_tree(b, pid)
        assert np.array_equal(ia, ib)
        assert np.array_equal(ta.pt, tb.pt)
        assert np.array_equal(ta.level, tb.level)
        assert ta.max_radius == tb.max_radius

    # double-resume is a no-op (all partitions already done)
    build_index(derive_points(docs, res), b, res,
                target_points=64, min_partitions=4)
    assert store.done_pids(b) == store.done_pids(a)


def test_lineage_records(ray_session, tmp_path):
    import ray.data as rd
    from covertile.pipeline import Index, build_index, derive_points

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    ck = str(tmp_path / "ck")
    idx = build_index(derive_points(docs, 3), ck, 3,
                      target_points=64, min_partitions=4)
    rows = idx.lineage()
    assert len(rows) == idx.plan.num_partitions
    assert sum(r["n_points"] for r in rows) == 500
    for r in rows:
        assert r["stage"] == "build"
        assert r["n_vertices"] >= r["n_points"]
        assert r["build_wall_s"] >= 0
    # Index.load round-trips the plan
    idx2 = Index.load(ck)
    assert idx2.plan.num_partitions == idx.plan.num_partitions


def test_map_groups_integrity_contract(ray_session):
    """Every grouped operator in this engine (build, joins, sessionize,
    dedup buckets, components...) assumes groupby().map_groups() hands
    the UDF each group WHOLE.  Pin that Ray contract under adversarial
    conditions: one 500k-row group with a 256KB target block size must
    arrive in exactly one UDF invocation."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ray.data.context import DataContext

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 256 * 1024
        n = 500_000
        t = pa.table({"k": np.zeros(n, np.int64),
                      "v": np.arange(n, dtype=np.int64)})

        def udf(g: pa.Table) -> pa.Table:
            return pa.table({"k": g["k"][:1],
                             "n": pa.array([len(g)], pa.int64())})

        out = (rd.from_arrow(t).repartition(16)
               .groupby("k").map_groups(udf, batch_format="pyarrow")
               .to_pandas())
        assert len(out) == 1 and int(out["n"][0]) == n
    finally:
        ctx.target_max_block_size = old
