"""Resumable partitioned query outputs: resume skip + equality."""

import os

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _index(tmp_path):
    import ray.data as rd
    from covertile.pipeline import build_index, derive_points

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    res = 3
    pts = derive_points(docs, res)
    idx = build_index(pts, str(tmp_path / "ck"), res,
                      target_points=64, min_partitions=4)
    return idx, pts


def test_epsilon_store_resume(ray_session, tmp_path):
    from covertile import outputs
    from covertile.queries import epsilon_graph

    idx, pts = _index(tmp_path)
    out = str(tmp_path / "edges")
    r = outputs.epsilon_graph_to_store(idx, pts, 0.5, out)
    nparts = idx.plan.num_partitions
    assert r == {"pids_written": nparts, "pids_skipped": 0}
    lineage = outputs.edge_store_lineage(out)
    assert len(lineage) == nparts
    assert all(row["stage"] == "epsilon_graph" for row in lineage)

    # stored edges == direct pipeline result
    direct = (epsilon_graph(idx, pts, 0.5).to_pandas()
              .sort_values(["src_id", "dst_id"]).reset_index(drop=True))
    stored = (outputs.read_edge_store(out).to_pandas()
              .sort_values(["src_id", "dst_id"]).reset_index(drop=True))
    assert len(direct) == len(stored)
    for c in ["src_id", "dst_id"]:
        assert np.array_equal(direct[c].to_numpy(), stored[c].to_numpy())
    assert np.array_equal(direct["dist"].to_numpy().view(np.int64),
                          stored["dist"].to_numpy().view(np.int64))

    # crash simulation: drop half the partitions, resume writes only those
    killed = sorted(outputs._done(out))[::2]
    for pid in killed:
        os.remove(outputs._edges_path(out, pid))
        os.remove(outputs._manifest_path(out, pid))
    r2 = outputs.epsilon_graph_to_store(idx, pts, 0.5, out)
    assert r2["pids_written"] == len(killed)
    assert r2["pids_skipped"] == nparts - len(killed)
    stored2 = (outputs.read_edge_store(out).to_pandas()
               .sort_values(["src_id", "dst_id"]).reset_index(drop=True))
    assert stored2.equals(stored)

    # full re-run is a no-op
    r3 = outputs.epsilon_graph_to_store(idx, pts, 0.5, out)
    assert r3["pids_written"] == 0
    assert r3["pids_skipped"] == nparts


def test_knn_store_resume(ray_session, tmp_path):
    from covertile import outputs
    from covertile.queries import knn_join

    idx, pts = _index(tmp_path)
    k = 4
    out = str(tmp_path / "knn")
    r = outputs.knn_self_to_store(idx, k, out)
    nparts = idx.plan.num_partitions
    assert r == {"pids_written": nparts, "pids_skipped": 0}
    lineage = outputs.edge_store_lineage(out)
    assert len(lineage) == nparts
    assert all(row["stage"] == "knn_self" and row["k"] == k
               for row in lineage)

    # stored result == direct self-join pipeline result
    direct = (knn_join(idx, pts, k, mode="self").to_pandas()
              .sort_values(["query_id", "rank"]).reset_index(drop=True))
    stored = (outputs.read_knn_store(out).to_pandas()
              .sort_values(["query_id", "rank"]).reset_index(drop=True))
    assert len(direct) == len(stored)
    for c in ["query_id", "rank", "neighbor_id"]:
        assert np.array_equal(direct[c].to_numpy(), stored[c].to_numpy())
    assert np.array_equal(direct["dist"].to_numpy().view(np.int64),
                          stored["dist"].to_numpy().view(np.int64))

    # crash simulation: drop half the partitions, resume writes only those
    killed = sorted(outputs._done(out))[::2]
    for pid in killed:
        os.remove(outputs._part_path(out, "knn", pid))
        os.remove(outputs._manifest_path(out, pid))
    r2 = outputs.knn_self_to_store(idx, k, out)
    assert r2["pids_written"] == len(killed)
    assert r2["pids_skipped"] == nparts - len(killed)
    stored2 = (outputs.read_knn_store(out).to_pandas()
               .sort_values(["query_id", "rank"]).reset_index(drop=True))
    assert stored2.equals(stored)

    # full re-run is a no-op
    r3 = outputs.knn_self_to_store(idx, k, out)
    assert r3 == {"pids_written": 0, "pids_skipped": nparts}
