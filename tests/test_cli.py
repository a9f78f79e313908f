"""Reference-workflow CLI: create-points -> build-graph -> conformance."""

import os
import subprocess
import sys

import numpy as np

ENV = dict(os.environ, RAY_GRAFT_CPUS="4")


def run(args):
    return subprocess.run([sys.executable, "-m", "covertile.cli", *args],
                          capture_output=True, text=True, env=ENV,
                          cwd="/root/repo")


def test_cli_reference_workflow(tmp_path):
    pts = str(tmp_path / "pts.fvecs")
    graph = str(tmp_path / "graph.txt")
    r = run(["create-points", "-n", "3000", "-V", "10", "-s", "7", "-o", pts])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.getsize(pts) == 3000 * 12  # int32 dim + 2 float32

    r = run(["build-graph", "-i", pts, "-r", "0.5", "-o", graph])
    assert r.returncode == 0, r.stderr[-2000:]
    lines = open(graph).read().splitlines()
    n_verts, n_edges = map(int, lines[0].split())
    assert n_verts == 3000
    assert len(lines) == n_edges + 1

    # exact equality with the brute-force oracle (1-indexed, sorted)
    from covertile.cli import gaussian_points
    from covertile.covertree import brute_force_radius
    xy = gaussian_points(3000, 10.0, 7)
    qi, pi, _ = brute_force_radius(xy, xy, 0.5)
    order = np.lexsort((pi, qi))
    want = [f"{u + 1} {v + 1}" for u, v in zip(qi[order], pi[order])]
    assert lines[1:] == want

    r = run(["check-graph", "-n", "2000", "-r", "0.5", "-V", "10", "-s", "3"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Graph construction was successful" in r.stdout


def test_size_suffix_parse():
    """M8: '1K/2M/4G' parse, reference read_args.cpp:7-19 semantics."""
    from covertile.cli import size_int
    assert size_int("100") == 100
    assert size_int("1K") == 1 << 10
    assert size_int("2m") == 2 << 20
    assert size_int("4G") == 4 << 30
    assert size_int("1.5k") == int(1.5 * 1024 + 0.499)
    assert size_int("0.1M") == int(0.1 * (1 << 20) + 0.499)


def test_curate_splits_match_oracle(ray_session, tmp_path):
    """curate = corpus_filter ∘ dataset_split, written as split=...
    partitions; verify each partition's doc ids against the composed SQL."""
    import duckdb
    import glob
    import pyarrow.parquet as pq
    from covertile import cli, textops as T

    SF = "/root/testdata/sf0.001"
    out = str(tmp_path / "curated")
    rc = cli.main(["curate", "-i", f"{SF}/documents.parquet", "-o", out])
    assert rc == 0
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    kept = con.execute(T.corpus_filter_sql()).df()["doc_id"].tolist()
    split_sql = con.execute(T.dataset_split_sql()).df()
    want = {}
    srow = dict(zip(split_sql["doc_id"], split_sql["split"]))
    for d in kept:
        want.setdefault(srow[d], set()).add(d)
    for d in sorted(glob.glob(out + "/split=*")):
        name = d.split("=")[-1]
        ids = set()
        for f in glob.glob(d + "/*.parquet"):
            ids |= set(pq.read_table(f, columns=["doc_id"])
                       ["doc_id"].to_pylist())
        assert ids == want.get(name, set()), name


def test_curate_idempotent_rerun(ray_session, tmp_path):
    """A second curate run on a completed output is a no-op (no duplicate
    parquet files appended)."""
    import glob
    from covertile import cli

    SF = "/root/testdata/sf0.001"
    out = str(tmp_path / "curated2")
    assert cli.main(["curate", "-i", f"{SF}/documents.parquet",
                     "-o", out]) == 0
    files1 = sorted(glob.glob(out + "/split=*/*.parquet"))
    assert cli.main(["curate", "-i", f"{SF}/documents.parquet",
                     "-o", out]) == 0
    files2 = sorted(glob.glob(out + "/split=*/*.parquet"))
    assert files1 == files2


def test_curate_refuses_foreign_directory(ray_session, tmp_path):
    """curate must not rmtree a pre-existing directory it cannot
    attribute to a prior curate run unless --overwrite is given."""
    from covertile import cli

    SF = "/root/testdata/sf0.001"
    out = tmp_path / "precious"
    out.mkdir()
    keep = out / "data.txt"
    keep.write_text("do not delete")
    assert cli.main(["curate", "-i", f"{SF}/documents.parquet",
                     "-o", str(out)]) == 1
    assert keep.read_text() == "do not delete"
    # explicit --overwrite clears it and completes
    assert cli.main(["curate", "-i", f"{SF}/documents.parquet",
                     "-o", str(out), "--overwrite"]) == 0
    assert not keep.exists()
    assert (out / "_DONE").exists()


def test_cli_profile_and_bm25(ray_session, capsys):
    """The profile and bm25 subcommands run end-to-end and print their
    result tables."""
    from covertile import cli

    SF = "/root/testdata/sf0.001"
    assert cli.main(["profile", "-i", f"{SF}/documents.parquet",
                     "-c", "doc_id,lang"]) == 0
    out = capsys.readouterr().out
    assert "doc_id" in out and "n_distinct" in out
    assert cli.main(["bm25", "-i", f"{SF}/documents.parquet",
                     "-q", "fast window", "-k", "5"]) == 0
    out = capsys.readouterr().out
    assert "score" in out and "doc_id" in out


def test_cli_bm25_store_matches_direct(ray_session, tmp_path, capsys):
    """--store builds the postings store on first use, reuses it on the
    second, and both invocations print the direct path's exact rows."""
    from covertile import cli

    SF = "/root/testdata/sf0.001"
    assert cli.main(["bm25", "-i", f"{SF}/documents.parquet",
                     "-q", "fast window", "-k", "5"]) == 0
    direct = capsys.readouterr().out
    store = str(tmp_path / "postings")
    for expect_build in (True, False):
        assert cli.main(["bm25", "-i", f"{SF}/documents.parquet",
                         "-q", "fast window", "-k", "5",
                         "--store", store]) == 0
        out = capsys.readouterr().out
        assert ("postings store built" in out) is expect_build
        assert out.splitlines()[-len(direct.splitlines()):] == \
            direct.splitlines()


def test_cli_dump_gml(ray_session, tmp_path, capsys):
    """dump-gml writes one reference-layout GML per completed partition."""
    import ray.data as rd
    from covertile import cli
    from covertile.pipeline import build_index, derive_points

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id"])
    ck = str(tmp_path / "ck")
    build_index(derive_points(docs, 3), ck, 3,
                target_points=64, min_partitions=4)
    out_dir = str(tmp_path / "gml")
    assert cli.main(["dump-gml", "--ckpt", ck, "-o", out_dir]) == 0
    files = sorted(os.listdir(out_dir))
    assert files and all(f.endswith(".gml") for f in files)
    text = open(os.path.join(out_dir, files[0])).read()
    assert text.startswith("graph\n[\n") and "\tnode\n" in text
