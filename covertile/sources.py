"""Reference on-disk formats as Ray Data sources/sinks.

* fvecs point files — the reference's binary point format: per record an
  int32 dim followed by dim float32 coords; record count inferred from
  file size (reader /root/reference/src/Point.cpp:113-142, writer
  :144-159, generic variant src/VectorIO.cpp:25-67).  The reader shards
  the file by RECORD RANGES so each Ray task decodes its own byte slice —
  a 100 GB file becomes parallel work without a pre-split.
* graph text files — the reference's epsilon-graph output: header
  "n_verts n_edges", then one 1-indexed "u v" line per edge with
  destinations sorted ascending per source
  (/root/reference/programs/build_graph.cpp:134-154).  The scalable sink
  writes one shard per block plus a manifest (resumable, per the brief);
  `write_graph_text_single` concatenates shards driver-side only for
  conformance-sized dumps.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa

__all__ = ["fvecs_dim_count", "read_fvecs", "write_fvecs_shards",
           "write_graph_text_single", "write_graph_text_shards",
           "read_table", "read_lance_fragments", "write_jsonl_shards",
           "write_csv_shards"]


def _lance_module():
    """Optional Lance support (the north rule names 'Lance/Parquet
    tables').  Returns the lance module or None; this container ships
    parquet only, so the fallback is the default path in practice."""
    try:
        import lance
        return lance
    except ImportError:
        return None


def read_lance_fragments(path: str, columns=None):
    """Fragment-parallel Lance scan -> ray.data.Dataset.

    Uses only the PUBLIC LanceDataset surface — `lance.dataset(uri)`,
    `.get_fragments()` / `.get_fragment(id)`, `.schema`,
    `LanceFragment.to_table(columns=...)` — the same per-fragment
    contract Ray's own Lance datasource is built on.  The driver touches
    METADATA only (the fragment-id list); each Ray task opens the
    dataset itself and decodes exactly one fragment with the projection
    pushed down, so a 10^12-row table becomes #fragments parallel units
    without any driver-side materialization.  Pinning the reader to this
    documented API (rather than ray.data.read_lance's internal
    datasource) is what lets tests/_lance_stub exercise the branch
    end-to-end in this container, where pylance is not installed."""
    import ray.data as rd

    lance = _lance_module()
    assert lance is not None
    dset = lance.dataset(path)
    frag_ids = [f.fragment_id for f in dset.get_fragments()]
    cols = list(columns) if columns else None
    if not frag_ids:
        empty = dset.schema.empty_table()
        return rd.from_arrow(empty.select(cols) if cols else empty)

    def load(batch: pa.Table):
        import lance as lance_w  # worker-side import (stub or real)
        ds_w = lance_w.dataset(path)
        get_one = getattr(ds_w, "get_fragment", None)
        by_id = (None if get_one else
                 {f.fragment_id: f for f in ds_w.get_fragments()})
        for fid in batch["fragment_id"].to_pylist():
            frag = get_one(fid) if get_one else by_id[fid]
            yield frag.to_table(columns=cols)

    items = rd.from_arrow(
        pa.table({"fragment_id": pa.array(frag_ids, pa.int64())}))
    return (items.repartition(len(frag_ids))
            .map_batches(load, batch_format="pyarrow", batch_size=None))


def read_table(sf_dir: str, name: str, columns=None, filter=None):
    """Read table `name` from a dataset directory as a ray.data.Dataset,
    dispatching on the on-disk format: `<name>.lance` (when present and
    the lance library is importable) else `<name>.parquet`.  Column
    pruning (`columns`) is honored on BOTH paths — projection pushdown is
    the read-side scale discipline; never read all columns for a
    two-column transform.  `filter` (a pyarrow.dataset expression, e.g.
    ``pc.field("label").isin([0, 1])``) is pushed into the parquet
    scanner so row groups whose statistics exclude the predicate never
    leave storage; the filter column does NOT need to be in `columns`.
    The lance path applies the same expression per fragment batch
    (fragment-level pushdown is a lance-library capability this
    container can't exercise — see tests/test_sources.py).

    This is the single entry point the api layer reads through, closing
    SURVEY §1.4's input contract: pointing sf_dir at a directory of
    .lance datasets uses the fragment-parallel scan above; parquet files
    use read_parquet's row-group parallelism."""
    import ray.data as rd

    lance_path = os.path.join(sf_dir, f"{name}.lance")
    if os.path.exists(lance_path):
        if _lance_module() is None:
            raise NotImplementedError(
                f"{lance_path} exists but the lance library is not "
                f"installed; install pylance or provide {name}.parquet")
        if filter is None:
            return read_lance_fragments(lance_path, columns)
        # the filter may reference columns outside the projection: scan
        # wide, filter, then project (the parquet path keeps full
        # pushdown; lance-level filter pushdown needs the real library)
        ds = read_lance_fragments(lance_path, None).map_batches(
            lambda t: t.filter(filter), batch_format="pyarrow")
        if columns:
            ds = ds.select_columns(list(columns))
        return ds
    pq_path = os.path.join(sf_dir, f"{name}.parquet")
    jsonl_path = os.path.join(sf_dir, f"{name}.jsonl")
    if not os.path.exists(pq_path) and os.path.exists(jsonl_path):
        # newline-delimited JSON (the interchange format LLM corpora
        # actually arrive in).  JSON is row-major, so projection cannot
        # prune the read itself; it is applied immediately after parse
        # so only the selected columns flow downstream.  Types degrade
        # to JSON's (int64/double/string) — callers needing
        # timestamps/float32 should convert to parquet first.
        ds = rd.read_json(jsonl_path)
        if filter is not None:
            ds = ds.map_batches(lambda t: t.filter(filter),
                                batch_format="pyarrow")
        if columns:
            ds = ds.select_columns(list(columns))
        return ds
    csv_path = os.path.join(sf_dir, f"{name}.csv")
    if not os.path.exists(pq_path) and os.path.exists(csv_path):
        # CSV: row-major like JSONL — projection applies right after
        # parse; types are pyarrow's CSV inference (int64/double/string/
        # timestamp).  Same caveat: convert to parquet for exact types.
        ds = rd.read_csv(csv_path)
        if filter is not None:
            ds = ds.map_batches(lambda t: t.filter(filter),
                                batch_format="pyarrow")
        if columns:
            ds = ds.select_columns(list(columns))
        return ds
    return rd.read_parquet(pq_path,
                           columns=list(columns) if columns else None,
                           filter=filter)


def write_jsonl_shards(ds, out_dir: str) -> dict:
    """Dataset -> newline-delimited JSON, one shard file per block plus
    a manifest (the graph-sink resumability discipline: a re-run lists
    the manifest and skips finished shards).  Returns the manifest."""
    import json

    os.makedirs(out_dir, exist_ok=True)
    ds.write_json(out_dir)
    shards = sorted(f for f in os.listdir(out_dir)
                    if f.endswith(".json") or f.endswith(".jsonl"))
    manifest = {"format": "jsonl", "shards": shards}
    # beside (not inside) the shard dir: readers scan every file in it
    with open(out_dir.rstrip("/") + ".manifest.json", "w") as f:
        json.dump(manifest, f)
    return manifest


def write_csv_shards(ds, out_dir: str) -> dict:
    """Dataset -> CSV, one shard file per block plus a manifest (the
    write_jsonl_shards discipline).  Returns the manifest."""
    import json

    os.makedirs(out_dir, exist_ok=True)
    ds.write_csv(out_dir)
    shards = sorted(f for f in os.listdir(out_dir)
                    if f.endswith(".csv"))
    manifest = {"format": "csv", "shards": shards}
    with open(out_dir.rstrip("/") + ".manifest.json", "w") as f:
        json.dump(manifest, f)
    return manifest


def fvecs_dim_count(path: str) -> tuple[int, int]:
    """(dim, n_records) from the first record + file size, mirroring the
    reference's size inference (assert on consistency like Point.cpp:127)."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        dim = struct.unpack("<i", f.read(4))[0]
    rec = 4 * (dim + 1)
    assert size % rec == 0, (size, rec)
    return dim, size // rec


def read_fvecs(path: str, records_per_block: int = 500_000):
    """fvecs file -> Dataset (point_id:int64, coords: list<float32>[dim]).

    Parallel decode: a range dataset over record spans; each task reads
    only its byte slice.  point_id = global record index (load order, the
    reference's id contract)."""
    import ray.data as rd

    dim, n = fvecs_dim_count(path)
    rec = 4 * (dim + 1)
    n_blocks = max(1, -(-n // records_per_block))

    def decode(batch: pa.Table) -> pa.Table:
        out = []
        for bi in batch["id"].to_numpy():
            lo = int(bi) * records_per_block
            hi = min(n, lo + records_per_block)
            with open(path, "rb") as f:
                f.seek(lo * rec)
                raw = np.frombuffer(f.read((hi - lo) * rec), np.uint8)
            m = raw.view(np.int32).reshape(hi - lo, dim + 1)
            dims = m[:, 0]
            assert (dims == dim).all()  # Point.cpp:127
            coords = m[:, 1:].view(np.float32)
            off = np.arange(0, (hi - lo + 1) * dim, dim, dtype=np.int64)
            out.append(pa.table({
                "point_id": np.arange(lo, hi, dtype=np.int64),
                "coords": pa.LargeListArray.from_arrays(
                    off, pa.array(coords.reshape(-1), pa.float32())),
            }))
        return pa.concat_tables(out)

    return (rd.range(n_blocks)
            .map_batches(decode, batch_format="pyarrow", batch_size=1))


def write_fvecs_shards(points_ds, out_dir: str,
                       x_col: str = "x", y_col: str = "y") -> list[str]:
    """Dataset -> one .fvecs shard per block under out_dir (+ manifest).
    Shards concatenate to the reference format byte-for-byte."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy().astype(np.float32)
        y = batch[y_col].to_numpy().astype(np.float32)
        n = len(x)
        m = np.empty((n, 3), np.float32)
        m[:, 0] = np.frombuffer(
            np.full(n, 2, np.int32).tobytes(), np.float32)
        m[:, 1] = x
        m[:, 2] = y
        if "point_id" not in batch.column_names:
            raise ValueError(
                "write_fvecs_shards requires a point_id column: shard "
                "names derive from it; without it every block would "
                "write the same file and silently clobber the others")
        if n == 0:
            return pa.table({"shard": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        ids = batch["point_id"].to_numpy()
        first, last = int(ids[0]), int(ids[-1])
        # (first, last, n) is unique per block for any sorted-by-id input
        # (blocks are disjoint contiguous runs); n disambiguates the rest.
        shard = os.path.join(
            out_dir, f"part-{first:012d}-{last:012d}-{n}.fvecs")
        tmp = shard + ".tmp"
        with open(tmp, "wb") as f:
            f.write(m.tobytes())
        os.replace(tmp, shard)
        return pa.table({"shard": pa.array([shard]),
                         "n": pa.array([n], pa.int64())})

    res = points_ds.map_batches(
        write_block, batch_format="pyarrow").to_pandas()
    return sorted(res["shard"])


def _format_edges(src: np.ndarray, dst: np.ndarray) -> bytes:
    """1-indexed 'u v' lines, input must already be (src, dst) sorted."""
    a = np.char.add(np.char.add((src + 1).astype(str), " "),
                    (dst + 1).astype(str))
    return ("\n".join(a) + "\n").encode() if len(a) else b""


def write_graph_text_shards(edges_ds, out_dir: str) -> list[str]:
    """Edge rows -> per-block text shards of 1-indexed sorted 'u v' lines
    (no header; the manifest carries counts for resumable assembly)."""
    os.makedirs(out_dir, exist_ok=True)
    edges = edges_ds.sort(["src_id", "dst_id"])

    def write_block(batch: pa.Table) -> pa.Table:
        src = batch["src_id"].to_numpy()
        dst = batch["dst_id"].to_numpy()
        # Blocks are disjoint contiguous runs of the globally (src, dst)-
        # sorted DISTINCT edge list, so the first (src, dst) pair is unique
        # per block — unlike (first_src, n_rows), which collides when a
        # high-degree src spans several equal-sized blocks.
        if len(src) == 0:  # nothing to write; avoids a shared empty name
            return pa.table({"shard": pa.array([], pa.string()),
                             "n_edges": pa.array([], pa.int64())})
        f_src, f_dst = int(src[0]), int(dst[0])
        shard = os.path.join(
            out_dir, f"part-{f_src:012d}-{f_dst:012d}.txt")
        tmp = shard + ".tmp"
        with open(tmp, "wb") as f:
            f.write(_format_edges(src, dst))
        os.replace(tmp, shard)
        return pa.table({"shard": pa.array([shard]),
                         "n_edges": pa.array([len(src)], pa.int64())})

    res = edges.map_batches(write_block, batch_format="pyarrow").to_pandas()
    return sorted(res["shard"])


def write_graph_text_single(edges_ds, path: str, n_verts: int) -> int:
    """Conformance sink: EXACT reference format (header + sorted 1-indexed
    edges, build_graph.cpp:134-154).  Driver-side concat — use only for
    test-sized graphs; write_graph_text_shards is the scale path."""
    tbl = pa.concat_tables(
        edges_ds.sort(["src_id", "dst_id"]).iter_batches(
            batch_size=None, batch_format="pyarrow"))
    src = tbl["src_id"].to_numpy()
    dst = tbl["dst_id"].to_numpy()
    with open(path, "wb") as f:
        f.write(f"{n_verts} {len(src)}\n".encode())
        f.write(_format_edges(src, dst))
    return len(src)


def write_tree_gml(ckpt_dir: str, pid: int, path: str) -> int:
    """GML dump of one partition's cover tree — the S8 debug sink, in the
    reference's EXACT output layout (/root/reference/src/OldCoverTree.cpp
    :383-417): node blocks [id, pt, level, cover = base^-level, %.3f] in
    vertex-id order, then parent->child edge blocks emitted by a
    root-rooted DFS with a pop-back stack (children pushed in child-list
    order — the reference's traversal), each carrying
    distance = d(source, target) / max_radius, %.3f.  `pt` is the global
    doc_id (our analogue of the reference's point index).  A per-partition
    debug dump, bounded by one partition tree — never a hot path."""
    from . import store

    tree, doc_ids = store.load_tree(ckpt_dir, pid)
    vx = tree.xy[tree.pt].astype(np.float64)
    lvl = tree.level
    cover = np.power(tree.base, -lvl.astype(np.float64))
    out = ["graph\n[\n"]
    for v in range(tree.num_vertices):
        out.append(
            "\tnode\n\t[\n\t\tid %d\n\t\tpt %d\n\t\tlevel %d\n"
            "\t\tcover %.3f\n\t]\n"
            % (v, doc_ids[tree.pt[v]], lvl[v], cover[v]))
    coff, cids = tree.child_off, tree.child_ids
    inv_r = 1.0 / tree.max_radius if tree.max_radius else 0.0
    stack = [0] if tree.num_vertices else []
    while stack:
        vtx = stack.pop()
        kids = cids[coff[vtx]:coff[vtx + 1]]
        if len(kids) == 0:
            continue
        d = np.sqrt(((vx[kids] - vx[vtx]) ** 2).sum(1)) * inv_r
        for child, dist in zip(kids.tolist(), d):
            out.append(
                "\tedge\n\t[\n\t\tsource %d\n\t\ttarget %d\n"
                "\t\tdistance %.3f\n\t]\n" % (vtx, child, dist))
        stack.extend(kids.tolist())
    out.append("]\n")
    with open(path, "w") as f:
        f.write("".join(out))
    return tree.num_vertices
