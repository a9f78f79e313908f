"""Checkpoint store: per-partition cover trees + lineage manifest as Parquet/JSON.

Layout (SURVEY.md §4.2 — resumable, idempotent):

    ckpt_dir/
      plan.json            # PartitionPlan + config hash (written once, atomic)
      trees/pid=N.parquet  # tree SoA + partition points, one row, list columns
      manifest/pid=N.json  # lineage record for the completed partition

Every file is written to a temp name then os.replace()d — a partition is
"done" iff its manifest file exists, so a killed run resumes by skipping
done pids and re-running the rest (pure function of partition input+config).
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .covertree import CoverTree

__all__ = [
    "atomic_write_bytes", "tree_path", "manifest_path", "save_tree",
    "load_tree", "done_pids", "load_manifests",
]


def atomic_write_bytes(path: str, data: bytes) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def tree_path(ckpt_dir: str, pid: int) -> str:
    return os.path.join(ckpt_dir, "trees", f"pid={pid}.parquet")


def manifest_path(ckpt_dir: str, pid: int) -> str:
    return os.path.join(ckpt_dir, "manifest", f"pid={pid}.json")


def save_tree(ckpt_dir: str, pid: int, tree: CoverTree,
              doc_ids: np.ndarray, lineage: dict) -> None:
    st = tree.to_state()
    table = pa.table({
        "pt": pa.array([st["pt"]], pa.large_list(pa.int64())),
        "level": pa.array([st["level"]], pa.large_list(pa.int64())),
        "terminal": pa.array([st["terminal"]], pa.large_list(pa.bool_())),
        "child_off": pa.array([st["child_off"]], pa.large_list(pa.int64())),
        "child_ids": pa.array([st["child_ids"]], pa.large_list(pa.int64())),
        "x": pa.array([st["xy"][:, 0]], pa.large_list(pa.float32())),
        "y": pa.array([st["xy"][:, 1]], pa.large_list(pa.float32())),
        "doc_id": pa.array([np.asarray(doc_ids, np.int64)],
                           pa.large_list(pa.int64())),
        "max_radius": pa.array([st["max_radius"]], pa.float64()),
        "base": pa.array([st["base"]], pa.float64()),
        "niters": pa.array([st["niters"]], pa.int64()),
    })
    path = tree_path(ckpt_dir, pid)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    # lz4: ~3x faster encode than zstd at slightly larger files — the save
    # happens once per partition inside the build's critical path
    pq.write_table(table, tmp, compression="lz4")
    os.replace(tmp, path)
    # manifest last: its existence marks the partition complete
    atomic_write_bytes(manifest_path(ckpt_dir, pid),
                       json.dumps(lineage).encode())


def load_tree(ckpt_dir: str, pid: int) -> tuple[CoverTree, np.ndarray]:
    """-> (tree, doc_ids) where doc_ids maps local point index -> doc_id."""
    t = pq.read_table(tree_path(ckpt_dir, pid))
    row = {name: t[name][0] for name in t.column_names}
    xy = np.stack([
        np.asarray(row["x"].values, np.float32),
        np.asarray(row["y"].values, np.float32),
    ], axis=1)
    tree = CoverTree.from_state({
        "pt": np.asarray(row["pt"].values),
        "level": np.asarray(row["level"].values),
        "terminal": np.asarray(row["terminal"].values),
        "child_off": np.asarray(row["child_off"].values),
        "child_ids": np.asarray(row["child_ids"].values),
        "xy": xy,
        "max_radius": row["max_radius"].as_py(),
        "base": row["base"].as_py(),
        "niters": row["niters"].as_py(),
    })
    return tree, np.asarray(row["doc_id"].values, np.int64)


def done_pids(ckpt_dir: str) -> set[int]:
    d = os.path.join(ckpt_dir, "manifest")
    if not os.path.isdir(d):
        return set()
    out = set()
    for name in os.listdir(d):
        if name.startswith("pid=") and name.endswith(".json"):
            out.add(int(name[4:-5]))
    return out


def load_manifests(ckpt_dir: str) -> list[dict]:
    d = os.path.join(ckpt_dir, "manifest")
    if not os.path.isdir(d):
        return []
    rows = []
    for name in sorted(os.listdir(d)):
        if name.startswith("pid=") and name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                rows.append(json.load(f))
    return rows


_TREE_LRU: dict = {}
_TREE_LRU_MAX = 64


def load_tree_cached(ckpt_dir: str, pid: int):
    """load_tree through a worker-process LRU (~64 partition trees, a few
    MB each): map_groups tasks that touch the same neighbor partitions —
    e.g. the kNN phase-2 per-home sweep — skip repeated parquet reads.
    Per-process state only; correctness never depends on it (checkpoint
    files are immutable once the manifest exists)."""
    key = (ckpt_dir, int(pid))
    hit = _TREE_LRU.pop(key, None)
    if hit is None:
        hit = load_tree(ckpt_dir, int(pid))
        while len(_TREE_LRU) >= _TREE_LRU_MAX:
            _TREE_LRU.pop(next(iter(_TREE_LRU)))
    _TREE_LRU[key] = hit  # re-insert = move to MRU end
    return hit
