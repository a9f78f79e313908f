"""Cell stats -> partition plan: Morton-range partitioning with salting.

Replaces the reference's greedy min-load hub->rank assignment
(/root/reference/src/DistCoverTree.cpp:726-758) and its per-hub count
Allreduce (:45-83) with a data-driven plan computed once from a small
`groupby(cell).count()` aggregate:

  * present cells are sorted by Morton code (space-filling-curve order) and
    packed greedily into contiguous ranges of ~target_points each — the
    locality-preserving analogue of "range-partition by cell prefix";
  * a *hot* cell whose count alone exceeds the target is salted: it gets a
    dedicated block of ceil(count/target) partition ids and its points are
    spread across them by point-id hash.  Queries targeting a salted cell fan
    out to every salt (and results need no dedup because each point still
    lives in exactly one partition).

The plan is a few small numpy arrays — broadcast to every task/actor via
closure capture or ray.put; never shuffled.
"""

from __future__ import annotations

import json

import numpy as np

__all__ = ["PartitionPlan", "HierarchicalPlan", "make_plan",
           "plan_from_json"]


class PartitionPlan:
    def __init__(
        self,
        resolution: int,
        cell_codes: np.ndarray,   # sorted uint64 codes of cells present
        pid_base: np.ndarray,     # first pid of each cell's partition block
        n_salts: np.ndarray,      # partitions for this cell (1 = unsalted)
        num_partitions: int,
    ):
        self.resolution = int(resolution)
        self.cell_codes = np.asarray(cell_codes, np.uint64)
        self.pid_base = np.asarray(pid_base, np.int64)
        self.n_salts = np.asarray(n_salts, np.int64)
        self.num_partitions = int(num_partitions)

    # -------------------------------------------------------------- lookups

    def _cell_index(self, cell: np.ndarray) -> np.ndarray:
        """Index into plan arrays per cell; -1 for cells with no points."""
        cell = np.asarray(cell, np.uint64)
        if len(self.cell_codes) == 0:
            return np.full(len(cell), -1, np.int64)
        idx = np.searchsorted(self.cell_codes, cell)
        idx = np.clip(idx, 0, len(self.cell_codes) - 1)
        miss = self.cell_codes[idx] != cell
        idx[miss] = -1
        return idx

    def pid_of_points(self, cell: np.ndarray, point_id: np.ndarray) -> np.ndarray:
        """Owning partition of each (cell, point_id); -1 if cell unknown."""
        idx = self._cell_index(cell)
        ok = idx >= 0
        pid = np.full(len(idx), -1, np.int64)
        base = self.pid_base[idx[ok]]
        ns = self.n_salts[idx[ok]]
        pid[ok] = base + (np.asarray(point_id, np.int64)[ok] % ns)
        return pid

    def pids_of_cells(self, cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Fan-out: all pids serving each cell (salted cells -> many).

        Returns (repeat_index, pid): cell i maps to pid[repeat_index == i].
        Unknown (empty) cells contribute nothing.
        """
        idx = self._cell_index(cell)
        ok = np.flatnonzero(idx >= 0)
        base = self.pid_base[idx[ok]]
        ns = self.n_salts[idx[ok]]
        rep = np.repeat(ok, ns)
        starts = np.zeros(len(ok) + 1, np.int64)
        np.cumsum(ns, out=starts[1:])
        salt = np.arange(starts[-1], dtype=np.int64) - starts[
            np.repeat(np.arange(len(ok)), ns)]
        return rep, np.repeat(base, ns) + salt

    # ------------------------------------------------------------ serialize

    def to_json(self) -> str:
        return json.dumps({
            "resolution": self.resolution,
            "cell_codes": self.cell_codes.astype(np.int64).tolist(),
            "pid_base": self.pid_base.tolist(),
            "n_salts": self.n_salts.tolist(),
            "num_partitions": self.num_partitions,
        })

    @classmethod
    def from_json(cls, s: str) -> "PartitionPlan":
        d = json.loads(s)
        return cls(
            d["resolution"],
            np.asarray(d["cell_codes"], np.int64).astype(np.uint64),
            np.asarray(d["pid_base"], np.int64),
            np.asarray(d["n_salts"], np.int64),
            d["num_partitions"],
        )


class HierarchicalPlan:
    """Two-level plan for resolutions whose flat cell table would exceed
    driver/broadcast capacity (the reference's greedy assignment, like the
    flat plan, is driver-resident — DistCoverTree.cpp:726-758 — so this is
    the 100-TB extension, not a parity item).

    Structure: a COARSE-resolution top plan covers every prefix whose
    total count fits in one partition's budget (those prefixes never need
    sub-cell structure); each heavier prefix gets its own fine-resolution
    PartitionPlan over just its occupied sub-cells, with a global pid
    offset.  Lookup API is identical to PartitionPlan, so the build,
    routing and halo machinery are agnostic to which plan they hold.

    Size: top is <= 4^coarse_res entries; each sub-plan is <= the
    occupied fine cells of ONE prefix (<= 4^(res - coarse_res)).  The
    broadcast payload is the sum of sub-plan sizes, which the refine
    threshold (= partition target) keeps proportional to the number of
    partitions — not to the global fine-cell count.
    """

    def __init__(self, resolution: int, coarse_resolution: int,
                 top: PartitionPlan, sub_codes: np.ndarray,
                 subs: list[PartitionPlan], sub_pid_off: np.ndarray,
                 num_partitions: int):
        assert resolution > coarse_resolution
        self.resolution = int(resolution)
        self.coarse_resolution = int(coarse_resolution)
        self.top = top
        self.sub_codes = np.asarray(sub_codes, np.uint64)  # sorted prefixes
        self.subs = subs
        self.sub_pid_off = np.asarray(sub_pid_off, np.int64)
        self.num_partitions = int(num_partitions)
        self._shift = np.uint64(2 * (self.resolution
                                     - self.coarse_resolution))

    def _split(self, cell: np.ndarray):
        """(coarse codes, refined-sub index per cell or -1)."""
        cell = np.asarray(cell, np.uint64)
        coarse = cell >> self._shift
        if len(self.sub_codes) == 0:
            return coarse, np.full(len(cell), -1, np.int64)
        j = np.searchsorted(self.sub_codes, coarse)
        j = np.clip(j, 0, len(self.sub_codes) - 1)
        j[self.sub_codes[j] != coarse] = -1
        return coarse, j

    def pid_of_points(self, cell: np.ndarray,
                      point_id: np.ndarray) -> np.ndarray:
        cell = np.asarray(cell, np.uint64)
        point_id = np.asarray(point_id, np.int64)
        coarse, j = self._split(cell)
        pid = np.full(len(cell), -1, np.int64)
        flat = j < 0
        if flat.any():
            pid[flat] = self.top.pid_of_points(coarse[flat], point_id[flat])
        for sj in np.unique(j[~flat]):
            sel = j == sj
            pid[sel] = (self.subs[sj].pid_of_points(cell[sel], point_id[sel])
                        + self.sub_pid_off[sj])
            pid[sel & (pid < self.sub_pid_off[sj])] = -1  # sub miss stays -1
        return pid

    def pids_of_cells(self, cell: np.ndarray):
        cell = np.asarray(cell, np.uint64)
        coarse, j = self._split(cell)
        out_rep, out_pid = [], []
        flat = np.flatnonzero(j < 0)
        if len(flat):
            rep, pids = self.top.pids_of_cells(coarse[flat])
            out_rep.append(flat[rep])
            out_pid.append(pids)
        for sj in np.unique(j[j >= 0]):
            sel = np.flatnonzero(j == sj)
            rep, pids = self.subs[sj].pids_of_cells(cell[sel])
            out_rep.append(sel[rep])
            out_pid.append(pids + self.sub_pid_off[sj])
        if not out_rep:
            z = np.zeros(0, np.int64)
            return z, z
        rep = np.concatenate(out_rep)
        pid = np.concatenate(out_pid)
        order = np.argsort(rep, kind="stable")  # per-input-cell grouping
        return rep[order], pid[order]

    # ------------------------------------------------------------ serialize

    def to_json(self) -> str:
        return json.dumps({
            "kind": "hierarchical",
            "resolution": self.resolution,
            "coarse_resolution": self.coarse_resolution,
            "top": self.top.to_json(),
            "sub_codes": self.sub_codes.astype(np.int64).tolist(),
            "subs": [s.to_json() for s in self.subs],
            "sub_pid_off": self.sub_pid_off.tolist(),
            "num_partitions": self.num_partitions,
        })

    @classmethod
    def from_json(cls, s: str) -> "HierarchicalPlan":
        d = json.loads(s)
        return cls(
            d["resolution"], d["coarse_resolution"],
            PartitionPlan.from_json(d["top"]),
            np.asarray(d["sub_codes"], np.int64).astype(np.uint64),
            [PartitionPlan.from_json(x) for x in d["subs"]],
            np.asarray(d["sub_pid_off"], np.int64),
            d["num_partitions"],
        )


def plan_from_json(s: str):
    """Checkpoint loader dispatch: flat or hierarchical."""
    if json.loads(s).get("kind") == "hierarchical":
        return HierarchicalPlan.from_json(s)
    return PartitionPlan.from_json(s)


def make_plan(
    cell_codes: np.ndarray,
    counts: np.ndarray,
    resolution: int,
    target_points: int,
    min_partitions: int = 1,
) -> PartitionPlan:
    """Build a PartitionPlan from per-cell counts (the A3-analogue aggregate).

    Deterministic: depends only on the sorted (cell, count) pairs and the
    config — safe to recompute on resume (and persisted anyway).
    min_partitions: lower bound on partition count so small inputs still
    exercise >1 worker (and scaling benchmarks aren't single-task-bound).
    """
    order = np.argsort(np.asarray(cell_codes, np.uint64))
    cell_codes = np.asarray(cell_codes, np.uint64)[order]
    counts = np.asarray(counts, np.int64)[order]
    total = int(counts.sum())
    if total == 0:
        return PartitionPlan(resolution, cell_codes[:0],
                             np.zeros(0, np.int64), np.zeros(0, np.int64), 0)
    # don't let min_partitions force absurdly small partitions
    target = max(1, min(int(target_points), (total // max(1, min_partitions)) + 1))

    n = len(cell_codes)
    pid_base = np.zeros(n, np.int64)
    n_salts = np.ones(n, np.int64)
    pid = 0
    acc = 0
    started = False
    for i in range(n):
        c = int(counts[i])
        if c > target:
            # hot cell: dedicated salted block
            if started:
                pid += 1
                acc = 0
                started = False
            s = int(np.ceil(c / target))
            pid_base[i] = pid
            n_salts[i] = s
            pid += s
        else:
            if started and acc + c > target:
                pid += 1
                acc = 0
            pid_base[i] = pid
            acc += c
            started = True
    if started:
        pid += 1
    return PartitionPlan(resolution, cell_codes, pid_base, n_salts, pid)
