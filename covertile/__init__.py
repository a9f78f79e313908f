"""covertile — a Ray-Data-native spatial-join + tiling engine.

From-scratch reimplementation of the *capabilities* of
gabe-raulet/ParallelCoverTree (metric cover-tree index build, epsilon-radius
queries, epsilon-neighborhood-graph construction) as a Ray Data pipeline over
Arrow tables of interleaved text+media documents, extended per the north rule
with hierarchical cell partitioning, kNN join, point-in-polygon join,
raster-tile assignment, checkpoint/resume and per-partition lineage, plus the
training-data-pipeline operators (dedup, similarity search, text analysis).

Architecture (see SURVEY.md §7):
  documents ──map_batches──▶ points(+cell) ──groupby(pid)──▶ per-partition
  cover trees (built inside tasks/actors, numpy-vectorized) ──▶ query stages
  (epsilon graph / kNN / PIP / tiles) ──▶ canonical sorted Arrow outputs.

Nothing here calls ray.init()/ray.shutdown(); sessions are owned by the
caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
