"""covertile — a Ray-Data-native spatial-join + tiling engine.

From-scratch reimplementation of the *capabilities* of
gabe-raulet/ParallelCoverTree (metric cover-tree index build, epsilon-radius
queries, epsilon-neighborhood-graph construction) as a Ray Data pipeline over
Arrow tables of interleaved text+media documents, extended per the north rule
with hierarchical cell partitioning, kNN join, point-in-polygon join,
raster-tile assignment, checkpoint/resume and per-partition lineage, plus the
training-data-pipeline operators: five dedup algorithms + near-dup
connected components, similarity search (exact ANN, IVF with a physically
bucketed store, cover-tree L2 kNN), text analysis (token/subword/quality
stats, lang-id, top-k terms, group quantiles), deterministic sampling and
train/val/test splitting, a composite curation filter (also a CLI), event
analytics (windows, sessions, as-of/range joins, funnels), multimodal
decode plumbing, and warehouse-style relational rollups.

Architecture (see SURVEY.md §7):
  documents ──map_batches──▶ points(+cell) ──groupby(pid)──▶ per-partition
  cover trees (built inside tasks/actors, numpy-vectorized) ──▶ query stages
  (epsilon graph / kNN / PIP / tiles) ──▶ canonical sorted Arrow outputs.

Nothing here calls ray.init()/ray.shutdown(); sessions are owned by the
caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.2.0"
