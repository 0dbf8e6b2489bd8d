"""Shared checkpoint discipline for iterative operators.

Every fixpoint loop in the engine (connected components, the
PageRank/HITS sweeps, Lloyd's k-means) must truncate lineage at two
places: the caller-supplied INPUT at loop entry (persist alone caches
rows but leaves the caller's whole logical plan riding into every
round's analyze/optimize pass — measured 72 s of pure planning for an
11-pair graph under curation_pipeline_v3's lineage vs 2.8 s
truncated), and the loop FRONTIER each round (the plan otherwise
doubles per round).

``loop_checkpoint`` is the one implementation of that cut:

- coalesce to a scale-adaptive partition count first — checkpoint
  captures the RDD BEFORE AQE's final-stage coalescing, so a bare
  200-shuffle-partition driver session would otherwise materialize
  200 near-empty blocks per call;
- with a reliable checkpoint directory configured
  (``sc.setCheckpointDir``, the right mode on a large cluster where
  executor loss must not kill the loop), the frame is persisted AROUND
  the checkpoint: ``Dataset.checkpoint(eager=True)`` runs the eager
  job AND a separate ReliableCheckpointRDD write job, which would
  otherwise recompute the (possibly expensive, possibly
  side-effecting) lineage a second time — Spark's own API docs
  recommend persisting first. The cache entry is dropped as soon as
  the checkpoint files exist, so nothing outlives the call;
- without one, ``localCheckpoint`` (executor-local blocks, freed when
  the frame is GC'd — fine for local / small-cluster runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def loop_checkpoint(df: DataFrame, npart: int | None = None) -> DataFrame:
    """Coalesce + materialize + lineage-cut ``df`` (see module doc)."""
    sc = df.sparkSession.sparkContext
    if npart is None:
        npart = sc.defaultParallelism
    df = df.coalesce(npart)
    if sc.getCheckpointDir() is None:
        return df.localCheckpoint(eager=True)
    df = df.persist()
    try:
        return df.checkpoint(eager=True)
    finally:
        df.unpersist()
