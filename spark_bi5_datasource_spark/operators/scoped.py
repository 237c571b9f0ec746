"""Scoped executor-storage cleanup for iterative operators.

Iterative DataFrame algorithms (pagerank, connected components) MUST
leave persisted loop-invariant frames and per-iteration
localCheckpoint blocks alive while the returned frame is lazy — the
result's lineage still reads them, and unpersisting early re-triggers
the recompute-per-branch blowup the persists exist to prevent
(operators/pagerank.py's executor-storage contract).  The cost: a
long-lived session running many such calls accumulates executor
storage until ``spark.catalog.clearCache()``, which is a sledgehammer
— it also evicts caches OTHER work still needs.

``storage_scope`` is the precise tool: it snapshots the set of
persisted RDDs at entry and unpersists exactly the ones created
inside the block at exit — invariant caches AND localCheckpoint
blocks (a local checkpoint IS a persist), touching nothing that
existed before.  The scoped contract is the usual one: materialize
(collect/write) everything you need before the block ends; frames
built inside are not valid afterwards.

    with storage_scope(spark):
        ranks = pagerank(edges, iters=10)
        top = ranks.orderBy(F.desc("rank")).limit(100).collect()
    # executor storage is back to its pre-block state
"""

from __future__ import annotations

from contextlib import contextmanager

__all__ = ["storage_scope"]


def _persistent_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


@contextmanager
def storage_scope(spark, blocking: bool = True):
    """Unpersist, on exit, every RDD that became persisted inside the
    block (DataFrame ``persist()`` caches and ``localCheckpoint``
    blocks alike), leaving pre-existing caches untouched.  Exception-
    safe: cleanup runs on error exits too.  ``blocking=True`` waits
    for the blocks to actually drop — the right default for tests and
    memory-pressure call sites; pass False to fire-and-forget."""
    before = _persistent_ids(spark)
    try:
        yield
    finally:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for entry in jmap.entrySet().toArray():
            if int(entry.getKey()) not in before:
                entry.getValue().unpersist(blocking)
