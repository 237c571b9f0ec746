"""Persisted MinHash band-index maintenance — the per-crawl artifact
that makes recurring-crawl dedup |Δ|·|C| instead of |C|².

``minhash_delta_dedup`` (dedup.py) probes a corpus band index that is
"at scale precomputed and stored once per crawl".  This module makes
that artifact real:

* ``minhash_band_index``   — build the (id, band, bucket) index frame
* ``merge_band_index``     — MERGE-style maintenance keyed on
                             (band, bucket, id): retire dropped docs'
                             bands, append new docs' bands (idempotent
                             — re-adding an indexed doc is a no-op)
* ``write_band_index`` / ``read_band_index`` — parquet round-trip
* probing a STORED index: pass the read-back frame as
  ``minhash_delta_dedup(..., corpus_index=...)``

Scale shape: the index is one row per (doc, band) — ~``bands``×|C|
narrow rows (id + two longs), written once per crawl and probed by
every increment.  ``merge_band_index`` touches |retired|+|added|·bands
rows plus one distinct over the index ids for idempotence (skip with
``assume_new=True`` when the crawl pipeline guarantees fresh ids — the
common case — making the merge a pure append + anti-join, no distinct
pass).  Nothing here pairs the corpus with itself.

Cites reference scope: the reference engine has no dedup or
maintenance surface (README.md:17 — loading only); this is the
LLM-pipeline extension tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import _banded, minhash_signatures

__all__ = [
    "minhash_band_index",
    "merge_band_index",
    "write_band_index",
    "read_band_index",
    "minhash_band_index_portable",
    "band_index_stats",
]


def minhash_band_index(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 32,
    bands: int = 16,
) -> DataFrame:
    """The (id, band, bucket) LSH index of a corpus: minhash
    signatures cut into ``bands`` bands, each hashed to a bucket —
    exactly the build side ``minhash_delta_dedup`` derives inline, as
    a standalone frame a pipeline can persist.  One narrow projection
    + per-row explode; no shuffle."""
    sigs = minhash_signatures(
        corpus.select(id_col, text_col), id_col, text_col, n, num_perm
    )
    return _banded(sigs, id_col, num_perm, bands)


def merge_band_index(
    index: DataFrame,
    added: DataFrame | None = None,
    retired: DataFrame | None = None,
    *,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 32,
    bands: int = 16,
    assume_new: bool = False,
) -> DataFrame:
    """One crawl cycle of index maintenance, MERGE-style on
    (band, bucket, id): drop every band row of ``retired`` ids (a
    one-column id frame), then append the band rows of ``added`` docs
    (a (id, text) frame) — retire-then-add, so a doc present in both
    ends up (re)indexed from its ``added`` text.

    Idempotence: ``added`` docs already present in the post-retire
    index are skipped (anti-join on id), so replaying a crawl's merge
    cannot duplicate index rows.  ``assume_new=True`` skips that
    distinct+anti-join pass when the pipeline guarantees fresh ids.

    Equality contract (pinned by pytest): for any split C = K ∪ R,
    ``merge_band_index(minhash_band_index(K ∪ R), added=A,
    retired=ids(R))`` row-equals ``minhash_band_index(K ∪ A)`` —
    the stored-and-maintained index is indistinguishable from a
    fresh rebuild of the live corpus."""
    out = index
    if retired is not None:
        # no broadcast hint: retire sets range from a handful to a
        # whole partition of the corpus — AQE picks the right strategy
        rid = retired.select(F.col(retired.columns[0]).alias(id_col))
        out = out.join(rid, id_col, "left_anti")
    if added is not None:
        new_idx = minhash_band_index(
            added, id_col, text_col, n, num_perm, bands
        )
        if not assume_new:
            new_idx = new_idx.join(
                out.select(id_col).distinct(), id_col, "left_anti"
            )
        out = out.unionByName(new_idx)
    return out


def write_band_index(index: DataFrame, path: str) -> None:
    """Persist the index to parquet (overwrite — the index is a
    per-crawl snapshot).  Plain layout: probes join on
    (band, bucket), which any partitioning by band alone wouldn't
    prune, so no partition columns — the narrow 3-column schema
    compresses well as-is."""
    index.write.mode("overwrite").parquet(path)


def read_band_index(spark: SparkSession, path: str) -> DataFrame:
    """Read a stored band index back for probing (the
    ``corpus_index=`` argument of ``minhash_delta_dedup``)."""
    return spark.read.parquet(path)


# ------------------------------------------------ index health stats

_P = (1 << 61) - 1
_POLY_P = 1_000_000_007


def minhash_band_index_portable(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 32,
    bands: int = 16,
) -> DataFrame:
    """Engine-portable band index: the PRODUCTION permutation family
    (minhash_signatures' seeded a/b coefficients) over the portable
    polynomial shingle hash (fold (h·131 + code) mod 1e9+7 — the
    dedup_minhash_error_monitor portability policy), with the bucket
    key as the PLAIN comma-joined band values instead of an xxhash64
    compaction.  Bit-for-bit reproducible in ANSI SQL, so
    index-health statistics can be oracle-verified; the production
    ``minhash_band_index`` keeps xxhash64 (one hash per shingle
    instead of a per-char fold) for the hot path — bucket
    POPULATIONS are identical between the two up to xxhash
    collisions (~|C|²·bands / 2⁶⁴)."""
    import random

    from .dedup import with_shingles

    rng = random.Random(0x5EED + num_perm)
    a = [rng.randrange(1, 1 << 30) for _ in range(num_perm)]
    b = [rng.randrange(0, _P) for _ in range(num_perm)]
    a_arr = "array({})".format(",".join(f"{x}L" for x in a))
    b_arr = "array({})".format(",".join(f"{x}L" for x in b))
    rpb = num_perm // bands
    poly = (
        "transform(shingles, s -> aggregate(split(s, ''), 0L,"
        f" (acc, c) -> (acc * 131 + ascii(c)) % {_POLY_P}))"
    )
    sig = (
        f"transform(array({poly}), hs -> zip_with({a_arr}, {b_arr},"
        f" (a, b) -> array_min(transform(hs, h -> (a * h + b) % {_P}L))))[0]"
    )
    return (
        with_shingles(corpus, text_col, n)
        .withColumn("__sig", F.expr(sig))
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"transform(sequence(0, {bands} - 1), b ->"
                    " named_struct('band', b, 'bucket',"
                    f" concat_ws(',', slice(__sig, b * {rpb} + 1, {rpb}))))"
                )
            ).alias("bb"),
        )
        .select(id_col, "bb.band", "bb.bucket")
    )


def band_index_stats(index: DataFrame, cap: int = 200) -> DataFrame:
    """Per-band health statistics of a band index — the tuning table
    behind the megabucket rule and the delta-dedup ``max_bucket``
    knob: bucket count, max bucket size, megabuckets above ``cap``
    (boilerplate attractors whose pair fan-out goes quadratic), and
    the singleton share in exact ppm (buckets that can never produce
    a candidate).  Works on any (id, band, bucket) frame — stored,
    merged, or freshly built.

    Scale shape: one exchange on (band, bucket) into the size
    aggregate, then a |bands|-row rollup."""
    sizes = index.groupBy("band", "bucket").agg(
        F.count("*").alias("sz")
    )
    return (
        sizes.groupBy("band")
        .agg(
            F.sum("sz").cast("bigint").alias("n_rows"),
            F.count("*").cast("bigint").alias("n_buckets"),
            F.max("sz").cast("bigint").alias("max_bucket"),
            F.sum(F.expr(f"CASE WHEN sz > {cap} THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("megabuckets"),
            F.sum(F.expr("CASE WHEN sz = 1 THEN 1 ELSE 0 END")).alias(
                "__singl"
            ),
        )
        .select(
            F.col("band").cast("bigint").alias("band"),
            "n_rows",
            "n_buckets",
            "max_bucket",
            "megabuckets",
            F.expr(
                "CAST(__singl * 1000000 div n_buckets AS BIGINT)"
            ).alias("singleton_ppm"),
        )
        .orderBy("band")
    )
