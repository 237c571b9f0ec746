"""Edit-distance (fuzzy) string self-join — blocked, verify-exact.

The naive fuzzy join is a cross product with a ``levenshtein`` filter:
O(n²) string comparisons, a non-starter at corpus scale.  This
operator uses the classic q-gram filter-and-verify plan (Gravano et
al., VLDB'01 — public literature):

1. **Collapse** to distinct strings first.  Real corpora repeat
   values heavily (the fixture's ``p_name`` has 2 000 rows over 64
   distinct names); identical strings defeat content blocking the
   same way they defeat LSH bucketing (see operators/dedup.py), so
   the join runs on distinct values and id pairs are expanded back
   at the end.
2. **Candidate generation**: an inverted trigram index (explode
   q-grams → equi-join on the gram).  Strings within edit distance k
   share ≥ max(len)-q+1-k·q positional q-grams; we apply the
   distinct-gram variant of that count filter plus the length filter
   ``|len_a − len_b| ≤ k``.  Both are cheap Catalyst joins/aggs —
   no UDF, no cross product.
3. **Verify** surviving candidates with the built-in
   ``levenshtein`` (JVM codegen) and keep ``1 ≤ dist ≤ k``
   (distance-0 pairs are exact duplicates — that is
   ``exact_dedup``'s job, not a fuzzy match).

Scale shape: shuffle volume is O(total q-grams) = O(n·len), the
per-gram fan-out is bounded by gram frequency (a ``max_gram``
guard drops ubiquitous grams the same way dedup's ``max_bucket``
drops degenerate buckets — those pairs are still found through
their rarer grams whenever the count-filter bound stays
satisfiable), and verification touches only counted candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["edit_distance_join"]


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    k: int = 1,
    q: int = 3,
    max_gram: int | None = None,
) -> DataFrame:
    """All id pairs (id_a < id_b) whose strings are within edit
    distance ``k`` (and not identical).

    Returns columns ``id_a, id_b, {str_col}_a, {str_col}_b, dist``.
    Deterministic: output is a pure function of the input set.
    """
    vals = df.select(F.col(id_col).alias("_id"), F.col(str_col).alias("_s"))
    names = vals.select("_s").distinct()

    # q-gram posting list per distinct string
    grams = names.select(
        "_s",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length(_s) - {q - 1}, 1)), "
                f"i -> substring(_s, i, {q}))"
            )
        ).alias("g"),
    ).distinct()
    if max_gram is not None:
        hot = (
            grams.groupBy("g")
            .count()
            .filter(F.col("count") > max_gram)
            .select("g")
        )
        grams = grams.join(F.broadcast(hot), "g", "left_anti")

    a = grams.select(F.col("_s").alias("s_a"), "g")
    b = grams.select(F.col("_s").alias("s_b"), "g")
    cand = (
        a.join(b, "g")
        .filter(F.col("s_a") < F.col("s_b"))
        .filter(
            F.abs(F.length("s_a") - F.length("s_b")) <= F.lit(k)
        )
        .groupBy("s_a", "s_b")
        .agg(F.count("*").alias("shared"))
        # count filter: within distance k the longer string keeps at
        # least maxlen-q+1-k*q of its grams intact
        .filter(
            F.col("shared")
            >= F.greatest(F.length("s_a"), F.length("s_b"))
            - F.lit(q - 1 + k * q)
        )
    )

    verified = cand.withColumn(
        "dist", F.levenshtein("s_a", "s_b")
    ).filter((F.col("dist") >= 1) & (F.col("dist") <= k))

    # expand distinct-string pairs back to id pairs; the string pair
    # is unordered but ids must come out id_a < id_b
    ids = vals
    pairs = (
        verified.join(
            ids.select(F.col("_id").alias("ia"), F.col("_s").alias("s_a")),
            "s_a",
        )
        .join(
            ids.select(F.col("_id").alias("ib"), F.col("_s").alias("s_b")),
            "s_b",
        )
        .select(
            F.least("ia", "ib").alias("id_a"),
            F.greatest("ia", "ib").alias("id_b"),
            F.when(F.col("ia") < F.col("ib"), F.col("s_a"))
            .otherwise(F.col("s_b"))
            .alias(f"{str_col}_a"),
            F.when(F.col("ia") < F.col("ib"), F.col("s_b"))
            .otherwise(F.col("s_a"))
            .alias(f"{str_col}_b"),
            "dist",
        )
    )
    return pairs
