"""Similarity search over embedding columns (``array<float>``).

Two tiers (SURVEY §2 Tier C / north star):

* ``cosine_topk`` — exact brute force: broadcast the (small) query
  side, JVM-side dot products via higher-order functions, per-query
  top-k window.  The correctness baseline; O(|Q|·|C|) but fully
  distributed and codegen-friendly — right answer for |Q| small.
* ``rp_lsh_topk`` — random-hyperplane LSH bucketing: sign-bit
  signature from fixed seeded hyperplanes, candidates restricted to
  colliding buckets (optionally multiprobe neighbors at hamming 1).
  The 100-TB path: turns the cross product into a bucket-equi-join.

Also ``cosine_pairs`` for embedding near-dup detection (threshold
join over LSH buckets).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "with_norm",
    "cosine_topk",
    "cosine_radius",
    "rp_signature",
    "rp_lsh_topk",
    "cosine_pairs",
]

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
_NORM = "sqrt(aggregate({v}, 0D, (acc, x) -> acc + x * x))"


def with_norm(df: DataFrame, vec_col: str, out_col: str = "norm") -> DataFrame:
    """L2 norm as a JVM-side expression (cast to double first)."""
    return df.withColumn("__v", F.expr(f"transform({vec_col}, x -> cast(x AS double))")).withColumn(
        out_col, F.expr(_NORM.format(v="__v"))
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors in ``corpus`` for each row of
    ``queries``.  Query side is broadcast — corpus is scanned once,
    no shuffle of the big side; ties broken by neighbor id."""
    # zero-norm vectors have undefined cosine; NaN would sort above
    # every real score in Spark, so exclude them outright
    c = with_norm(corpus, vec_col).filter(F.col("norm") > 0).select(
        F.col(id_col).alias("nbr_id"), F.col("__v").alias("__cv"), F.col("norm").alias("__cn")
    )
    q = with_norm(queries, vec_col).filter(F.col("norm") > 0).select(
        F.col(id_col).alias("query_id"), F.col("__v").alias("__qv"), F.col("norm").alias("__qn")
    )
    joined = c.crossJoin(F.broadcast(q))
    if not include_self:
        joined = joined.filter(F.col("query_id") != F.col("nbr_id"))
    scored = joined.withColumn(
        "cosine",
        F.expr(_DOT.format(a="__cv", b="__qv")) / (F.col("__cn") * F.col("__qn")),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def cosine_radius(
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """Range search: every corpus vector within cosine ``threshold``
    of each query — the fixed-radius twin of :func:`cosine_topk`
    (retrieval wants top-k; dedup/recall audits want *all* matches
    above a similarity floor, however many).

    Same scale shape as the top-k tier: query side broadcast, corpus
    scanned once with the dot product in codegen, and — unlike top-k
    — **no window at all**: the threshold filter is applied directly
    on the scan, so output size is the only cost of a permissive
    radius."""
    c = with_norm(corpus, vec_col).filter(F.col("norm") > 0).select(
        F.col(id_col).alias("nbr_id"),
        F.col("__v").alias("__cv"),
        F.col("norm").alias("__cn"),
    )
    q = with_norm(queries, vec_col).filter(F.col("norm") > 0).select(
        F.col(id_col).alias("query_id"),
        F.col("__v").alias("__qv"),
        F.col("norm").alias("__qn"),
    )
    joined = c.crossJoin(F.broadcast(q))
    if not include_self:
        joined = joined.filter(F.col("query_id") != F.col("nbr_id"))
    return (
        joined.withColumn(
            "cosine",
            F.expr(_DOT.format(a="__cv", b="__qv"))
            / (F.col("__cn") * F.col("__qn")),
        )
        .filter(F.col("cosine") >= threshold)
        .select(
            "query_id", "nbr_id", F.round("cosine", 6).alias("cosine")
        )
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)  # fixed seed → deterministic plan
    return rng.standard_normal((n_planes, dim)).tolist()


def rp_signature(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 12,
    seed: int = 42,
    out_col: str = "bucket",
) -> DataFrame:
    """Random-hyperplane sign signature packed into one long: bit i =
    sign(v · h_i).  Hyperplanes are literal arrays baked into the plan
    (broadcast-free, deterministic)."""
    planes = _hyperplanes(dim, n_planes, seed)
    bits = []
    for i, h in enumerate(planes):
        arr = "array({})".format(",".join(f"{x}D" for x in h))
        dot = _DOT.format(a=f"transform({vec_col}, x -> cast(x AS double))", b=arr)
        bits.append(f"CASE WHEN ({dot}) >= 0 THEN shiftleft(1L, {i}) ELSE 0L END")
    return df.withColumn(out_col, F.expr(" | ".join(f"({b})" for b in bits)))


def rp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 12,
    multiprobe: bool = True,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows whose LSH bucket
    matches the query's bucket (or differs in one bit when
    ``multiprobe``).  Equi-join on bucket replaces the cross product;
    recall grows with multiprobe radius."""
    c = rp_signature(
        with_norm(corpus, vec_col).filter(F.col("norm") > 0), vec_col, dim, n_planes, seed
    ).select(
        F.col(id_col).alias("nbr_id"),
        F.col("__v").alias("__cv"),
        F.col("norm").alias("__cn"),
        "bucket",
    )
    q = rp_signature(
        with_norm(queries, vec_col).filter(F.col("norm") > 0), vec_col, dim, n_planes, seed
    ).select(
        F.col(id_col).alias("query_id"),
        F.col("__v").alias("__qv"),
        F.col("norm").alias("__qn"),
        "bucket",
    )
    if multiprobe:
        probes = "array_union(array(bucket), transform(sequence(0, {n} - 1), i -> cast(bucket AS bigint) ^ shiftleft(1L, i)))".format(
            n=n_planes
        )
        q = q.withColumn("probe", F.explode(F.expr(probes))).drop("bucket").withColumnRenamed(
            "probe", "bucket"
        )
    joined = c.join(F.broadcast(q), "bucket").filter(F.col("query_id") != F.col("nbr_id"))
    scored = joined.withColumn(
        "cosine",
        F.expr(_DOT.format(a="__cv", b="__qv")) / (F.col("__cn") * F.col("__qn")),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", F.round("cosine", 6).alias("cosine"), "rank")
        .distinct()
    )


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    dim: int = 64,
    n_planes: int = 5,
    n_bands: int = 7,
    multiprobe: bool = True,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs (id_a < id_b, cosine ≥ threshold).

    OR-amplified random-hyperplane LSH: ONE signature of
    ``n_bands * n_planes`` sign bits per row, sliced into ``n_bands``
    independent b-bit band buckets (the minhash-banding idiom from
    ``dedup._banded``); a pair is a candidate if it collides in ANY
    band, optionally also at hamming distance 1 within a band
    (``multiprobe``).  Candidates are deduped before the exact-cosine
    verification, so amplification costs joins, not dot products.

    Collision odds for a pair at angle θ with q = 1 - θ/π:
    per band p = q^b + b·q^(b-1)(1-q) (multiprobe), overall
    1 - (1-p)^n_bands — defaults give ≈ 0.99 at cosine 0.5, vs ≈ 0.09
    for the single-band single-probe shape this replaces.

    Exact-duplicate vectors are collapsed BEFORE the bucket join:
    identical vectors share identical signatures, so bucket sizes (and
    the join's quadratic term) scale with the duplication factor —
    >550 s on a 10×-replicated 20 k corpus.  The LSH join runs on
    distinct vectors only; pairs are then expanded back through the
    duplicate groups (cross-group and within-group) and EVERY pair is
    scored by the same exact-cosine filter, so the output is
    bit-identical to the undeduplicated run.  Measured ~15 s on the
    same corpus.
    """
    total_bits = n_bands * n_planes
    if total_bits > 63:
        raise ValueError(f"n_bands*n_planes must fit a long, got {total_bits}")
    mask = (1 << n_planes) - 1
    rows = with_norm(df, vec_col).filter(F.col("norm") > 0).select(
        F.col(id_col).alias("id"), F.col("__v").alias("v"), F.col("norm").alias("n")
    )
    # collapse bit-identical vectors; reps carry the min id per group
    reps = rows.groupBy("v").agg(
        F.min("id").alias("id"), F.first("n").alias("n"), F.count("*").alias("__gsz")
    )
    members = rows.select("id", "v").join(
        reps.select(F.col("id").alias("__rid"), "v"), "v"
    )
    s = rp_signature(
        reps, "v", dim, total_bits, seed, out_col="sig"
    ).select("id", "v", "n", "sig")
    # band key: (band index, b-bit slice of the signature)
    band_bucket = f"shiftright(sig, band * {n_planes}) & {mask}"
    b_side = s.withColumn("band", F.explode(F.expr(f"sequence(0, {n_bands - 1})"))).select(
        F.col("id").alias("id_b"),
        F.col("v").alias("v_b"),
        F.col("n").alias("n_b"),
        "band",
        F.expr(band_bucket).alias("bucket"),
    )
    a_side = s.withColumn("band", F.explode(F.expr(f"sequence(0, {n_bands - 1})")))
    if multiprobe:
        # probe the exact bucket plus every bucket at hamming distance 1
        probes = (
            f"array_union(array({band_bucket}), "
            f"transform(sequence(0, {n_planes - 1}), "
            f"i -> ({band_bucket}) ^ shiftleft(1L, i)))"
        )
        a_side = a_side.withColumn("bucket", F.explode(F.expr(probes)))
    else:
        a_side = a_side.withColumn("bucket", F.expr(band_bucket))
    a_side = a_side.select(
        F.col("id").alias("id_a"), F.col("v").alias("v_a"), F.col("n").alias("n_a"),
        "band", "bucket",
    )
    cands = (
        a_side.join(b_side, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        # dedupe across bands/probes BEFORE scoring: one dot per pair
        .dropDuplicates(["id_a", "id_b"])
    )
    rep_pairs = cands.withColumn(
        "cosine",
        F.expr(_DOT.format(a="v_a", b="v_b")) / (F.col("n_a") * F.col("n_b")),
    ).filter(F.col("cosine") >= threshold).select("id_a", "id_b", "cosine")
    # expand representative pairs back through the duplicate groups;
    # identical vectors give identical cosines, so members inherit the
    # rep pair's score exactly
    ma = members.select(F.col("__rid").alias("id_a"), F.col("id").alias("__ia"))
    mb = members.select(F.col("__rid").alias("id_b"), F.col("id").alias("__ib"))
    cross = (
        rep_pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select(
            F.least("__ia", "__ib").alias("id_a"),
            F.greatest("__ia", "__ib").alias("id_b"),
            "cosine",
        )
    )
    # within-group pairs: cosine(v, v) through the same formula (not a
    # literal 1.0 — FP parity with the all-pairs oracle)
    self_cos = (
        reps.filter(F.col("__gsz") > 1)
        .withColumn(
            "cosine", F.expr(_DOT.format(a="v", b="v")) / (F.col("n") * F.col("n"))
        )
        .filter(F.col("cosine") >= threshold)
        .select(F.col("id").alias("__rid"), "cosine")
    )
    m1 = members.select("__rid", F.col("id").alias("id_a"))
    m2 = members.select("__rid", F.col("id").alias("id_b"))
    within = (
        self_cos.join(m1, "__rid")
        .join(m2, "__rid")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "cosine")
    )
    return cross.unionByName(within).select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    )
