"""Round-11 catalog additions — the two highest-value absent LLM-
pipeline ops (r6 verdict ask #6):

* SemDeDup-style semantic dedup (operators/semdedup.py) — k-means
  cells + intra-cell cosine pruning with a deterministic lowest-id
  representative, hash-gated in the provably-exact single-cell mode
  (every pair intra-cell ⇒ output == the all-pairs answer, the same
  exact-at-a-point trick as sim_ivf_exact / sim_lsh_exact); the
  approximate production mode is pinned by a recall pytest;
* cross-table contamination matrix — text_decontaminate generalized
  from one (train, bench) split to the full per-source-pair 3-gram
  overlap report: the train/eval leakage audit a corpus runs before
  any split is trusted.  Pair generation is the basket pattern
  (collect_set per shingle + array-HOF unfold, round4_ops.py
  _copurchase_pairs): the shingle→sources inverted index never
  self-joins, and the per-shingle fan-out is bounded by
  C(|sources|, 2).

Oracle policy unchanged: counts BIGINT, derived floats in half-up
integer ppm, deterministic total orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import t

ROUND11_OPS: dict[str, tuple] = {}


def _q(name: str, sql: str | None, bench: bool = False):
    def wrap(fn):
        ROUND11_OPS[name] = (fn, sql, bench)
        return fn

    return wrap


# ------------------------------------------- SemDeDup semantic dedup

_DOT_D = (
    "list_sum(list_transform(list_zip(CAST(a.embedding AS DOUBLE[]), "
    "CAST(b.embedding AS DOUBLE[])), x -> x[1] * x[2]))"
)

_SEMDEDUP_SQL = f"""
    WITH n AS (
      SELECT vec_id, embedding,
        sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
          x -> x * x))) AS nrm
      FROM embeddings
    ), nn AS (
      SELECT * FROM n WHERE nrm > 0
    ), hits AS (
      SELECT b.vec_id AS vec_id,
        CAST(count(*) AS BIGINT) AS n_dups_lower,
        CAST(floor(max({_DOT_D} / (a.nrm * b.nrm)) * 1000000 + 0.5)
          AS BIGINT) AS max_cos_ppm
      FROM nn a JOIN nn b ON a.vec_id < b.vec_id
      WHERE {_DOT_D} / (a.nrm * b.nrm) >= 0.3
      GROUP BY b.vec_id
    )
    SELECT nn.vec_id, CAST(0 AS INTEGER) AS cell,
      CAST(COALESCE(h.n_dups_lower, 0) AS BIGINT) AS n_dups_lower,
      h.max_cos_ppm,
      h.max_cos_ppm IS NULL AS is_kept
    FROM nn LEFT JOIN hits h ON h.vec_id = nn.vec_id
    ORDER BY nn.vec_id
"""


@_q("dedup_semantic_semdedup", _SEMDEDUP_SQL)
def dedup_semantic_semdedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup over the embeddings table in EXACT single-cell mode
    (nlist=1 ⇒ the intra-cell pair set is the all-pairs set, so the
    k-means/cell/pair/keep plumbing is hash-checked against the
    brute-force oracle); τ=0.3 exercises a non-trivial duplicate set
    on the fixture distribution (990 of ~125k pairs at sf0.01).  The
    production mode (nlist·nprobe tuned to the corpus) is
    dedup_semantic_cells territory — pinned by the recall pytest in
    tests/test_semdedup.py, same split as sim_ivf_topk/sim_ivf_exact.

    Scale shape: one corpus shuffle by cell, per-cell bounded pair
    fan-out, one aggregation to per-vector verdicts — no all-pairs
    join at production nlist; the exact mode's single cell is the
    fixture-scale correctness pin, not the deployment shape."""
    from ..operators.semdedup import semantic_dedup

    emb = t(spark, sf, "embeddings")
    return semantic_dedup(
        emb, "vec_id", "embedding", threshold=0.3, nlist=1
    ).orderBy("vec_id")


# -------------------------------------- cross-source contamination

_CONTAM_SQL = """
    WITH toks AS (
      SELECT source, string_split(text, ' ') AS tk FROM documents
    ), sh AS (
      SELECT DISTINCT source,
        concat_ws(' ', tk[i], tk[i+1], tk[i+2]) AS shingle
      FROM toks, UNNEST(generate_series(1, len(tk) - 2)) AS u(i)
      WHERE len(tk) >= 3
      UNION
      SELECT DISTINCT source, array_to_string(tk, ' ') AS shingle
      FROM toks WHERE len(tk) < 3
    ), sz AS (
      SELECT source, CAST(count(*) AS BIGINT) AS sz
      FROM sh GROUP BY source
    ), inter AS (
      SELECT a.source AS sa, b.source AS sb,
        CAST(count(*) AS BIGINT) AS n_common
      FROM sh a JOIN sh b
        ON a.shingle = b.shingle AND a.source < b.source
      GROUP BY sa, sb
    )
    SELECT i.sa AS source_a, i.sb AS source_b, i.n_common,
      za.sz AS sz_a, zb.sz AS sz_b,
      CAST(i.n_common * 1000000 // za.sz AS BIGINT) AS contain_a_ppm,
      CAST(i.n_common * 1000000 // zb.sz AS BIGINT) AS contain_b_ppm
    FROM inter i
    JOIN sz za ON za.source = i.sa
    JOIN sz zb ON zb.source = i.sb
    ORDER BY source_a, source_b
"""


@_q("text_contamination_matrix", _CONTAM_SQL)
def text_contamination_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-source contamination matrix: for every unordered source
    pair with any 3-gram overlap, the count of shared distinct
    shingles and both directional containments (|∩|/|A|, |∩|/|B|) in
    exact integer ppm — text_decontaminate generalized from one
    (train, bench) split to the all-pairs leakage audit run before a
    (source → split) assignment is trusted.  Zero-overlap pairs are
    absent by construction (the report is the overlap set).

    Scale shape: distinct (source, shingle) is the only corpus-sized
    aggregation; the pair stream unfolds basket-pattern from the
    shingle→sources inverted index (sorted collect_set + array-HOF
    pair expansion — ≤C(|sources|,2) rows per shingle, no self-join,
    no post-join distinct, same shape as _copurchase_pairs with its
    x1000 head-to-head in SCALE_NOTES); the matrix itself is
    ≤|sources|² rows and the size join is a broadcast."""
    from ..operators.dedup import with_shingles

    docs = t(spark, sf, "documents").select("source", "text")
    sh = (
        with_shingles(docs, "text", 3)
        .select("source", F.explode("shingles").alias("shingle"))
        .distinct()
    )
    sz = sh.groupBy("source").agg(F.count("*").cast("bigint").alias("sz"))
    inv = (
        sh.groupBy("shingle")
        .agg(F.expr("sort_array(collect_set(source))").alias("ss"))
        .where(F.expr("size(ss) >= 2"))
    )
    pairs = inv.select(
        F.explode(
            F.expr(
                "flatten(transform(ss, (x, i) ->"
                " transform(slice(ss, i + 2, size(ss)),"
                " y -> struct(x AS sa, y AS sb))))"
            )
        ).alias("p")
    ).select("p.sa", "p.sb")
    inter = pairs.groupBy("sa", "sb").agg(
        F.count("*").cast("bigint").alias("n_common")
    )
    za = sz.select(F.col("source").alias("sa"), F.col("sz").alias("sz_a"))
    zb = sz.select(F.col("source").alias("sb"), F.col("sz").alias("sz_b"))
    return (
        inter.join(F.broadcast(za), "sa")
        .join(F.broadcast(zb), "sb")
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            "n_common",
            "sz_a",
            "sz_b",
            F.expr("CAST(n_common * 1000000 div sz_a AS BIGINT)").alias(
                "contain_a_ppm"
            ),
            F.expr("CAST(n_common * 1000000 div sz_b AS BIGINT)").alias(
                "contain_b_ppm"
            ),
        )
        .orderBy("source_a", "source_b")
    )
