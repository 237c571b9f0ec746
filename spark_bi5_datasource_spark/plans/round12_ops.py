"""Round-12 catalog additions (builder round 8): the two ops the r7
verdict asked for.

* ``dedup_incremental_delta`` — incremental corpus-delta dedup: a new
  crawl increment deduped AGAINST the standing corpus without ever
  re-pairing the corpus with itself (minhash bands of the increment
  probe the corpus band index; candidates exist only across the
  increment×corpus boundary).  Oracle: the exact shingle-Jaccard SQL
  over increment×corpus pairs (same equality discipline as
  dedup_minhash — LSH recall catches every fixture loser, pinned by a
  planted-pair pytest).
* ``sim_ann_recall_monitor`` — the ops guardrail that decides ANN
  parameters at corpus scale: per-tier/param recall of the
  approximate tiers vs exact cosine on a deterministic 8-query
  slice, emitted as a (tier, param, recall_ppm) table.  LSH tiers
  reuse the production ``rp_lsh_topk`` (hyperplanes are seeded
  literals, so the DuckDB twin reproduces the buckets exactly); the
  IVF tier runs on init-only centroids (the 16 smallest vec_ids'
  unit vectors — a deterministic, SQL-expressible assignment rule;
  Lloyd-trained centroids are the one piece SQL cannot reproduce,
  and the monitor certifies PROBE mechanics, which are identical
  either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .tables import fanout, t

ROUND12_OPS: dict[str, tuple] = {}


def _q(name: str, sql: str | None, bench: bool = False):
    def wrap(fn):
        ROUND12_OPS[name] = (fn, sql, bench)
        return fn

    return wrap


# ------------------------------------- incremental corpus-delta dedup

# the deterministic crawl split: every 10th doc id is "the new
# increment", the rest are "the standing corpus"
_DELTA_SQL = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
        concat_ws(' ', tk[i], tk[i+1], tk[i+2]) AS shingle
      FROM toks, UNNEST(generate_series(1, len(tk) - 2)) AS u(i)
      WHERE len(tk) >= 3
      UNION
      SELECT doc_id, array_to_string(tk, ' ') AS shingle
      FROM toks WHERE len(tk) < 3
    ), sizes AS (
      SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
    ), losers AS (
      SELECT DISTINCT y.doc_id AS id
      FROM sh x JOIN sh y ON x.shingle = y.shingle
      JOIN sizes sa ON sa.doc_id = x.doc_id
      JOIN sizes sb ON sb.doc_id = y.doc_id
      WHERE x.doc_id % 10 <> 0 AND y.doc_id % 10 = 0
      GROUP BY x.doc_id, y.doc_id, sa.sz, sb.sz
      HAVING CAST(count(*) AS DOUBLE) / (sa.sz + sb.sz - count(*)) >= 0.5
    )
    SELECT doc_id, lang, source FROM documents
    WHERE doc_id % 10 = 0 AND doc_id NOT IN (SELECT id FROM losers)
    ORDER BY doc_id
"""


@_q("dedup_incremental_delta", _DELTA_SQL)
def dedup_incremental_delta(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup a new crawl increment (doc_id % 10 = 0) against the
    standing corpus (the other 90%) WITHOUT re-pairing the corpus
    with itself — the production shape of every recurring-crawl
    pipeline: the corpus band index is the build side (at scale,
    precomputed and stored once per crawl), the increment's bands
    probe it, and candidate pairs exist only across the
    increment×corpus boundary.  Surviving increment docs are
    returned; a doc is dropped iff a verified word-3-shingle Jaccard
    ≥ 0.5 corpus neighbor exists.

    Oracle = the exact increment×corpus shingle-index SQL (the
    dedup_minhash equality discipline: the banded output only drops
    VERIFIED pairs, so equality holds when LSH recall catches every
    loser — 16 bands × 2 rows at num_perm=32 on this corpus, pinned
    by the planted-pair pytest in tests/test_operators.py).

    Scale shape: |Δ|·|C| band collisions instead of the |C|²
    self-join a full re-dedup pays (|Δ| ≪ |C|); one shuffle keyed on
    (band, bucket) — content-derived, skew-bounded by the bucket
    hash; verification is per-candidate HOF set algebra, no Python.
    Cites reference scope: the reference engine has no dedup surface
    (README.md:17 — loading only); this is the LLM-pipeline
    extension tier."""
    from ..operators.dedup import minhash_delta_dedup

    docs = t(spark, sf, "documents")
    corpus = docs.where("doc_id % 10 <> 0")
    increment = docs.where("doc_id % 10 = 0")
    kept = minhash_delta_dedup(
        corpus,
        increment,
        "doc_id",
        "text",
        n=3,
        num_perm=32,
        bands=16,
        threshold=0.5,
    )
    return kept.select("doc_id", "lang", "source").orderBy("doc_id")


# ------------------------------------------- ANN recall monitor

_K = 10
_NQ = 8  # vec_id < 8 — the deterministic sampled query slice
_NLIST = 16
_LSH_TIERS = (8, 12, 16)
_IVF_TIERS = (1, 2, 4)


def _plane_literals() -> list[list[float]]:
    """The 16 seeded hyperplanes shared by every LSH tier: with a
    fixed seed, numpy fills row-major, so _hyperplanes(dim, 8, seed)
    is exactly the first 8 rows of _hyperplanes(dim, 16, seed) — one
    plane set serves all three tiers (and keeps the SQL twin to one
    set of literals)."""
    from ..operators.similarity import _hyperplanes

    return _hyperplanes(64, 16, 42)


def _recall_sql() -> str:
    planes = _plane_literals()
    dot_ab = (
        "list_sum(list_transform(list_zip(a.e, b.e), x -> x[1] * x[2]))"
    )
    sign_bits = ", ".join(
        "CASE WHEN list_sum(list_transform(list_zip(e, ["
        + ", ".join(repr(x) for x in row)
        + f"]), x -> x[1] * x[2])) >= 0 THEN (1::BIGINT << {i})"
        " ELSE 0 END AS s" + str(i)
        for i, row in enumerate(planes)
    )
    mask = {8: (1 << 8) - 1, 12: (1 << 12) - 1, 16: (1 << 16) - 1}
    lsh_leg = " UNION ALL ".join(
        f"""
        SELECT 'lsh' AS tier, {np} AS param, q.vec_id AS query_id,
          c.vec_id AS nbr_id,
          row_number() OVER (PARTITION BY q.vec_id ORDER BY
            {_DOT_RAW} / (c.nrm * q.nrm) DESC, c.vec_id ASC) AS rk
        FROM sig c JOIN sig q
          ON bit_count(xor(c.bucket & {mask[np]}, q.bucket & {mask[np]})) <= 1
        WHERE q.vec_id < {_NQ} AND c.vec_id <> q.vec_id
        """
        for np in _LSH_TIERS
    )
    ivf_leg = " UNION ALL ".join(
        f"""
        SELECT 'ivf' AS tier, {npr} AS param, q.vec_id AS query_id,
          c.vec_id AS nbr_id,
          row_number() OVER (PARTITION BY q.vec_id ORDER BY
            {_DOT_RAW} / (c.nrm * q.nrm) DESC, c.vec_id ASC) AS rk
        FROM asg c JOIN probes q ON c.cell = q.cell
        WHERE q.vec_id < {_NQ} AND q.pr <= {npr} AND c.vec_id <> q.vec_id
        """
        for npr in _IVF_TIERS
    )
    return f"""
    WITH n AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
        sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
          x -> x * x))) AS nrm
      FROM embeddings
    ), nn AS (
      SELECT vec_id, e, nrm, list_transform(e, x -> x / nrm) AS u
      FROM n WHERE nrm > 0
    ), exact AS (
      SELECT b.vec_id AS query_id, a.vec_id AS nbr_id
      FROM nn a, nn b
      WHERE b.vec_id < {_NQ} AND a.vec_id <> b.vec_id
      QUALIFY row_number() OVER (PARTITION BY b.vec_id ORDER BY
        {dot_ab} / (a.nrm * b.nrm) DESC, a.vec_id ASC) <= {_K}
    ), sig AS (
      SELECT vec_id, e, nrm, u, ({
        " | ".join(f"s{i}" for i in range(16))
      }) AS bucket
      FROM (SELECT vec_id, e, nrm, u, {sign_bits} FROM nn)
    ), cents AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ci, u AS cu
      FROM nn ORDER BY vec_id LIMIT {_NLIST}
    ), dist AS (
      SELECT v.vec_id, c.ci,
        round(list_sum(list_transform(list_zip(v.u, c.cu),
          x -> x[1] * x[2])), 9) AS rdot
      FROM nn v CROSS JOIN cents c
    ), asg AS (
      SELECT d.vec_id, d.ci AS cell, nn.e, nn.nrm, nn.u
      FROM dist d JOIN nn USING (vec_id)
      QUALIFY row_number() OVER (PARTITION BY d.vec_id
        ORDER BY d.rdot DESC, d.ci ASC) = 1
    ), probes AS (
      SELECT d.vec_id, d.ci AS cell, nn.e, nn.nrm, nn.u,
        row_number() OVER (PARTITION BY d.vec_id
          ORDER BY d.rdot DESC, d.ci ASC) AS pr
      FROM dist d JOIN nn USING (vec_id)
      WHERE d.vec_id < {_NQ}
    ), approx AS (
      SELECT tier, param, query_id, nbr_id
      FROM ({lsh_leg} UNION ALL {ivf_leg})
      WHERE rk <= {_K}
    ), hits AS (
      SELECT a.tier, a.param, CAST(count(*) AS BIGINT) AS n_hits
      FROM approx a JOIN exact e
        ON a.query_id = e.query_id AND a.nbr_id = e.nbr_id
      GROUP BY a.tier, a.param
    ), dom AS (
      SELECT * FROM (VALUES {", ".join(
          [f"('lsh', {np})" for np in _LSH_TIERS]
          + [f"('ivf', {npr})" for npr in _IVF_TIERS]
      )}) d(tier, param)
    )
    SELECT dom.tier, CAST(dom.param AS BIGINT) AS param,
      CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
      CAST(coalesce(h.n_hits, 0) * 1000000 // {_NQ * _K} AS BIGINT)
        AS recall_ppm
    FROM dom LEFT JOIN hits h
      ON h.tier = dom.tier AND h.param = dom.param
    ORDER BY dom.tier, dom.param
    """


_DOT_RAW = (
    "list_sum(list_transform(list_zip(c.e, q.e), x -> x[1] * x[2]))"
)


@_q("sim_ann_recall_monitor", _recall_sql())
def sim_ann_recall_monitor(spark: SparkSession, sf: str) -> DataFrame:
    """Per-tier/param ANN recall vs exact cosine on the deterministic
    8-query slice (vec_id < 8), k=10: LSH at 8/12/16 hyperplanes
    (hamming-1 multiprobe, the production rp_lsh_topk path) and IVF
    at nprobe 1/2/4 over 16 init-only cells — emitted as a
    (tier, param, n_hits, recall_ppm) table.  This is the guardrail
    a corpus-scale deployment runs per crawl to pick band counts /
    probe widths: recall decays as buckets shrink (more planes) and
    grows with probe width, and the monitor makes the trade-off a
    TABLE instead of folklore.

    The exact leg reuses ``cosine_topk`` (the ≤10-query broadcast
    contract).  LSH buckets come from the seeded literal hyperplanes
    — numpy fills row-major, so the 8- and 12-plane tiers are bit
    prefixes of the 16-plane signature and the DuckDB twin
    reproduces every bucket from one plane set.  The IVF tier uses
    init-only centroids (unit vectors of the 16 smallest vec_ids —
    deterministic and SQL-expressible; Lloyd iterations would put
    data-dependent floats in the twin).  Cell assignment rounds the
    centroid dot to 1e-9 before the argmax so both engines rank the
    same values (absorbs fold-order FP noise); the per-neighbor
    cosine ranking itself is the established sim_cosine_topk
    convention.

    Scale shape: every leg is a bounded bucket/cell equi-join (the
    8-query side broadcasts; no cross product anywhere); the recall
    join is |approx|≈6·80 rows against |exact|=80."""
    from ..operators.similarity import cosine_topk, rp_lsh_topk, with_norm

    emb = t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < _NQ)
    exact = cosine_topk(fanout(emb), queries, k=_K).select(
        "query_id", "nbr_id"
    )

    legs = []
    for n_planes in _LSH_TIERS:
        legs.append(
            rp_lsh_topk(emb, queries, k=_K, n_planes=n_planes)
            .select(
                F.lit("lsh").alias("tier"),
                F.lit(n_planes).cast("bigint").alias("param"),
                "query_id",
                "nbr_id",
            )
        )

    # ---- IVF init-only tier: expression-side assignment against the
    # 16 smallest vec_ids' unit vectors (bounded 16×64 driver state,
    # the ivf.py centroid-collect class)
    nn = (
        with_norm(emb, "embedding")
        .filter(F.col("norm") > 0)
        .select(
            "vec_id",
            F.col("__v").alias("e"),
            F.col("norm").alias("nrm"),
            F.expr("transform(__v, x -> x / norm)").alias("u"),
        )
    )
    cents = [
        r.u for r in nn.orderBy("vec_id").limit(_NLIST).select("u").collect()
    ]
    dots = ", ".join(
        "named_struct('rdot', round(aggregate(zip_with(u, array("
        + ", ".join(repr(x) + "D" for x in c)
        + f"), (x, y) -> x * y), 0D, (acc, v) -> acc + v), 9), 'ni', {-i})"
        for i, c in enumerate(cents)
    )
    # lexicographic array_max picks (max rdot, max -ci) = ties to the
    # SMALLEST cell index — the twin's (rdot DESC, ci ASC) order
    ranked_cells = f"reverse(array_sort(array({dots})))"
    c_asg = nn.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("e").alias("__cv"),
        F.col("nrm").alias("__cn"),
        F.expr(f"-element_at({ranked_cells}, 1).ni").alias("cell"),
    )
    q_probe = nn.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("__qv"),
        F.col("nrm").alias("__qn"),
        F.posexplode(
            F.expr(f"transform({ranked_cells}, s -> -s.ni)")
        ).alias("pr0", "cell"),
    )
    from ..operators.similarity import _DOT

    for nprobe in _IVF_TIERS:
        joined = c_asg.join(
            F.broadcast(q_probe.filter(F.col("pr0") < nprobe)), "cell"
        ).filter(F.col("query_id") != F.col("nbr_id"))
        scored = joined.withColumn(
            "cosine",
            F.expr(_DOT.format(a="__cv", b="__qv"))
            / (F.col("__cn") * F.col("__qn")),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("nbr_id").asc()
        )
        legs.append(
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _K)
            .select(
                F.lit("ivf").alias("tier"),
                F.lit(nprobe).cast("bigint").alias("param"),
                "query_id",
                "nbr_id",
            )
        )

    approx = legs[0]
    for leg in legs[1:]:
        approx = approx.unionByName(leg)
    hits = (
        approx.join(exact, ["query_id", "nbr_id"])
        .groupBy("tier", "param")
        .agg(F.count("*").cast("bigint").alias("n_hits"))
    )
    # a tier whose recall collapses to ZERO must still show a row —
    # that is the exact situation the monitor exists to surface
    dom = spark.createDataFrame(
        [("lsh", p) for p in _LSH_TIERS]
        + [("ivf", p) for p in _IVF_TIERS],
        "tier STRING, param BIGINT",
    )
    return (
        dom.join(F.broadcast(hits), ["tier", "param"], "left")
        .select(
            "tier",
            "param",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            F.expr(
                f"CAST(coalesce(n_hits, 0) * 1000000 div {_NQ * _K}"
                " AS BIGINT)"
            ).alias("recall_ppm"),
        )
        .orderBy("tier", "param")
    )
