#!/usr/bin/env python
"""Stress probe of the remaining round-13/14 catalog additions
(builder round 9) — run the round they land so no straggler backlog
accumulates (the perf_x1000_round12 method; exclusions recorded in
the output).

Tier choices:
* dedup_audio_fingerprint / dedup_video_fingerprint — x1000 Spark
  warm (the synth + real-decoder + fingerprint Arrow kernels are the
  honest product cost), DuckDB head-to-head at x100: the twins
  materialize 65 (audio) / 3×72 (video) UNNEST rows per doc
  self-joined per consecutive index — ~2.3G join probes at x1000,
  the pair-counting-rule class (same call as dedup_media_phash in
  BENCH_X1000_R14).
* dedup_band_index_health — the portable polynomial shingle hash is
  a per-CHAR fold in BOTH engines (~3.4G char steps at x1000); the
  Spark side is the catalog's own plan so it IS measured at x1000,
  but the DuckDB leg is probed at x10 where the list_reduce fold is
  feasible.
* sim_ivf_index_merge — the catalog entry is the provably-exact
  nprobe=nlist mode (the sim_ivf_exact / semdedup-exact-mode pin):
  at x1000 that is 500K queries × 4.5M-vector corpus ≈ 2.3e12 scored
  pairs BY CONSTRUCTION — the pair-counting rule.  Measured instead:
  the x10 exact head-to-head (both engines pay the same brute-force
  work) plus the PRODUCTION approximate shape at x100 Spark-only
  (nlist=64, nprobe=4, 1K queries — build + merge + parquet
  round-trip + stored-index probe end-to-end, the shape a 100 TB
  pipeline actually runs; DuckDB has no approximate twin).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")

from bench import CPUS, SF_DIR, build_spark, synth_scaled_dir, timed  # noqa: E402

EXCLUSIONS = {
    "dedup_audio_fingerprint": (
        "DuckDB x1000 twin excluded: 65 UNNEST rows/doc = 325M g-rows "
        "self-joined on consecutive sample index — the pair-counting "
        "rule.  Spark x1000 warm measured (the kernels are the product "
        "path); head-to-head at x100."
    ),
    "dedup_video_fingerprint": (
        "DuckDB x1000 twin excluded: 3 frames × 72 UNNEST rows/doc = "
        "1.1G g-rows self-joined — the pair-counting rule.  Spark "
        "x1000 warm measured; head-to-head at x100."
    ),
    "dedup_band_index_health": (
        "DuckDB x1000 leg excluded: the engine-portable polynomial "
        "shingle hash is a per-char list_reduce fold (~3.4G char "
        "steps) — measured at x10 where it is feasible; the Spark "
        "side is the catalog plan itself and is measured at x1000."
    ),
    "sim_ivf_index_merge": (
        "x1000 head-to-head excluded: the catalog entry is the "
        "provably-exact nprobe=nlist mode (the sim_ivf_exact "
        "fixture-scale pin), which at x1000 is 500K queries × 4.5M "
        "corpus ≈ 2.3e12 scored pairs by construction — the "
        "pair-counting rule.  x10 exact head-to-head measured; the "
        "production approximate shape (nlist=64, nprobe=4) measured "
        "Spark-only at x100 below."
    ),
}


def _ivf_production_x100(spark, x100emb: str) -> dict:
    """Production-shape stored-IVF cycle at x100 embeddings (500K
    vectors): train on the initial corpus, build + merge + write +
    read back + probe 1K queries at nlist=64 / nprobe=4."""
    from pyspark.sql import functions as F

    from spark_bi5_datasource_spark.operators.ann_index import (
        build_ivf_index,
        ivf_probe_index,
        merge_ivf_index,
        read_ivf_index,
        write_ivf_index,
    )
    from spark_bi5_datasource_spark.operators.ivf import kmeans_centroids

    emb = spark.read.parquet(f"{x100emb}/embeddings.parquet")
    initial = emb.where("vec_id % 10 BETWEEN 1 AND 8")
    adds = emb.where("vec_id % 10 = 9")
    retired = initial.where("vec_id % 7 = 3").select("vec_id")
    queries = emb.where("vec_id % 10 = 0").orderBy("vec_id").limit(1000)

    t0 = time.perf_counter()
    cents = kmeans_centroids(initial, "embedding", k=64, iters=2)
    t_train = time.perf_counter() - t0

    t0 = time.perf_counter()
    merged = merge_ivf_index(
        build_ivf_index(initial, cents),
        added=adds,
        retired=retired,
        centroids=cents,
    )
    path = "/tmp/spark_graft_ivf_x100"
    write_ivf_index(merged, cents, path)
    t_build_merge_write = time.perf_counter() - t0

    t0 = time.perf_counter()
    stored, stored_cents = read_ivf_index(spark, path)
    probe = ivf_probe_index(stored, stored_cents, queries, k=5, nprobe=4)
    n = probe.count()
    t_probe = time.perf_counter() - t0
    return {
        "train_s": round(t_train, 3),
        "build_merge_write_s": round(t_build_merge_write, 3),
        "stored_probe_s": round(t_probe, 3),
        "probe_rows": n,
        "nlist": 64,
        "nprobe": 4,
        "n_queries": 1000,
    }


def main() -> None:
    import duckdb

    from spark_bi5_datasource_spark import plans, register

    x1000_docs = synth_scaled_dir(SF_DIR, 1000, ["documents"])
    x100_docs = synth_scaled_dir(SF_DIR, 100, ["documents"])
    x100_emb = synth_scaled_dir(SF_DIR, 100, ["embeddings"])
    x10_docs = synth_scaled_dir(SF_DIR, 10, ["documents"])
    x10_emb = synth_scaled_dir(SF_DIR, 10, ["embeddings"])

    spark = build_spark()
    register(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    qs = {n: fn for n, (fn, _s, _b) in plans.CATALOG.items()}
    oracles = plans.oracle_sql()

    out: dict = {"x": 1000, "exclusions": EXCLUSIONS}

    spark_x1000: dict[str, float] = {}
    for q in ("dedup_audio_fingerprint", "dedup_video_fingerprint",
              "dedup_band_index_health"):
        spark_x1000[q] = timed(qs[q](spark, x1000_docs), runs=2)
        print(f"# spark {q} x1000: {spark_x1000[q]}", file=sys.stderr)
    out["spark"] = spark_x1000

    spark_small = {
        "dedup_audio_fingerprint_x100": timed(
            qs["dedup_audio_fingerprint"](spark, x100_docs), runs=2
        ),
        "dedup_video_fingerprint_x100": timed(
            qs["dedup_video_fingerprint"](spark, x100_docs), runs=2
        ),
        "dedup_band_index_health_x10": timed(
            qs["dedup_band_index_health"](spark, x10_docs), runs=2
        ),
        "sim_ivf_index_merge_x10": timed(
            qs["sim_ivf_index_merge"](spark, x10_emb), runs=2
        ),
    }
    for k, v in spark_small.items():
        print(f"# spark {k}: {v}", file=sys.stderr)
    out["spark_small_tier"] = spark_small

    out["ivf_production_x100"] = _ivf_production_x100(spark, x100_emb)
    print(f"# ivf production x100: {out['ivf_production_x100']}",
          file=sys.stderr)
    spark.stop()

    def duck_time(view_dir: str, q: str, table: str) -> float:
        con = duckdb.connect()
        con.execute(f"PRAGMA threads={CPUS}")
        con.execute(
            f"CREATE VIEW {table} AS FROM '{view_dir}/{table}.parquet'"
        )
        sql = oracles[q]
        con.execute(sql).fetchall()
        best = float("inf")
        for _ in range(2):
            s = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - s)
        con.close()
        return round(best, 3)

    duck = {
        "dedup_audio_fingerprint_x100": duck_time(
            x100_docs, "dedup_audio_fingerprint", "documents"
        ),
        "dedup_video_fingerprint_x100": duck_time(
            x100_docs, "dedup_video_fingerprint", "documents"
        ),
        "dedup_band_index_health_x10": duck_time(
            x10_docs, "dedup_band_index_health", "documents"
        ),
        "sim_ivf_index_merge_x10": duck_time(
            x10_emb, "sim_ivf_index_merge", "embeddings"
        ),
    }
    for k, v in duck.items():
        print(f"# duckdb {k}: {v}", file=sys.stderr)
    out["duckdb_small_tier"] = duck
    out["small_tier_ratio"] = {
        k: round(spark_small[k] / duck[k], 2) for k in duck
    }

    line = json.dumps(out)
    print(line)
    with open(
        os.path.join(os.path.dirname(__file__), "..", "BENCH_X1000_R15.json"),
        "w",
    ) as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
