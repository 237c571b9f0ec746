#!/usr/bin/env python
"""r10 same-window re-pin sweep (VERDICT r9 asks #1, #2, #4).

Every ratio below is measured with the r10 drift protocol: the Spark
leg runs in a FRESH JVM (scripts/_spark_leg.py subprocess, warm
min-of-2), and the DuckDB leg runs in the parent immediately after —
same box state, minutes apart.  This supersedes the cross-state
BENCH_X1000_R13 rows for these queries.

Legs:
* x1000: window_macd, text_encoding_audit, dedup_band_tuning_monitor
  (the three flagged-not-counted R13 ratios), and
  dq_doc_embedding_coverage twice — plain layout vs the NEW
  documents/embeddings bucketed layout (BUCKET_SPECS r10) — ask #1's
  re-pin.
* x1000 Spark-only: dedup_band_index_merge under the NEW capped
  default (max_bucket=200) — ask #4's "survives the replica tier
  instead of being excluded" run.  DuckDB twin stays excluded by the
  pair-counting rule (the exact SQL is quadratic by construction).
* x100: dedup_media_phash and events_stickiness_dau_mau
  head-to-heads.
* x10: dedup_band_index_merge (capped) and dedup_incremental_delta
  head-to-heads (the two R13/R14 x10 legs).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CPUS, SF_DIR, synth_scaled_dir  # noqa: E402

RUNNER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_spark_leg.py")


def spark_leg(
    query: str,
    scaled: str,
    bucket_tables: list[str] | None = None,
    runs: int = 2,
    timeout: int = 3600,
) -> float:
    cmd = [
        sys.executable,
        RUNNER,
        query,
        scaled,
        ",".join(bucket_tables or []),
        str(runs),
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)
    if r.returncode != 0:
        raise RuntimeError(f"{query} spark leg failed:\n{r.stderr[-2000:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])["sec"]


def duck_leg(query: str, scaled: str, tables: list[str], runs: int = 2) -> float:
    import duckdb

    from spark_bi5_datasource_spark import plans

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={CPUS}")
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS FROM '{scaled}/{t}.parquet'")
    sql = plans.oracle_sql()[query]
    con.execute(sql).fetchall()  # warm-up, matches timed()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    con.close()
    return round(best, 3)


def main() -> None:
    out: dict = {"protocol": "fresh-JVM spark leg + immediate duckdb leg"}

    x1000_de = synth_scaled_dir(SF_DIR, 1000, ["documents", "embeddings"])
    x1000_ev = synth_scaled_dir(SF_DIR, 1000, ["events"])
    x100 = synth_scaled_dir(SF_DIR, 100, ["documents", "events"])
    x10 = synth_scaled_dir(SF_DIR, 10, ["documents"])

    def pair(tag, query, scaled, tables, bucket=None, runs=2):
        s = spark_leg(query, scaled, bucket_tables=bucket, runs=runs)
        d = duck_leg(query, scaled, tables, runs=runs)
        out[tag] = {
            "spark": s,
            "duckdb": d,
            "ratio": round(s / d, 2) if d else None,
        }
        print(f"# {tag}: spark={s} duck={d}", file=sys.stderr)

    # ---- x1000 re-pins (the flagged cross-state R13 rows)
    pair("window_macd_x1000", "window_macd", x1000_ev, ["events"])
    pair(
        "text_encoding_audit_x1000",
        "text_encoding_audit",
        x1000_de,
        ["documents"],
    )
    pair(
        "dedup_band_tuning_monitor_x1000",
        "dedup_band_tuning_monitor",
        x1000_de,
        ["documents"],
    )

    # ---- ask #1: coverage plain vs bucketed, one DuckDB leg between
    s_plain = spark_leg("dq_doc_embedding_coverage", x1000_de)
    d_cov = duck_leg(
        "dq_doc_embedding_coverage", x1000_de, ["documents", "embeddings"]
    )
    s_buck = spark_leg(
        "dq_doc_embedding_coverage",
        x1000_de,
        bucket_tables=["documents", "embeddings"],
    )
    out["dq_doc_embedding_coverage_x1000"] = {
        "spark_plain": s_plain,
        "spark_bucketed": s_buck,
        "duckdb": d_cov,
        "ratio_plain": round(s_plain / d_cov, 2),
        "ratio_bucketed": round(s_buck / d_cov, 2),
    }
    print(
        f"# coverage: plain={s_plain} bucketed={s_buck} duck={d_cov}",
        file=sys.stderr,
    )

    # ---- ask #4: capped band-index at the replica tier, Spark-only
    t0 = time.perf_counter()
    s_bi = spark_leg(
        "dedup_band_index_merge", x1000_de, runs=1, timeout=3600
    )
    out["band_index_merge_x1000_capped"] = {
        "spark_warm_min1": s_bi,
        "wall_incl_warmup": round(time.perf_counter() - t0, 1),
        "duckdb": "excluded (pair-counting rule; exact SQL quadratic)",
    }
    print(f"# band_index x1000 capped: {s_bi}", file=sys.stderr)

    # ---- x100 head-to-heads
    pair("phash_x100", "dedup_media_phash", x100, ["documents"])
    pair(
        "stickiness_x100",
        "events_stickiness_dau_mau",
        x100,
        ["events"],
    )

    # ---- x10 head-to-heads
    pair(
        "band_index_x10_capped",
        "dedup_band_index_merge",
        x10,
        ["documents"],
    )
    pair(
        "delta_dedup_x10", "dedup_incremental_delta", x10, ["documents"]
    )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
