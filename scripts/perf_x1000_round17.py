#!/usr/bin/env python
"""r11 same-window re-pin sweep (VERDICT r10 asks #2 and #3).

Protocol = the r10 drift countermeasure: every Spark leg runs in a
FRESH JVM (scripts/_spark_leg.py or _r17_leg.py subprocess, warm
min-of-N) with the DuckDB leg timed by the parent immediately after
— same box state, minutes apart.

Legs:
* ask #2 — dq_doc_embedding_coverage at x1000: the shipped bucketed
  entry AND its two-table scan floor timed back-to-back in ONE JVM
  (settling the 4.11×-pin vs 2.1×-floor disagreement), with
  is_bucketed printed for both tables.
* ask #3 — the three small-absolute stragglers re-pinned at the
  SHIPPED bench config (bench.build_spark sets shuffle.partitions =
  CPUS = 32; the r10 probe default of 128 was a probe artifact, and
  its tiny-stage overhead is exactly what the r10 sweeps measured):
  window_macd, dedup_band_tuning_monitor, text_encoding_audit at
  shuf=32 and shuf=128, plus text_encoding_audit's minimal decode
  floor (sum octet/char lengths — the cheapest plan that still
  materializes every string) against DuckDB's same floor.

Writes BENCH_X1000_R17.json.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CPUS, SF_DIR, synth_scaled_dir  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
RUNNER = os.path.join(HERE, "_spark_leg.py")
RUNNER17 = os.path.join(HERE, "_r17_leg.py")


def spark_leg(query, scaled, shuf="32", runs=2, timeout=3600):
    cmd = [sys.executable, RUNNER, query, scaled, "", str(runs), shuf]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)
    if r.returncode != 0:
        raise RuntimeError(f"{query} spark leg failed:\n{r.stderr[-2000:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])["sec"]


def leg17(mode, scaled, shuf="32", timeout=3600):
    cmd = [sys.executable, RUNNER17, mode, scaled, shuf]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)
    if r.returncode != 0:
        raise RuntimeError(f"{mode} leg failed:\n{r.stderr[-2000:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def duck_leg(sql, scaled, tables, runs=2):
    import duckdb

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={CPUS}")
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS FROM '{scaled}/{t}.parquet'")
    con.execute(sql).fetchall()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    con.close()
    return round(best, 3)


def _dump(out: dict) -> None:
    path = os.path.join(HERE, "..", "BENCH_X1000_R17.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)


def main() -> None:
    from spark_bi5_datasource_spark import plans

    oracles = plans.oracle_sql()
    out: dict = {"protocol": "fresh JVM per Spark leg; DuckDB in parent minutes after"}

    x1000 = synth_scaled_dir(SF_DIR, 1000, ["documents", "embeddings", "events"])

    # ---- ask #2: coverage entry + scan floor, one JVM, both shufs
    for shuf in ("128", "32"):
        pair = leg17("coverage_pair", x1000, shuf)
        pair["duckdb_sec"] = duck_leg(
            oracles["dq_doc_embedding_coverage"], x1000,
            ["documents", "embeddings"],
        )
        pair["ratio"] = round(pair["entry_sec"] / pair["duckdb_sec"], 2)
        out[f"dq_doc_embedding_coverage@{shuf}"] = pair
        _dump(out)

    # ---- ask #3: the three stragglers at shipped (32) and probe (128)
    for q, tabs in (
        ("window_macd", ["events"]),
        ("dedup_band_tuning_monitor", ["documents"]),
        ("text_encoding_audit", ["documents"]),
    ):
        entry: dict = {}
        for shuf in ("32", "128"):
            entry[f"spark@{shuf}"] = spark_leg(q, x1000, shuf, runs=3)
        entry["duckdb"] = duck_leg(oracles[q], x1000, tabs, runs=3)
        entry["ratio@32"] = round(entry["spark@32"] / entry["duckdb"], 2)
        entry["ratio@128"] = round(entry["spark@128"] / entry["duckdb"], 2)
        out[q] = entry
        _dump(out)

    # encoding decode floor, both engines
    fl = leg17("encoding_floor", x1000, "32")
    fl["duckdb_floor_sec"] = duck_leg(
        # DuckDB: strlen = byte length, length = character count
        "SELECT sum(strlen(text)) AS b, sum(length(text)) AS c"
        " FROM documents",
        x1000,
        ["documents"],
    )
    out["text_encoding_decode_floor"] = fl
    _dump(out)

    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
