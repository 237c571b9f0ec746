#!/usr/bin/env python
"""Ask #4 (r10 verdict): decompose dedup_band_index_merge's x10 cost
into build / merge / parquet-round-trip / probe legs.

The entry's DuckDB twin does the whole cycle IN MEMORY (one SQL over
the raw parquet view), while the Spark entry pays a real storage
lifecycle: build the initial index, MERGE one crawl cycle, WRITE it
to parquet, READ it back, probe.  If the storage legs dominate, the
ratio is storage-honest, not plan-weak.

One JVM, legs run in two rotations (forward then reverse) with the
min taken per leg, so the within-session drift bias cannot favor a
fixed position.  Writes nothing; prints JSON.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")

from bench import SF_DIR, build_spark, synth_scaled_dir, timed  # noqa: E402


def main() -> None:
    from spark_bi5_datasource_spark.operators.band_index import (
        merge_band_index,
        minhash_band_index,
        read_band_index,
        write_band_index,
    )
    from spark_bi5_datasource_spark.operators.dedup import (
        minhash_delta_dedup,
    )
    from spark_bi5_datasource_spark.plans.tables import t

    scaled = synth_scaled_dir(SF_DIR, 10, ["documents"])
    spark = build_spark()
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
    )

    docs = t(spark, scaled, "documents")
    initial = docs.where("doc_id % 10 NOT IN (0, 9)")
    adds = docs.where("doc_id % 10 = 9")
    retired = initial.where("doc_id % 7 = 3").select("doc_id")
    increment = docs.where("doc_id % 10 = 0")
    live = initial.where("doc_id % 7 <> 3").unionByName(adds)
    kw = dict(n=3, num_perm=32, bands=16)

    scratch = "/tmp/bandidx_decomp"

    def leg_build():
        return timed(
            minhash_band_index(initial, "doc_id", "text", **kw), runs=2
        )

    def leg_merge():
        return timed(
            merge_band_index(
                minhash_band_index(initial, "doc_id", "text", **kw),
                added=adds, retired=retired,
                id_col="doc_id", text_col="text", **kw,
            ),
            runs=2,
        )

    def leg_roundtrip():
        merged = merge_band_index(
            minhash_band_index(initial, "doc_id", "text", **kw),
            added=adds, retired=retired,
            id_col="doc_id", text_col="text", **kw,
        ).localCheckpoint(eager=True)  # isolate the WRITE+READ cost
        best = float("inf")
        for _ in range(2):
            shutil.rmtree(scratch, ignore_errors=True)
            t0 = time.perf_counter()
            write_band_index(merged, scratch)
            read_band_index(spark, scratch).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    def leg_probe():
        # steady-state: stored index already on disk
        if not os.path.exists(os.path.join(scratch, "_SUCCESS")):
            write_band_index(
                merge_band_index(
                    minhash_band_index(initial, "doc_id", "text", **kw),
                    added=adds, retired=retired,
                    id_col="doc_id", text_col="text", **kw,
                ),
                scratch,
            )
        stored = read_band_index(spark, scratch)
        return timed(
            minhash_delta_dedup(
                live, increment, "doc_id", "text",
                threshold=0.5, max_bucket=200, corpus_index=stored, **kw,
            ).select("doc_id", "lang", "source").orderBy("doc_id"),
            runs=2,
        )

    def leg_full():
        from spark_bi5_datasource_spark import plans

        return timed(
            plans.CATALOG["dedup_band_index_merge"][0](spark, scaled),
            runs=2,
        )

    legs = {
        "build": leg_build,
        "merge": leg_merge,
        "write_read": leg_roundtrip,
        "probe_stored": leg_probe,
        "full_entry": leg_full,
    }
    out: dict = {"x": 10}
    for order in (list(legs), list(legs)[::-1]):
        for name in order:
            v = legs[name]()
            out[name] = min(out.get(name, float("inf")), v)
    spark.stop()

    import duckdb

    from spark_bi5_datasource_spark import plans

    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    con.execute(
        f"CREATE VIEW documents AS FROM '{scaled}/documents.parquet'"
    )
    sql = plans.oracle_sql()["dedup_band_index_merge"]
    con.execute(sql).fetchall()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    out["duckdb_full"] = round(best, 3)
    con.close()
    shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
