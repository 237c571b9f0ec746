#!/usr/bin/env python
"""Extended floor proof for text_url_email_stats (r8 verdict ask #6).

r8 proved Spark's parquet STRING DECODE alone costs ~0.6-0.8 s at
x1000 vs DuckDB's 0.036 s.  This decomposes the rest: the fixture
text contains ZERO 'http' and ZERO '@' occurrences (verified below),
so the gated regexes never execute — the residual above the decode
floor is exactly the two instr() literal gate scans, i.e. the audit's
irreducible must-touch-every-byte exact-match work, not regex cost.

Components measured (x1000 = 5M docs / ~1.5 GB text):
  decode floor        sum(length(text))
  decode + gates      the two instr probes + per-source rollup
  full shipped query  adds the (never-entered) regexp_count branches
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")

from bench import SF_DIR, build_spark, synth_scaled_dir, timed  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from spark_bi5_datasource_spark import plans
    from spark_bi5_datasource_spark.plans.tables import t

    scaled = synth_scaled_dir(SF_DIR, 1000, ["documents"])
    spark = build_spark()
    spark.conf.set("spark.sql.shuffle.partitions", "128")

    docs = t(spark, scaled, "documents").where("text IS NOT NULL")
    decode = docs.select(F.sum(F.length("text")))
    gates = (
        docs.select(
            "source",
            F.expr("CAST(instr(text, 'http') > 0 AS INT)").alias("u"),
            F.expr("CAST(instr(text, '@') > 0 AS INT)").alias("m"),
        )
        .groupBy("source")
        .agg(F.sum("u"), F.sum("m"))
    )
    fn = {n: f for n, (f, _s, _b) in plans.CATALOG.items()}[
        "text_url_email_stats"
    ]
    t_decode = timed(decode)
    t_gates = timed(gates)
    t_full = timed(fn(spark, scaled))
    hits = docs.select(
        F.sum(F.expr("CAST(instr(text,'http') > 0 AS INT)")).alias("u"),
        F.sum(F.expr("CAST(instr(text,'@') > 0 AS INT)")).alias("m"),
    ).collect()[0]
    print(f"decode floor       : {t_decode:.3f}s")
    print(f"decode + gate scans: {t_gates:.3f}s")
    print(f"full shipped query : {t_full:.3f}s  "
          f"(= gates + {t_full - t_gates:.3f}s)")
    print(f"gate hits on fixture: url={hits.u} mail={hits.m} "
          "(zero => regex branches never execute)")


if __name__ == "__main__":
    main()
