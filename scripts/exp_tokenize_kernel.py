#!/usr/bin/env python
"""Tokenize-kernel experiment: can an Arrow kernel beat the JVM
regex-split + explode for corpus token counting?

Motivation: at x1000, `text_source_diversity` is 5.6x DuckDB (16.8 s
vs 3.0 s) and the plan is dominated by `split(lower(text),'[^a-z]+')`
+ explode over ~100M tokens — the aggregation itself collapses to
|sources| x |vocab| rows map-side.  The round-6 repetition-stats
kernel precedent (8.5x over a Catalyst fold) suggests the Arrow
string kernels (utf8_lower / split_pattern_regex are RE2, identical
semantics for the pure-ASCII class pattern) may beat JVM regex.

Variants, timed at the x100 tier (500k docs) via bench.timed:
  a) JVM: explode(split(lower, re)) -> groupBy(source, term).count
  b) Arrow partial-count kernel: mapInArrow emits per-batch
     (source, term, cnt) partials -> groupBy(source, term).sum
Both reduce to the same exact counts (kernel partials are exact), so
the oracle contract is unaffected by a swap.

RESULT (this box, local[32], min of 2 after warm-up, exact-count
cross-check green both runs):
  x100  (500k docs): JVM 13.10 s | Arrow kernel 6.00 s   (2.2x)
  x1000 (5M docs):   JVM 16.16 s | Arrow kernel 9.12 s   (1.8x)
ACCEPTED: promoted to ``functions.text.term_count_partials`` and
wired into tok_zipf_profile / text_source_diversity (the other
corpus aggs keep their driver-green JVM plans; the kernel is
available when their tokenize stage shows up in a profile).  Unlike
the repetition kernel (which replaced an INTERPRETED Catalyst fold),
this one beats a fused codegen stage — the win is per-token JVM
object churn vs Arrow's columnar split, and the downstream shuffle
shrinking from token rows to per-batch vocab partials.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SF_DIR, build_spark, synth_scaled_dir, timed  # noqa: E402

X = int(os.environ.get("EXP_X", "100"))


def jvm_counts(spark, sf):
    from pyspark.sql import functions as F

    from spark_bi5_datasource_spark.plans.tables import t

    return (
        t(spark, sf, "documents")
        .select(
            "source",
            F.explode(
                F.expr("filter(split(lower(text), '[^a-z]+'), x -> x <> '')")
            ).alias("term"),
        )
        .groupBy("source", "term")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def arrow_counts(spark, sf):
    import pyarrow as pa

    from pyspark.sql import functions as F
    from spark_bi5_datasource_spark.plans.tables import t

    out_schema = "source string, term string, cnt long"

    def kernel(batches):
        import pyarrow.compute as pc

        for b in batches:
            src = b.column("source")
            toks = pc.split_pattern_regex(
                pc.utf8_lower(b.column("text")), pattern="[^a-z]+"
            )
            # replicate source per token, drop the empty-split artifacts
            lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
            flat = pc.list_flatten(toks)
            src_rep = pa.array(src.to_pandas().repeat(lens))
            keep = pc.not_equal(flat, "")
            flat = pc.filter(flat, keep)
            src_rep = pc.filter(src_rep, keep)
            tbl = pa.table({"source": src_rep, "term": flat})
            counts = (
                tbl.group_by(["source", "term"])
                .aggregate([([], "count_all")])
                .rename_columns(["source", "term", "cnt"])
                .cast(
                    pa.schema(
                        [
                            ("source", pa.string()),
                            ("term", pa.string()),
                            ("cnt", pa.int64()),
                        ]
                    )
                )
            )
            yield from counts.to_batches()

    partial = (
        t(spark, sf, "documents")
        .select("source", "text")
        .mapInArrow(kernel, out_schema)
    )
    return partial.groupBy("source", "term").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def main() -> None:
    scaled = synth_scaled_dir(SF_DIR, X, ["documents"])
    spark = build_spark()
    from spark_bi5_datasource_spark import ship_package

    ship_package(spark)

    a = jvm_counts(spark, scaled)
    b = arrow_counts(spark, scaled)
    # cross-check exactness before timing
    mismatch = a.join(b, ["source", "term"], "full_outer").where(
        "a.cnt IS NULL OR b.cnt IS NULL"
    ) if False else None  # noqa: F841 — counts compared below
    rows_a = {(r[0], r[1]): r[2] for r in a.collect()}
    rows_b = {(r[0], r[1]): r[2] for r in b.collect()}
    assert rows_a == rows_b, "kernel diverges from JVM counts"

    ta = timed(a, runs=2)
    tb = timed(b, runs=2)
    print(f"x{X}: jvm={ta}s arrow_kernel={tb}s")


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"# total {time.time() - t0:.0f}s", file=sys.stderr)
