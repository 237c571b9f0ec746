#!/usr/bin/env python
"""Decompose text_repetition_stats at x10: the biggest absolute
Spark-vs-DuckDB gap left in the x10 sweep (4.69 s vs 2.22 s,
BENCH_DETAIL r5).  The current plan is the round-3 rewrite — one
tokenization, per-doc sorted gram arrays, run-length folds (already
5x faster than the exploded groupBy it replaced).  Where do the
remaining seconds go?

Pieces timed (same x10 documents table, runs=3, min):
  tok        tokenize + size only (scan + split floor)
  bg_build   bigram transform(concat) without sort
  bg_sorted  + array_sort over the gram STRINGS (current shape)
  bg_hsort   + array_sort over xxhash64(gram) BIGINTs instead
  full       the shipped catalog query
  full_hash  hash-sorted variant of the full query
  duckdb     the oracle twin

Hypothesis: array_sort on per-doc string arrays (O(n log n) string
comparisons, interpreted lambda machinery) dominates; sorting 64-bit
gram hashes keeps the identical run-length semantics (equal grams ↔
equal hashes, modulo 2^-64-scale collisions) at integer-compare cost.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CPUS, SF_DIR, build_spark, synth_scaled_dir, timed  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

_TKS = "filter(split(lower(text), '[^a-z]+'), x -> x <> '')"


def gram_arr(n: int, body: str) -> str:
    """Per-doc gram array builder for gram size n with payload expr
    ``body`` (uses tks / i)."""
    return (
        "transform("
        f"CASE WHEN size(tks) >= {n} THEN sequence(1, size(tks) - {n - 1}) "
        "ELSE CAST(array() AS ARRAY<INT>) END, "
        f"i -> {body})"
    )


BG_STR = gram_arr(2, "concat(element_at(tks, i), ' ', element_at(tks, i + 1))")
TG_STR = gram_arr(
    3,
    "concat(element_at(tks, i), ' ', element_at(tks, i + 1), ' ', "
    "element_at(tks, i + 2))",
)
BG_HASH = gram_arr(2, "xxhash64(element_at(tks, i), element_at(tks, i + 1))")
TG_HASH = gram_arr(
    3,
    "xxhash64(element_at(tks, i), element_at(tks, i + 1), "
    "element_at(tks, i + 2))",
)


def fold_mx(arr: str, zero: str) -> str:
    return (
        f"aggregate(array_sort({arr}), named_struct('p', {zero}, 'r', 0, 'mx', 0), "
        "(st, x) -> CASE WHEN x = st.p THEN named_struct('p', x, 'r', st.r + 1, "
        "  'mx', greatest(st.mx, st.r + 1)) "
        "ELSE named_struct('p', x, 'r', 1, 'mx', greatest(st.mx, 1)) END, "
        "st -> st.mx)"
    )


def fold_dup(arr: str, zero: str) -> str:
    return (
        f"aggregate(array_sort({arr}), named_struct('p', {zero}, 'r', 0, 'dup', 0), "
        "(st, x) -> CASE WHEN x = st.p THEN named_struct('p', x, 'r', st.r + 1, "
        "  'dup', st.dup + (CASE WHEN st.r = 1 THEN 2 ELSE 1 END)) "
        "ELSE named_struct('p', x, 'r', 1, 'dup', st.dup) END, "
        "st -> st.dup)"
    )


def piece(docs, body: str):
    return docs.select(
        "doc_id",
        F.expr(f"inline(transform(array({_TKS}), tks -> named_struct({body})))"),
    )


def main() -> None:
    import duckdb

    from spark_bi5_datasource_spark import plans

    scaled = synth_scaled_dir(SF_DIR, 10)
    spark = build_spark()
    docs = spark.read.parquet(os.path.join(scaled, "documents.parquet"))
    n = docs.count()
    print(f"x10 documents: {n} rows, cpus={CPUS}")

    pieces = {
        "tok": piece(docs, "'n', size(tks)"),
        "bg_build": piece(docs, f"'n', size({BG_STR})"),
        "bg_sorted": piece(docs, f"'n', size(array_sort({BG_STR}))"),
        "bg_hash": piece(docs, f"'n', size({BG_HASH})"),
        "bg_hsort": piece(docs, f"'n', size(array_sort({BG_HASH}))"),
        "bg_fold_str": piece(docs, f"'mx', {fold_mx(BG_STR, chr(39) + chr(39))}"),
        "bg_fold_hash": piece(docs, f"'mx', {fold_mx(BG_HASH, '0L')}"),
        "full_str": piece(
            docs,
            f"'n_tokens', size(tks), 'bg_mx', {fold_mx(BG_STR, chr(39) + chr(39))}, "
            f"'tg_dup', {fold_dup(TG_STR, chr(39) + chr(39))}",
        ),
        "full_hash": piece(
            docs,
            f"'n_tokens', size(tks), 'bg_mx', {fold_mx(BG_HASH, '0L')}, "
            f"'tg_dup', {fold_dup(TG_HASH, '0L')}",
        ),
        "catalog": plans.CATALOG["text_repetition_stats"][0](spark, scaled),
    }
    for name, df in pieces.items():
        print(f"{name:14s} {timed(df, runs=3):7.3f} s")

    con = duckdb.connect()
    con.execute(f"SET threads TO {CPUS}")
    con.execute(f"CREATE VIEW documents AS FROM '{scaled}/documents.parquet'")
    sql = plans.CATALOG["text_repetition_stats"][1]
    import time

    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    print(f"{'duckdb':14s} {best:7.3f} s")


if __name__ == "__main__":
    main()
