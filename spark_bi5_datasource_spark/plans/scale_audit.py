"""``explain_scale`` — the PLAN_AUDIT heuristics as a user-facing API.

``scripts/plan_audit.py`` gates every round by mechanically scanning
each catalog entry's physical plan for the properties that decide
whether a plan survives a 100× scale-up: exchanges (how many, on
what), single-partition funnels, broadcast sides, Python boundaries,
scan multiplicity, codegen coverage.  That knowledge was trapped in a
CI script; ``explain_scale(df)`` turns it into a DataFrame any user
can call on any frame — the "would this plan survive at 100 TB"
question as a query.

One row per audited property:

* ``property`` — dotted key (``exchange.hash``, ``scan.multiplicity``…)
* ``count``    — occurrences in the executed plan
* ``severity`` — ``ok`` (expected at scale), ``review`` (legitimate
  only with a boundedness argument — the caller must know why), or
  ``scale_killer`` (never acceptable on an unbounded input)
* ``detail``   — what was found (keys, tables, modes)

Severity encodes the PLAN_AUDIT rulebook: CartesianProduct and
row-at-a-time Python are killers; SinglePartition exchanges and
broadcast-NLJ are ``review`` unless the structural scalar-aggregate
pattern proves them bounded (one partial row per partition); Arrow
boundaries are ``review`` (the allowed slow path — each one should be
a documented kernel); hash exchanges and broadcasts are ``ok`` but
counted, because every exchange is a cost and the count is the first
thing to compare between two candidate plans.

The scan is string-based over ``executedPlan`` — the same substrate
PLAN_AUDIT uses.  With AQE enabled the string can repeat
reused-exchange subtrees, so counts over-report reused stages;
comparisons between plans of the SAME query are exact, absolute
counts are upper bounds (same caveat as the audit script).
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame

__all__ = ["explain_scale"]

_SCHEMA = "property string, count int, severity string, detail string"


def _rows(plan: str) -> list[tuple[str, int, str, str]]:
    lines = plan.splitlines()
    rows: list[tuple[str, int, str, str]] = []

    # ---- scale killers: never acceptable on unbounded inputs
    for marker, prop in (
        ("CartesianProduct", "join.cartesian"),
        ("BatchEvalPython", "python.row_at_a_time"),
    ):
        n = plan.count(marker)
        if n:
            rows.append((prop, n, "scale_killer", marker))

    # ---- structural boundedness: a SinglePartition exchange (or an
    # identity broadcast) whose child is a keys=[] partial aggregate
    # moves one row per upstream partition — bounded by design
    sp_scalar = ibm_scalar = 0
    for i, line in enumerate(lines):
        nxt = " ".join(lines[i + 1 : i + 3])
        if "Exchange SinglePartition" in line and (
            "HashAggregate(keys=[], functions=[partial_" in nxt
        ):
            sp_scalar += 1
        if "BroadcastExchange IdentityBroadcastMode" in line and (
            "HashAggregate(keys=[]," in nxt
        ):
            ibm_scalar += 1

    n_sp = plan.count("Exchange SinglePartition")
    if n_sp:
        unbounded = n_sp - sp_scalar
        if sp_scalar:
            rows.append((
                "exchange.single_partition.scalar_agg", sp_scalar, "ok",
                "keys=[] partial aggregate: one row per upstream partition",
            ))
        if unbounded > 0:
            rows.append((
                "exchange.single_partition", unbounded, "review",
                "all rows through one task — needs a post-aggregation "
                "row-count bound (|days|, |sources|, top-k…)",
            ))

    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    if n_bnlj:
        sev = "ok" if n_bnlj <= ibm_scalar else "review"
        rows.append((
            "join.broadcast_nested_loop", n_bnlj, sev,
            "bounded iff the broadcast side is provably tiny "
            f"({ibm_scalar} proven 1-row scalar frames)",
        ))

    # ---- exchanges: the cost centers to count and compare.
    # Non-greedy up to the trailing ", <numPartitions>)" so expression
    # keys with their own parens (cast(x as bigint), coalesce(a, b))
    # stay intact; a nested ", <int>)" literal can still truncate the
    # detail early — informational only, the COUNT is always exact
    keys = re.findall(
        r"Exchange hashpartitioning\((.*?), \d+\)", plan
    )
    n_hash = plan.count("Exchange hashpartitioning")
    if n_hash:
        cols = sorted({
            re.sub(r"#\d+L?", "", k).strip()
            for key in keys for k in key.split(", ")
        })
        rows.append((
            "exchange.hash", n_hash, "ok",
            "shuffle keys: " + ", ".join(cols)[:200],
        ))
    n_range = plan.count("Exchange rangepartitioning")
    if n_range:
        rows.append((
            "exchange.range", n_range, "ok",
            "global sort — fine for top-k tails, review if feeding "
            "another wide stage",
        ))

    n_bc = plan.count("BroadcastExchange")
    if n_bc:
        rows.append((
            "broadcast.exchange", n_bc, "ok",
            "each must stay executor-memory-sized at the target scale "
            "(dims, model state, query sides)",
        ))

    # ---- Python boundaries: the allowed (Arrow) slow path, counted
    n_arrow = sum(
        plan.count(m) for m in ("MapInArrow", "MapInPandas",
                                "ArrowEvalPython", "FlatMapGroupsInPandas")
    )
    if n_arrow:
        rows.append((
            "python.arrow_boundary", n_arrow, "review",
            "Arrow-vectorized kernels — each should be a documented "
            "can't-express-in-Catalyst boundary",
        ))

    # ---- scans: multiplicity (shared-subtree re-execution smell) and
    # pruning evidence.  Key each scan on its Location path (the
    # format token alone collapses every parquet scan into one bucket)
    scan_lines = [ln for ln in lines if "FileScan" in ln]
    srcs = []
    for ln in scan_lines:
        m = re.search(r"Location:[^\[]*\[([^\],]+)", ln)
        if m:
            srcs.append(m.group(1).rstrip("/").rsplit("/", 1)[-1])
        else:
            m2 = re.search(r"FileScan (\S+)", ln)
            srcs.append(m2.group(1) if m2 else "unknown")
    per_src = Counter(srcs)
    for src, n in sorted(per_src.items()):
        sev = "ok" if n <= 2 else "review"
        rows.append((
            "scan.multiplicity", n, sev,
            f"{src}: scanned {n}× "
            + ("(self-join is 2×; ≥4× usually means a shared subtree "
               "re-executes per branch)" if n > 2 else ""),
        ))
    n_pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
    n_scans = len(scan_lines)
    if n_scans:
        rows.append((
            "scan.pushed_filters", n_pushed, "ok",
            f"{n_pushed} of {n_scans} file scans carry pushed filters",
        ))

    # ---- codegen coverage: wide spans = JVM-side expressions
    n_wsc = len(re.findall(r"WholeStageCodegen \(\d+\)", plan)) or plan.count(
        "*("
    )
    if n_wsc:
        rows.append((
            "codegen.spans", n_wsc, "ok",
            "whole-stage codegen spans — widen by keeping expressions "
            "in pyspark.sql.functions",
        ))

    n_sort = len(re.findall(r"\bSort \[", plan))
    if n_sort:
        rows.append((
            "sort.nodes", n_sort, "ok",
            "each sort is a spill risk at scale; bucketed+sorted "
            "layout elides the SMJ ones",
        ))
    return rows


def explain_scale(df: DataFrame) -> DataFrame:
    """Audit ``df``'s executed physical plan for scale-critical
    properties; returns a small local DataFrame (property, count,
    severity, detail) — see module docstring for the rulebook.  Plan
    compilation runs at call time (no job; nothing is executed)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    rows = _rows(plan) or [
        ("plan.trivial", 0, "ok", "no audited constructs found")
    ]
    return df.sparkSession.createDataFrame(rows, _SCHEMA)
