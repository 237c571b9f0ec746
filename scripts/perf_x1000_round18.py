#!/usr/bin/env python
"""r12 x1000 probe (r11 verdict ask #6): the two r11 flagships at the
sf100-equivalent tier.

* ``corpus_build_production`` — x10/x100 pins exist (BENCH_X1000_R16
  narrative: x10 Spark 0.39x ahead; the exact DuckDB twin DNF'd at
  x100, quadratic inverted-shingle self-join); this adds the x1000
  Spark absolute.  DuckDB twin is NOT attempted at x1000 by prior
  evidence — recorded as infeasible, not skipped silently.
* ``layout_cobucketed_docs_emb`` — bucketed entry vs the PLAIN-layout
  twin leg (same audit join over plain parquet) in the same window,
  plus the DuckDB SQL twin: proves the bucketed SMJ advantage GROWS
  with scale (x100 r11: 6.59→4.14 s bucketed-vs-plain on q5's family).

Protocol: fresh JVM per Spark leg (scripts/_r18_leg.py), DuckDB in
the parent immediately after, one-time layout writes happen at plan
build (amortized artifact cost, untimed — the lifecycle is the
write_bucketed entry itself).  Writes BENCH_X1000_R18.json.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CPUS, SF_DIR, synth_scaled_dir  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
RUNNER = os.path.join(HERE, "_r18_leg.py")


def leg(mode: str, scaled: str, runs: int = 2, timeout: int = 5400) -> float:
    cmd = [sys.executable, RUNNER, mode, scaled, str(runs)]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)
    if r.returncode != 0:
        raise RuntimeError(f"{mode} leg failed:\n{r.stderr[-2000:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])["sec"]


def duck_leg(sql: str, scaled: str, tables: list[str], runs: int = 2) -> float:
    import duckdb

    from bench import duck_timed

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={CPUS}")
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS FROM '{scaled}/{t}.parquet'")
    best = duck_timed(con, sql, runs)
    con.close()
    return best


def main() -> None:
    from spark_bi5_datasource_spark import plans

    oracles = plans.oracle_sql()
    out: dict = {
        "protocol": (
            "fresh JVM per Spark leg (_r18_leg.py); DuckDB in parent "
            "immediately after; x1000 = sf100-equivalent stride replicas"
        )
    }
    x1000 = synth_scaled_dir(SF_DIR, 1000, ["documents", "embeddings"])

    # ---- layout flagship: bucketed entry vs plain twin vs DuckDB,
    # one window
    cob = {}
    cob["spark_bucketed"] = leg("entry:layout_cobucketed_docs_emb", x1000)
    cob["spark_plain"] = leg("cobucket_plain", x1000)
    cob["duckdb"] = duck_leg(
        oracles["layout_cobucketed_docs_emb"], x1000,
        ["documents", "embeddings"],
    )
    cob["bucketed_vs_plain"] = round(
        cob["spark_bucketed"] / cob["spark_plain"], 2
    )
    cob["ratio_vs_duckdb"] = round(cob["spark_bucketed"] / cob["duckdb"], 2)
    out["layout_cobucketed_docs_emb@x1000"] = cob
    _dump(out)

    # ---- corpus flagship: Spark absolute; DuckDB twin infeasible
    cbp = {
        "spark": leg("entry:corpus_build_production", x1000),
        "duckdb": "DNF-by-prior-evidence (exact inverted-shingle "
        "self-join is quadratic in the x1000 duplication factor; "
        "exhausted 48 GB spill at x100 — SCALE_NOTES r11)",
    }
    out["corpus_build_production@x1000"] = cbp
    _dump(out)
    print(json.dumps(out, indent=1))


def _dump(out: dict) -> None:
    with open(os.path.join(HERE, "..", "BENCH_X1000_R18.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
