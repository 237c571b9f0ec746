#!/usr/bin/env python
"""Exact string-op rewrites of text_url_email_stats' two regex counts
(r8 ask #4).

URL  'https?://[^ ]+'  : the greedy [^ ]+ always consumes to the end
of the current space-delimited token and scanning resumes past it, so
every token yields at most one match and yields it iff it contains
'http://' or 'https://' anywhere — count = #tokens containing either
literal.

EMAIL 'L+@D+' with L=[a-zA-Z0-9._%+-], D=[a-zA-Z0-9.-] (D subset L):
left-to-right over the '@'-split parts p_0..p_{n-1}; the @ between
p_{i-1} and p_i matches iff
  first char of p_i in D
  AND p_{i-1} nonempty AND last char of p_{i-1} in L
  AND NOT (previous @ matched AND p_{i-1} entirely D-chars)
(the previous match's greedy D+ consumes the maximal D-prefix of
p_{i-1}; only when that prefix is the WHOLE part does the local-part
candidate disappear — otherwise the un-consumed suffix still ends at
the same last char).  Verified against regexp_count on adversarial
chains below.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")

from bench import SF_DIR, build_spark, synth_scaled_dir, timed  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

_D_CHARS = (
    "abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.-"
)

# char-class tests on a single char via ascii() arithmetic (codegen)
_IS_D = (
    "(({c} >= 97 AND {c} <= 122) OR ({c} >= 65 AND {c} <= 90)"
    " OR ({c} >= 48 AND {c} <= 57) OR {c} = 46 OR {c} = 45)"
)
_IS_L = _IS_D + " OR {c} = 95 OR {c} = 37 OR {c} = 43"

# a token matches iff the FIRST literal occurrence has >=1 char
# after it (the [^ ]+ needs one); later occurrences are even closer
# to the token end, so checking the first suffices.
N_URL = (
    "CASE WHEN instr(text, 'http') > 0 THEN "
    "size(filter(split(text, ' ', -1), t ->"
    " (instr(t, 'http://') > 0 AND instr(t, 'http://') + 7 <= length(t))"
    " OR (instr(t, 'https://') > 0"
    "     AND instr(t, 'https://') + 8 <= length(t))))"
    " ELSE 0 END"
)

_PARTS = (
    "transform(split(text, '@', -1), p -> named_struct("
    f"'sd', {_IS_D.format(c='ascii(substring(p, 1, 1))')},"
    f"'ll', p <> '' AND ({_IS_L.format(c='ascii(right(p, 1))')}),"
    f"'ad', p <> '' AND translate(p, '{_D_CHARS}', '') = ''))"
)

N_MAIL = (
    "CASE WHEN instr(text, '@') > 0 THEN "
    f"aggregate(sequence(1, size(split(text, '@', -1)) - 1),"
    " named_struct('c', CAST(0 AS INT), 'pm', false),"
    " (acc, i) -> (CASE WHEN element_at(ps, i + 1).sd"
    "   AND element_at(ps, i).ll"
    "   AND NOT (acc.pm AND element_at(ps, i).ad)"
    "  THEN named_struct('c', acc.c + 1, 'pm', true)"
    "  ELSE named_struct('c', acc.c, 'pm', false) END),"
    " acc -> acc.c) ELSE 0 END"
)


def main() -> None:
    spark = build_spark()
    spark.conf.set("spark.sql.shuffle.partitions", "128")

    # adversarial correctness: string-op counts == regexp counts
    cases = [
        "a@b@c", "a@bb@c", "a@b.c@d", "a@b c@d", "a@bb_cc@d",
        "x@@y", "@a", "a@", "", "no at signs", "a@b_@c",
        "mail me at foo.bar+baz@ex-ample.org or f%x@y.z thanks",
        "http://x http://y", "zhttp://a b", "http:// nope",
        "http://", "xhttp://", "https://", "http://x", "a http://",
        "https://http://", "http://http://", "w ahttp:// b",
        "see https://a.b/chttp://woven and http://t",
        "a@b@c@d@e", "_@-", "%@.", "a@." , ".@a", "a@-b-@c",
        "http://ahttp://b c", "pre http://u1 mid https://u2 end",
        "u@d1.d2 u2@d3", "a@b__x@c", "t\tx@y",
    ]
    rows = [(i, s) for i, s in enumerate(cases)]
    df = spark.createDataFrame(rows, "id INT, text STRING")
    chk = df.selectExpr(
        "id", "text",
        "regexp_count(text, 'https?://[^ ]+') AS ru",
        f"{N_URL} AS su",
        "regexp_count(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+') AS rm",
        f"replace({N_MAIL}, 'ps', '{_PARTS}')" if False else
        N_MAIL.replace("element_at(ps,", f"element_at({_PARTS},")
        + " AS sm",
    ).collect()
    bad = [r for r in chk if r.ru != r.su or r.rm != r.sm]
    for r in bad:
        print("MISMATCH:", r.text, (r.ru, r.su), (r.rm, r.sm))
    assert not bad, f"{len(bad)} mismatches"
    print("# adversarial cases: all equal", file=sys.stderr)

    # fixture-wide correctness at sf0.1
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_mail_expr = N_MAIL.replace("element_at(ps,", f"element_at({_PARTS},")
    diff = (
        docs.where("text IS NOT NULL")
        .selectExpr(
            "regexp_count(text, 'https?://[^ ]+') AS ru",
            f"{N_URL} AS su",
            "regexp_count(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+') AS rm",
            f"{n_mail_expr} AS sm",
        )
        .where("ru <> su OR rm <> sm")
        .count()
    )
    assert diff == 0, diff
    print("# sf0.1 corpus: all equal", file=sys.stderr)

    # x1000 timing: regex-gated (current) vs string-op
    scaled = synth_scaled_dir(SF_DIR, 1000, ["documents"])
    d = spark.read.parquet(os.path.join(scaled, "documents.parquet")).where(
        "text IS NOT NULL"
    )
    cur = d.selectExpr(
        "source",
        "CASE WHEN instr(text, 'http') > 0 THEN"
        " regexp_count(text, 'https?://[^ ]+') ELSE 0 END AS n_url",
        "CASE WHEN instr(text, '@') > 0 THEN regexp_count(text,"
        " '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+') ELSE 0 END AS n_mail",
    ).groupBy("source").agg(F.sum("n_url"), F.sum("n_mail"), F.count("*"))
    new = d.selectExpr(
        "source", f"{N_URL} AS n_url", f"{n_mail_expr} AS n_mail"
    ).groupBy("source").agg(F.sum("n_url"), F.sum("n_mail"), F.count("*"))
    print("current_regex:", timed(cur, runs=2))
    print("string_ops:", timed(new, runs=2))
    spark.stop()


if __name__ == "__main__":
    main()
