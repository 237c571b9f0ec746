"""bi5 write path — an extension beyond the reference (which is
explicitly read-only: "Only loading is implemented. No writing.",
README.md:17).  Useful for regenerating tick archives from parquet or
synthesizing fixtures at scale.

Layout contract mirrors the reader exactly: one LZMA-alone file per
(ticker, hour) at ``<ticker>/<YYYY>/<mm>/<dd>/<hh>h_ticks.bi5`` with
month written 0-based by default (``january`` option, same semantics
as the reader), records packed big-endian ``'>3I2f'`` with
``price * 10^digits`` as uint32.

Because the bi5 naming scheme has no room for part-files, **all rows
of one (ticker, hour) must land in one task** — use
``write_bi5_tree`` (which repartitions by (ticker, hour) first), or
pre-partition yourself.  Cross-task collisions are detected at commit
time via the tasks' WriterCommitMessages and fail the job rather than
silently truncating data.
"""

from __future__ import annotations

import lzma
import os
import struct
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

__all__ = ["Bi5Writer", "write_bi5_tree"]


@dataclass
class Bi5CommitMessage(WriterCommitMessage):
    files: tuple[str, ...]  # relative file keys written by this task


class Bi5Writer(DataSourceWriter):
    def __init__(self, options) -> None:
        path = options.get("path")
        if path is None:
            raise ValueError("'path' must be specified for BI5 data.")
        digits_raw = options.get("digits")
        if digits_raw is None:
            raise ValueError("'digits' should be the digits for the currency")
        self.digits = int(digits_raw)
        if self.digits < 0:
            raise ValueError("digits cannot be smaller than 0")
        self.january = int(options.get("january", "0"))
        if self.january < 0 or self.january > 1:
            raise ValueError("january can only be 0 or 1")
        self.path = path

    def write(self, iterator) -> Bi5CommitMessage:
        """Group this task's rows by (ticker, hour), encode, write one
        file per group.  Rows: (ticker, ts, ask, bid, ask_volume,
        bid_volume) — the reader's schema."""
        scale = 10**self.digits
        groups: dict[tuple, list[tuple]] = {}
        for row in iterator:
            ts: datetime = row[1]
            # Spark's Python DataSource write path hands TimestampType
            # over as NAIVE datetimes in the executor's system-local
            # timezone (ArrowTableToRowsConversion applies
            # .astimezone().replace(tzinfo=None)).  For a naive value,
            # astimezone() reattaches local time before converting, so
            # one call is correct for both naive and aware inputs;
            # replace(tzinfo=utc) would silently shift every non-UTC
            # host's archive by the local offset.
            ts = ts.astimezone(timezone.utc)
            hour = ts.replace(minute=0, second=0, microsecond=0)
            delta = ts - hour
            # exact integer arithmetic — total_seconds()*1000 loses the
            # last millisecond to float truncation
            ms = delta.seconds * 1000 + delta.microseconds // 1000
            groups.setdefault((row[0], hour), []).append(
                (ms, round(row[2] * scale), round(row[3] * scale), row[4], row[5])
            )
        written = []
        for (ticker, hour), recs in groups.items():
            recs.sort(key=lambda r: r[0])
            month_field = hour.month - 1 + self.january  # inverse of reader
            rel = os.path.join(
                ticker,
                f"{hour.year:04d}",
                f"{month_field:02d}",
                f"{hour.day:02d}",
                f"{hour.hour:02d}h_ticks.bi5",
            )
            full = os.path.join(self.path, rel)
            os.makedirs(os.path.dirname(full), exist_ok=True)
            payload = b"".join(struct.pack(">3I2f", *r) for r in recs)
            with open(full, "wb") as f:
                f.write(lzma.compress(payload, format=lzma.FORMAT_ALONE))
            written.append(rel)
        return Bi5CommitMessage(files=tuple(written))

    def commit(self, messages) -> None:
        seen: set[str] = set()
        dupes: set[str] = set()
        for m in messages:
            for rel in m.files:
                if rel in seen:
                    dupes.add(rel)
                seen.add(rel)
        if dupes:
            raise ValueError(
                "rows for one (ticker, hour) were split across tasks and "
                f"would overwrite each other: {sorted(dupes)[:5]} — "
                "repartition by (ticker, hour) first (see write_bi5_tree)"
            )

    def abort(self, messages) -> None:
        pass  # partial files may remain; bi5 trees are re-writable


def write_bi5_tree(
    df: DataFrame, path: str, digits: int, january: int = 0
) -> None:
    """Write a tick DataFrame (reader schema) as a bi5 tree.

    Repartitions by (ticker, hour) so each hour file is produced by
    exactly one task, then invokes the ``bi5`` writer."""
    from pyspark.sql import functions as F

    (
        df.repartition(F.col("ticker"), F.date_trunc("hour", "ts"))
        .write.format("bi5")
        .option("digits", digits)
        .option("january", january)
        .mode("append")
        .save(path)
    )
