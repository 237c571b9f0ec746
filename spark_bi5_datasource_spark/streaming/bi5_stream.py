"""Streaming bi5 source: tail a growing Dukascopy directory tree.

The reference is batch-only (``ReadSupport`` only, DS24:26-27); this
is the natural Structured Streaming extension (SURVEY §2 Tier C "bi5
streaming scan").  Micro-batch model:

* offset = the set of files already processed, tracked as a sorted
  list in the offset JSON (hour files are immutable once written —
  Dukascopy trees are append-only, so set-difference is exact);
* each micro-batch plans one partition per new file (same per-file
  parallelism as the batch source) and reuses the batch codec and
  Arrow batch builder;
* dirty files follow the same silent-skip contract (A10);
* the ``tickers``/``start``/``end`` prune options are honored when
  listing, so the watch window is bounded the same way as the batch
  reader's option pruning;
* ``min.age.seconds`` (default 0) excludes files modified more
  recently than the given age from an offset — protection against
  ingesting a file mid-write (a truncated decode would otherwise be
  final, since offsets never revisit a path).

Scale note: the offset carries file paths, so very deep histories
should bound the watch window with ``start``/``end``/``tickers``.
The per-batch work is proportional to *new* files only.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql.datasource import DataSourceStreamReader, InputPartition

from ..sources.bi5_datasource import local_path
from ..sources.bi5_codec import (
    decode_bi5_file,
    iter_bi5_files,
    parse_bi5_path,
    ticks_record_batch,
)

__all__ = ["Bi5StreamReader", "stream_bi5_writer"]

HOUR_US = 3_600_000_000


def _iso_to_us(value: str) -> int:
    dt = datetime.fromisoformat(value)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1_000_000)


@dataclass
class Bi5StreamPartition(InputPartition):
    files: tuple[str, ...]


class Bi5StreamReader(DataSourceStreamReader):
    def __init__(self, options) -> None:
        path = options.get("path")
        if path is None:
            raise ValueError("'path' must be specified for BI5 data.")
        path = local_path(path)
        if not os.path.exists(path):
            raise ValueError("Invalid path")
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
        self.tickers = {
            t.strip() for t in options.get("tickers", "").split(",") if t.strip()
        } or None
        self.start_us = _iso_to_us(options["start"]) if options.get("start") else None
        self.end_us = _iso_to_us(options["end"]) if options.get("end") else None
        self.min_age_s = float(options.get("min.age.seconds", "0"))

    def _keep(self, fpath: str) -> bool:
        if self.min_age_s > 0:
            try:
                if time.time() - os.path.getmtime(fpath) < self.min_age_s:
                    return False  # possibly still being written
            except OSError:
                return False
        try:
            meta = parse_bi5_path(fpath, self.january)
        except ValueError:
            return True  # let executor-side silent-skip decide
        if self.tickers is not None and meta.ticker not in self.tickers:
            return False
        if self.start_us is not None and meta.hour_epoch_us + HOUR_US <= self.start_us:
            return False
        if self.end_us is not None and meta.hour_epoch_us > self.end_us:
            return False
        return True

    # offsets are {"files": [...]} — immutable-file set semantics
    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        return {"files": sorted(f for f in iter_bi5_files(self.path) if self._keep(f))}

    def partitions(self, start: dict, end: dict):
        new_files = sorted(set(end["files"]) - set(start["files"]))
        if not new_files:
            return [Bi5StreamPartition(files=())]
        return [Bi5StreamPartition(files=(f,)) for f in new_files]

    def read(self, partition: Bi5StreamPartition):
        for fpath in partition.files:
            cols = decode_bi5_file(fpath, self.digits, self.january)
            if cols is None or len(cols["ts_us"]) == 0:
                continue
            yield ticks_record_batch(cols)

    def commit(self, end: dict) -> None:
        pass  # offsets are self-contained; nothing to clean up

    def stop(self) -> None:
        pass


def stream_bi5_writer(stream_df, path: str, digits: int, january: int = 0):
    """foreachBatch sink writing each micro-batch into a bi5 tree —
    the ingestion loop closed: a tick stream lands in the same
    hour-file layout the batch scanner (and the reference) reads.

    Each batch routes through ``write_bi5_tree`` (one task per
    (ticker, hour) file).  Delivery is at-least-once per Structured
    Streaming's foreachBatch contract; the bi5 writer's commit-time
    collision detection turns a replayed batch that would re-emit an
    existing hour file into a loud failure instead of silent
    duplication, so batches aligned to hour boundaries are
    effectively idempotent.  Returns the DataStreamWriter (caller
    picks trigger/checkpoint and starts it).
    """
    from ..sources.bi5_writer import write_bi5_tree

    def apply(batch_df, _batch_id: int) -> None:
        if not batch_df.isEmpty():
            write_bi5_tree(batch_df, path, digits, january)

    return stream_df.writeStream.foreachBatch(apply)
