"""Streaming bi5 source: tail a growing Dukascopy directory tree.

The reference is batch-only (``ReadSupport`` only, DS24:26-27); this
is the natural Structured Streaming extension (SURVEY §2 Tier C "bi5
streaming scan").  Micro-batch model:

* offset = the set of files already processed, tracked as a sorted
  list in the offset JSON (hour files are immutable once written —
  Dukascopy trees are append-only, so set-difference is exact);
* each micro-batch plans one partition per new file (same per-file
  parallelism as the batch source) and reuses the batch codec;
* dirty files follow the same silent-skip contract (A10).

Scale note: the offset carries file paths, so very deep histories
should bound the watch window with the ``start``/``end``/``tickers``
options (shared with the batch reader's pruning).  The per-batch work
is proportional to *new* files only.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceStreamReader, InputPartition

from ..sources.bi5_codec import decode_bi5_file, iter_bi5_files

__all__ = ["Bi5StreamReader"]


@dataclass
class Bi5StreamPartition(InputPartition):
    files: tuple[str, ...]


class Bi5StreamReader(DataSourceStreamReader):
    def __init__(self, options) -> None:
        path = options.get("path")
        if path is None:
            raise ValueError("'path' must be specified for BI5 data.")
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

    # offsets are {"files": [...]} — immutable-file set semantics
    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        return {"files": sorted(iter_bi5_files(self.path))}

    def partitions(self, start: dict, end: dict):
        new_files = sorted(set(end["files"]) - set(start["files"]))
        if not new_files:
            return [Bi5StreamPartition(files=())]
        return [Bi5StreamPartition(files=(f,)) for f in new_files]

    def read(self, partition: Bi5StreamPartition):
        import pyarrow as pa

        arrow_schema = pa.schema(
            [
                pa.field("ticker", pa.string(), nullable=False),
                pa.field("ts", pa.timestamp("us", tz="UTC"), nullable=False),
                pa.field("ask", pa.float64(), nullable=False),
                pa.field("bid", pa.float64(), nullable=False),
                pa.field("ask_volume", pa.float64(), nullable=False),
                pa.field("bid_volume", pa.float64(), nullable=False),
            ]
        )
        for fpath in partition.files:
            cols = decode_bi5_file(fpath, self.digits, self.january)
            if cols is None or len(cols["ts_us"]) == 0:
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(cols["ticker"], type=pa.string()),
                    pa.array(cols["ts_us"], type=pa.timestamp("us", tz="UTC")),
                    pa.array(cols["ask"], type=pa.float64()),
                    pa.array(cols["bid"], type=pa.float64()),
                    pa.array(cols["ask_volume"], type=pa.float64()),
                    pa.array(cols["bid_volume"], type=pa.float64()),
                ],
                schema=arrow_schema,
            )

    def commit(self, end: dict) -> None:
        pass  # offsets are self-contained; nothing to clean up

    def stop(self) -> None:
        pass
