"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2 Streaming tier: "applyInPandasWithState for custom stateful
operators").

``running_stats`` is the canonical shape: per-key state (count, sum,
last value) persisted in the state store across micro-batches, updated
with Arrow-batched pandas, emitted in ``update`` mode.  The same
skeleton carries any accumulator the built-in windowed aggregates
can't express (EWMA price trackers, per-ticker book state, cross-batch
session attribution).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["running_stats", "RUNNING_STATS_SCHEMA"]

RUNNING_STATS_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("n_total", LongType(), False),
        StructField("value_sum", DoubleType(), False),
        StructField("ewma", DoubleType(), True),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", DoubleType()),
        StructField("ewma", DoubleType()),
    ]
)


def running_stats(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    alpha: float = 0.2,
    ts_col: str = "ts",
) -> DataFrame:
    """Cross-batch running count/sum/EWMA per key.

    State lives in the streaming state store (checkpointed, recovered
    on restart); each micro-batch folds its Arrow batches into the
    accumulator and emits the updated row — the custom-operator
    pattern for aggregations with order-dependent state (EWMA) that
    ``groupBy().agg()`` cannot express on a stream.

    The EWMA fold is order-dependent, and Arrow batches arrive in
    partition order, which is not stable across retries or different
    partitionings — so each micro-batch's rows are concatenated and
    sorted by (event time, value) before folding.  Ties on both sort
    keys are order-insensitive for the fold, making the result
    deterministic per micro-batch content.
    """
    for col in (key_col, value_col, ts_col):
        if col not in events.columns:
            raise ValueError(
                f"running_stats: column {col!r} not in stream schema "
                f"{events.columns} (ts_col is required to order the "
                "EWMA fold deterministically)"
            )

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, s, ewma = state.get
        else:
            n, s, ewma = 0, 0.0, None
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            rows = pd.concat(chunks, ignore_index=True).sort_values(
                [ts_col, value_col], kind="mergesort"
            )
            vals = rows[value_col].astype(float)
            n += len(vals)
            s += float(vals.sum())
            for v in vals:
                ewma = float(v) if ewma is None else alpha * float(v) + (1 - alpha) * ewma
        state.update((n, s, ewma))
        yield pd.DataFrame(
            {"key": [key[0]], "n_total": [n], "value_sum": [s], "ewma": [ewma]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
