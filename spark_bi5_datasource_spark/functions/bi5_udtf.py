"""`bi5_decode` UDTF — the alternative/fallback scan path over
``spark.read.format("binaryFile")`` (SURVEY §2 "UDF/UDAF/UDTF
surface"; the reference registers no functions at all).

Useful when the tick tree is already being listed by another source
(e.g. a lakehouse table of raw payloads): the same codec runs as a
table function inside SQL::

    register_bi5_udtf(spark)
    files = spark.read.format("binaryFile").load(".../EURUSD")
    spark.sql('''
        SELECT t.* FROM {files} AS f,
        LATERAL bi5_decode(f.path, f.content, 5, 0) AS t
    ''', files=files)

Keeps the silent-skip contract: undecodable payloads yield no rows.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql.functions import udtf

from ..sources.bi5_codec import decode_bi5_bytes, parse_bi5_path

__all__ = ["Bi5DecodeUDTF", "register_bi5_udtf"]

_RETURN_TYPE = (
    "ticker string, ts timestamp, ask double, bid double, "
    "ask_volume double, bid_volume double"
)


class Bi5DecodeUDTF:
    """Decode one (path, payload) pair into tick rows."""

    def eval(self, path: str, content, digits: int, january: int = 0):
        try:
            meta = parse_bi5_path(path, january)
            cols = decode_bi5_bytes(bytes(content), digits, meta.hour_epoch_us)
        except Exception:
            return  # A10 silent-skip contract
        for i in range(len(cols["ts_us"])):
            yield (
                meta.ticker,
                # tz-aware so Spark stores the true instant regardless
                # of the session timezone (naive would be reinterpreted)
                datetime.fromtimestamp(cols["ts_us"][i] / 1_000_000, tz=timezone.utc),
                float(cols["ask"][i]),
                float(cols["bid"][i]),
                float(cols["ask_volume"][i]),
                float(cols["bid_volume"][i]),
            )


def register_bi5_udtf(spark) -> None:
    from .. import ship_package

    ship_package(spark)  # the UDTF class is pickled by module reference
    spark.udtf.register("bi5_decode", udtf(Bi5DecodeUDTF, returnType=_RETURN_TYPE))
