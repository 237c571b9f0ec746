"""Unit tests for the Spark-free bi5 codec — timestamp semantics
(month-0, january option, lenient rollover, UTC), decode scaling,
and the silent-skip error policy (SURVEY §1.3, §7 hard-parts)."""

from __future__ import annotations

import lzma
import struct
from datetime import datetime, timezone

import numpy as np
import pytest

from spark_bi5_datasource_spark.sources.bi5_codec import (
    decode_bi5_bytes,
    decode_bi5_file,
    hour_epoch_micros,
    iter_bi5_files,
    parse_bi5_path,
)


def us(y, mo, d, h=0, mi=0, s=0, micro=0):
    return int(
        datetime(y, mo, d, h, mi, s, micro, tzinfo=timezone.utc).timestamp() * 1_000_000
    )


class TestPathParsing:
    def test_month0_default(self):
        # Dukascopy convention: path month 11 == December (README.md:23).
        meta = parse_bi5_path("/x/EURUSD/2019/11/31/15h_ticks.bi5")
        assert meta.ticker == "EURUSD"
        assert meta.hour_epoch_us == us(2019, 12, 31, 15)

    def test_january_1_based(self):
        meta = parse_bi5_path("/x/USDJPY/2020/12/01/23h_ticks.bi5", january=1)
        assert meta.hour_epoch_us == us(2020, 12, 1, 23)

    def test_month0_april(self):
        meta = parse_bi5_path("/x/EURUSD/2020/03/03/00h_ticks.bi5")
        assert meta.hour_epoch_us == us(2020, 4, 3, 0)

    def test_lenient_day_rollover(self):
        # month-0 "1" = February; Feb 30 rolls into March (Calendar leniency).
        meta = parse_bi5_path("/x/EURUSD/2019/1/30/00h_ticks.bi5")
        assert meta.hour_epoch_us == us(2019, 3, 2, 0)

    def test_lenient_month_overflow_january1(self):
        # january=1 with path month 0 → calendar month -1 → Dec of prior year.
        meta = parse_bi5_path("/x/EURUSD/2019/0/5/00h_ticks.bi5", january=1)
        assert meta.hour_epoch_us == us(2018, 12, 5, 0)

    def test_windows_backslashes(self):
        meta = parse_bi5_path(r"C:\data\EURUSD\2019\11\31\15h_ticks.bi5")
        assert meta.ticker == "EURUSD"

    def test_bad_path_raises(self):
        with pytest.raises(ValueError, match="Invalid path provided"):
            parse_bi5_path("/x/EURUSD/notadate/15h_ticks.bi5")

    def test_leap_day(self):
        meta = parse_bi5_path("/x/EURUSD/2020/1/29/12h_ticks.bi5")
        assert meta.hour_epoch_us == us(2020, 2, 29, 12)


class TestHourEpoch:
    def test_plain(self):
        assert hour_epoch_micros(2020, 0, 1, 0) == us(2020, 1, 1)

    def test_negative_month_carries(self):
        assert hour_epoch_micros(2020, -1, 1, 0) == us(2019, 12, 1)

    def test_month_12_carries(self):
        assert hour_epoch_micros(2020, 12, 1, 0) == us(2021, 1, 1)

    def test_day_zero(self):
        # Calendar leniency: day 0 = last day of previous month.
        assert hour_epoch_micros(2020, 2, 0, 0) == us(2020, 2, 29)

    def test_hour_rollover(self):
        assert hour_epoch_micros(2020, 0, 1, 25) == us(2020, 1, 2, 1)


def pack(records):
    return b"".join(struct.pack(">3I2f", *r) for r in records)


class TestDecode:
    def test_golden_scaling(self):
        raw = lzma.compress(pack([(90, 112207, 112198, 1.5, 2.25)]), format=lzma.FORMAT_ALONE)
        cols = decode_bi5_bytes(raw, 5, us(2019, 12, 31, 15))
        assert cols["ts_us"][0] == us(2019, 12, 31, 15, 0, 0, 90_000)
        assert cols["ask"][0] == 1.12207
        assert cols["bid"][0] == 1.12198
        assert cols["ask_volume"][0] == 1.5
        assert cols["bid_volume"][0] == 2.25

    def test_float32_widening_artifact(self):
        # 0.19f widens to 0.1899999976158142 (T:115 golden).
        raw = lzma.compress(pack([(0, 1, 1, 0.75, 0.19)]), format=lzma.FORMAT_ALONE)
        cols = decode_bi5_bytes(raw, 0, 0)
        assert cols["bid_volume"][0] == 0.1899999976158142

    def test_digits_zero(self):
        raw = lzma.compress(pack([(0, 108705, 108677, 1.0, 1.0)]), format=lzma.FORMAT_ALONE)
        cols = decode_bi5_bytes(raw, 0, 0)
        assert cols["ask"][0] == 108705.0

    def test_truncated_trailing_record_dropped(self):
        payload = pack([(0, 1, 2, 3.0, 4.0), (1, 5, 6, 7.0, 8.0)]) + b"\x00\x01\x02"
        raw = lzma.compress(payload, format=lzma.FORMAT_ALONE)
        cols = decode_bi5_bytes(raw, 0, 0)
        assert len(cols["ts_us"]) == 2

    def test_corrupt_payload_empty(self):
        cols = decode_bi5_bytes(b"I poured root beer into a square glass.", 5, 0)
        assert len(cols["ts_us"]) == 0

    def test_empty_payload(self):
        cols = decode_bi5_bytes(b"", 5, 0)
        assert len(cols["ts_us"]) == 0

    def test_big_endian(self):
        # 0x00000001 big-endian == 1, catches byte-order regressions.
        raw = lzma.compress(pack([(1, 1, 1, 1.0, 1.0)]), format=lzma.FORMAT_ALONE)
        cols = decode_bi5_bytes(raw, 0, 0)
        assert cols["ts_us"][0] == 1000
        np.testing.assert_allclose(cols["ask"], [1.0])


class TestFileAndWalk:
    def test_decode_missing_file_skipped(self):
        assert decode_bi5_file("/nonexistent/EURUSD/2019/11/31/15h_ticks.bi5", 5) is None

    def test_decode_badly_named_file_skipped(self, tmp_path):
        p = tmp_path / "random.bi5"
        p.write_bytes(b"x")
        assert decode_bi5_file(str(p), 5) is None

    def test_walk_case_insensitive_suffix(self, tmp_path):
        (tmp_path / "a").mkdir()
        (tmp_path / "a" / "1h_ticks.BI5").write_bytes(b"")
        (tmp_path / "a" / "skip.txt").write_bytes(b"")
        files = list(iter_bi5_files(str(tmp_path)))
        assert len(files) == 1 and files[0].endswith(".BI5")

    def test_walk_follows_symlinks(self, tmp_path):
        real = tmp_path / "real"
        real.mkdir()
        (real / "0h_ticks.bi5").write_bytes(b"")
        (tmp_path / "tree").mkdir()
        (tmp_path / "tree" / "link").symlink_to(real)
        files = list(iter_bi5_files(str(tmp_path / "tree")))
        assert len(files) == 1

    def test_single_file_root(self, tmp_path):
        p = tmp_path / "0h_ticks.bi5"
        p.write_bytes(b"")
        assert list(iter_bi5_files(str(p))) == [str(p)]
        assert list(iter_bi5_files(str(tmp_path / "other.txt"))) == []
