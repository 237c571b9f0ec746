"""Round-13 catalog additions (builder round 9): the ops the r8
verdict asked for.

* ``dedup_band_index_merge`` — persisted band-index maintenance: the
  recurring-crawl loop ``dedup_incremental_delta`` opened, completed.
  The corpus band index is BUILT, MERGED through one crawl cycle
  (retire dropped docs' bands, append new docs' bands, keyed on
  (band, bucket, doc_id)), WRITTEN to parquet, READ BACK, and the new
  increment is deduped probing the STORED index — end-to-end through
  the storage round-trip.  Oracle: the exact shingle-Jaccard SQL over
  increment×live-corpus pairs (the dedup_incremental_delta equality
  discipline) — any corruption in merge logic or the parquet
  round-trip changes the candidate set and breaks the hash.
* ``dedup_media_phash`` — perceptual-hash near-dup dedup over the
  multimodal binary column: 64-bit dHash from the REAL pure-Python
  image decoders (functions/multimodal.py), then the simhash-style
  16-bit banding + hamming verify.  Makes the media column a dedup
  *participant*, not just a feature source.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import t

ROUND13_OPS: dict[str, tuple] = {}


def _q(name: str, sql: str | None, bench: bool = False):
    def wrap(fn):
        ROUND13_OPS[name] = (fn, sql, bench)
        return fn

    return wrap


# --------------------------------- persisted band-index maintenance

# the deterministic crawl-cycle split over documents:
#   initial corpus  doc_id % 10 ∈ {1..8}
#   added docs      doc_id % 10 = 9   (this crawl's keepers)
#   retired ids     initial ∩ (doc_id % 7 = 3)
#   new increment   doc_id % 10 = 0   (probes the maintained index)
# live corpus = (initial \ retired) ∪ added — the SQL twin's x-side.
_BANDIDX_SQL = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
        concat_ws(' ', tk[i], tk[i+1], tk[i+2]) AS shingle
      FROM toks, UNNEST(generate_series(1, len(tk) - 2)) AS u(i)
      WHERE len(tk) >= 3
      UNION
      SELECT doc_id, array_to_string(tk, ' ') AS shingle
      FROM toks WHERE len(tk) < 3
    ), sizes AS (
      SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
    ), losers AS (
      SELECT DISTINCT y.doc_id AS id
      FROM sh x JOIN sh y ON x.shingle = y.shingle
      JOIN sizes sa ON sa.doc_id = x.doc_id
      JOIN sizes sb ON sb.doc_id = y.doc_id
      WHERE ((x.doc_id % 10 NOT IN (0, 9) AND x.doc_id % 7 <> 3)
             OR x.doc_id % 10 = 9)
        AND y.doc_id % 10 = 0
      GROUP BY x.doc_id, y.doc_id, sa.sz, sb.sz
      HAVING CAST(count(*) AS DOUBLE) / (sa.sz + sb.sz - count(*)) >= 0.5
    )
    SELECT doc_id, lang, source FROM documents
    WHERE doc_id % 10 = 0 AND doc_id NOT IN (SELECT id FROM losers)
    ORDER BY doc_id
"""


def _warehouse(sf: str, leaf: str) -> str:
    """Deterministic scratch location inside the repo's gitignored
    spark-warehouse/, anchored on the package path (cwd-independent),
    keyed by the sf dir's basename so scales don't clobber each
    other."""
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    return os.path.join(
        repo,
        "spark-warehouse",
        leaf,
        os.path.basename(os.path.normpath(sf)),
    )


@_q("dedup_band_index_merge", _BANDIDX_SQL)
def dedup_band_index_merge(spark: SparkSession, sf: str) -> DataFrame:
    """One full crawl cycle of PERSISTED band-index maintenance
    (operators/band_index.py): build the initial corpus's minhash
    band index, merge one cycle (retire doc_id%7=3, append the
    doc_id%10=9 adds), write it to parquet, read it back, and dedup
    the doc_id%10=0 increment probing the STORED index — the
    production artifact ``dedup_incremental_delta``'s docstring says
    "at scale is precomputed and stored once per crawl", made real
    through the storage round-trip.  Surviving increment docs are
    returned; a doc is dropped iff a verified word-3-shingle Jaccard
    ≥ 0.5 live-corpus neighbor exists.

    Oracle = the exact increment×live-corpus shingle-index SQL (the
    dedup_incremental_delta equality discipline): merge errors —
    un-retired bands resurrecting a dropped doc as a candidate whose
    text join-back then dangles, missed adds losing a loser, parquet
    round-trip corruption — all shift the verified drop set and break
    the hash.  Stored-vs-inline index EXACT row equality is
    additionally pinned by pytest (tests/test_operators.py).

    Scale shape: the index is ~bands×|C| narrow rows written once per
    crawl; the merge is one anti-join + one append (plus an
    idempotence distinct this entry exercises deliberately); the
    probe is the |Δ|·|C| banded join of minhash_delta_dedup — the
    corpus is never self-paired, and a 1000-crawl history pays ONE
    stored index, not 1000 rebuilds."""
    from ..operators.band_index import (
        merge_band_index,
        minhash_band_index,
        read_band_index,
        write_band_index,
    )
    from ..operators.dedup import minhash_delta_dedup

    docs = t(spark, sf, "documents")
    initial = docs.where("doc_id % 10 NOT IN (0, 9)")
    adds = docs.where("doc_id % 10 = 9")
    retired = initial.where("doc_id % 7 = 3").select("doc_id")
    increment = docs.where("doc_id % 10 = 0")

    idx = minhash_band_index(
        initial, "doc_id", "text", n=3, num_perm=32, bands=16
    )
    merged = merge_band_index(
        idx,
        added=adds,
        retired=retired,
        id_col="doc_id",
        text_col="text",
        n=3,
        num_perm=32,
        bands=16,
    )
    path = _warehouse(sf, "band_index")
    write_band_index(merged, path)
    stored = read_band_index(spark, path)

    live = initial.where("doc_id % 7 <> 3").unionByName(adds)
    kept = minhash_delta_dedup(
        live,
        increment,
        "doc_id",
        "text",
        n=3,
        num_perm=32,
        bands=16,
        threshold=0.5,
        corpus_index=stored,
    )
    return kept.select("doc_id", "lang", "source").orderBy("doc_id")


# ----------------------------------- perceptual-hash multimodal dedup

# bit r*8+c of the dHash compares gray(r,c) > gray(r,c+1) on the 9×8
# grid; pixel index i = r*9+c; gray = (len(token[(i % n_tokens)+1])*7)
# % 128 — exactly what documents_as_ppm_media bakes into the P6
# payload the Spark side DECODES back.  Bit 63 (i=70) is the sign bit
# of the BIGINT: materialized as the signed constant (DuckDB's `<< 63`
# raises on overflow; the signed sum equals the two's-complement
# pattern the kernel emits).
_PHASH_SQL = """
    WITH tk AS (
      SELECT doc_id, string_split(text, ' ') AS tk
      FROM documents WHERE text IS NOT NULL
    ), g AS (
      SELECT doc_id, i, (len(tk[(i % len(tk)) + 1]) * 7) % 128 AS g
      FROM tk, UNNEST(generate_series(0, 71)) u(i)
    ), bits AS (
      SELECT a.doc_id,
        CAST(coalesce(sum(CASE WHEN a.g > b.g THEN
          CASE WHEN (a.i // 9) * 8 + (a.i % 9) = 63
            THEN -9223372036854775807 - 1
            ELSE 1::BIGINT << ((a.i // 9) * 8 + (a.i % 9)) END
          ELSE 0 END), 0) AS BIGINT) AS phash
      FROM g a JOIN g b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      WHERE a.i % 9 < 8
      GROUP BY a.doc_id
    ), chunks AS (
      SELECT doc_id, phash, u.b AS band, (phash >> (u.b * 16)) & 65535 AS chunk
      FROM bits, UNNEST(generate_series(0, 3)) u(b)
    ), losers AS (
      SELECT DISTINCT b.doc_id AS id
      FROM chunks a JOIN chunks b
        ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.phash, b.phash)) <= 3
    )
    SELECT doc_id AS media_id, phash FROM bits
    WHERE doc_id NOT IN (SELECT id FROM losers)
    ORDER BY media_id
"""


@_q("dedup_media_phash", _PHASH_SQL)
def dedup_media_phash(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual-hash near-dup dedup over the multimodal binary
    column: every document becomes a REAL 9×8 P6 image
    (functions/multimodal.documents_as_ppm_media — pixels derived
    from token lengths, so near-dup texts yield near-dup images), the
    payload is DECODED back through the pure-Python decoder stack and
    dHashed in one Arrow mapInPandas kernel (extract_phash →
    dhash64), and near-dups are dropped min-id-survivor style via the
    established simhash machinery: 4×16-bit banding + bit_count(xor)
    hamming verify (operators/dedup.simhash_pairs — pigeonhole makes
    hamming ≤ 3 banding EXACT, no recall luck).  The media column
    becomes a dedup PARTICIPANT, not just a feature source — the
    "dedup × multimodal" cross.

    Oracle = the same dHash recomputed arithmetically from
    string_split token lengths (the decode leg is an identity over
    the raster the synth kernel wrote — any decoder, hash, banding or
    survivor error breaks value equality), with the identical banded
    chunk join.  A planted near-dup pytest additionally pins the
    kernel on images the synthesizer did NOT produce
    (tests/test_operators.py).

    Scale shape: one Arrow pass per payload (decode+hash, no Python
    per-row UDF), then the simhash_pairs shape — identical-hash
    collapse to representatives, 4-chunk bucket join (content-derived
    keys), hamming verify on candidates only; survivors via one
    left_anti.  No all-pairs anywhere; payload bytes never shuffle
    past the hash kernel."""
    from ..functions.multimodal import documents_as_ppm_media, extract_phash
    from ..operators.dedup import simhash_pairs

    docs = t(spark, sf, "documents").where("text IS NOT NULL")
    hashed = extract_phash(documents_as_ppm_media(docs))
    pairs = simhash_pairs(hashed, "media_id", max_hamming=3, hash_col="phash")
    losers = pairs.select(F.col("id_b").alias("media_id")).distinct()
    return (
        hashed.join(losers, "media_id", "left_anti")
        .select("media_id", "phash")
        .orderBy("media_id")
    )
