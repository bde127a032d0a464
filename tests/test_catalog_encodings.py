"""Regression test for the events.ts parquet-encoding drift.

The driver regenerates /root/testdata fixtures between rounds and has
already shipped `events.ts` as INT64 TIMESTAMP(NANOS) (round ≤2) and as
TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ (round 3+).
`catalog.normalize_events_ts` must map every plausible encoding to
TimestampType with identical instant values, for both the batch reader
(`catalog.table`) and the streaming reader's projection.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from blockchain2graphdb_spark.catalog import normalize_events_ts, prep, table

from blockchain2graphdb_spark.paths import tmp_root

_TMP = os.path.join(tmp_root(), "enc_test")

# wall-clock instants (UTC); include a sub-second component
_TS = [
    dt.datetime(2024, 1, 1, 0, 0, 0, 123456),
    dt.datetime(2024, 3, 15, 12, 30, 45, 1),
    dt.datetime(2025, 12, 31, 23, 59, 59, 999999),
]

ENCODINGS = {
    # legacy fixture: physical INT64 nanos (Spark reads bigint under
    # spark.sql.legacy.parquet.nanosAsLong)
    "nanos": pa.timestamp("ns"),
    # current fixture: MICROS with isAdjustedToUTC=false → TIMESTAMP_NTZ
    "micros_ntz": pa.timestamp("us"),
    # plausible future: MICROS adjusted-to-UTC → TimestampType directly
    "micros_utc": pa.timestamp("us", tz="UTC"),
}


def _write_events(enc_name: str, ts_type: pa.DataType) -> str:
    d = f"{_TMP}/{enc_name}"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(_TS, pa.timestamp("us")).cast(ts_type),
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["view", "purchase", "error"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "props": pa.array(['{"k": 1}', '{"k": 2}', '{"k": 3}']),
        }
    )
    pq.write_table(tbl, f"{d}/events.parquet")
    return d


@pytest.mark.parametrize("enc", sorted(ENCODINGS))
def test_batch_reader_normalizes_every_encoding(spark, enc):
    prep(spark)
    d = _write_events(enc, ENCODINGS[enc])
    df = table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", f"{enc}: got {dict(df.dtypes)['ts']}"
    got = {r.event_id: r.ts for r in df.select("event_id", "ts").collect()}
    assert got == {i + 1: t for i, t in enumerate(_TS)}, enc


@pytest.mark.parametrize("enc", sorted(ENCODINGS))
def test_streaming_projection_normalizes_every_encoding(spark, enc):
    """The streaming reader applies normalize_events_ts to a DataFrame
    whose ts dtype comes from the raw file schema — exercise the helper
    on exactly those dtypes (bigint / timestamp_ntz / timestamp)."""
    prep(spark)
    d = _write_events(enc, ENCODINGS[enc])
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{d}/events.parquet")
    df = normalize_events_ts(raw)
    assert dict(df.dtypes)["ts"] == "timestamp", enc
    got = {r.event_id: r.ts for r in df.select("event_id", "ts").collect()}
    assert got == {i + 1: t for i, t in enumerate(_TS)}, enc


def test_all_encodings_agree(spark):
    prep(spark)
    vals = {}
    for enc, t in ENCODINGS.items():
        d = _write_events(enc, t)
        vals[enc] = sorted(
            (r.event_id, r.ts) for r in table(spark, d, "events").collect()
        )
    assert vals["nanos"] == vals["micros_ntz"] == vals["micros_utc"]


def test_date_columns_normalize_to_timestamps(spark):
    """Round-proofing for the OTHER temporal drift: if the driver ships
    o_orderdate as parquet DATE instead of TIMESTAMP, catalog.table must
    hand back TimestampType at midnight so oracle outputs and literal
    comparisons keep hashing identically."""
    d = f"{_TMP}/datedrift"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    days = [dt.date(2024, 1, 1), dt.date(2024, 6, 15)]
    tbl = pa.table(
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_custkey": pa.array([10, 20], pa.int64()),
            "o_orderdate": pa.array(days, pa.date32()),
        }
    )
    pq.write_table(tbl, f"{d}/orders.parquet")
    df = table(spark, d, "orders")
    assert dict(df.dtypes)["o_orderdate"] == "timestamp"
    got = sorted(r.o_orderdate for r in df.collect())
    assert got == [dt.datetime(2024, 1, 1), dt.datetime(2024, 6, 15)]


def test_timestamp_columns_pass_through_unchanged(spark):
    """The date normalizer must be a no-op on today's fixtures, which
    read as TIMESTAMP_NTZ (naive micros) — both timestamp flavors
    collect as naive datetimes under the UTC session, so only DATE
    needs rewriting."""
    df = table(spark, "/root/testdata/sf0.001", "orders")
    assert dict(df.dtypes)["o_orderdate"] in ("timestamp", "timestamp_ntz")
