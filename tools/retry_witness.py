"""Task-retry / speculation determinism witness (VERDICT r14 #2).

The engine's oracle story rests on content-hash determinism; on a real
cluster tasks WILL re-execute (retries after lost executors,
speculative duplicates of stragglers). This witness proves the
representative key family reproduces bit-identical results when every
scan task's FIRST attempt is killed and re-executed:

  * `random_walk_sample`  — md5-hash-driven walk trajectories (the
    "randomness" must be content-addressed, not attempt-addressed);
  * `stream_sprt`         — order-sensitive stateful streaming fold
    (micro-batch task retry must not reorder or double-fold);
  * `eigenvector_centrality` — checkpointed iterative float kernel
    (per-round checkpoints must not capture attempt-dependent state);
  * `stream_multi_table_ingest` — multi-table atomic snapshot commit
    (task retry inside the commit batch must stay exactly-once).

Protocol per key: run CLEAN (no injection), canonical-hash the rows;
run again with SPARK_GRAFT_CHAOS=* (catalog._chaos_wrap raises on
TaskContext.attemptNumber()==0 in every fixture-table read) under a
`local[N,2]` master (spark.task.maxFailures=2) with aggressive
speculation enabled; assert (1) the chaos run's hash equals the clean
run's, and (2) the retry accumulator is > 0, i.e. retried attempts
actually produced output — the witness can never pass vacuously.

MUST run in its own process: the master string (retry budget) binds at
JVM start. tests/test_retry_determinism.py subprocesses this module
and asserts on the JSON line it prints.

Usage: python3 tools/retry_witness.py [sf_dir] [key ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# retry budget + speculation MUST be in the environment before the
# session is created (they bind at JVM start)
os.environ.setdefault("SPARK_GRAFT_TASK_MAX_FAILURES", "2")
os.environ.setdefault("SPARK_GRAFT_SPECULATION", "1")
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

DEFAULT_KEYS = [
    "random_walk_sample",
    "stream_sprt",
    "eigenvector_centrality",
    "stream_multi_table_ingest",
]


def canonical_hash(df) -> tuple[str, int]:
    """Order-insensitive value hash of a DataFrame (same spirit as the
    driver's gate: stringify every cell, sort rows, sha256)."""

    def cell(v):
        if v is None:
            return "\x00"
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)

    rows = sorted("\x1f".join(cell(v) for v in r) for r in df.collect())
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest(), len(rows)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    keys = sys.argv[2:] or DEFAULT_KEYS

    from blockchain2graphdb_spark import catalog, registry
    from blockchain2graphdb_spark.session import get_spark

    spark = get_spark("retry-witness")
    assert ",2]" in spark.sparkContext.master, spark.sparkContext.master
    specs = registry.load_all()

    def reset_session_reuse(key: str) -> None:
        """Clear session-scoped memos and content-keyed sink roots so
        BOTH the clean and the chaos run recompute from the fixture
        scans — otherwise the second run reuses checkpointed edges /
        already-committed group logs, the wrap never executes, and the
        non-vacuity guard (rightly) fails the witness."""
        from blockchain2graphdb_spark.operators import centrality, graphops

        graphops._PAIRS_MEMO.clear()
        centrality._SEED_BFS_MEMO.clear()
        if key == "stream_multi_table_ingest":
            import glob
            import shutil

            from blockchain2graphdb_spark.paths import tmp_root

            for p in glob.glob(os.path.join(tmp_root(), "mtgroup_*")):
                shutil.rmtree(p, ignore_errors=True)

    results: dict[str, dict] = {}
    ok = True
    for key in keys:
        os.environ.pop("SPARK_GRAFT_CHAOS", None)
        reset_session_reuse(key)
        clean_hash, clean_rows = canonical_hash(specs[key].builder(spark, sf_dir))

        before = catalog.chaos_retry_count()
        os.environ["SPARK_GRAFT_CHAOS"] = "*"
        reset_session_reuse(key)
        try:
            chaos_hash, chaos_rows = canonical_hash(specs[key].builder(spark, sf_dir))
        finally:
            os.environ.pop("SPARK_GRAFT_CHAOS", None)
        retried = catalog.chaos_retry_count() - before

        row = {
            "clean_rows": clean_rows,
            "chaos_rows": chaos_rows,
            "hash_equal": clean_hash == chaos_hash,
            "retried_tasks": retried,
            "pass": clean_hash == chaos_hash and retried > 0,
        }
        results[key] = row
        ok = ok and row["pass"]
        print(f"# {key}: {row}", file=sys.stderr)

    print(json.dumps({"metric": "retry_witness", "sf_dir": sf_dir,
                      "keys": results, "pass": ok}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
