"""Memory-envelope witness (VERDICT r14 #5): run the heaviest keys at
sf0.1 under a deliberately SMALL heap to force the spill paths the
128 GiB sandbox never exercises, and assert they still produce rows.

A plan that only works because everything fits in memory is the
classic 100x failure mode: a build side that silently explodes, a
sort that assumes in-core, an aggregation hash map that never spills.
local[8] with a 2 GiB heap at sf0.1 (~600k-row facts, 6 GiB+ of
intermediate state across the iterative keys) makes Spark's
UnsafeExternalSorter / ShuffleExternalSorter spill machinery do real
work; per-key memory/disk spill bytes are read from the
AppStatusStore stage metrics and recorded so the artifact shows the
spills actually happened (a green run with zero spills at this heap
would mean the envelope wasn't tight enough to prove anything).

MUST run in its own process (heap size binds at JVM start):
    python3 tools/memory_envelope.py [--out MEMENV_r15.md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# heap + parallelism pinned BEFORE the session import chain
os.environ["SPARK_DRIVER_MEMORY"] = os.environ.get("SPARK_GRAFT_ENV_HEAP", "2g")
os.environ["SPARK_GRAFT_CPUS"] = os.environ.get("SPARK_GRAFT_ENV_CPUS", "8")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The 10 heaviest keys by the r14 quiet-bench ranking (VERDICT r14
# "Design-for-scale audit" list + the next bench entries).
HEAVY10 = [
    "eigenvector_centrality",
    "edge_betweenness_approx",
    "label_propagation",
    "wallet_components",
    "dedup_minhash",
    "topo_order",
    "item_cf_recommend",
    "ktruss_edges",
    "ann_recall_curve",
    "text_tfidf",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--keys", nargs="*", default=None)
    args = ap.parse_args()

    from blockchain2graphdb_spark import registry
    from blockchain2graphdb_spark.session import get_spark

    spark = get_spark("memory-envelope")
    heap = spark.sparkContext.getConf().get("spark.driver.memory")
    sys.path.insert(0, os.path.join(_REPO, "tools"))
    from bench_slope import _ShuffleMeter  # seen-stage tracking

    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    meter = _ShuffleMeter(spark)

    def spill_delta(seen_before: set) -> tuple[int, int]:
        mem = disk = 0
        for s in meter._stages():
            key = (s.stageId(), s.attemptId())
            if key in seen_before:
                continue
            mem += s.memoryBytesSpilled()
            disk += s.diskBytesSpilled()
        return mem, disk

    specs = registry.load_all()
    results: dict[str, dict] = {}
    ok = True
    for key in args.keys or HEAVY10:
        seen = set(meter._seen)
        meter.snapshot()
        seen = set(meter._seen)
        t0 = time.time()
        try:
            n = specs[key].builder(spark, SF_DIR).count()
            err = None
        except Exception as e:  # noqa: BLE001 — the failure IS the finding
            n, err = None, f"{type(e).__name__}: {e}"
        dt = round(time.time() - t0, 1)
        meter.snapshot()
        mem, disk = spill_delta(seen)
        row = {
            "rows": n,
            "seconds": dt,
            "spill_mem_mb": round(mem / 1e6, 1),
            "spill_disk_mb": round(disk / 1e6, 1),
            "error": err,
        }
        results[key] = row
        ok = ok and err is None
        print(f"# {key}: {row}", file=sys.stderr)

    line = {
        "metric": "memory_envelope",
        "heap": heap,
        "cpus": os.environ["SPARK_GRAFT_CPUS"],
        "sf_dir": SF_DIR,
        "keys": results,
        "pass": ok,
    }
    print(json.dumps(line))
    if args.out:
        rows = [
            "# Memory-envelope witness — " + os.path.basename(args.out).replace(".md", ""),
            "",
            f"Heaviest keys at `{SF_DIR}` under `local[{os.environ['SPARK_GRAFT_CPUS']}]`"
            f" with a **{heap} heap** (the 128 GiB sandbox forgives build-side",
            "explosions; this envelope doesn't). Spill bytes from AppStatusStore",
            "stage metrics prove the spill paths actually ran.",
            "",
            "| key | rows | seconds | spill mem MB | spill disk MB | error |",
            "|---|---|---|---|---|---|",
        ]
        for k, r in results.items():
            rows.append(
                f"| {k} | {r['rows']} | {r['seconds']} | {r['spill_mem_mb']} "
                f"| {r['spill_disk_mb']} | {r['error'] or ''} |"
            )
        rows.append("")
        with open(args.out, "w") as fh:
            fh.write("\n".join(rows))
        print(f"# wrote {args.out}", file=sys.stderr)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
