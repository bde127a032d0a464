"""SnapshotStore: versioned commits, time travel, metadata-only restore,
partition-scoped overwrite (the M5 reorg path), vacuum.

Mirrors the invariant family of tests/test_chain_invariants.py:
reorg-via-overwrite_partitions must equal rebuild-from-truncated-input.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from blockchain2graphdb_spark.catalog import table
from blockchain2graphdb_spark.sources.snapshots import SnapshotStore


@pytest.fixture()
def store(tmp_path):
    return SnapshotStore(str(tmp_path / "tbl"))


def _orders(spark, sf_dir):
    return table(spark, sf_dir, "orders")


def _count_sum(df):
    row = df.agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_orderkey").cast("long")).alias("s"),
    ).collect()[0]
    return row["n"], row["s"]


def test_write_read_roundtrip(spark, sf_dir, store):
    df = _orders(spark, sf_dir)
    v = store.write(df)
    assert v == 1
    assert _count_sum(store.read(spark)) == _count_sum(df)


def test_time_travel_pins_old_snapshot(spark, sf_dir, store):
    df = _orders(spark, sf_dir)
    early = df.filter(F.col("o_orderstatus") == "F")
    store.write(early)
    store.write(df)
    assert _count_sum(store.read(spark, version=1)) == _count_sum(early)
    assert _count_sum(store.read(spark)) == _count_sum(df)


def test_append_accumulates(spark, sf_dir, store):
    df = _orders(spark, sf_dir)
    a = df.filter(F.col("o_orderkey") % 2 == 0)
    b = df.filter(F.col("o_orderkey") % 2 == 1)
    store.write(a)
    v = store.append(b)
    assert v == 2
    assert _count_sum(store.read(spark)) == _count_sum(df)


def test_restore_is_metadata_only(spark, sf_dir, store):
    df = _orders(spark, sf_dir)
    early = df.filter(F.col("o_orderstatus") == "F")
    store.write(early)
    store.write(df)
    n_files_before = len(
        [n for _, _, ns in os.walk(f"{store.root}/data") for n in ns]
    )
    v = store.restore(1)
    n_files_after = len(
        [n for _, _, ns in os.walk(f"{store.root}/data") for n in ns]
    )
    assert v == 3
    assert n_files_after == n_files_before  # no data movement
    assert _count_sum(store.read(spark)) == _count_sum(early)
    # history records the op
    assert store.history()[-1]["op"] == "restore(1)"


def test_overwrite_partitions_reorg_equals_truncation(spark, sf_dir, store):
    """ingest + reorg-overwrite ≡ direct build from the union — the M5
    invariant, at the storage layer."""
    df = _orders(spark, sf_dir).withColumn(
        "bucket", (F.col("o_orderkey") % 4).cast("int")
    )
    store.write(df, partition_col="bucket")
    # "fork" away buckets 2 and 3, replacing them with a filtered branch
    new_branch = df.filter(F.col("bucket").isin(2, 3)).filter(
        F.col("o_orderstatus") != "F"
    )
    store.overwrite_partitions(new_branch, values=[2, 3])
    expect = df.filter(F.col("bucket").isin(0, 1)).unionByName(new_branch)
    got = store.read(spark)
    assert _count_sum(got) == _count_sum(expect)
    # partition column survives the round-trip with a usable type
    assert dict(got.dtypes)["bucket"] == "int"


def test_overwrite_requires_partitioned_table(spark, sf_dir, store):
    store.write(_orders(spark, sf_dir))
    with pytest.raises(ValueError, match="partitioned"):
        store.overwrite_partitions(_orders(spark, sf_dir), values=[1])


def test_append_layout_must_match(spark, sf_dir, store):
    df = _orders(spark, sf_dir).withColumn(
        "bucket", (F.col("o_orderkey") % 4).cast("int")
    )
    store.write(df, partition_col="bucket")
    v = store.append(df.filter(F.col("bucket") == 0))  # inherits layout
    assert store.partition_col(v) == "bucket"


def test_vacuum_drops_only_unreferenced(spark, sf_dir, store):
    df = _orders(spark, sf_dir)
    store.write(df.filter(F.col("o_orderstatus") == "F"))
    store.write(df)  # v1 files still referenced by v1's manifest
    assert store.vacuum() == []  # every file is referenced by some manifest
    # simulate manifest expiry by rewriting v1's manifest to empty
    import json

    m = store._manifest(1)
    m["files"] = []
    with open(f"{store.root}/_manifests/v00000001.json", "w") as f:
        json.dump(m, f)
    dead = store.vacuum()
    assert dead  # v1-only files now collected
    # latest still reads fine
    assert store.read(spark).count() == df.count()


def test_partition_pruning_reaches_scan(spark, sf_dir, store):
    """The retained col=value layout must let Catalyst prune partitions:
    a bucket filter should cut the scanned file set, not just filter rows."""
    df = _orders(spark, sf_dir).withColumn(
        "bucket", (F.col("o_orderkey") % 4).cast("int")
    )
    store.write(df, partition_col="bucket")
    plan = (
        store.read(spark)
        .filter(F.col("bucket") == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(bucket" in plan, plan


def test_diff_change_data_feed(spark, sf_dir, store):
    df = _orders(spark, sf_dir).withColumn(
        "bucket", (F.col("o_orderkey") % 4).cast("int")
    )
    store.write(df, partition_col="bucket")
    branch = df.filter(F.col("bucket").isin(2, 3)).filter(
        F.col("o_orderstatus") != "F"
    )
    store.overwrite_partitions(branch, values=[2, 3])

    cdf = store.diff(spark, 1, 2)
    ins = cdf.where(F.col("_change") == "insert").drop("_change")
    dele = cdf.where(F.col("_change") == "delete").drop("_change")
    # net effect: deletes - inserts == rows removed by the reorg
    removed = df.filter(F.col("bucket").isin(2, 3)).filter(
        F.col("o_orderstatus") == "F"
    )
    assert dele.exceptAll(ins).count() == removed.count()
    assert ins.exceptAll(dele).count() == 0  # no new rows, only survivors
    # buckets 0/1 never appear in the feed (file-level pruning)
    assert cdf.where(F.col("bucket").isin(0, 1)).count() == 0


def test_diff_identical_versions_is_empty(spark, sf_dir, store):
    store.write(_orders(spark, sf_dir))
    store.restore(1)
    assert store.diff(spark, 1, 2).count() == 0


def test_compact_reduces_files_preserves_rows(spark, sf_dir, store):
    df = _orders(spark, sf_dir)
    # many tiny commits => many files
    for k in range(5):
        part = df.filter(F.col("o_orderkey") % 5 == k)
        (store.write if k == 0 else store.append)(part)
    n_before = len(store.files())
    store.compact(spark, target_files=2)
    assert len(store.files()) <= 2 < n_before
    assert _count_sum(store.read(spark)) == _count_sum(df)
    # pre-compaction versions still read (files not vacuumed yet)
    assert store.read(spark, version=5).count() == df.count()
    dead = store.vacuum()  # nothing dead: old manifests still reference
    assert dead == []


def test_compact_rewrites_only_fragmented_partitions(spark, sf_dir, store):
    """Partitioned compaction is incremental: a partition already at or
    under the file target keeps its exact files (metadata-only carry);
    only fragmented partitions are read and rewritten."""
    df = _orders(spark, sf_dir).withColumn(
        "bucket", (F.col("o_orderkey") % 2).cast("int")
    )
    store.write(df.filter(F.col("bucket") == 0).coalesce(1), partition_col="bucket")
    # fragment ONLY bucket 1 with many tiny appends
    for k in range(5):
        store.append(
            df.filter((F.col("bucket") == 1) & (F.col("o_orderkey") % 5 == k)).coalesce(1)
        )
    before = {f for f in store.files() if "bucket=0" in f}
    frag_before = sum(1 for f in store.files() if "bucket=1" in f)
    assert frag_before == 5
    store.compact(spark, target_files=2)
    after = {f for f in store.files() if "bucket=0" in f}
    assert after == before  # untouched partition carried verbatim
    assert sum(1 for f in store.files() if "bucket=1" in f) <= 2
    assert _count_sum(store.read(spark)) == _count_sum(df)
    # compacting an already-tidy table is a no-op, not an empty commit
    v = store.latest_version()
    assert store.compact(spark, target_files=5) == v
    assert store.latest_version() == v


def test_schema_evolution_on_append(spark, sf_dir, store):
    df = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    store.write(df.filter(F.col("o_orderkey") % 2 == 0))
    evolved = df.filter(F.col("o_orderkey") % 2 == 1).withColumn(
        "flag", F.lit("new")
    )
    store.append(evolved)
    got = store.read(spark)
    assert set(got.columns) == {"o_orderkey", "o_totalprice", "flag"}
    assert got.where(F.col("flag").isNull()).count() == df.where(
        F.col("o_orderkey") % 2 == 0
    ).count()


def test_empty_commit_reads_back_with_schema(spark, sf_dir, store):
    """A committed-but-empty version (first micro-batch with one empty
    table) must read as an empty frame with the manifest's schema, and
    later appends must work — not raise 'empty table'."""
    df = _orders(spark, sf_dir)
    store.write(df.limit(0), partition_col="o_orderstatus")
    got = store.read(spark)
    assert got.count() == 0
    assert sorted(got.columns) == sorted(df.columns)
    store.append(df.filter(F.col("o_orderkey") % 2 == 0))
    assert store.read(spark).count() == df.filter(F.col("o_orderkey") % 2 == 0).count()


def test_overwrite_rejects_rows_in_retained_partitions(spark, sf_dir, store):
    """replaceWhere validation: a df row landing in a partition whose
    files are KEPT would silently duplicate — the commit must refuse.
    Rows in brand-new partitions (reorg branch past the old tip) are
    legitimate and must still commit."""
    df = _orders(spark, sf_dir).withColumn(
        "bucket", (F.col("o_orderkey") % 4).cast("int")
    )
    store.write(df, partition_col="bucket")
    v = store.latest_version()
    with pytest.raises(ValueError, match="retained partitions"):
        store.overwrite_partitions(df.filter(F.col("bucket").isin(1, 2)), values=[2])
    assert store.latest_version() == v  # refused commit left no version
    # new partition value (9) beyond the existing layout is allowed
    branch = df.filter(F.col("bucket") == 2).withColumn("bucket", F.lit(9).cast("int"))
    store.overwrite_partitions(branch, values=[2])
    got = store.read(spark)
    assert got.where(F.col("bucket") == 2).count() == 0
    assert got.where(F.col("bucket") == 9).count() == branch.count()


def test_diff_across_schema_evolution(spark, sf_dir, store):
    """CDF over a span that includes a schema-evolving append must align
    the two sides (mergeSchema + null-fill) instead of throwing on
    exceptAll schema mismatch."""
    df = _orders(spark, sf_dir).withColumn(
        "bucket", (F.col("o_orderkey") % 4).cast("int")
    )
    store.write(df, partition_col="bucket")                       # v1
    extra = df.filter(F.col("bucket") == 0).withColumn("note", F.lit("x"))
    store.append(extra)                                           # v2: +note
    replacement = (
        df.filter(F.col("bucket") == 1)
        .filter(F.col("o_orderstatus") != "F")
        .withColumn("o_orderpriority", F.lit("X-REORGED"))
    )
    store.overwrite_partitions(replacement, values=[1])           # v3
    changes = store.diff(spark, 1)  # old side lacks `note` entirely
    kinds = dict(
        changes.groupBy("_change").count().collect()
    )
    assert kinds.get("insert", 0) == extra.count() + replacement.count()
    assert kinds.get("delete", 0) == df.filter(F.col("bucket") == 1).count()


def test_concurrent_appends_both_land(spark, sf_dir, store):
    """Multi-writer CAS: two writers appending concurrently must BOTH
    commit (the loser retries at the next version carrying the winner's
    files forward) — no lost update, gapless version sequence."""
    import threading

    df = _orders(spark, sf_dir)
    store.write(df.filter(F.col("o_orderkey") % 3 == 0))
    parts = [
        df.filter(F.col("o_orderkey") % 3 == 1),
        df.filter(F.col("o_orderkey") % 3 == 2),
    ]
    errs = []

    def run(piece):
        try:
            store.append(piece)
        except Exception as e:  # surface thread failures in the assert
            errs.append(e)

    threads = [threading.Thread(target=run, args=(p,)) for p in parts]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert store.latest_version() == 3
    assert _count_sum(store.read(spark)) == _count_sum(df)
    # every version is readable (no torn manifests)
    for v in (1, 2, 3):
        store.read(spark, version=v).count()


def test_concurrent_version_claim_is_exclusive(store, spark, sf_dir):
    """The CAS primitive itself: many racing claims for the same version
    slot — exactly one wins per version, and the log stays gapless."""
    import threading

    df = _orders(spark, sf_dir).limit(10)
    store.write(df)
    n = 6
    barrier = threading.Barrier(n)
    results = []

    def run(i):
        barrier.wait()  # maximize contention on the same base version
        results.append(store.restore(1))

    threads = [threading.Thread(target=run, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(results) == list(range(2, 2 + n))  # all landed, no dup/gap


@pytest.mark.slow  # >9s measured r13; full lane still runs it
def test_randomized_op_sequences_match_model(spark, tmp_path):
    """Model-based check: random write/append/overwrite/restore
    sequences must always read back exactly what an in-memory model
    predicts — for the latest version AND every historical version."""
    import random

    rng = random.Random(4)
    rows = [(i, i % 4, f"v{i}") for i in range(400)]  # (id, bucket, payload)

    def df_of(subset):
        return spark.createDataFrame(subset, "id long, bucket int, payload string")

    for trial in range(3):
        store = SnapshotStore(str(tmp_path / f"m{trial}"))
        history = []  # model state per version (list of row tuples)
        state = []
        # v1 is always a partitioned write
        first = rng.sample(rows, 120)
        store.write(df_of(first), partition_col="bucket")
        state = list(first)
        history.append(list(state))
        for _ in range(6):
            op = rng.choice(["append", "overwrite", "restore"])
            if op == "append":
                batch = rng.sample(rows, 40)
                store.append(df_of(batch))
                state = state + batch
            elif op == "overwrite":
                vals = rng.sample([0, 1, 2, 3], rng.randint(1, 2))
                repl = [r for r in rng.sample(rows, 60) if r[1] in vals]
                store.overwrite_partitions(df_of(repl), values=vals)
                state = [r for r in state if r[1] not in vals] + repl
            else:
                v = rng.randint(1, len(history))
                store.restore(v)
                state = list(history[v - 1])
            history.append(list(state))

        for v, expected in enumerate(history, start=1):
            got = sorted(
                (r["id"], r["bucket"], r["payload"])
                for r in store.read(spark, version=v).collect()
            )
            assert got == sorted(expected), f"trial {trial} version {v}"


# --- TableGroup: snapshot-consistent multi-table transactions (r11) ---


@pytest.fixture()
def group(tmp_path):
    from blockchain2graphdb_spark.sources.snapshots import TableGroup

    return TableGroup(str(tmp_path / "group"))


def _rows(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x long")


def test_group_commit_is_cross_table_consistent(spark, group):
    g1 = group.commit({"blocks": _rows(spark, [1]), "txs": _rows(spark, [10, 11])})
    g2 = group.commit({"blocks": _rows(spark, [2]), "txs": _rows(spark, [20])})
    assert (g1, g2) == (1, 2)
    # group time travel pins BOTH tables at once
    assert sorted(r["x"] for r in group.read(spark, "blocks", group=1).collect()) == [1]
    assert sorted(r["x"] for r in group.read(spark, "txs", group=1).collect()) == [10, 11]
    assert sorted(r["x"] for r in group.read(spark, "blocks").collect()) == [1, 2]
    assert sorted(r["x"] for r in group.read(spark, "txs").collect()) == [10, 11, 20]


def test_group_commit_carries_untouched_tables_forward(spark, group):
    group.commit({"blocks": _rows(spark, [1]), "txs": _rows(spark, [10])})
    group.commit({"blocks": _rows(spark, [2])})  # txs untouched
    m = group.group_manifest()
    assert m["txs"] == 1 and m["blocks"] == 2
    assert sorted(r["x"] for r in group.read(spark, "txs").collect()) == [10]


def test_orphan_table_version_never_leaks(spark, group):
    """A writer dying AFTER its table-version commit but BEFORE the
    group claim leaves an orphan table version: invisible to group
    readers, and excluded from later transactions (they base on the
    catalog-pinned version, not the table's raw latest)."""
    group.commit({"blocks": _rows(spark, [1])})
    st = group.store("blocks")
    # simulate the half-dead writer: commit a table version directly
    orphan_files = st._stage(_rows(spark, [666]), None)
    st._commit(lambda: st.files() + orphan_files, None, "orphan-append")
    assert st.latest_version() == 2  # the orphan exists at table level
    # group reader never sees it
    assert sorted(r["x"] for r in group.read(spark, "blocks").collect()) == [1]
    # and the next transaction does not leak it
    group.commit({"blocks": _rows(spark, [2])})
    assert sorted(r["x"] for r in group.read(spark, "blocks").collect()) == [1, 2]


def test_concurrent_group_commits_rebase_not_lose(spark, group):
    """Two threads committing to the same table concurrently: the loser
    rebases on the winner's catalog, so both transactions' rows land and
    group versions are sequential."""
    import threading

    group.commit({"t": _rows(spark, [0])})
    errs = []

    def writer(vals):
        try:
            group.commit({"t": _rows(spark, vals)})
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ths = [threading.Thread(target=writer, args=([i],)) for i in (1, 2, 3)]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    assert not errs
    assert group.latest_group() == 4
    assert sorted(r["x"] for r in group.read(spark, "t").collect()) == [0, 1, 2, 3]
    # every historical group reads a consistent prefix-closed row set
    sizes = [
        len(group.read(spark, "t", group=g).collect())
        for g in range(1, group.latest_group() + 1)
    ]
    assert sizes == sorted(sizes) and sizes[-1] == 4


def test_shallow_clone_isolation_and_hazards(spark, tmp_path):
    """Clone references source files with zero copy; appends to the
    clone never leak to the source; partitioned sources are refused;
    the clone's own vacuum never deletes source files."""
    import os

    from blockchain2graphdb_spark.sources.snapshots import SnapshotStore

    src = SnapshotStore(str(tmp_path / "src"))
    df = spark.range(10).withColumn("v", F.col("id") * 2)
    src.write(df)
    dst = SnapshotStore(str(tmp_path / "dst"))
    v = dst.clone_from(src)
    assert v == 1
    # zero copy: clone's data dir holds nothing yet
    ddir = str(tmp_path / "dst" / "data")
    n_own = sum(len(fs) for _, _, fs in os.walk(ddir)) if os.path.isdir(ddir) else 0
    assert n_own == 0
    assert dst.read(spark).count() == 10
    dst.append(spark.range(100, 103).withColumn("v", F.col("id")))
    assert dst.read(spark).count() == 13
    assert src.read(spark).count() == 10  # isolation
    # clone vacuum never touches foreign files
    deleted = dst.vacuum()
    assert deleted == []
    assert src.read(spark).count() == 10
    # partitioned source refused
    import pytest as _pytest

    psrc = SnapshotStore(str(tmp_path / "psrc"))
    pdf = spark.range(6).withColumn("p", (F.col("id") % 2).cast("string"))
    psrc.write(pdf, partition_col="p")
    with _pytest.raises(ValueError, match="partitioned"):
        SnapshotStore(str(tmp_path / "pdst")).clone_from(psrc)


# ---------------------------------------------------------------------------
# Commit-protocol seam (VERDICT r11 #4): the os.link CAS and an
# object-store conditional PUT must be interchangeable behind
# `claim(tmp, target) -> bool`. A fake in-memory object store stands in
# for S3/GCS: PUT-if-absent under a lock, then materialize the object
# for the unchanged local read path (the fake's GET).
# ---------------------------------------------------------------------------


class _FakeObjectStore:
    """Conditional-PUT object store: `put_if_absent` is the atomic
    primitive (S3 `If-None-Match: *`). Tracks every attempt so tests
    can assert the retry traffic."""

    def __init__(self):
        import threading

        self.lock = threading.Lock()
        self.objects: dict[str, bytes] = {}
        self.attempts = 0
        self.conflicts = 0

    def put_if_absent(self, tmp: str, target: str) -> bool:
        with open(tmp, "rb") as f:
            payload = f.read()
        with self.lock:
            self.attempts += 1
            if target in self.objects:
                self.conflicts += 1
                return False
            self.objects[target] = payload
            # materialize the committed object so the (unchanged) local
            # manifest read path observes exactly what a GET would
            with open(target, "wb") as f:
                f.write(payload)
            return True


def test_fake_object_store_protocol_roundtrip(spark, sf_dir, tmp_path):
    """The whole SnapshotStore surface must work unchanged through the
    injected conditional-PUT protocol: write/append/restore/time-travel,
    with every manifest present in the fake store's object map."""
    fake = _FakeObjectStore()
    store = SnapshotStore(str(tmp_path / "obj"), claim=fake.put_if_absent)
    df = _orders(spark, sf_dir)
    a = df.filter(F.col("o_orderkey") % 2 == 0)
    b = df.filter(F.col("o_orderkey") % 2 == 1)
    assert store.write(a) == 1
    assert store.append(b) == 2
    assert _count_sum(store.read(spark)) == _count_sum(df)
    assert _count_sum(store.read(spark, version=1)) == _count_sum(a)
    assert store.restore(1) == 3
    assert _count_sum(store.read(spark)) == _count_sum(a)
    # every committed manifest went through the object store, none torn
    assert len(fake.objects) == 3
    assert fake.attempts == 3 and fake.conflicts == 0


def test_fake_object_store_racing_claims_one_winner(spark, sf_dir, tmp_path):
    """Many writers racing the SAME version slot through the
    conditional-PUT seam: exactly one PUT wins per slot, losers retry
    at the next version, the log stays gapless, and the conflict count
    proves the race actually happened."""
    import threading

    fake = _FakeObjectStore()
    store = SnapshotStore(str(tmp_path / "obj"), claim=fake.put_if_absent)
    store.write(_orders(spark, sf_dir).limit(10))
    n = 6
    barrier = threading.Barrier(n)
    results: list[int] = []

    def run():
        barrier.wait()
        results.append(store.restore(1))

    threads = [threading.Thread(target=run) for _ in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(results) == list(range(2, 2 + n))
    assert fake.conflicts >= 1  # the race was real, losers rebased
    assert len(fake.objects) == 1 + n  # one object per committed version


def test_injected_claim_race_forces_rebase_no_lost_update(spark, sf_dir, tmp_path):
    """Deterministic race injection: the claim wrapper makes a competing
    writer land FIRST on the victim's initial attempt. The victim must
    lose the CAS, rebase on the winner's files, and re-commit carrying
    BOTH writers' rows — the no-lost-update contract independent of
    thread timing."""
    from blockchain2graphdb_spark.sources.snapshots import link_claim

    root = str(tmp_path / "raced")
    rival = SnapshotStore(root)  # plain protocol, same log
    rival.write(_rows(spark, [1, 2]))  # v1
    state = {"injected": False}

    def racing_claim(tmp: str, target: str) -> bool:
        if not state["injected"]:
            state["injected"] = True
            # the rival commits v2 first — the victim's claim MUST fail
            rival.append(_rows(spark, [777]))
        return link_claim(tmp, target)

    victim = SnapshotStore(root, claim=racing_claim)
    assert victim.append(_rows(spark, [3])) == 3  # lost v2, landed at v3
    vals = sorted(r["x"] for r in victim.read(spark).collect())
    assert vals == [1, 2, 3, 777]  # nobody's rows were lost
    assert state["injected"]
    # gapless, every version readable, and v2 = the rival's view
    assert sorted(r["x"] for r in victim.read(spark, version=2).collect()) == [
        1,
        2,
        777,
    ]


def test_group_commit_through_object_store_seam(spark, tmp_path):
    """TableGroup's two-level commit (per-table CAS + group CAS) must
    run entirely through the injected protocol."""
    from blockchain2graphdb_spark.sources.snapshots import TableGroup

    fake = _FakeObjectStore()
    group = TableGroup(str(tmp_path / "g"), claim=fake.put_if_absent)
    group.commit({"blocks": _rows(spark, [1]), "txs": _rows(spark, [10, 11])})
    group.commit({"blocks": _rows(spark, [2])})
    assert sorted(r["x"] for r in group.read(spark, "blocks").collect()) == [1, 2]
    assert sorted(r["x"] for r in group.read(spark, "txs").collect()) == [10, 11]
    # 3 table-version manifests + 2 group manifests, all via the store
    assert len(fake.objects) == 5 and fake.conflicts == 0


def test_group_vacuum_reclaims_orphans_only(spark, tmp_path):
    """TableGroup.vacuum must reclaim exactly the table versions no
    group pins (crash/race leftovers) plus their files, while keeping
    every pinned version readable, anything at/above the highest pin
    (in-flight commits), and tables no group references at all."""
    import os

    from blockchain2graphdb_spark.sources.snapshots import TableGroup, link_claim

    root = str(tmp_path / "gv")
    group = TableGroup(root)
    group.commit({"a": _rows(spark, [1]), "b": _rows(spark, [10])})  # g1: a1 b1

    # crash AFTER a's table commit, BEFORE b's -> a@2 becomes an orphan
    calls = {"n": 0}

    def crash_second(tmp, target):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("boom")
        return link_claim(tmp, target)

    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        TableGroup(root, claim=crash_second).commit(
            {"a": _rows(spark, [2]), "b": _rows(spark, [20])}
        )
    group.commit({"a": _rows(spark, [3]), "b": _rows(spark, [30])})  # g2: a3 b2

    sa = group.store("a")
    assert sa.latest_version() == 3  # v2 = the orphan
    orphan_files = set(sa.files(2))
    assert orphan_files  # the orphan really staged data

    # an in-flight table version ABOVE every pin (no group claim yet)
    sa._commit(lambda: sa.files(3), None, "inflight-append")
    assert sa.latest_version() == 4

    # an unpinned table (mid-first-commit) must be untouched
    sc = group.store("c")
    sc.write(_rows(spark, [99]))

    removed = group.vacuum()
    assert removed == {"a": [2]}
    # orphan manifest + files gone
    assert not os.path.exists(f"{sa.root}/_manifests/v{2:08d}.json")
    for p in orphan_files:
        if p not in set(sa.files(1)) | set(sa.files(3)):
            assert not os.path.exists(p), p
    # pinned versions still read exactly; in-flight + unpinned intact
    assert sorted(r["x"] for r in group.read(spark, "a", group=1).collect()) == [1]
    assert sorted(r["x"] for r in group.read(spark, "a").collect()) == [1, 3]
    assert sa.latest_version() == 4
    assert sc.read(spark).count() == 1
    # idempotent
    assert group.vacuum() == {}


def test_group_diff_is_transactionally_consistent(spark, tmp_path):
    """TableGroup.diff must return per-table feeds pinned at the SAME
    group boundary: tables whose version did not move are absent, a
    table born between the groups diffs against empty, and the feeds
    reproduce exactly the rows the transaction added."""
    from blockchain2graphdb_spark.sources.snapshots import TableGroup

    group = TableGroup(str(tmp_path / "gd"))
    group.commit({"a": _rows(spark, [1, 2]), "b": _rows(spark, [10])})  # g1
    group.commit({"a": _rows(spark, [3])})  # g2: b untouched
    group.commit({"a": _rows(spark, [4]), "c": _rows(spark, [100])})  # g3

    d12 = group.diff(spark, 1, 2)
    assert set(d12) == {"a"}
    ins = d12["a"].where(F.col("_change") == "insert")
    assert sorted(r["x"] for r in ins.collect()) == [3]
    assert d12["a"].where(F.col("_change") == "delete").count() == 0

    d13 = group.diff(spark, 1)  # to latest
    assert set(d13) == {"a", "c"}
    assert sorted(
        r["x"] for r in d13["a"].where(F.col("_change") == "insert").collect()
    ) == [3, 4]
    assert sorted(
        r["x"] for r in d13["c"].where(F.col("_change") == "insert").collect()
    ) == [100]

    assert group.diff(spark, 3, 3) == {}
