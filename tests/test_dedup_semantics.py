"""Near-duplicate detection semantics: the fixture corpus has no dups,
so these tests run the MinHash-LSH pipeline on synthetic corpora with
planted near-duplicate clusters and assert recall/precision, plus a
bucketed-join layout proof for the 100 TB co-location story."""

from __future__ import annotations

import pytest

import random
from pyspark.sql import functions as F

from blockchain2graphdb_spark.operators.dedup import minhash_clusters

VOCAB = [f"word{i}" for i in range(200)]


def _doc(rng: random.Random, n: int = 60) -> str:
    return " ".join(rng.choice(VOCAB) for _ in range(n))


def _mutate(rng: random.Random, text: str, n_edits: int) -> str:
    toks = text.split()
    for _ in range(n_edits):
        toks[rng.randrange(len(toks))] = rng.choice(VOCAB)
    return " ".join(toks)


def test_minhash_finds_planted_near_dups(spark):
    rng = random.Random(4)
    rows, expected_clusters = [], []
    doc_id = 0
    # 5 clusters of 3 near-dups (2-3 token edits on a 60-token doc ⇒
    # shingle Jaccard well above 0.5)
    for _c in range(5):
        base = _doc(rng)
        ids = []
        for _ in range(3):
            rows.append((doc_id, _mutate(rng, base, rng.randint(0, 2))))
            ids.append(doc_id)
            doc_id += 1
        expected_clusters.append(set(ids))
    # 25 unrelated docs
    for _ in range(25):
        rows.append((doc_id, _doc(rng)))
        doc_id += 1

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = minhash_clusters(docs)
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}

    # recall: every planted cluster is grouped under one id
    for ids in expected_clusters:
        labels = {got[i] for i in ids}
        assert len(labels) == 1, f"planted cluster {ids} split into {labels}"
    # precision: unrelated docs stay singletons
    planted = set().union(*expected_clusters)
    for i, c in got.items():
        if i not in planted:
            assert c == i, f"unrelated doc {i} absorbed into cluster {c}"
    # cluster_size bookkeeping
    sizes = {r["doc_id"]: r["cluster_size"] for r in out.collect()}
    for ids in expected_clusters:
        assert all(sizes[i] == 3 for i in ids)


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """ARCHITECTURE.md §2: bucketing by the join key co-locates fact-fact
    joins. Both sides bucketed by key ⇒ the join plan has no shuffle
    Exchange (only the scan stages)."""
    import uuid

    from blockchain2graphdb_spark.catalog import table
    from blockchain2graphdb_spark.plans.inspect import plan_string
    from conftest import SF_DIR

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force the issue
    suffix = uuid.uuid4().hex[:8]
    try:
        orders = table(spark, SF_DIR, "orders")
        li = table(spark, SF_DIR, "lineitem")
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
            "overwrite"
        ).saveAsTable(f"orders_b_{suffix}")
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
            "overwrite"
        ).saveAsTable(f"lineitem_b_{suffix}")
        ob = spark.table(f"orders_b_{suffix}")
        lb = spark.table(f"lineitem_b_{suffix}")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).select(
            "o_orderkey", "l_linenumber"
        )
        plan = plan_string(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql(f"DROP TABLE IF EXISTS orders_b_{suffix}")
        spark.sql(f"DROP TABLE IF EXISTS lineitem_b_{suffix}")


# ------------------------------------------------------- dedup_keep_best


def test_keep_best_collapses_planted_duplicates(spark):
    """Exact-dup clusters collapse to the longest copy (ties to smallest
    doc_id); the fixture-free synthetic corpus plants case-insensitive
    duplicates (the md5 runs over lower(text))."""
    import os
    import tempfile

    from blockchain2graphdb_spark.operators.dedup import dedup_keep_best
    from blockchain2graphdb_spark.paths import tmp_root

    rows = [
        # cluster A: same text modulo case, 3 copies — n_chars differ,
        # keep the longest (doc 2)
        (1, "Hello World", "en", "s0", 11),
        (2, "hello world", "en", "s0", 20),
        (3, "HELLO WORLD", "en", "s0", 11),
        # cluster B: two copies with equal n_chars — keep smallest id
        (4, "spark", "en", "s1", 5),
        (5, "Spark", "en", "s1", 5),
        # singleton
        (6, "unique text", "en", "s1", 11),
    ]
    with tempfile.TemporaryDirectory(dir=tmp_root()) as tmp:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars int"
        ).write.parquet(os.path.join(tmp, "documents.parquet"))
        got = {r["kept_doc_id"]: r for r in dedup_keep_best(spark, tmp).collect()}
    assert set(got) == {2, 4, 6}
    assert got[2]["n_copies"] == 3 and got[2]["n_chars"] == 20
    assert got[4]["n_copies"] == 2
    assert got[6]["n_copies"] == 1


def test_minhash_exact_recalls_seeded_neardups(spark, sf_dir):
    """dedup_minhash_exact seeds a 90%-truncation twin for every base
    doc; the md5-banded LSH must recall most (orig, twin) pairs, every
    reported pair must clear the 0.5 Jaccard verify threshold, and
    pairs are canonical (doc_a < doc_b)."""
    from blockchain2graphdb_spark.operators.dedup import dedup_minhash_exact

    rows = dedup_minhash_exact(spark, sf_dir).collect()
    assert rows
    pairs = {(r["doc_a"], r["doc_b"]) for r in rows}
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert r["jaccard"] >= 0.5
    n_base = len({a for a, _ in pairs if a < 1_000_000} | {b for _, b in pairs if b < 1_000_000})
    seeded_found = sum(1 for a, b in pairs if b == a + 1_000_000)
    # LSH misses are possible (bands are probabilistic) but must be rare
    assert seeded_found >= 0.8 * max(n_base, 1)


def test_substring_overlap_catches_low_jaccard_copy(spark):
    """A long verbatim span shared between two otherwise-different docs
    must produce a candidate pair with >= 1 shared anchor, even though
    their bag-of-shingles Jaccard is far below the near-dup threshold;
    unrelated docs share no anchors."""
    import random

    from blockchain2graphdb_spark.operators.dedup import substring_anchors
    from pyspark.sql import functions as F

    rng = random.Random(7)
    span = " ".join(rng.choice(VOCAB) for _ in range(40))  # ~250 chars
    doc_a = " ".join(rng.choice(VOCAB) for _ in range(200)) + " " + span
    doc_b = span + " " + " ".join(rng.choice(VOCAB) for _ in range(200))
    doc_c = " ".join(rng.choice(VOCAB) for _ in range(200))
    docs = spark.createDataFrame(
        [(1, doc_a), (2, doc_b), (3, doc_c)], "doc_id long, text string"
    )
    # the SAME projection the registered operator ships (shared helper)
    anchors = substring_anchors(docs)
    l, r = anchors.alias("l"), anchors.alias("r")
    pairs = {
        (row["a"], row["b"]): row["n"]
        for row in l.join(
            r,
            (F.col("l.h") == F.col("r.h")) & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert pairs.get((1, 2), 0) >= 1, f"verbatim span not detected: {pairs}"
    assert (1, 3) not in pairs and (2, 3) not in pairs, pairs


def test_mapside_minhash_equals_agg_minhash(spark):
    """The map-side array_min(transform(...)) minhash must equal the
    explode+groupBy-min formulation permutation by permutation — guards
    the F.transform arity trap (a two-arg lambda silently receives the
    ARRAY INDEX as its second argument, replacing the permutation
    number)."""
    import random

    from pyspark.sql import functions as F

    from blockchain2graphdb_spark.operators.dedup import (
        _MH_PERMS,
        _MH_PRIME,
        _shingles,
        _tokens,
    )

    rng = random.Random(11)
    rows = [
        (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(5, 80))))
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def perm(i):
        return lambda h: F.pmod(
            h * F.lit(2 * i + 1) + F.lit(7919 * i + 13), F.lit(_MH_PRIME)
        )

    arr = docs.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                _shingles(_tokens(F.col("text"))),
                lambda s: F.pmod(F.xxhash64(s), F.lit(_MH_PRIME)),
            )
        ).alias("hs"),
    ).select(
        "doc_id",
        *[
            F.array_min(F.transform(F.col("hs"), perm(i))).alias(f"m{i}")
            for i in range(_MH_PERMS)
        ],
    )
    agg = (
        docs.select(
            "doc_id", F.explode(_shingles(_tokens(F.col("text")))).alias("s")
        )
        .select("doc_id", F.pmod(F.xxhash64("s"), F.lit(_MH_PRIME)).alias("h"))
        .groupBy("doc_id")
        .agg(
            *[
                F.min(
                    F.pmod(
                        F.col("h") * F.lit(2 * i + 1) + F.lit(7919 * i + 13),
                        F.lit(_MH_PRIME),
                    )
                ).alias(f"m{i}")
                for i in range(_MH_PERMS)
            ]
        )
    )
    a = {r["doc_id"]: [r[f"m{i}"] for i in range(_MH_PERMS)] for r in arr.collect()}
    b = {r["doc_id"]: [r[f"m{i}"] for i in range(_MH_PERMS)] for r in agg.collect()}
    assert a == b


def test_dedup_incremental_flags_exact_twins_only(spark, sf_dir):
    """is_dup must be 1 exactly when the batch doc's text also appears in
    the corpus split (recomputed independently via a text join)."""
    from pyspark.sql import functions as F

    from blockchain2graphdb_spark import registry
    from blockchain2graphdb_spark.catalog import table

    got = {
        r["doc_id"]: r["is_dup"]
        for r in registry.load_all()["dedup_incremental"]
        .builder(spark, sf_dir)
        .collect()
    }
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0).select("text").distinct()
    dups = {
        r["doc_id"]
        for r in batch.join(corpus, "text", "left_semi").select("doc_id").collect()
    }
    for doc_id, is_dup in got.items():
        assert is_dup == (1 if doc_id in dups else 0), (doc_id, is_dup)


@pytest.mark.slow  # >9s measured r14; full lane still runs it
def test_minhash_clusters_degenerate_corpora(spark):
    """Edge cases that break naive shingle pipelines: empty strings,
    single-token docs, and exact duplicates. Exact dups must cluster
    (Jaccard 1.0 >= any threshold); empties/singletons must survive the
    pipeline as rows (their 1-element shingle array keeps them
    representable) without crashing."""
    docs = spark.createDataFrame(
        [
            (1, ""),
            (2, "one"),
            (3, "one"),
            (4, "alpha beta gamma delta epsilon"),
            (5, "alpha beta gamma delta epsilon"),
            (6, "totally different words here now"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in minhash_clusters(docs).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6}
    # exact duplicates cluster together
    assert out[2]["cluster_id"] == out[3]["cluster_id"]
    assert out[4]["cluster_id"] == out[5]["cluster_id"]
    assert out[4]["cluster_size"] == 2
    # unrelated docs stay singletons
    assert out[6]["cluster_id"] == 6 and out[6]["cluster_size"] == 1
