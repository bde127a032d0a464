"""Property tests for the X11 full-text-search family (SURVEY §2.13) —
semantic invariants the DuckDB oracle can't see: conjunctive-match
containment against the raw text, phrase adjacency vs a pure-Python
count, BM25 rank monotonicity, and chunker coverage/overlap geometry.
"""

from __future__ import annotations

from blockchain2graphdb_spark import registry

from conftest import SF_DIR

SPECS = registry.load_all()


def _rows(name, spark):
    return SPECS[name].builder(spark, SF_DIR).collect()


def _docs(spark):
    from blockchain2graphdb_spark.catalog import table

    return {
        r["doc_id"]: r["text"]
        for r in table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    }


def test_text_search_hits_contain_all_terms(spark):
    docs = _docs(spark)
    rows = _rows("text_search", spark)
    assert 0 < len(rows) <= 20
    for r in rows:
        toks = docs[r["doc_id"]].split(" ")
        for t in ("query", "join", "table"):
            assert t in toks, (r["doc_id"], t)
        assert r["tf_total"] == sum(toks.count(t) for t in ("query", "join", "table"))


def test_phrase_search_counts_match_python(spark):
    docs = _docs(spark)
    got = {r["doc_id"]: r["n_occurrences"] for r in _rows("text_phrase_search", spark)}
    expect = {}
    for doc_id, text in docs.items():
        toks = text.split(" ")
        n = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == "window" and toks[i + 1] == "join"
        )
        if n:
            expect[doc_id] = n
    assert got == expect


def test_bm25_scores_descend_and_beat_absent_docs(spark):
    rows = _rows("text_search_bm25", spark)
    assert len(rows) == 15
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_doc_chunk_covers_every_document_with_overlap(spark):
    docs = _docs(spark)
    by_doc: dict[int, list] = {}
    for r in _rows("doc_chunk", spark):
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        n = len(docs[doc_id])
        chunks.sort(key=lambda r: r["start"])
        # stride geometry: starts are 0,192,384,... and every char is covered
        assert [c["start"] for c in chunks] == [
            i * 192 for i in range(len(chunks))
        ]
        last = chunks[-1]
        assert last["start"] + last["chunk_len"] == n  # tail chunk ends at EOF
        for c in chunks:
            assert c["chunk_len"] == min(256, n - c["start"])
        # consecutive chunks overlap by 64 chars (256 - 192)
        if len(chunks) > 1:
            assert chunks[0]["start"] + 256 - chunks[1]["start"] == 64


def test_rate_source_is_stop_timing_independent(spark):
    rows = SPECS["stream_rate_source"].builder(spark, SF_DIR).collect()
    got = {r["batch_id"]: (r["n_rows"], r["sum_value"]) for r in rows}
    assert got == {b: (50, 2500 * b + 1225) for b in range(3)}


def test_pii_mask_leaves_no_residual_pii(spark, sf_dir):
    """After masking, no email or 555- phone pattern survives anywhere,
    every doc has at least one masked email, and the counts follow the
    deterministic seeding schedule (2 emails iff doc_id%5==0, a phone
    iff doc_id%3==0)."""
    import re

    from blockchain2graphdb_spark.catalog import table
    from blockchain2graphdb_spark.operators.textops import text_pii_mask

    rows = text_pii_mask(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_emails"] == (2 if r["doc_id"] % 5 == 0 else 1), r
        assert r["n_phones"] == (1 if r["doc_id"] % 3 == 0 else 0), r

    # independently re-run the masking in Python and confirm no PII
    # survives and the fingerprint matches
    import hashlib

    docs = {
        d["doc_id"]: d["text"]
        for d in table(spark, sf_dir, "documents")
        .where("doc_id < 300")
        .select("doc_id", "text")
        .collect()
    }
    for r in rows:
        t = docs[r["doc_id"]] + f" contact user{r['doc_id']}@example.com"
        if r["doc_id"] % 5 == 0:
            t += f" cc admin{r['doc_id']}@corp.net"
        if r["doc_id"] % 3 == 0:
            t += " or call 555-" + str(r["doc_id"] % 10000).zfill(4)
        m = re.sub(r"[a-z0-9._]+@[a-z0-9.]+", "[EMAIL]", t)
        m = re.sub(r"555-[0-9]{4}", "[PHONE]", m)
        assert not re.search(r"[a-z0-9._]+@[a-z0-9.]+", m)
        assert not re.search(r"555-[0-9]{4}", m)
        assert r["masked_fp"] == hashlib.md5(m.encode()).hexdigest(), r["doc_id"]
        assert r["masked_len"] == len(m)


def test_bpe_merge_pairs_on_known_corpus(spark):
    """BPE pair counts on a hand-computable corpus: 'aaab aaab ab' →
    word freqs {aaab:2, ab:1}; pairs: aaab→(aa×2, ab) ×2, ab→(ab) ×1 ⇒
    aa:4, ab:3."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "aaab aaab ab")], "doc_id long, text string"
    )
    freq = (
        docs.select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    pairs = freq.select(
        F.explode(
            F.expr(
                "CASE WHEN length(w) >= 2 THEN transform("
                "  sequence(1, length(w) - 1), i -> substring(w, i, 2))"
                " ELSE array() END"
            )
        ).alias("pair"),
        "f",
    )
    got = {
        r["pair"]: r["cnt"]
        for r in pairs.groupBy("pair").agg(F.sum("f").alias("cnt")).collect()
    }
    assert got == {"aa": 4, "ab": 3}, got
