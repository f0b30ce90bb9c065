"""Chunking reconstruction invariants and DRF ordering pins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_source_spark.llmops import chunking as ck
from hadoop_source_spark.operators import capacity as cap


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_chunk_reconstruction_no_loss_no_dup(spark):
    import random

    rng = random.Random(3)
    texts = [
        "".join(rng.choice("abcdefgh ") for _ in range(n))
        for n in (0, 1, 149, 150, 151, 200, 201, 353, 1000)
    ]
    out = ck.chunk_documents(_docs(spark, texts), size=200, overlap=50)
    rows = sorted(
        ((r.doc_id, r.chunk_idx, r.start, r.end, r.chunk, r.n_chunks)
         for r in out.collect())
    )
    by_doc = {}
    for doc_id, idx, start, end, chunk, n in rows:
        by_doc.setdefault(doc_id, []).append((idx, start, end, chunk, n))
    for doc_id, chunks in by_doc.items():
        text = texts[doc_id]
        assert len(chunks) == chunks[0][4]
        # leading-stride concat rebuilds the document exactly
        rebuilt = "".join(
            c[3] if i == len(chunks) - 1 else c[3][:150]
            for i, c in enumerate(chunks)
        )
        assert rebuilt == text
        # every chunk matches its offsets, and overlaps agree
        for idx, start, end, chunk, _ in chunks:
            assert chunk == text[start:end]
            assert end - start == len(chunk)
        for (i1, s1, e1, c1, _), (i2, s2, e2, c2, _) in zip(
            chunks, chunks[1:]
        ):
            assert s2 == s1 + 150
            assert c1[150:] == c2[: e1 - s2]  # shared overlap identical


def test_chunk_empty_doc_kept(spark):
    out = ck.chunk_documents(_docs(spark, [""]), size=10, overlap=2)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0].chunk == "" and rows[0].n_chunks == 1


def test_chunk_param_validation(spark):
    with pytest.raises(ValueError):
        ck.chunk_documents(_docs(spark, ["x"]), size=10, overlap=10)


def test_drf_serves_lowest_dominant_share_first(spark):
    # cluster 100 mem / 100 cpu. a: mem-heavy 60/10 → dom .6 (memory);
    # b: cpu-heavy 10/30 → dom .3 (vcores); c: 20/20 → dom .2, served 1st
    usage = spark.createDataFrame(
        [("a", 60, 10), ("b", 10, 30), ("c", 20, 20)],
        "queue string, mem_used long, vcores_used long",
    )
    totals = spark.createDataFrame(
        [(100, 100)], "mem_total long, vcores_total long"
    )
    out = {r.queue: r for r in cap.drf_ranking(usage, totals).collect()}
    assert out["c"].schedule_rank == 1
    assert out["b"].schedule_rank == 2
    assert out["a"].schedule_rank == 3
    assert out["a"].dominant_resource == "memory"
    assert out["b"].dominant_resource == "vcores"
    assert out["c"].dominant_resource == "memory"  # exact tie → memory
    assert out["a"].dominant_share == pytest.approx(0.6)


def test_drf_tie_breaks_by_queue_name(spark):
    usage = spark.createDataFrame(
        [("z", 10, 10), ("a", 10, 10)],
        "queue string, mem_used long, vcores_used long",
    )
    totals = spark.createDataFrame(
        [(100, 100)], "mem_total long, vcores_total long"
    )
    out = {r.queue: r.schedule_rank for r in
           cap.drf_ranking(usage, totals).collect()}
    assert out == {"a": 1, "z": 2}


def test_preemption_proportional_and_capped(spark):
    def q(rows):
        return spark.createDataFrame(
            rows,
            "queue string, usage double, min_share double, "
            "fair_share double, min_starved boolean, fair_starved boolean",
        )

    # a starved by min rule needs 30; b and c are donors with surplus
    # 60/20 → proportional take 30*(60/80)=22.5 and 30*(20/80)=7.5
    rows = [
        ("a", 20.0, 50.0, 100.0, True, False),
        ("b", 160.0, 50.0, 100.0, False, False),
        ("c", 120.0, 50.0, 100.0, False, False),
        ("d", 100.0, 50.0, 100.0, False, False),
    ]
    from hadoop_source_spark.operators import capacity as cap

    out = {r.queue: r for r in cap.preemption_plan(q(rows)).collect()}
    assert out["a"].role == "STARVED" and out["a"].deficit == 30.0
    assert out["b"].preempt == 22.5 and out["b"].role == "DONOR"
    assert out["c"].preempt == 7.5
    assert out["d"].role == "OK" and out["d"].preempt == 0.0
    # donors never pushed below fair share
    for r in out.values():
        assert r.preempt <= r.surplus + 1e-9
    # total moved == total needed when it fits
    assert sum(r.preempt for r in out.values()) == 30.0

    # deficit exceeds surplus → everything available moves, no more
    rows2 = [
        ("a", 0.0, 90.0, 100.0, True, False),
        ("b", 110.0, 50.0, 100.0, False, False),
    ]
    out2 = {r.queue: r for r in cap.preemption_plan(q(rows2)).collect()}
    assert out2["b"].preempt == 10.0  # capped at surplus

    # fair rule gated by the threshold: usage 60 of fair 100 is NOT
    # under 0.5*fair, so no deficit even though flagged starved
    rows3 = [
        ("a", 60.0, 10.0, 100.0, False, True),
        ("b", 40.0, 10.0, 100.0, False, True),  # 40 < 50 → deficit 60
        ("c", 200.0, 10.0, 100.0, False, False),
    ]
    out3 = {r.queue: r for r in cap.preemption_plan(q(rows3)).collect()}
    assert out3["a"].deficit == 0.0 and out3["a"].role == "OK"
    assert out3["b"].deficit == 60.0
