"""Testdata-seam canary for the ABSOLUTE-id benchmark pins.

Several operators keep a fixed-size "benchmark"/"anchor" side by pinning
it to absolute vector ids (``vec_id < 500``) so the scaling harness
can't grow it with the corpus:

- ``embedding_decontamination`` — benchmark = vec_id % 37 == 0 AND
  vec_id < 500 (workload.py);
- ``contrastive_pair_mining`` / ``bitext_margin_mining`` — anchor set =
  vec_id % 10 == 0 AND vec_id < 500.

The driver regenerates /root/testdata between rounds (it has already
changed the timestamp physical type twice — see test_ntz_seam.py). If a
regeneration ever RE-KEYS vector ids, these pins would silently select a
different (or empty) benchmark; for a decontamination stage an empty
benchmark is a fail-open hazard. This canary makes that seam fail
LOUDLY: it asserts the original-id range still exists at the smallest
SF, and that the fail-closed guard in ``embedding_decontaminate``
actually raises when the pin comes up empty (simulated by filtering to
an impossible id range, exactly what a re-keyed fixture would produce).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_source_spark.data import table
from hadoop_source_spark.llmops import similarity as sim

SF = "/root/testdata/sf0.001"


def test_original_id_range_still_present(spark):
    emb = table(spark, SF, "embeddings")
    low = emb.where(F.col("vec_id") < 500)
    n_low = low.count()
    assert 1 <= n_low <= 500, (
        f"embeddings at {SF} has {n_low} rows with vec_id < 500 — the "
        "driver's testdata regeneration re-keyed vector ids; every "
        "absolute-id benchmark pin (embedding_decontamination, "
        "contrastive_pair_mining, bitext_margin_mining) must be re-based"
    )
    # the specific decontamination benchmark predicate must be non-empty
    n_bench = low.where(F.col("vec_id") % 37 == 0).count()
    assert n_bench >= 1, (
        "embedding_decontamination's benchmark (vec_id % 37 == 0 AND "
        f"vec_id < 500) selects 0 rows at {SF} — fail-open hazard"
    )
    # and the anchor-set pin used by the mining rows
    n_anchor = low.where(F.col("vec_id") % 10 == 0).count()
    assert n_anchor >= 1, (
        "contrastive/bitext anchor pin (vec_id % 10 == 0 AND vec_id < "
        f"500) selects 0 rows at {SF}"
    )


def test_empty_benchmark_fails_closed(spark):
    emb = table(spark, SF, "embeddings")
    empty_bench = emb.where(F.col("vec_id") < 0)  # what a re-key looks like
    with pytest.raises(ValueError, match="benchmark is empty"):
        sim.embedding_decontaminate(emb, empty_bench, threshold=0.99)
