"""Deterministic sampling and dataset splitting for training pipelines.

A training-data pipeline needs REPRODUCIBLE splits: re-running the job on
the same corpus (or an incrementally grown one) must route each document
to the same split, with no driver-side state and no shuffle. Both
operators here are pure per-row projections on a hashed id — zero
shuffles, fully codegen'd, stable under repartitioning, insertion order,
and cluster size, which `df.sample`/`randomSplit` are NOT (they depend on
partition layout).

Reference parity: Hadoop has no sampling surface; this is part of the
LLM-data-pipeline extension (brief). The hash-bucket trick is the
standard one (e.g. TFX/Beam's hash-mod split).

Two hash families:
- impl="xxhash" (default): Spark's xxhash64(id, seed) — production path.
- impl="arith": multiplicative hashing in plain integer arithmetic,
  expressible identically in any ANSI SQL engine — the oracle-comparable
  path (cross-engine hash functions never agree, arithmetic does).
  Intermediate products are bounded well inside int64 so ANSI-mode
  overflow checking never trips.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth multiplicative constant (2654435761 = 2^32 * phi) and a large
# prime pre-mod keeping (id % P) * C < 2^63.
_P = 1_000_003
_C = 2_654_435_761
_BUCKETS = 10_000


def hash_bucket(
    id_col: Column | str, seed: int = 42, impl: str = "xxhash"
) -> Column:
    """Deterministic bucket in [0, 10000) from an id column."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    if impl == "xxhash":
        return F.pmod(F.xxhash64(c, F.lit(seed)), F.lit(_BUCKETS))
    if impl == "arith":
        # ((id % P + seed) * C) % BUCKETS — max intermediate ~2.7e15 < 2^63
        return F.pmod(
            (F.pmod(c.cast("long"), F.lit(_P)) + F.lit(seed)) * F.lit(_C),
            F.lit(_BUCKETS),
        )
    raise ValueError(f"unknown impl {impl!r}")


def _arith_bucket_sql(id_expr: str, seed: int = 42) -> str:
    """The impl='arith' bucket as portable ANSI SQL (for oracles)."""
    return f"((({id_expr}) % {_P} + {seed}) * {_C}) % {_BUCKETS}"


def hash_split(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    impl: str = "xxhash",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split, train/val/test style.

    fractions maps split name -> fraction; they must sum to ≤ 1 (any
    remainder is dropped, which doubles as deterministic subsampling).
    Assignment = cumulative bucket ranges over hash_bucket, so it is
    exact-per-bucket (a 0.8 fraction is exactly 8000 of the 10000
    buckets), reproducible, and disjoint by construction.
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    b = hash_bucket(id_col, seed, impl)
    expr = None
    lo = 0
    for name, frac in fractions.items():
        hi = lo + int(round(frac * _BUCKETS))
        cond = (b >= lo) & (b < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    out = df.withColumn(split_col, expr)
    return out.filter(F.col(split_col).isNotNull())


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    impl: str = "xxhash",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling — the class-balancing step of a
    training mix (e.g. downsample 'en' to 20%, keep low-resource
    languages whole).

    Same zero-shuffle hash-threshold mechanics as deterministic_sample,
    with the threshold looked up per stratum from an inline CASE (no join
    — the fraction map is a literal in the plan). Strata missing from
    `fractions` get `default_fraction` (0.0 = drop)."""
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction {frac} for stratum {name!r}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction {default_fraction}")
    thr = None
    for name, frac in fractions.items():
        t = int(round(frac * _BUCKETS))
        cond = F.col(strata_col) == name
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = (
        thr.otherwise(int(round(default_fraction * _BUCKETS)))
        if thr is not None
        else F.lit(int(round(default_fraction * _BUCKETS)))
    )
    return df.filter(hash_bucket(id_col, seed, impl) < thr)


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    seed: int = 42,
    impl: str = "xxhash",
) -> DataFrame:
    """Keep a deterministic `fraction` of rows by hash threshold.

    Unlike df.sample, membership depends only on (id, seed): stable
    across runs, partitionings, and appends — the property an
    incremental training-data pipeline needs.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction {fraction} outside [0, 1]")
    return df.filter(
        hash_bucket(id_col, seed, impl) < int(round(fraction * _BUCKETS))
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Epoch shuffle for training order: global sort by xxhash64(id,
    seed) — a pseudorandom permutation that is a pure function of (id,
    seed), so it is reproducible across runs and partitionings, and each
    epoch's seed yields an independent order. One range-partitioned sort
    shuffle (Spark's sort is a sampled range exchange — hash values are
    uniform by construction, so the ranges are balanced and skew-free);
    `num_partitions` sets the output file count for the writer.

    ``id_col`` is a secondary sort key so rows with duplicate ids (or a
    64-bit hash collision) still land in a deterministic relative order —
    without it the epoch order would be reproducible only up to ties."""
    out = df.repartitionByRange(
        *([num_partitions] if num_partitions else []),
        F.xxhash64(F.col(id_col), F.lit(seed)),
    ).sortWithinPartitions(
        F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col)
    )
    return out


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    impl: str = "xxhash",
    default_weight: float = 0.0,
    copy_col: str = "copy",
) -> DataFrame:
    """Training-data MIXTURE: per-stratum weights that may EXCEED 1 —
    the standard LLM curation op ("2.5 epochs of low-resource zh, 0.3
    epochs of crawl en").

    weight w per stratum ⇒ each row appears floor(w) times, plus one
    more copy for the deterministic hash-fraction (w - floor(w)) of ids
    — so expected multiplicity is exactly w, membership of the
    fractional copy is a pure function of (id, seed), and w ≤ 1
    degenerates to stratified_sample. Copies carry a 1-based ``copy``
    index so a downstream deterministic_shuffle with per-epoch seeds
    spreads repeats instead of clustering them.

    Scale shape: one JVM-side CASE for the copy count, one
    explode(sequence(...)) — a narrow rowwise expansion, no shuffle, no
    Python; output size is Σ w_s·|stratum_s| by construction.
    """
    for name, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight {w} for stratum {name!r}")
    if default_weight < 0:
        raise ValueError(f"negative default_weight {default_weight}")

    def n_copies(w: float):
        base = int(w)
        frac_thr = int(round((w - base) * _BUCKETS))
        # +1 copy when the id's (seed-offset) bucket falls under the
        # fractional threshold; offset keeps this independent of any
        # other sampling decision made with the same base seed
        extra = (hash_bucket(id_col, seed + 7919, impl) < frac_thr).cast("int")
        return F.lit(base) + extra

    copies = None
    for name, w in weights.items():
        cond = F.col(strata_col) == name
        copies = (
            F.when(cond, n_copies(w))
            if copies is None
            else copies.when(cond, n_copies(w))
        )
    copies = (
        copies.otherwise(n_copies(default_weight))
        if copies is not None
        else n_copies(default_weight)
    )
    return (
        df.withColumn("__n_copies", copies)
        .filter(F.col("__n_copies") > 0)
        .withColumn(
            copy_col, F.explode(F.sequence(F.lit(1), F.col("__n_copies")))
        )
        .drop("__n_copies")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 42,
    impl: str = "xxhash",
    key_dp: int = 6,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement — the Efraimidis-Spirakis
    exponential-sort trick (A-ES, 2006): each row draws a deterministic
    u in (0,1) from its id and takes priority u^(1/w); the k largest
    priorities are EXACTLY a weight-proportional draw without
    replacement. Distributed shape: one projection + global top-k
    (TakeOrderedAndProject — per-partition heaps, no full sort), so a
    100 TB corpus pays a scan and a k-row reduce, never a shuffle of
    itself. Keys are compared as ln(u)/w (monotone in u^(1/w)), rounded
    to ``key_dp`` with the id as tiebreak so the selection boundary is
    engine-reproducible; impl='arith' makes u portable ANSI SQL for
    oracle checks (same dual-impl contract as hash_split)."""
    u = (hash_bucket(id_col, seed, impl) + F.lit(0.5)) / F.lit(_BUCKETS)
    key = F.round(F.log(u) / F.col(weight_col), key_dp)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("sample_key", key)
        .orderBy(F.desc("sample_key"), F.col(id_col))
        .limit(k)
    )


def temperature_mixture(
    df: DataFrame,
    alpha: float,
    target_rows: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    impl: str = "xxhash",
    copy_col: str = "copy",
) -> DataFrame:
    """Temperature-based multilingual resampling (the mT5 / XLM-R
    recipe, Xue et al. 2021 §3.1, Conneau et al. 2020 §3): sample
    stratum l with probability p_l ∝ n_l^alpha, alpha ∈ (0, 1] —
    alpha=1 keeps natural proportions, smaller alpha lifts
    low-resource strata. Unlike mixture_sample the weights are
    DERIVED FROM THE DATA: w_l = p_l * target_rows / n_l, which
    upsamples small strata past 1 epoch and downsamples the head so
    the output lands on the target budget in expectation.

    The whole derivation stays on the cluster: one stratum-count
    groupBy, one scalar denominator, one broadcast join back — no
    driver collect — then the same floor(w)-plus-hash-fraction
    expansion as mixture_sample (expected multiplicity exactly w_l).
    With alpha=0.5 the power is computed via IEEE-exact sqrt, so the
    weights are bit-identical across engines and the expansion is
    fully hash-checkable.
    """
    if not 0 < alpha <= 1:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    n = F.col("__n").cast("double")
    powered = F.sqrt(n) if alpha == 0.5 else F.pow(n, F.lit(alpha))
    sizes = (
        df.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__pw", powered)
    )
    denom = sizes.agg(F.sum("__pw").alias("__denom"))
    weights = sizes.crossJoin(F.broadcast(denom)).select(
        strata_col,
        (
            F.col("__pw") / F.col("__denom") * F.lit(float(target_rows)) / n
        ).alias("__w"),
    )
    w = F.col("__w")
    frac_thr = F.round((w - F.floor(w)) * _BUCKETS, 0).cast("long")
    extra = (
        hash_bucket(id_col, seed + 7919, impl) < frac_thr
    ).cast("int")
    n_copies = F.floor(w).cast("int") + extra
    return (
        df.join(F.broadcast(weights), strata_col)
        .withColumn("__n_copies", n_copies)
        .filter(F.col("__n_copies") > 0)
        .withColumn(
            copy_col, F.explode(F.sequence(F.lit(1), F.col("__n_copies")))
        )
        .withColumn("sample_weight", F.round(w, 6))
        .drop("__n_copies", "__w")
    )
