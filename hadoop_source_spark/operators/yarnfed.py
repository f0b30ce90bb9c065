"""YARN Federation policies: router home-subcluster choice and the
AMRMProxy weighted ANY-split.

Reference semantics:
- `federation/policies/router/PriorityRouterPolicy.java:40-77` — the
  home subcluster is the active, non-blacklisted subcluster with the
  highest configured weight; `currentBest` starts at Float.MIN_VALUE
  (the smallest POSITIVE float), so only weights > 0 ever qualify and
  an all-nonpositive weight vector throws.
- `router/HashBasedRouterPolicy.java:74-103` — blacklisted subclusters
  are removed from the ACTIVE set first, then the home is the
  alphabetically-sorted active list at position
  `Math.abs(queue.hashCode() % size)`; weights are ignored entirely
  (`reinitialize` skips the weight validation on purpose).
- `router/LoadBasedRouterPolicy.java:44-106` — weights must be 0/1;
  among active, non-blacklisted, weight==1 subclusters the home is the
  one with the largest `clusterMetrics.availableMB` from the
  capability JSON ("picks the sub-cluster with the least load").
- `amrmproxy/LocalityMulticastAMRMProxyPolicy.java:322-379
  (splitIndividualAny), 386-430 (computeIntegerAssignment), 447-484
  (policy/headroom weighting), 532-570 (AllocationBookkeeper)` — a
  non-localized ANY ask of N containers splits across the
  active-and-enabled (weight>0) subclusters with per-subcluster
  weight `hrAlpha*headroomWeighting + (1-hrAlpha)*policyWeighting`,
  where policyWeighting = w/totW over active-and-enabled, and
  headroomWeighting = 1/N for subclusters with unknown headroom,
  else (headroomMB/totHeadroomMB)*(knownRMs/N). Integer assignment
  floors N*w/totW per bin, then places the residue one container at
  a time. A zero-container ANY (a cancel) is forwarded verbatim to
  every subcluster we have headroom state from (:334-340).

Documented divergences (both pinned in tests/test_yarnfed.py):
- Ties: the reference iterates a HashMap with unspecified order and
  keeps the FIRST maximum (`>`is strict); this engine pins the
  deterministic equivalent "smallest subcluster id wins ties" so the
  result is reproducible across engines.
- Residue placement: `computeIntegerAssignment` draws
  `getWeightedRandom(weightsList)` per residue container; this engine
  uses largest-fractional-remainder (Hamilton) order — deterministic,
  same per-bin expectation, and it preserves the reference's stated
  invariant that per-RM counts add up to the user ask (the reference
  bounds the excess by #subclusters; Hamilton's excess is exactly 0).

Scale shape: subcluster registries are control-plane-sized (tens of
rows) — every join here broadcasts the subcluster side, so the
per-app / per-request work is an O(|SC|) fan-out inside one codegen
stage, no data-sized shuffle beyond the final per-key window picks,
which partition by app/request id (embarrassingly parallel at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hadoop_source_spark.functions.hashes import java_string_hash


def route_apps(
    apps: DataFrame, subclusters: DataFrame, weights: DataFrame
) -> DataFrame:
    """One row per app with the home subcluster under each of the three
    deterministic router policies (priority / hash / load).

    `apps`: (app_id, queue, blacklist array<string>); `subclusters`:
    (sc_id, active boolean, available_mb long); `weights`:
    (sc_id, weight double). A policy with no eligible subcluster
    yields NULL (the reference throws FederationPolicyException — the
    NULL row is this engine's loud batch-mode equivalent)."""
    sc = F.broadcast(
        subclusters.join(weights, "sc_id", "left").select(
            "sc_id", "active", "available_mb",
            F.coalesce("weight", F.lit(0.0)).alias("weight"),
        )
    )
    cand = (
        apps.crossJoin(sc)
        .withColumn(
            "__blk", F.array_contains(F.col("blacklist"), F.col("sc_id"))
        )
        .where(F.col("active") & ~F.col("__blk"))
    )
    # PriorityRouterPolicy: max weight among weight > 0 (Float.MIN_VALUE
    # floor); tie pinned to smallest sc_id (see module docstring).
    w_pri = Window.partitionBy("app_id").orderBy(
        F.col("weight").desc(), F.col("sc_id").asc()
    )
    pri = (
        cand.where(F.col("weight") > 0)
        .withColumn("__rn", F.row_number().over(w_pri))
        .where(F.col("__rn") == 1)
        .select("app_id", F.col("sc_id").alias("home_priority"))
    )
    # HashBasedRouterPolicy: sorted active-minus-blacklist list at
    # position abs(queue.hashCode() % size); weights ignored.
    w_sort = Window.partitionBy("app_id").orderBy(F.col("sc_id").asc())
    hsh = (
        cand.withColumn("__pos", F.row_number().over(w_sort))
        .withColumn(
            "__n", F.count(F.lit(1)).over(Window.partitionBy("app_id"))
        )
        .where(
            F.col("__pos")
            == F.abs(java_string_hash(F.col("queue"))) % F.col("__n") + 1
        )
        .select("app_id", F.col("sc_id").alias("home_hash"))
    )
    # LoadBasedRouterPolicy: weight must be exactly 1; max availableMB,
    # tie pinned to smallest sc_id.
    w_load = Window.partitionBy("app_id").orderBy(
        F.col("available_mb").desc(), F.col("sc_id").asc()
    )
    load = (
        cand.where(F.col("weight") == 1.0)
        .withColumn("__rn", F.row_number().over(w_load))
        .where(F.col("__rn") == 1)
        .select("app_id", F.col("sc_id").alias("home_load"))
    )
    return (
        apps.select("app_id", "queue")
        .join(pri, "app_id", "left")
        .join(hsh, "app_id", "left")
        .join(load, "app_id", "left")
    )


def route_apps_random(
    apps: DataFrame,
    subclusters: DataFrame,
    weights: DataFrame,
    seed: int = 7,
) -> DataFrame:
    """Home subcluster under the randomized router family, with the
    engine's deterministic arith-hash sample replacing the RNG (same
    convention as llmops/sampling.hash_bucket — reproducible across
    runs and engines, identical distribution over the id space).

    - WeightedRandomRouterPolicy.java:37-81 — among ACTIVE,
      non-blacklisted subclusters, walk the positive-weight list and
      pick the first whose running weight covers samplePoint =
      rand.nextFloat() * totalWeight (FederationPolicyUtils.
      getWeightedRandom:217-243); all-nonpositive weights throw (NULL
      row here). The reference walks a HashMap's order; this engine
      pins sorted sc_id order (deterministic, same distribution).
    - UniformRandomRouterPolicy.java:78-103 — active-minus-blacklist
      list at rand.nextInt(size); pinned to sorted order with the
      hash-derived index.
    - LocalityRouterPolicy.java:66-150 — when the app's AM node
      request resolves to a subcluster that is valid (active,
      non-blacklisted) AND enabled (weight > 0), route there;
      otherwise FailForward to the WeightedRandom pick (:133-150).
      RejectRouterPolicy.java:62-74 routes nothing by construction —
      no column for it.

    `apps`: (app_id long, blacklist array<string>, node_sc string
    nullable — the SubClusterResolver verdict for the AM node request,
    NULL when unresolvable). Returns (app_id, home_weighted,
    home_uniform, home_locality). Subcluster side broadcasts; per-app
    picks window on app_id."""
    from hadoop_source_spark.llmops.sampling import hash_bucket

    sc = F.broadcast(
        subclusters.join(weights, "sc_id", "left").select(
            "sc_id", "active",
            F.coalesce("weight", F.lit(0.0)).alias("weight"),
        )
    )
    cand = (
        apps.crossJoin(sc)
        .where(
            F.col("active")
            & ~F.array_contains(F.col("blacklist"), F.col("sc_id"))
        )
    )
    u_w = hash_bucket("app_id", seed=seed, impl="arith") / F.lit(10000.0)
    w_sort = Window.partitionBy("app_id").orderBy(F.col("sc_id").asc())
    w_all = Window.partitionBy("app_id")
    weighted_rows = (
        cand.where(F.col("weight") > 0)
        .select(
            "app_id",
            "sc_id",
            F.sum("weight")
            .over(w_sort.rowsBetween(Window.unboundedPreceding, 0))
            .alias("__cum"),
            F.sum("weight").over(w_all).alias("__tot"),
        )
        .where(u_w * F.col("__tot") <= F.col("__cum"))
        .withColumn("__rn", F.row_number().over(w_sort))
        .where(F.col("__rn") == 1)
    )
    weighted = weighted_rows.select(
        "app_id", F.col("sc_id").alias("home_weighted")
    )
    # Locality: the resolved node subcluster must be active,
    # non-blacklisted AND weight-enabled, else fall forward to the
    # weighted pick computed above.
    node_ok = (
        cand.where(
            (F.col("sc_id") == F.col("node_sc")) & (F.col("weight") > 0)
        )
        .select("app_id", F.col("sc_id").alias("__node_home"))
    )
    locality = (
        apps.select("app_id")
        .join(node_ok, "app_id", "left")
        .join(weighted, "app_id", "left")
        .select(
            "app_id",
            F.coalesce("__node_home", "home_weighted").alias(
                "home_locality"
            ),
        )
    )
    uniform = (
        cand.select(
            "app_id",
            "sc_id",
            F.row_number().over(w_sort).alias("__pos"),
            F.count(F.lit(1)).over(w_all).alias("__n"),
        )
        .where(
            F.col("__pos")
            == F.pmod(
                hash_bucket("app_id", seed=seed + 1, impl="arith"),
                F.col("__n"),
            )
            + 1
        )
        .select("app_id", F.col("sc_id").alias("home_uniform"))
    )
    return (
        apps.select("app_id")
        .join(weighted, "app_id", "left")
        .join(uniform, "app_id", "left")
        .join(locality, "app_id", "left")
    )


def split_any(
    requests: DataFrame, subclusters: DataFrame, hr_alpha: float
) -> DataFrame:
    """Split each non-localized ANY ask across the active-and-enabled
    subclusters — `splitIndividualAny` + `computeIntegerAssignment`
    with deterministic (Hamilton) residue placement.

    `requests`: (req_id, num_containers); `subclusters`: (sc_id,
    active boolean, weight double, headroom_mb nullable long — NULL
    means this RM never reported headroom). Returns (req_id, sc_id,
    containers); zero-container asks fan out to every
    headroom-reporting subcluster with containers = 0 (cancel
    semantics, LocalityMulticastAMRMProxyPolicy.java:334-340)."""
    enabled = subclusters.where(F.col("active") & (F.col("weight") > 0))
    # Bookkeeper scalars (AllocationBookkeeper.reinitialize :532-570):
    # N, totPolicyWeight over active-and-enabled; totHeadroom and
    # knownRMs over the headroom-reporting subset of those.
    book = enabled.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("weight").alias("__tot_w"),
        F.sum(F.coalesce("headroom_mb", F.lit(0))).alias("__tot_hr"),
        F.count("headroom_mb").alias("__known"),
    )
    per_sc = F.broadcast(
        enabled.crossJoin(F.broadcast(book)).select(
            "sc_id",
            "headroom_mb",
            (
                F.lit(float(hr_alpha))
                * F.when(
                    F.col("headroom_mb").isNotNull() & (F.col("__tot_hr") > 0),
                    (
                        F.col("headroom_mb").cast("double")
                        / F.col("__tot_hr")
                    )
                    * (F.col("__known").cast("double") / F.col("__n")),
                ).otherwise(F.lit(1.0) / F.col("__n"))
                + F.lit(1.0 - float(hr_alpha))
                * (F.col("weight") / F.col("__tot_w"))
            ).alias("__w"),
        )
    )
    live = requests.where(F.col("num_containers") > 0).crossJoin(per_sc)
    wsum = Window.partitionBy("req_id")
    scored = live.select(
        "req_id",
        "sc_id",
        "num_containers",
        (
            F.col("num_containers")
            * F.col("__w")
            / F.sum(F.when(F.col("__w") > 0, F.col("__w"))).over(wsum)
        ).alias("__share"),
    ).where(F.col("__w") > 0)
    w_rem = Window.partitionBy("req_id").orderBy(
        (F.col("__share") - F.floor("__share")).desc(), F.col("sc_id").asc()
    )
    assigned = scored.select(
        "req_id",
        "sc_id",
        F.floor("__share").alias("__base"),
        (
            F.col("num_containers") - F.sum(F.floor("__share")).over(wsum)
        ).alias("__residue"),
        F.row_number().over(w_rem).alias("__rank"),
    ).select(
        "req_id",
        "sc_id",
        (
            F.col("__base")
            + F.when(F.col("__rank") <= F.col("__residue"), 1).otherwise(0)
        ).cast("long").alias("containers"),
    )
    cancels = (
        requests.where(F.col("num_containers") == 0)
        .crossJoin(
            F.broadcast(
                subclusters.where(F.col("headroom_mb").isNotNull()).select(
                    "sc_id"
                )
            )
        )
        .select("req_id", "sc_id", F.lit(0).cast("long").alias("containers"))
    )
    return assigned.where(F.col("containers") > 0).unionByName(cancels)
