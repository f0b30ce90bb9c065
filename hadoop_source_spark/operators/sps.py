"""Storage Policy Satisfier: which blocks must move, where, and what
each file's analysis outcome is.

Reference semantics (`hadoop-hdfs/.../namenode/sps/
StoragePolicySatisfier.java`):

- ``analyseBlocksStorageMovementsAndAssignToDN:347-459``: an
  under-construction file postpones (ANALYSIS_SKIPPED_FOR_RETRY); a
  file with no blocks skips pairing (BLOCKS_TARGET_PAIRING_SKIPPED);
  a striped file whose policy is outside the EC-suitable set {HOT,
  COLD, ALL_SSD} skips pairing
  (``ErasureCodingPolicyManager.checkStoragePolicySuitableForECStripedMode:181-191``);
  otherwise every block's expected-vs-existing storage types are
  multiset-diffed (``removeOverlapBetweenStorageTypes:1182-1196`` —
  non-movable types dropped from both sides, satisfied when EITHER
  side empties) and any mismatched block marks the file
  BLOCKS_TARGETS_PAIRED. NOTE the :514 latch:
  ``computeBlockMovingInfos`` initializes
  ``foundMatchingTargetNodesForBlock = true`` and ONLY ever ``|=``'s
  it (:561), so a mismatched block reports paired even when no
  target existed — this version's NO_BLOCKS_TARGETS_PAIRED is
  reachable only through the never-false return, i.e. dead; the
  engine reproduces the latch faithfully. A file whose blocks all
  satisfied but any block has fewer locations than its replication
  (EC: data+parity, ``isLowRedundancyBlock:472-485``) reports
  FEW_LOW_REDUNDANCY_BLOCKS (:431-432).
- Source selection (``computeBlockMovingInfos:510-567``): pass one
  walks locations in order and picks nodes that HAVE (existence, not
  space — ``checkSourceAndTargetTypeExists:881-902``) both a
  leftover-existing type and a leftover-expected type, pairing the
  REPLICA's own storage type and removing it from the leftover list;
  pass two walks the leftover existing types in order and takes the
  first remaining location of that exact type.
- Target maps (``findTargetsForExpectedStorageTypes:837-864``):
  iterates the expected leftover IN ORDER and ABORTS, returning the
  partial map, at the first type with no live node at all; nodes
  enter a type's list only with positive available-to-move space
  (``getMaxRemaining:866-878``).
- Pairing (``findSourceAndTargetToMove:590-684``): a local pass
  first — for each source whose current type is not itself expected,
  the first expected-leftover type with schedulable space on the
  SOURCE node wins (``chooseTargetTypeInSameNode:749-773``); if
  expected types remain, a remote pass walks sources again (skipping
  nodes that already produced a move, ``checkIfAlreadyChosen``),
  trying SAME_RACK before ANY_OTHER (node groups off), each tier
  scanning expected types in order for a node with space outside the
  exclude set (existing replicas + previously chosen targets); each
  success consumes the expected type and excludes the target.

Determinism: the reference SHUFFLES remote candidates (:784). The
engine therefore reports the deterministic surface — move kind
(LOCAL / REMOTE_SAME_RACK / REMOTE_ANY / UNPAIRED), target storage
type, and tier existence — and pins the representative target node
to the smallest node id so re-runs are stable; kinds, types and
existence match the reference under any shuffle outcome.

Spark-first: file statuses and the satisfied/mismatch split are pure
DataFrame logic (per-type count comparison — no kernel); only
MISMATCHED blocks reach the pairing kernel, keeping Python work
proportional to the drift exactly like the real SPS only visits
misplaced blocks. The kernel is an Arrow-batched mapInPandas over
per-block rows, partition-parallel by block; the cluster storage
report it consults is collected once (cluster-conf-sized, the same
documented bound as the queue configs in operators/capacity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_source_spark.operators.mover import POLICY_TEMPLATES

EC_SUITABLE = ("HOT", "COLD", "ALL_SSD")
NON_MOVABLE = ("RAM_DISK", "PROVIDED")

SKIPPED_RETRY = "ANALYSIS_SKIPPED_FOR_RETRY"
PAIRING_SKIPPED = "BLOCKS_TARGET_PAIRING_SKIPPED"
ALREADY_SATISFIED = "BLOCKS_ALREADY_SATISFIED"
TARGETS_PAIRED = "BLOCKS_TARGETS_PAIRED"
FEW_LOW_REDUNDANCY = "FEW_LOW_REDUNDANCY_BLOCKS"

_MOVE_SCHEMA = (
    "block_id long, file_id long, source_node string,"
    " source_type string, action string, target_type string,"
    " target_node string"
)


def expected_types(policy_col, n_col):
    """BlockStoragePolicy.chooseStorageTypes(n): the first n template
    slots, the last slot repeated beyond the template length."""
    tmpl = F.map_from_arrays(
        F.array(*[F.lit(p) for p in POLICY_TEMPLATES]),
        F.array(
            *[
                F.array(*[F.lit(t) for t in ts])
                for ts in POLICY_TEMPLATES.values()
            ]
        ),
    )[policy_col]
    return F.transform(
        F.sequence(F.lit(1), n_col),
        lambda i: F.coalesce(
            F.element_at(tmpl, i.cast("int")), F.element_at(tmpl, -1)
        ),
    )


def _block_frame(files: DataFrame, blocks: DataFrame,
                 replicas: DataFrame) -> DataFrame:
    """Per-block: existing types (slot order), expected template,
    satisfied / low-redundancy flags. ``files``: (file_id, policy,
    replication int, under_construction bool, is_striped bool,
    ec_data int?, ec_parity int?). ``blocks``: (block_id, file_id).
    ``replicas``: (block_id, slot int, node_id, storage_type)."""
    per_block = (
        replicas.groupBy("block_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct("slot", "node_id", "storage_type")
                )
            ).alias("locs")
        )
        .join(blocks, "block_id")
        .join(files, "file_id")
    )
    n_exp = F.when(
        F.col("is_striped"), F.size("locs")
    ).otherwise(F.col("replication"))
    existing = F.filter(
        F.transform(F.col("locs"), lambda s: s["storage_type"]),
        lambda t: ~t.isin(*NON_MOVABLE),
    )
    expected = F.filter(
        expected_types(F.col("policy"), n_exp),
        lambda t: ~t.isin(*NON_MOVABLE),
    )
    types = sorted({t for ts in POLICY_TEMPLATES.values() for t in ts})

    def cnt(arr, t):
        return F.size(F.filter(arr, lambda x: x == F.lit(t)))

    exp_minus_ex_empty = F.lit(True)
    ex_minus_exp_empty = F.lit(True)
    for t in types:
        exp_minus_ex_empty &= cnt(expected, t) <= cnt(existing, t)
        ex_minus_exp_empty &= cnt(existing, t) <= cnt(expected, t)
    low_red_repl = F.when(
        F.col("is_striped"), F.col("ec_data") + F.col("ec_parity")
    ).otherwise(F.col("replication"))
    return per_block.select(
        "block_id", "file_id", "policy", "replication",
        "under_construction", "is_striped", "locs",
        expected.alias("expected"),
        (exp_minus_ex_empty | ex_minus_exp_empty).alias("satisfied"),
        (F.size("locs") < low_red_repl).alias("low_redundancy"),
    )


def file_status(files: DataFrame, blocks: DataFrame,
                replicas: DataFrame) -> DataFrame:
    """Per-file BlocksMovingAnalysis.Status (:347-459 order: UC
    postpone, no-blocks skip, EC-unsuitable skip, then the block
    sweep with the :514/:561 always-paired latch and the
    low-redundancy override)."""
    bf = _block_frame(files, blocks, replicas)
    agg = bf.groupBy("file_id").agg(
        F.max(~F.col("satisfied")).alias("any_mismatch"),
        F.max("low_redundancy").alias("any_low_red"),
    )
    j = files.join(agg, "file_id", "left")
    return j.select(
        "file_id",
        F.when(F.col("under_construction"), SKIPPED_RETRY)
        .when(F.col("any_mismatch").isNull(), PAIRING_SKIPPED)
        .when(
            F.col("is_striped")
            & ~F.col("policy").isin(*EC_SUITABLE),
            PAIRING_SKIPPED,
        )
        .when(F.col("any_mismatch"), TARGETS_PAIRED)
        .when(F.col("any_low_red"), FEW_LOW_REDUNDANCY)
        .otherwise(ALREADY_SATISFIED)
        .alias("status"),
    )


def move_plan(files: DataFrame, blocks: DataFrame, replicas: DataFrame,
              node_storages: DataFrame, nodes: DataFrame) -> DataFrame:
    """Per-source move verdicts for every mismatched, analyzable
    block. ``node_storages``: (node_id, storage_type, avail_bytes
    long — the live report; a type row present means the node HAS
    that storage, positive avail_bytes means it can take a move).
    ``nodes``: (node_id, rack).

    Returns (block_id, file_id, source_node, source_type, action
    LOCAL|REMOTE_SAME_RACK|REMOTE_ANY|UNPAIRED, target_type,
    target_node — smallest-id representative, null when unpaired)."""
    bf = _block_frame(files, blocks, replicas).where(
        ~F.col("under_construction")
        & ~F.col("satisfied")
        & (
            ~F.col("is_striped") | F.col("policy").isin(*EC_SUITABLE)
        )
    )
    # Cluster storage report: conf-sized (nodes x storage types), the
    # same documented driver-side bound as capacity.py's queue confs.
    have: dict[str, set[str]] = {}
    avail: dict[str, set[str]] = {}
    for r in node_storages.collect():
        have.setdefault(r["node_id"], set()).add(r["storage_type"])
        if r["avail_bytes"] > 0:
            avail.setdefault(r["node_id"], set()).add(r["storage_type"])
    rack_of = {r["node_id"]: r["rack"] for r in nodes.collect()}
    all_nodes = sorted(rack_of)
    # Candidate indexes, built ONCE from the conf-sized cluster maps
    # so the per-block remote pass scans a short pre-sorted list and
    # skips excludes, instead of re-filtering every cluster node per
    # pending type (the itertuples-era inner loop this replaces).
    type_has_node = {t for ts in have.values() for t in ts}
    global_cands: dict[str, list[str]] = {}
    rack_cands: dict[tuple[str, str], list[str]] = {}
    for n in all_nodes:
        for t in avail.get(n, ()):
            global_cands.setdefault(t, []).append(n)
            rack_cands.setdefault((rack_of[n], t), []).append(n)

    def kernel(batches):
        import pandas as pd

        # Pairing is a pure function of (ordered replica placement,
        # expected template) given the fixed cluster maps, and a
        # bounded node set repeats the same placement signature across
        # many blocks — memoize the verdict list per signature so the
        # procedural walk below runs once per DISTINCT pattern, not
        # once per block (worst case all-unique degrades to the plain
        # per-block walk plus one tuple build).
        memo: dict[tuple, list[tuple]] = {}

        def pair(loc_pairs, raw_expected):
                expected = [
                    t for t in raw_expected if t not in NON_MOVABLE
                ]
                existing = [
                    t for _, t in loc_pairs if t not in NON_MOVABLE
                ]
                # removeOverlapBetweenStorageTypes:1182-1196
                for t in list(existing):
                    if t in expected:
                        expected.remove(t)
                        existing.remove(t)
                # source passes (computeBlockMovingInfos:527-557)
                pool = list(loc_pairs)
                sources: list[tuple[str, str]] = []  # (type, node)
                for node, rtype in list(pool):
                    if any(t in existing for t in have.get(node, ()))\
                            and any(
                                t in expected
                                for t in have.get(node, ())
                            ):
                        sources.append((rtype, node))
                        pool.remove((node, rtype))
                        if rtype in existing:
                            existing.remove(rtype)
                for t in list(existing):
                    for node, rtype in list(pool):
                        if rtype == t:
                            sources.append((rtype, node))
                            pool.remove((node, rtype))
                            break
                # findTargetsForExpectedStorageTypes:837-864 partial-
                # map abort: stop at the first type no live node HAS.
                target_map: set[str] = set()
                for t in expected:
                    if t not in type_has_node:
                        break
                    target_map.add(t)
                exclude = {n for n, _ in loc_pairs}
                moved_nodes: set[str] = set()
                pending = list(expected)
                moves: dict[str, tuple] = {}
                # local pass (findSourceAndTargetToMove:598-623)
                for stype, node in sources:
                    if stype in pending:
                        continue
                    for t in pending:
                        if t in target_map and t in avail.get(node, ()):
                            moves[node] = (stype, "LOCAL", t, node)
                            moved_nodes.add(node)
                            pending.remove(t)
                            break
                if pending:
                    # remote pass (:629-677)
                    for stype, node in sources:
                        if node in moved_nodes:
                            continue
                        chosen = None
                        for tier in ("REMOTE_SAME_RACK", "REMOTE_ANY"):
                            for t in pending:
                                if t not in target_map:
                                    continue
                                cand_list = (
                                    rack_cands.get(
                                        (rack_of.get(node), t), ()
                                    )
                                    if tier == "REMOTE_SAME_RACK"
                                    else global_cands.get(t, ())
                                )
                                # pre-sorted by node id; first
                                # non-excluded == the old cands[0]
                                for n in cand_list:
                                    if n not in exclude:
                                        chosen = (stype, tier, t, n)
                                        break
                                if chosen:
                                    break
                            if chosen:
                                break
                        if chosen:
                            moves[node] = chosen
                            moved_nodes.add(node)
                            pending.remove(chosen[2])
                            exclude.add(chosen[3])
                        else:
                            moves[node] = (stype, "UNPAIRED", None, None)
                return list(moves.items())

        for pdf in batches:
            out: list[tuple] = []
            for block_id, file_id, raw_locs, raw_expected in zip(
                pdf["block_id"].tolist(), pdf["file_id"].tolist(),
                pdf["locs"].tolist(), pdf["expected"].tolist(),
            ):
                loc_pairs = [
                    (s["node_id"], s["storage_type"])
                    for s in sorted(raw_locs, key=lambda s: s["slot"])
                ]
                key = (tuple(loc_pairs), tuple(raw_expected))
                verdicts = memo.get(key)
                if verdicts is None:
                    verdicts = memo[key] = pair(loc_pairs, raw_expected)
                for node, (stype, action, ttype, tnode) in verdicts:
                    out.append(
                        (block_id, file_id, node, stype,
                         action, ttype, tnode)
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "block_id", "file_id", "source_node", "source_type",
                    "action", "target_type", "target_node",
                ],
            )

    return bf.select(
        "block_id", "file_id", "locs", "expected"
    ).mapInPandas(kernel, _MOVE_SCHEMA)
