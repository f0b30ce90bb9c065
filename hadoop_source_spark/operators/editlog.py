"""Edit-log replay: reconstruct a namespace image from an ordered op log.

Reference semantics: the NameNode journals every mutation as a typed op
(`hdfs/server/namenode/FSEditLogOpCodes.java:31-81` — OP_ADD 0,
OP_RENAME 15, OP_TIMES 13, OP_TRUNCATE 46, OP_APPEND 47) and rebuilds the
in-memory image by replaying them in txid order
(`FSEditLogLoader.java` `loadEditRecords`, applied op-by-op on one
thread). The image is the FIXED POINT of the log — per-file state depends
only on that file's ops, in order.

Spark-first re-expression: the sequential replay is re-factored into
relational passes, each distributed:

1. **Rename-chain resolution** — renames form a functional graph on
   names (each dst has exactly one src; names are write-once here, as
   txids are in the reference). Pointer DOUBLING (anc := anc(anc), with
   hop counts summed) resolves every name to its originating inode in
   O(log D) self-joins instead of O(D) sequential steps — same
   acceleration `llmops/dedup.dedup_clusters` uses for components.
2. **Op attribution** — one equi-join from each op's post-op name to the
   resolved name→inode map (no interval logic needed while names are
   unique; the reference guarantees this by replaying in txid order).
3. **Per-inode fold** — truncate-resets-appends is "sum of appends after
   the last truncate": a partition-window max over (ts, eid) tuples and
   a conditional sum in the SAME hash partitioning (window + groupBy on
   `inode` share one exchange).

Scale: pass 1 shuffles the rename set (≪ log) log-D times; passes 2-3 are
one shuffle each on name/inode. Nothing is driver-side except the
bounded convergence counts (one scalar per doubling round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_ORDER = ("ts", "eid")


def derive_edit_log(events: DataFrame) -> DataFrame:
    """Deterministic edit log from the `events` table: each user owns one
    file. The FIRST signup creates it as `f0_<user>` (later signups are
    no-op re-creates, dropped — first-create-wins); each `view` renames
    it to `f<event_id>`; `purchase` appends `value` bytes; `error`
    truncates to 0; `click` touches mtime (OP_TIMES,
    `FSEditLogOpCodes.java:45`). Ops reference the file by the NAME
    current at their (ts, event_id) — the client-visible path, exactly
    what the journal records — so replay must resolve renames.

    Output schema (user_id intentionally dropped — replay sees only what
    the journal would hold): op, path, path2, delta, ts, eid.
    """
    f0 = F.concat(F.lit("f0_"), F.col("user_id").cast("string"))
    creates = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("c"))
        .select(
            "user_id",
            F.col("c.ts").alias("cts"),
            F.col("c.event_id").alias("ceid"),
        )
    )
    scoped = (
        events.join(creates, "user_id")
        .filter(
            F.struct("ts", "event_id") > F.struct(F.col("cts"), F.col("ceid"))
        )
        .filter(F.col("event_type").isin("view", "purchase", "error", "click"))
    )
    dst = F.when(
        F.col("event_type") == "view",
        F.concat(F.lit("f"), F.col("event_id").cast("string")),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    named = scoped.select(
        "event_type",
        "ts",
        "event_id",
        "value",
        dst.alias("dst"),
        F.coalesce(F.last(dst, ignorenulls=True).over(w_prev), f0).alias(
            "prev_name"
        ),
    )
    op = (
        F.when(F.col("event_type") == "view", F.lit("OP_RENAME"))
        .when(F.col("event_type") == "purchase", F.lit("OP_APPEND"))
        .when(F.col("event_type") == "error", F.lit("OP_TRUNCATE"))
        .otherwise(F.lit("OP_TIMES"))
    )
    body = named.select(
        op.alias("op"),
        F.col("prev_name").alias("path"),
        F.col("dst").alias("path2"),
        F.when(F.col("event_type") == "purchase", F.col("value")).alias(
            "delta"
        ),
        "ts",
        F.col("event_id").alias("eid"),
    )
    adds = creates.select(
        F.lit("OP_ADD").alias("op"),
        f0.alias("path"),
        F.lit(None).cast("string").alias("path2"),
        F.lit(None).cast("double").alias("delta"),
        F.col("cts").alias("ts"),
        F.col("ceid").alias("eid"),
    )
    return adds.unionByName(body)


def resolve_rename_chains(log: DataFrame, max_iter: int = 30) -> DataFrame:
    """name → (inode, depth) for every name the log ever used. Pointer
    doubling over the rename graph: each round replaces every node's
    ancestor pointer with its ancestor's ancestor and adds the hop
    counts, halving the remaining chain — a depth-D chain resolves in
    ceil(log2 D) equi-joins. Rows whose ancestor has no pointer entry
    already point at a root (an OP_ADD name, never a rename dst).

    Malformed logs fail LOUDLY: if pointers are still unresolved after
    `max_iter` doublings — a rename cycle (every member's ancestor is
    itself a rename dst, so the chain never reaches a root) or a chain
    deeper than 2**max_iter — raises ValueError instead of emitting
    rows whose `inode` is a non-root intermediate name. Likewise a
    chain that RESOLVES but terminates at a name that was never
    OP_ADDed (a rename whose src never existed) raises rather than
    presenting that phantom terminal as the root inode."""
    ptr = (
        log.filter(F.col("op") == "OP_RENAME")
        .select(
            F.col("path2").alias("node"),
            F.col("path").alias("anc"),
            F.lit(1).alias("d"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        hop = ptr.select(
            F.col("node").alias("anc"),
            F.col("anc").alias("anc2"),
            F.col("d").alias("d2"),
        )
        # ONE materialization per round (r14): the join checkpoints
        # eagerly, the convergence count reads from the checkpointed
        # partitions, and the next round's ptr is a plain projection
        # of them — the old shape paid a second checkpoint-copy pass
        # per round for the same lineage cut.
        joined = ptr.join(hop, "anc", "left").localCheckpoint(eager=True)
        remaining = joined.filter(F.col("anc2").isNotNull()).count()
        ptr = joined.select(
            "node",
            F.coalesce("anc2", "anc").alias("anc"),
            (F.col("d") + F.coalesce("d2", F.lit(0))).alias("d"),
        )
        if remaining == 0:
            break
    else:
        raise ValueError(
            f"rename chains unresolved after {max_iter} pointer-doubling "
            f"rounds ({remaining} pointers still mid-chain): the rename "
            "graph has a cycle or a dst whose chain never reaches an "
            "OP_ADD root"
        )
    roots = log.filter(F.col("op") == "OP_ADD").select(
        F.col("path").alias("node"),
        F.col("path").alias("inode"),
        F.lit(0).alias("depth"),
    )
    phantom = (
        ptr.join(roots.select(F.col("node").alias("anc")), "anc", "left_anti")
        .select("anc")
        .limit(5)
        .collect()
    )
    if phantom:
        raise ValueError(
            "rename chains terminate at names never OP_ADDed (first few: "
            f"{sorted(r.anc for r in phantom)}): the log renames paths "
            "that have no creation record"
        )
    return roots.unionByName(
        ptr.select("node", F.col("anc").alias("inode"), F.col("d").alias("depth"))
    )


def replay(log: DataFrame) -> DataFrame:
    """Fold the log into the final image: one row per inode with its
    current name, rename/append/truncate counts, live size (appends
    after the last truncate — OP_TRUNCATE resets the file the way
    `FSEditLogLoader` applies TruncateOp before later AppendOps), and
    mtime (max op time, OP_TIMES included)."""
    # one derivation of the (possibly expensive) log lineage: the
    # rename resolver, the OP_ADD roots, the phantom probe and the
    # attribution join all read the same lazily-checkpointed pass (r14)
    log = log.localCheckpoint(eager=False)
    name_map = resolve_rename_chains(log)
    attr = log.select(
        F.coalesce("path2", "path").alias("name"), "op", "delta", "ts", "eid"
    )
    mapped = attr.join(name_map, attr["name"] == name_map["node"]).drop("node")
    w_inode = Window.partitionBy("inode")
    lt = F.max(
        F.when(F.col("op") == "OP_TRUNCATE", F.struct(*_ORDER))
    ).over(w_inode)
    with_lt = mapped.withColumn("lt", lt)
    live = (F.col("op") == "OP_APPEND") & (
        F.col("lt").isNull() | (F.struct(*_ORDER) > F.col("lt"))
    )
    return with_lt.groupBy("inode").agg(
        F.max_by("name", "depth").alias("final_path"),
        F.max("depth").cast("int").alias("n_renames"),
        F.count(F.when(F.col("op") == "OP_APPEND", 1)).alias("n_appends"),
        F.count(F.when(F.col("op") == "OP_TRUNCATE", 1)).alias("n_truncates"),
        F.round(
            F.coalesce(F.sum(F.when(live, F.col("delta"))), F.lit(0.0)), 2
        ).alias("live_size"),
        F.max("ts").alias("mtime_ts"),
    )


def retention_purge(
    images: DataFrame,
    segments: DataFrame,
    retain_images: int = 2,
    extra_edits: int = 10000,
) -> DataFrame:
    """NNStorage retention sweep (`hdfs/server/namenode/
    NNStorageRetentionManager.java:111` purgeOldStorage): keep the
    newest `retain_images` fsimages (dfs.namenode.num.checkpoints.
    retained); with fsimage_N the OLDEST retained image, everything up
    to txid N is reflected in it, so edit segments are purgeable below
    `purgeLogsFrom = max(0, N + 1 - extra_edits)` (:133-134 — the
    extra-edits cushion keeps a tail of already-applied txns for HA
    peers catching up); a segment containing purgeLogsFrom is kept
    WHOLE (the trimming loop at :150 never splits a segment).

    images: txid. segments: first_txid, last_txid. Output one row per
    artifact: kind ('image'|'edits'), first_txid, last_txid (= txid
    for images), action ('KEEP'|'PURGE'), reason ('RETAINED_IMAGE' /
    'OLD_IMAGE' / 'REQUIRED' — covers txns past the oldest retained
    image / 'CUSHION' — kept only by the extra-edits tail /
    'PURGEABLE'). Both inputs are checkpoint-count-sized control-plane
    tables; the one global window is deliberate and bounded, the same
    documented shape as operators/balancer."""
    w = Window.orderBy(F.col("txid").desc())
    ranked = images.select(
        "txid", F.row_number().over(w).alias("__r")
    )
    scalars = ranked.filter(F.col("__r") <= retain_images).agg(
        F.min("txid").alias("__min_img")
    )
    img = ranked.crossJoin(F.broadcast(scalars)).select(
        F.lit("image").alias("kind"),
        F.col("txid").alias("first_txid"),
        F.col("txid").alias("last_txid"),
        F.when(F.col("__r") <= retain_images, F.lit("KEEP"))
        .otherwise(F.lit("PURGE"))
        .alias("action"),
        F.when(F.col("__r") <= retain_images, F.lit("RETAINED_IMAGE"))
        .otherwise(F.lit("OLD_IMAGE"))
        .alias("reason"),
    )
    min_required = F.col("__min_img") + 1
    purge_from = F.greatest(min_required - extra_edits, F.lit(0))
    seg = segments.crossJoin(F.broadcast(scalars)).select(
        F.lit("edits").alias("kind"),
        "first_txid",
        "last_txid",
        F.when(F.col("last_txid") < purge_from, F.lit("PURGE"))
        .otherwise(F.lit("KEEP"))
        .alias("action"),
        F.when(F.col("last_txid") < purge_from, F.lit("PURGEABLE"))
        .when(F.col("last_txid") < min_required, F.lit("CUSHION"))
        .otherwise(F.lit("REQUIRED"))
        .alias("reason"),
    )
    return img.unionByName(seg)


def checkpoint_triggers(
    state: DataFrame, txn_count: int, period_sec: int
) -> DataFrame:
    """Standby-checkpoint trigger evaluation for a fleet of
    namespaces (reference namenode/ha/StandbyCheckpointer.java:
    445-480 — in order: a pending rollback image always triggers;
    else uncheckpointed txns >= dfs.namenode.checkpoint.txns; else
    seconds since the last checkpoint >= dfs.namenode.checkpoint.
    period; and a triggered checkpoint is SKIPPED when `now` is still
    inside the about-to-failover quiet window preventCheckpointsUntil,
    counting toward canceledCount).

    `state`: (ns, uncheckpointed long, secs_since_last long,
    need_rollback bool, now long, prevent_until long). One codegen
    CASE pass — no shuffle at all."""
    trigger = (
        F.when(F.col("need_rollback"), F.lit("ROLLBACK"))
        .when(F.col("uncheckpointed") >= txn_count, F.lit("TXN_COUNT"))
        .when(F.col("secs_since_last") >= period_sec, F.lit("PERIOD"))
        .otherwise(F.lit("NONE"))
    )
    action = (
        F.when(trigger == "NONE", F.lit("NONE"))
        .when(
            F.col("now") < F.col("prevent_until"),
            F.lit("SKIPPED_FAILOVER"),
        )
        .otherwise(F.lit("CHECKPOINT"))
    )
    return state.select(
        "ns",
        "uncheckpointed",
        "secs_since_last",
        trigger.alias("trigger"),
        action.alias("action"),
    )
