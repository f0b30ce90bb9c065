"""EC striped-read geometry: logical byte ranges over RS-striped block
groups → aligned stripes → per-internal-block chunk fetch plans,
including the recovery reads that substitute parity when a data block
is lost — the read-path half of erasure coding (the repo's RS
encode/reconstruct kernels are the write/repair half).

Reference semantics (`hdfs-client/util/StripedBlockUtil.java`):

- ``divideByteRangeIntoStripes:404`` — Step 1
  ``getStripingCellsOfByteRange:437`` maps the inclusive byte range to
  cells: cell g of the block group lives on internal block ``g % k``
  at internal-block cell index ``g / k`` (``StripingCell:655-664``);
  the first/last cells carry the partial offset/size
  (``:452-470``). Step 2 ``getRangesForInternalBlocks:478`` folds the
  cells of each internal block into one VerticalRange (start = first
  cell's physical offset, span = sum of cell sizes); parity blocks
  get the [earliestStart, latestEnd] envelope (``:505-509``). Step 3
  ``mergeRangesForInternalBlocks:517`` collects every range's
  endpoints (plus the block group's last-cell end offset when it
  falls strictly inside, ``:530-539``) into a sorted point set whose
  consecutive pairs are the 1-5 AlignedStripes — within a stripe
  every internal block is processed uniformly (``AlignedStripe``
  header ``:678-695``).
- ``getInternalBlockLength:210-229`` + ``lastCellSize:255-266``: an
  internal block's physical length; data blocks past the block
  group's logical end are shorter, and ``prepareAllZeroChunks:
  602-616`` marks a data chunk whose block length <= the stripe
  offset ALLZERO — known-zero decode input, nothing fetched.
- Recovery reads (``DFSStripedInputStream.java`` StripeReader: a
  failed/missing data chunk flips the stripe into decode mode — read
  until k chunks of the stripe are available, preferring remaining
  data blocks and then parity, then RS-decode the missing chunk;
  ALLZERO chunks count as known inputs). The deterministic selection
  here — surviving data blocks in index order, then parity in index
  order, stopping at k total inputs — is the planning-time shape of
  that preference.

Spark-first closed form: no per-request loops. Cells are one
``sequence()`` explode; vertical ranges one groupBy on the
(request, internal-block) key; the point-set merge is per-request
array algebra (<= 2k+1 points by construction — tiny arrays, codegen
throughout); chunk classification and the recovery-input ranking are
one join plus windows over the (request, stripe) key. Everything
shuffles on the request key family only — a billion concurrent read
plans partition-parallel, O(cells + stripes*(k+p)) work per request.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

NO_RECOVERY = "NO_RECOVERY_INSUFFICIENT_BLOCKS"
TRUNCATE = "TRUNCATE_TO_NEW_SIZE"
EXCLUDED = "EXCLUDED_SHORT"


def _internal_block_length(
    data_size: Column, cell: Column, k: Column, idx: Column
) -> Column:
    """getInternalBlockLength:210-229 + lastCellSize:255-266 as one
    expression. ``idx`` may be a parity index (>= k): parity blocks are
    as long as block 0 (lastCellSize skips the shift for i >= k)."""
    stripe_sz = cell * k
    last_len = data_size % stripe_sz
    num_stripes = F.floor((data_size - 1) / stripe_sz) + 1
    shifted = F.when(
        idx < k, F.greatest(last_len - idx * cell, F.lit(0))
    ).otherwise(last_len)
    last_cell = F.least(shifted, cell)
    return F.when(last_len == 0, (data_size / k).cast("long")).otherwise(
        (num_stripes - 1) * cell + last_cell
    )


def plan_striped_reads(
    requests: DataFrame, lost: DataFrame | None = None
) -> DataFrame:
    """Plan every read request's stripe/chunk fetch geometry.

    ``requests``: (req_id long, data_size long — block group LOGICAL
    size, only counting data bytes, cell_size long, data_units int,
    parity_units int, range_start long, range_end long — INCLUSIVE,
    like the reference). ``lost``: (req_id, blk_idx int) — internal
    blocks unavailable to that request's read.

    Returns one row per planned chunk: req_id, stripe_id (0-based in
    offset order), stripe_off / stripe_span (the vertical range every
    touched block shares), blk_idx, kind, fetch_off / fetch_span
    (bytes actually read from that block; partial-tail fetches are
    clipped to the internal block length, the remainder zero-padded),
    and the stripe-level ``recoverable`` flag. Kinds:

    - DATA            requested chunk on a live block — normal fetch
    - ALLZERO         data chunk beyond the block's length — known
                      zero, no fetch (prepareAllZeroChunks)
    - DECODE_TARGET   requested chunk on a LOST block — output of the
                      RS decode, no fetch
    - RECOVERY_FETCH  extra chunk (surviving data first, then parity)
                      read only to give the decoder k inputs

    Ranges violating the reference's precondition (start > end or
    end >= data_size, ``:446-449``) yield a single INVALID_RANGE row
    rather than a silent empty plan."""
    # one evaluation of the request lineage (r14): the geometry
    # consumes `requests` in the invalid branch, the cell explode and
    # the stripe-merge join; without the lineage cut Catalyst re-ran
    # the upstream derivation per branch (10 scans in the before-plan)
    requests = requests.localCheckpoint(eager=False)
    k = F.col("data_units").cast("long")
    p = F.col("parity_units").cast("long")
    c = F.col("cell_size").cast("long")
    start, end = F.col("range_start"), F.col("range_end")

    bad = (start > end) | (end >= F.col("data_size")) | (start < 0)
    invalid = requests.where(bad).select(
        "req_id",
        F.lit(-1).cast("long").alias("stripe_id"),
        F.lit(None).cast("long").alias("stripe_off"),
        F.lit(None).cast("long").alias("stripe_span"),
        F.lit(-1).cast("int").alias("blk_idx"),
        F.lit("INVALID_RANGE").alias("kind"),
        F.lit(None).cast("long").alias("fetch_off"),
        F.lit(None).cast("long").alias("fetch_span"),
        F.lit(False).alias("recoverable"),
    )
    reqs = requests.where(~bad)

    # Step 1 — cells (getStripingCellsOfByteRange:437-470)
    length = end - start + 1
    first_g = F.floor(start / c)
    last_g = F.floor(end / c)
    g = F.col("g")
    cells = reqs.select(
        "*", F.explode(F.sequence(first_g, last_g)).alias("g")
    ).select(
        "req_id",
        (g % k).cast("int").alias("blk_idx"),
        (
            F.floor(g / k) * c
            + F.when(g == first_g, start % c).otherwise(F.lit(0))
        ).alias("cell_off"),
        F.when(g == first_g, F.least(c - start % c, length))
        .when(g == last_g, end % c + 1)
        .otherwise(c)
        .alias("cell_size"),
    )

    # Step 2 — per-block vertical ranges (getRangesForInternalBlocks)
    # consumed by both the stripe-point merge and the chunk join —
    # checkpoint so the cell explode + aggregate runs once (r14)
    vr = cells.groupBy("req_id", "blk_idx").agg(
        F.min("cell_off").alias("voff"),
        F.sum("cell_size").alias("vspan"),
    ).localCheckpoint(eager=False)

    # Step 3 — merge endpoints into stripes (mergeRangesForInternalBlocks).
    # The parity envelope [earliestStart, latestEnd+1] endpoints are the
    # min/max of the data endpoints, so the data ranges alone carry every
    # point; the block group's last-cell end joins when strictly inside.
    pts = vr.groupBy("req_id").agg(
        F.array_sort(
            F.array_distinct(
                F.flatten(
                    F.collect_list(
                        F.array(F.col("voff"), F.col("voff") + F.col("vspan"))
                    )
                )
            )
        ).alias("pts")
    )
    with_req = pts.join(reqs, "req_id")
    last_cell_end = (
        F.floor(F.floor(F.col("data_size") / c) / k) * c
        + F.col("data_size") % c
    )
    lo, hi = F.get("pts", 0), F.element_at("pts", -1)
    pts2 = with_req.select(
        "*",
        F.array_sort(
            F.when(
                (lo < last_cell_end) & (last_cell_end < hi),
                F.array_distinct(
                    F.concat(F.col("pts"), F.array(last_cell_end))
                ),
            ).otherwise(F.col("pts"))
        ).alias("pts2"),
    )
    stripes = pts2.select(
        "req_id", "data_size", "cell_size", "data_units", "parity_units",
        F.posexplode(
            F.expr(
                "transform(slice(pts2, 1, size(pts2) - 1), "
                "(s, i) -> struct(s as off, pts2[i + 1] - s as span))"
            )
        ).alias("stripe_id", "s"),
    ).select(
        "req_id", "data_size", "cell_size", "data_units", "parity_units",
        "stripe_id",
        F.col("s.off").alias("stripe_off"),
        F.col("s.span").alias("stripe_span"),
    )

    # Steps 4/5 — chunk classification per (stripe x internal block)
    chunks = stripes.select(
        "*",
        F.explode(F.sequence(F.lit(0), (k + p - 1).cast("int"))).alias(
            "blk_idx"
        ),
    ).join(vr, ["req_id", "blk_idx"], "left")
    if lost is not None:
        chunks = chunks.join(
            lost.select(
                "req_id", "blk_idx", F.lit(True).alias("__lost")
            ),
            ["req_id", "blk_idx"],
            "left",
        ).withColumn("__lost", F.coalesce("__lost", F.lit(False)))
    else:
        chunks = chunks.withColumn("__lost", F.lit(False))

    s_off, s_span = F.col("stripe_off"), F.col("stripe_span")
    is_data = F.col("blk_idx") < k
    ibl = _internal_block_length(
        F.col("data_size"), c, k, F.col("blk_idx")
    )
    # stripes are split at every range endpoint, so overlap means the
    # stripe sits fully inside the block's vertical range
    in_range = F.col("voff").isNotNull() & (F.col("voff") <= s_off) & (
        s_off < F.col("voff") + F.col("vspan")
    )
    base_kind = (
        F.when(is_data & in_range & ~F.col("__lost"), F.lit("DATA"))
        .when(is_data & in_range, F.lit("DECODE_TARGET"))
        .when(is_data & (ibl <= s_off), F.lit("ALLZERO"))
    )
    avail_span = F.least(s_span, ibl - s_off)
    classified = chunks.select(
        "req_id", "stripe_id", "stripe_off", "stripe_span", "blk_idx",
        "data_units",
        base_kind.alias("kind"),
        F.col("__lost").alias("lost"),
        avail_span.alias("avail_span"),
        is_data.alias("is_data"),
    )

    sw = Window.partitionBy("req_id", "stripe_id")
    need_decode = F.max((F.col("kind") == "DECODE_TARGET").cast("int")).over(
        sw
    ) == 1
    free_inputs = F.sum(
        F.col("kind").isin("DATA", "ALLZERO").cast("long")
    ).over(sw)
    is_candidate = (
        F.col("kind").isNull() & ~F.col("lost") & (F.col("avail_span") > 0)
    )
    # surviving data blocks first, then parity, index order each
    cand_rank = F.sum(F.col("is_candidate_i")).over(
        sw.orderBy(F.col("is_data").desc(), F.col("blk_idx").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_candidates = F.sum(F.col("is_candidate_i")).over(sw)
    staged = classified.withColumn(
        "is_candidate_i", is_candidate.cast("long")
    ).select(
        "*",
        need_decode.alias("__need"),
        free_inputs.alias("__free"),
        n_candidates.alias("__ncand"),
        cand_rank.alias("__crank"),
    )
    needed = F.col("data_units").cast("long") - F.col("__free")
    kind2 = F.when(F.col("kind").isNotNull(), F.col("kind")).when(
        F.col("__need")
        & (F.col("is_candidate_i") == 1)
        & (F.col("__crank") <= needed),
        F.lit("RECOVERY_FETCH"),
    )
    recoverable = ~F.col("__need") | (
        F.col("__free") + F.col("__ncand") >= F.col("data_units")
    )
    fetch_span = (
        F.when(F.col("kind2") == "DATA", F.col("stripe_span"))
        .when(F.col("kind2") == "RECOVERY_FETCH", F.col("avail_span"))
        .otherwise(F.lit(0))
        .cast("long")
    )
    out = (
        staged.withColumn("kind2", kind2)
        .where(F.col("kind2").isNotNull())
        .select(
            "req_id",
            F.col("stripe_id").cast("long").alias("stripe_id"),
            "stripe_off",
            "stripe_span",
            "blk_idx",
            F.col("kind2").alias("kind"),
            F.when(fetch_span > 0, F.col("stripe_off"))
            .cast("long")
            .alias("fetch_off"),
            fetch_span.alias("fetch_span"),
            recoverable.alias("recoverable"),
        )
    )
    return out.unionByName(invalid)


def plan_striped_recovery(reports: DataFrame) -> DataFrame:
    """Striped lease/block recovery planning
    (`BlockRecoveryWorker.java` RecoveryTaskStriped.recover:430-490 +
    getSafeLength:522-532 → `StripedBlockUtil.getSafeLength:240-253`).

    ``reports``: one row per internal block that responded to
    initReplicaRecovery — (group_id long, blk_idx int, num_bytes long,
    cell_size long, data_units int, parity_units int).

    Reference walk, closed-form per group:

    - ``checkLocations:534-539``: fewer than k reporting internal
      blocks aborts the whole group (every row NO_RECOVERY, NULL
      safe_length).
    - safe length = ``lastFullStripeIdx * stripeSize`` where
      lastFullStripeIdx floors the k-th LARGEST reported length (data
      and parity lengths sorted together, :246-252) by the cell size —
      the largest stripe count guaranteed reconstructable.
    - per block ``newSize = getInternalBlockLength(safeLength, ...)``
      (:456); because the safe length is stripe-aligned this is
      uniformly ``safeLength / k`` for every index incl. parity. A
      block joins the truncate-to-RUR set iff its reported length >=
      newSize (:458-460) — at least k always qualify (the reference's
      ``assert rurList.size() >= dataBlkNum``, which the k-th-largest
      floor makes a theorem); the rest are excluded and zeroed from
      the new locations (:469-474).

    One shuffle on group_id: a window ranks lengths, a second
    same-keyed window broadcasts the pivot and the report count —
    millions of concurrent recoveries stay partition-parallel."""
    k = F.col("data_units").cast("long")
    wg = Window.partitionBy("group_id")
    rn = F.row_number().over(
        wg.orderBy(F.col("num_bytes").desc(), F.col("blk_idx"))
    )
    staged = reports.withColumn("__rn", rn).select(
        "*",
        F.count(F.lit(1)).over(wg).alias("__n"),
        F.max(F.when(F.col("__rn") == k, F.col("num_bytes"))).over(wg).alias(
            "__pivot"
        ),
    )
    safe_len = F.floor(F.col("__pivot") / F.col("cell_size")) * F.col(
        "cell_size"
    ) * k
    new_size = (safe_len / k).cast("long")
    enough = F.col("__n") >= k
    return staged.select(
        "group_id",
        "blk_idx",
        "num_bytes",
        F.when(enough, safe_len).cast("long").alias("safe_length"),
        F.when(enough, new_size).cast("long").alias("new_size"),
        F.when(~enough, F.lit(NO_RECOVERY))
        .when(F.col("num_bytes") >= new_size, F.lit(TRUNCATE))
        .otherwise(F.lit(EXCLUDED))
        .alias("action"),
    )
