#!/usr/bin/env python
"""Plan audit: for every headline query, extract the physical-plan
properties that matter at 100 TB and write PLANS.md — the receipts
behind the scale claims, regenerated per round.

Audited per query (at $SPARK_GRAFT_SF_DIR, default sf0.1):
- exchanges: shuffle count (every one is a full network pass of its input)
- broadcasts: BroadcastHashJoin/BroadcastNestedLoop count (dims must
  broadcast; a missing broadcast turns a map-side join into a shuffle)
- sorts: SortExec count (global sorts are range exchanges, fine; a
  single-partition sort would also show up as exchanges=SinglePartition)
- single_partition: whether any Exchange targets SinglePartition — the
  classic scale-killer (global windows without partitioning)
- codegen: WholeStageCodegen span count (JVM-compiled pipelines; Python
  batch operators sit outside, by design, behind Arrow)
- pushed: whether any parquet scan reports PushedFilters (scan-level
  predicate pruning reached the reader)
- python: ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas operator
  count (the deliberate Arrow-batched Python kernels; anything here must
  be one of the documented llmops kernels, never a row-at-a-time UDF)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_source_spark import get_spark, workload  # noqa: E402


def audit(spark, fn, sf_dir: str) -> dict:
    # Plan with AQE off for the audit: static planning annotates
    # WholeStageCodegen stages (*(n)) without executing, and every
    # Exchange/broadcast decision is visible up front. (fn() runs first —
    # data.table() re-enables AQE defensively — then we flip the conf
    # before the lazy planning happens at toString time.)
    df = fn(spark, sf_dir)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # a SinglePartition exchange is benign when it feeds a grand-total
    # scalar aggregate (keys=[], one row per upstream partition — e.g. a
    # min/max or count-distinct broadcast); it is a scale flag only when
    # something data-sized (Window/Sort) runs behind it.
    sp_bad = 0
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        parent = lines[i - 1] if i else ""
        if not re.search(r"HashAggregate\(keys=\[\]", parent):
            sp_bad += 1
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "broadcasts": len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan)),
        "sorts": len(re.findall(r"\bSort\b", plan)),
        "single_partition": sp_bad > 0,
        "codegen": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "pushed": "PushedFilters: [" in plan
        and bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        "python": len(
            re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)
        ),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="hss-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    # headline set + the round-4 beyond-reference operators: same receipts
    audited = dict(workload.headline_queries())
    for extra in (
        "quality_repetition_filter", "boilerplate_prune",
        "time_resample_gapfill", "pivot_event_matrix", "stats_corr_suite",
        "distcp_sync_plan", "semdedup_prune", "fsck_report",
        "balancer_move_plan", "ec_reconstruct_check", "zorder_curve",
        "perplexity_quality_filter", "retention_expiry_plan",
        "window_suite_2", "sketch_cms_user_counts", "cdc_merge_apply",
        "events_sliding_windows", "ec_rs_reconstruct_check",
        "dedup_span_exact", "dsir_selection", "block_placement_plan",
        "encryption_zone_roundtrip", "asof_nearest_tolerance",
        "weighted_sample_docs", "distcp_incremental_plan",
        "storage_mover_plan", "cache_directive_plan",
        "quality_classifier_scores", "bpe_tokenize_stats",
        "dsir_selection", "capacity_scheduler_allocation",
        "table_stats_report",
        "bm25_search", "dedup_span_rewrite", "cross_source_dup_matrix",
        "ann_pq_topk", "kll_quantile_store", "theta_retention_overlap",
        "funnel_conversion", "bpe_tokenize_stats", "editlog_replay",
        "knn_label_classify", "knn_label_classify_ivf",
        "hybrid_search_rrf",
        "audit_log_summary", "embedding_class_stats",
        "replication_repair_plan", "storage_type_quota_report",
        "permission_check_matrix", "nntop_window_users",
        "rpc_scheduler_priority", "datanode_liveness_report",
        "safemode_report", "anomaly_rolling_zscore",
        "delegation_token_sweep", "pca_embedding_projection",
        "lease_recovery_sweep", "xattr_store_report",
        "doc_chunking_rag", "drf_fair_share_ranking",
        "contrastive_pair_mining", "length_bucket_batching",
        "speculative_execution_plan", "range_partition_advisor",
        "cusum_drift_detection", "preemption_reclaim_plan",
        "acl_transformation_apply", "qjm_segment_recovery",
        "disk_balancer_plan", "replica_read_ordering",
        "mount_table_resolution", "composite_file_checksum",
        "writable_hash_partitioning", "trash_expunge_sweep",
        "volume_choice_assignment", "zipf_token_spectrum",
        "block_scanner_queue", "observer_read_routing",
        "rbf_quota_report", "curriculum_phases",
        "nnstorage_retention", "distcp_checksum_delta",
        "slow_peer_report", "bitext_margin_mining",
        "bitext_margin_mining_ivf",
        "ec_policy_matrix", "hedged_read_plan",
        "block_report_reconcile", "maintenance_readiness_report",
        "snapshot_reclaim_report",
        "config_resolution", "proxy_user_matrix",
        "retry_schedule_matrix",
        "token_entropy_report",
        "service_acl_host_matrix",
        "bpe_pair_merge",
        "reservation_admission_plan", "node_label_allocation",
        "oiv_file_distribution", "webhdfs_liststatus_scan",
        "reservation_integral_quota", "fair_queue_placement",
        "pipeline_recovery_plan", "wrr_callqueue_drain",
        "retry_cache_replay",
        "federation_router_decisions", "federation_amrm_split",
        "encryption_zone_resolution", "ez_rename_validity",
        "locality_delay_schedule", "kms_key_acl_matrix",
        "opportunistic_queue_plan",
        "rename_quota_check", "directory_scanner_reconcile",
        "intra_queue_app_order", "queue_assignment_order",
        "lazy_persist_eviction", "snapshot_admission_check",
        "upgrade_domain_placement_report", "url_canonical_dedup",
        "stupid_backoff_lm_score", "temperature_resample",
        "am_blacklist_updates", "checkpoint_trigger_plan",
        "fim_transform_corpus", "concat_chunk_training_stream",
        "embedding_decontamination", "queue_hierarchy_capacities",
    "aggregated_log_index", "log_retention_sweep",
    "ec_striped_read_plan", "local_cache_cleanup",
    "resource_request_normalize", "wet_extract_pipeline",
    "unigram_lm_tokenize_stats", "ec_striped_lease_recovery",
    "nodes_refresh_plan", "user_limit_matrix",
    "am_attempt_retry_policy", "auth_to_local_mapping",
    "container_memory_check", "span_corruption_transform",
    "fair_starvation_report", "scheduler_headroom_matrix",
    "cs_queue_mapping", "token_renewal_plan",
    "ifile_log_lookup", "scm_bootstrap_index", "scm_cleaner_plan",
    "scr_cache_sweep", "flow_run_rollup",
    "zkfc_failover_matrix", "zkfc_electability",
    "groups_cache_lookup", "container_relaunch_plan",
    "block_report_lease_check", "block_report_lease_admission",
    "placement_constraint_matrix", "sps_file_status", "sps_move_plan",
    "rbf_membership_quorum", "rbf_namenode_priority",
    "reencryption_batch_plan", "reencryption_zone_report",
    "app_lifetime_plan", "nfs_write_reorder",
    "router_safemode_plan", "cs_absolute_resources",
    "cs_allocation_activities", "flow_activity_rollup",
    "auto_queue_management", "provided_alias_map",
    "yarn_service_rollup", "cgroups_usage_kill",
    "gpu_allocation_matrix", "registry_dns_zone", "oom_kill_order",
    "timeline_filter_grammar", "nm_container_recovery",
    "rm_app_state_recovery", "node_queue_limit",
    "federation_random_routing", "fpga_allocation_matrix",
    "placement_spec_parse", "timeline_data_to_retrieve",
    "timeline_uid_roundtrip", "retrieval_metrics_hybrid",
    "mmr_diversify_hybrid",
    # round 14
    "decom_watcher_status", "nm_health_report",
    "docker_runtime_admission", "ahs_history_rollup",
    "semdedup_prune_pinned", "knn_ivf_pinned", "bitext_ivf_pinned",
    "quality_scores_pinned", "egfs_timeline_scan",
    "amproxy_filter_matrix", "metrics_sink_rollup",
    ):
        audited.setdefault(extra, workload.QUERIES[extra].fn)
    rows = {}
    for name, fn in audited.items():
        try:
            rows[name] = audit(spark, fn, sf_dir)
        except Exception as exc:
            rows[name] = {"error": str(exc)[:200]}

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lines = [
        "# Plan audit — headline queries (regenerate: `python scripts/plan_audit.py`)",
        "",
        f"Physical-plan properties at `{sf_dir}`. See scripts/plan_audit.py",
        "for what each column means and why it matters at 100 TB.",
        "",
        "| query | exchanges | broadcasts | sorts | 1-part? | codegen | pushed | py-ops |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, r in rows.items():
        if "error" in r:
            lines.append(f"| {name} | ERROR: {r['error']} | | | | | | |")
            continue
        lines.append(
            f"| {name} | {r['exchanges']} | {r['broadcasts']} | {r['sorts']} "
            f"| {'**YES**' if r['single_partition'] else 'no'} | {r['codegen']} "
            f"| {'yes' if r['pushed'] else 'no'} | {r['python']} |"
        )
    # Every SinglePartition flag must be ADJUDICATED: either listed here
    # with its bounding argument (the windowed table is control-plane-
    # sized and the total order is the algorithm), or the audit says
    # "fix" and stays red until it is. Keys absent from the flag set are
    # reported as stale so this list can't rot.
    sp_exceptions = {
        "balancer_move_plan": (
            "cumulative-interval pairing windows run on the NODE-COUNT-"
            "sized utilization table (rows == datanodes, metadata scale); "
            "the balancer serializes there too"
        ),
        "capacity_scheduler_allocation": (
            "the global admission cumsum runs on the APP table (rows == "
            "running apps) after the data-sized partial-agg groupBy has "
            "reduced the input; the scheduler's allocation loop is a "
            "total order by construction"
        ),
        "nnstorage_retention": (
            "retention_purge's ranking window runs on the CHECKPOINT-"
            "COUNT-sized fsimage/edit-segment tables of one namenode "
            "(tens of rows; NNStorageRetentionManager sorts the same "
            "list in memory)"
        ),
        "opportunistic_queue_plan": (
            "the water-filling windows run on the NODE-REGISTRY-sized "
            "table AFTER the data-sized heartbeat reduction (one "
            "node_id groupBy); the capacity-gated round-robin is a "
            "total order over nodes by definition"
        ),
        "rm_app_state_recovery": (
            "statestore.fence_intervals' lead() window runs on the "
            "FENCE LOG — one row per RM failover (single digits); the "
            "intervals then broadcast into the data-sized write join"
        ),
    }
    bad = [n for n, r in rows.items() if r.get("single_partition")]
    unadjudicated = [n for n in bad if n not in sp_exceptions]
    stale = [n for n in sp_exceptions if n in rows and n not in bad]
    lines += [
        "",
        (
            "No headline query plans a SinglePartition exchange."
            if not bad
            else "SinglePartition exchanges found in: "
            + ", ".join(bad)
            + (
                " — every one adjudicated below."
                if not unadjudicated
                else f" — UNADJUDICATED (fix): {', '.join(unadjudicated)}."
            )
        ),
        "",
        "Adjudicated exceptions (control-plane-bounded by design):",
    ]
    for name_, why in sp_exceptions.items():
        lines.append(f"- {name_}: {why}.")
    if stale:
        lines.append(
            f"- STALE exceptions (no longer flagged, prune): {stale}"
        )
    lines += [
        "",
        "Caveats: iterative queries (dedup_connected_components) cut",
        "lineage with localCheckpoint between rounds, so the audited plan",
        "is the final read — per-round shuffle shape is asserted in",
        "tests/test_plans.py instead; provided_alias_map's two alias-map",
        "codec kernels likewise sit behind lineage cuts (run once,",
        "scanned by every branch), so its py-ops column reads 0 — the",
        "kernels are documented in operators/aliasmap.py and COVERAGE.md.",
        "py-ops are the documented Arrow-batched kernels (minhash",
        "signatures, BLAS scoring, text profiling); row-at-a-time Python",
        "UDFs appear nowhere.",
    ]
    with open(os.path.join(repo, "PLANS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(rows))
    spark.stop()


if __name__ == "__main__":
    main()
