"""Measured slow tier (VERDICT r13 #7): exact node ids of tests
whose call phase took >= 8 s in the full-suite durations run
(plans/r14/pytest_durations_r14.txt). conftest marks these
"slow" at collection; the default run deselects them so the
default tier lands under ~20 min, while `pytest -m slow` (or
-m "") runs the full suite — the close-of-round protocol.
A renamed/reparametrized test silently drops off this list and
runs in the DEFAULT tier — the safe direction.
"""

SLOW_TESTS = {
    "tests/test_auditlog.py::test_db_watchdog_recovers_then_expires",  # 8s
    "tests/test_auditlog.py::test_run_incremental_jdbc_end_to_end",  # 16s
    "tests/test_auditlog.py::test_run_incremental_jdbc_start_after_id",  # 9s
    "tests/test_batch_replication.py::test_copy_new_tables_then_propagate_drops",  # 13s
    "tests/test_batch_replication.py::test_incremental_update_copies_changed_data_only",  # 8s
    "tests/test_cdf_stream.py::test_publish_after_later_commits_reaches_downstream",  # 10s
    "tests/test_cdf_stream.py::test_pump_snapshot_then_increments",  # 20s
    "tests/test_cdf_stream.py::test_range_apply_is_idempotent",  # 21s
    "tests/test_cdf_stream.py::test_range_apply_replay_never_duplicates_inserts",  # 20s
    "tests/test_compaction.py::test_execute_compaction_single_job_many_dirs",  # 9s
    "tests/test_composite_spec.py::test_spec_incremental_publish_rewrites_only_own_cells",  # 9s
    "tests/test_datapipe.py::test_kmeans_large_k_matrix_path",  # 8s
    "tests/test_datapipe.py::test_semdedup_invariants",  # 15s
    "tests/test_datapipe.py::test_stream_neardup_cross_batch_suppression",  # 10s
    "tests/test_delete_by_key.py::test_lifecycle",  # 9s
    "tests/test_eq_upserts.py::test_stream_upsert_exactly_once_and_latest_state",  # 9s
    "tests/test_fault_injection.py::test_stream_crash_between_batches_replays_only_tail",  # 23s
    "tests/test_fault_injection.py::test_stream_crash_mid_batch_recovers_from_checkpoint",  # 36s
    "tests/test_fault_injection.py::test_stream_transient_fault_absorbed_without_restart",  # 16s
    "tests/test_incremental.py::test_direct_api_mutations_replicate_end_to_end",  # 10s
    "tests/test_incremental.py::test_incremental_e2e_digest_multibatch_equivalence",  # 17s
    "tests/test_incremental.py::test_incremental_loop_with_checkpoint_restart",  # 17s
    "tests/test_incremental.py::test_rename_execution_moves_dest_table",  # 11s
    "tests/test_incremental.py::test_start_after_id_aborts_inflight_and_forces_resume",  # 9s
    "tests/test_kafka_bus.py::test_full_audited_scenario_through_kafka_composition",  # 18s
    "tests/test_monitor.py::test_pause_resume_stops_incremental_loop",  # 9s
    "tests/test_mor_deletes.py::test_cow_rewrite_kills_superseded_dvs",  # 13s
    "tests/test_mor_deletes.py::test_fold_preserves_dv_accounting",  # 11s
    "tests/test_mor_deletes.py::test_mor_as_of_reads_skip_later_deletes",  # 29s
    "tests/test_mor_deletes.py::test_mor_delete_emptying_buckets_drops_them_from_plans",  # 12s
    "tests/test_mor_deletes.py::test_mor_overlapping_deletes_never_double_count",  # 10s
    "tests/test_mor_deletes.py::test_mor_refused_on_orc_layout",  # 19s
    "tests/test_mor_deletes.py::test_vacuum_sweeps_dead_dv_deltas",  # 9s
    "tests/test_partition_scale.py::test_merge_scale_job_count_flat_at_10x",  # 11s
    "tests/test_partition_scale.py::test_pubmap_model_equivalence_property",  # 18s
    "tests/test_plan_shapes.py::test_registry_wide_no_row_python_no_cartesian",  # 315s
    "tests/test_registry_smoke.py::test_registered_query_executes[cdf_incremental_sync]",  # 9s
    "tests/test_registry_smoke.py::test_registered_query_executes[stream_cdf_sync]",  # 10s
    "tests/test_registry_smoke.py::test_registered_query_executes[stream_upsert_latest]",  # 11s
    "tests/test_rewrite_manifests.py::test_append_auto_fold_keeps_delta_count_bounded",  # 26s
    "tests/test_rewrite_manifests.py::test_fold_crash_windows_converge",  # 38s
    "tests/test_rewrite_manifests.py::test_fold_leaves_data_identical_and_answers_unchanged",  # 10s
    "tests/test_rewrite_manifests.py::test_fold_then_append_then_refold",  # 10s
    "tests/test_rewrite_manifests.py::test_mutations_compose_after_fold",  # 9s
    "tests/test_rewrite_manifests.py::test_vacuum_retention_protects_prefold_dirs",  # 17s
    "tests/test_rewrite_manifests.py::test_vacuum_sweeps_dirs_stranded_below_fold",  # 16s
    "tests/test_rewrite_manifests.py::test_zonemap_maintain_policy_dispatch",  # 30s
    "tests/test_skew_and_properties.py::test_chunked_running_sum_equals_single_window",  # 13s
    "tests/test_skew_and_properties.py::test_compact_plan_invariants",  # 15s
    "tests/test_skew_and_properties.py::test_diff_planner_invariants",  # 34s
    "tests/test_skew_and_properties.py::test_zero_vector_survives_unit_norm_and_kmeans",  # 19s
    "tests/test_skew_and_properties.py::test_zonemap_fold_replace_vacuum_model_equivalence",  # 76s
    "tests/test_skew_and_properties.py::test_zonemap_mor_upsert_model_equivalence",  # 70s
    "tests/test_skew_and_properties.py::test_zonemap_overwrite_merge_recluster_stats_model_equivalence",  # 58s
    "tests/test_skew_and_properties.py::test_zonemap_prune_count_delete_model_equivalence",  # 38s
    "tests/test_sources.py::test_zonemap_hashed_column_type_change_refused",  # 8s
    "tests/test_sources.py::test_zonemap_hidden_partitioning_bucket_expr",  # 9s
    "tests/test_sources.py::test_zonemap_ndv_kmv_sketch",  # 9s
    "tests/test_streaming.py::test_funnel_ttl_path",  # 8s
    "tests/test_streaming.py::test_stream_fold_does_not_starve_compaction",  # 10s
    "tests/test_streaming.py::test_stream_replicate_end_to_end",  # 14s
    "tests/test_streaming.py::test_stream_zonemap_autocompact_invariance_and_replay",  # 10s
    "tests/test_streaming.py::test_stream_zonemap_autofold_invariance_and_replay",  # 9s
    "tests/test_streaming.py::test_stream_zonemap_batch_boundary_invariance",  # 9s
    "tests/test_tiff.py::test_lzw_primitives_incl_clear_boundary",  # 10s
    "tests/test_time_travel.py::test_rollback_restores_and_resurrects",  # 9s
    "tests/test_zonemap_changes.py::test_change_feed_after_compact_only_new_commits",  # 9s
    "tests/test_zonemap_replication.py::test_dest_only_zonemapped_table_is_never_dropped",  # 9s
    "tests/test_zonemap_replication.py::test_incremental_event_drives_incremental_publish",  # 18s
    "tests/test_zonemap_replication.py::test_incremental_event_publishes_zonemapped_target",  # 9s
    "tests/test_zonemap_replication.py::test_incremental_publish_crash_before_watermark_converges",  # 19s
    "tests/test_zonemap_replication.py::test_incremental_publish_rewrites_only_affected_buckets",  # 20s
    "tests/test_zonemap_replication.py::test_legacy_descriptor_watermarks_migrate_to_pubmap",  # 14s
    "tests/test_zonemap_replication.py::test_replicate_hidden_partitioning_bucket_expr",  # 9s
    "tests/test_zonemap_replication.py::test_replicate_into_zonemapped_target",  # 9s
    "tests/test_zonemap_replication.py::test_replicate_zonemapped_converges_and_tombstones",  # 21s
    "tests/test_zonemap_replication.py::test_snapshot_then_incremental_flip_reseeds_and_tombstones",  # 15s
}
