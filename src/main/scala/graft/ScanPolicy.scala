package graft

/** Per-query parquet scan-split sizing for the Bench/Verify harnesses.
  *
  * One global `spark.sql.files.maxPartitionBytes` cannot serve both query
  * families this engine runs:
  *
  *  - The TEXT family (tokenize/hash/segment kernels over `documents`)
  *    compresses ~50:1, so splits must be sized to the DECOMPRESSED work:
  *    at the 100x fixture the 13.7 MB documents table is FOUR scan tasks
  *    for 32 cores under even 4 MB splits. 512 KB splits were profiled
  *    (event logs, r10) as the dominant wall-time fix for the heavy text
  *    queries, and a parquet row group stays the floor.
  *  - The SCAN-LIGHT family (relational/events/embeddings/manifest
  *    queries, and iterative loops whose scan partitioning propagates
  *    into per-round task counts) does near-zero CPU per input byte; the
  *    same 512 KB floor hands them ~20x the task count of the 4 MB r9
  *    configuration and purely scheduler-bound 2.4-3.1x regressions in
  *    BENCH_r10_100x (q_salted_distinct 1.15->3.59 s, q_pivot_daily
  *    1.34->3.98 s, q_ann_ivf_trained 2.08->6.12 s — the last a 5-run
  *    median both rounds, so not noise).
  *
  * The harnesses therefore set the split PER QUERY, before the query
  * function runs (several queries train models eagerly inside their
  * builder — the conf must be in place for those internal jobs too,
  * which rules out inspecting the built plan first). Membership below is
  * measurement-derived: every query whose r10/r9 100x ratio exceeded
  * 1.5x, plus its same-input-shape siblings (whole manifest/ANN/sample/
  * window families), minus text-CPU-dense queries. q_zorder measured
  * FASTER at 512 KB and stays on the text default.
  */
object ScanPolicy {

  /** Queries whose scans should use the wide (default-ish) split: the
    * scan-light set derived from BENCH_r09/r10 100x medians. */
  val scanLight: Set[String] = Set(
    // relational TPC-H-ish family (lineitem/orders/customer scans)
    "q1_pricing", "q_revenue_by_nation", "q_top_customers",
    "q_customers_without_orders", "q_segments_with_orders",
    "q_rollup_revenue", "q_pivot_daily", "q_salted_distinct",
    "q_bucketed_join", "q_range_join",
    // events/time-series family (window/sort over the events table)
    "q_asof_join", "q_asof_forward", "q_rolling", "q_decayed",
    "q_sessionize", "q_hourly_counts", "q_hourly_filtered",
    "q_topk_per_type", "q_window_suite", "q_value_stats",
    // embeddings/ANN family (numeric vectors, ~1:1 compression; the
    // trained variants run driver-loop jobs whose scan task counts repeat
    // per iteration)
    "q_ann_topk", "q_ann_lsh", "q_ann_lsh_mp", "q_ann_ivf",
    "q_ann_ivf_trained", "q_ann_pq", "q_ann_ivfpq", "q_ann_rerank",
    "q_ann_recall", "q_embed_neardup", "q_semdedup",
    // manifest table-format family (metadata-dominated, small data scans)
    "q_manifest_count", "q_manifest_point", "q_manifest_skip",
    "q_manifest_lazy", "q_manifest_semijoin", "q_manifest_changes",
    "q_manifest_cdc", "q_manifest_tsrange", "q_manifest_rollback",
    "q_manifest_delete", "q_manifest_upsert", "q_manifest_evolve",
    "q_manifest_zorder", "q_manifest_stream",
    // sampling/splits (near-zero CPU per documents byte)
    "q_sample_exact", "q_sample_strat", "q_sample_split",
    // iterative CC over representative pairs: per-round task counts
    // inherit the scan partitioning (1.9x at 512 KB)
    "q_dedup_clusters")

  /** Split for the text-CPU-dense default (env-overridable, as before). */
  def textSplit: String =
    sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "512k")

  /** Split for the scan-light set: the r9 value whose 100x numbers the
    * regression grades are measured against. */
  def lightSplit: String =
    sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES_LIGHT", "4m")

  def splitFor(query: String): String =
    if (scanLight(query)) lightSplit else textSplit

  /** Set the session conf for `query` (splits are read at planning time,
    * so a runtime conf set before the query's first job is sufficient). */
  def applyFor(spark: org.apache.spark.sql.SparkSession,
               query: String): Unit =
    spark.conf.set("spark.sql.files.maxPartitionBytes", splitFor(query))
}
