package graft

import org.apache.spark.sql.functions._

import graft.sources.PartitionedTables

/** Partitioned parquet sink: planning-time partition pruning + exact
  * round trip. */
class PartitionedTablesSpec extends SparkSpec {

  private lazy val sf = "/root/testdata/sf0.001"

  test("partition predicate becomes a PartitionFilter (planning-time " +
    "pruning), and only the matching directory's files are scanned") {
    val path = PartitionedTables.ensureEventsPartitioned(spark, sf)
    val pruned = PartitionedTables.eventsFromPartitioned(spark, path)
      .filter(col("event_type") === "click")
    val plan = pruned.queryExecution.executedPlan.toString
    // the predicate must appear in PartitionFilters (planning-time), not
    // as a post-scan data filter
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("event_type"),
      s"no partition filter in plan:\n$plan")
    // the executed scan reads ONLY the click partition's one file (the
    // fixture writes one file per partition, 5 partitions total) —
    // df.inputFiles can't show this (it lists the whole relation), the
    // scan node's numFiles metric can
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec leaf"))
    assert(scan.metrics("numFiles").value == 1L,
      s"expected 1 pruned file, scanned ${scan.metrics("numFiles").value}")
    val full = PartitionedTables.eventsFromPartitioned(spark, path)
    assert(full.inputFiles.length == 5)
  }

  test("partitioned write round-trips exactly (partition column through " +
    "directory names, the rest through parquet)") {
    val path = PartitionedTables.ensureEventsPartitioned(spark, sf)
    val back = PartitionedTables.eventsFromPartitioned(spark, path)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("value"), col("event_type"))
    val expected = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("value"), col("event_type"))
    assert(back.count() == expected.count())
    assert(back.except(expected).isEmpty)
    assert(expected.except(back).isEmpty)
  }
}
