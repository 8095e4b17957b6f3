package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.Relational

/** Partitioned writes + partition pruning, and the CDC upsert composition —
  * the two remaining pieces of the pay-at-ingest storage story
  * (BucketingSpec covers exchange-free joins). */
class PartitioningSpec extends SparkSpec {

  test("partitioned write prunes non-matching partitions at scan time") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_part").toString
    val df = (0 until 2000)
      .map(i => (i.toLong, Seq("a", "b", "c", "d")(i % 4), i * 1.5))
      .toDF("id", "cat", "v")
    df.write.mode("overwrite").partitionBy("cat").parquet(dir)

    val filtered = spark.read.parquet(dir).filter(col("cat") === "b")
    val scan = filtered.queryExecution.executedPlan.toString
    // the filter must reach the scan as a PartitionFilters entry: only
    // cat=b directories are read, 3/4 of the data never touches an
    // executor — the core 100 TB scan lever
    assert(scan.contains("PartitionFilters") && scan.contains("cat"),
      s"expected partition pruning in:\n$scan")
    assert(filtered.count() == 500)
    // pruned read returns exactly the partition's rows
    assert(filtered.agg(sum("id")).collect()(0).getLong(0) ==
      (0 until 2000).filter(_ % 4 == 1).map(_.toLong).sum)
  }

  test("upsert: updates win per key by version, unmatched rows pass through") {
    import spark.implicits._
    val base = Seq((1L, 1L, "one-v1"), (2L, 1L, "two-v1"), (3L, 1L, "three-v1"))
      .toDF("k", "ver", "payload")
    val updates = Seq((2L, 2L, "two-v2"), (4L, 1L, "four-v1"),
      (2L, 2L, "two-v2b")) // same key+version: tie-break decides
    .toDF("k", "ver", "payload")
    val out = Relational.upsert(base, updates, Seq(col("k")),
      version = col("ver"), tieBreak = col("payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set((1L, 1L, "one-v1"), (2L, 2L, "two-v2b"),
      (3L, 1L, "three-v1"), (4L, 1L, "four-v1")))
  }
}
