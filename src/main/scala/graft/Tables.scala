package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness parquet star schema (TESTDATA.md).
  *
  * All engine operators take DataFrames, not paths — these helpers only bind
  * the driver fixtures. At cluster scale the same operators run over any
  * `spark.read` source; nothing below assumes single-file inputs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as long nanos (legacy conf) and surface a
    * proper TimestampType column (microsecond truncation — same floor
    * semantics DuckDB applies at second granularity). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql("...")` is a
    * first-class entry point beside the DataFrame API — same loaders
    * (including the events nanos fix), so both surfaces see identical
    * data. Idempotent; views are session-scoped. */
  def registerAll(s: SparkSession, d: String): Unit = {
    val loaders: Map[String, (SparkSession, String) => DataFrame] = Map(
      "events" -> events _)
    all.foreach { name =>
      loaders.getOrElse(name, (ss: SparkSession, dd: String) => load(ss, dd, name))
        .apply(s, d).createOrReplaceTempView(name)
    }
  }
}
