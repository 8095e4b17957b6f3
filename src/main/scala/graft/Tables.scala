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
  /** `events.ts` surfaces as a session-zone TimestampType column whatever
    * the parquet physical type: harness generations have shipped it both
    * as TIMESTAMP(NANOS) — which Spark's vectorized reader rejects, so it
    * is read as long nanos (legacy conf) and truncated to micros — and as
    * TIMESTAMP(MICROS) without UTC adjustment, which Spark reads as
    * TIMESTAMP_NTZ and DuckDB as naive TIMESTAMP (sessions run UTC, so
    * the NTZ→LTZ cast is value-preserving and both engines agree). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the NTZ→LTZ branch is value-preserving ONLY under a UTC session —
    // assert rather than silently shifting every event instant in a
    // non-UTC embedding (launcher configs set this, but the loader is the
    // contract holder)
    val tz = s.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC" || tz == "Etc/UTC" || tz == "GMT",
      s"events() requires spark.sql.session.timeZone=UTC (got $tz): the " +
        "fixture's naive-timestamp generations are defined in UTC")
    val raw = load(s, d, "events")
    import org.apache.spark.sql.functions._
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case org.apache.spark.sql.types.TimestampNTZType =>
        // value-preserving cast under the UTC session asserted above
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case other => throw new IllegalArgumentException(
        s"events.ts has unexpected parquet-surfaced type $other — known " +
          "harness generations are nanos-as-long, TIMESTAMP and " +
          "TIMESTAMP_NTZ; refusing to guess a cast")
    }
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
