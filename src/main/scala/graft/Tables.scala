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
    val raw = load(s, d, "events")
    import org.apache.spark.sql.functions._
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case org.apache.spark.sql.types.TimestampNTZType =>
        // The NTZ→LTZ cast is the ONLY value-altering branch: it is
        // value-preserving solely under a UTC session, so the guard lives
        // here — the nanos-as-long and TIMESTAMP branches load
        // timezone-independent instants and must not be rejected in a
        // non-UTC embedding. Zone spellings normalize via ZoneId (UTC,
        // Etc/UTC, GMT, Z, +00:00, Etc/Universal … all accept).
        val tz = s.conf.get("spark.sql.session.timeZone")
        val isUtc = try {
          java.time.ZoneId.of(tz).normalized() == java.time.ZoneOffset.UTC
        } catch { case _: java.time.DateTimeException => false }
        require(isUtc,
          s"events() requires spark.sql.session.timeZone=UTC (got $tz): " +
            "this fixture generation carries naive timestamps defined in " +
            "UTC, and the NTZ->session-zone cast would shift every instant")
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
