package graft
import org.apache.spark.sql.SparkSession

/** Plan auditor: prints `explain("formatted")` for each query (or the
  * names given as args) so pushdown / broadcast / codegen spans can be
  * inspected. `sbt "runMain graft.Explain [sfDir] [name...]"`. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n===================== $name =====================")
      try SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"[explain] failed: $e") }
    }
    spark.stop()
  }
}
