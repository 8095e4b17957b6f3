package graft

import org.apache.spark.sql.functions._

import graft.ops.{Relational, Sketches}

/** Count-min: never undercounts, exact without collisions, mergeable. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val items =
    (Seq.fill(10)("a") ++ Seq.fill(5)("b") ++ Seq("c")).toDF("item")

  test("estimates never undercount and match exactly absent collisions") {
    val sketch = Sketches.cmBuild(items, col("item"))
    val est = Sketches.cmEstimate(sketch,
      Seq("a", "b", "c").toDF("item"), "item")
      .as[(String, Long)].collect().toMap
    // 3 distinct items in 4×4096 cells: collisions would need two items
    // agreeing on the SAME row's nibbles — est is exact here
    assert(est == Map("a" -> 10L, "b" -> 5L, "c" -> 1L))
  }

  test("absent items estimate at most the collision noise (0 here)") {
    val sketch = Sketches.cmBuild(items, col("item"))
    val est = Sketches.cmEstimate(sketch, Seq("zzz").toDF("item"), "item")
      .as[(String, Long)].collect().head._2
    assert(est == 0L)
  }

  test("weighted build over aggregated counts equals the raw build") {
    val raw = (Seq.fill(7)("x") ++ Seq.fill(3)("y") ++ Seq.fill(2)("z"))
      .toDF("item")
    val agg = raw.groupBy("item").count()
    val a = Sketches.cmBuild(raw, col("item"))
    val b = Sketches.cmBuildWeighted(agg, col("item"), col("count"))
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("cmBuild runs unchanged under readStream and agrees with batch") {
    implicit val sc = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    val q = Sketches.cmBuild(mem.toDF().toDF("item"), col("item"))
      .writeStream.format("memory").queryName("cm_out")
      .outputMode("complete").start()
    mem.addData("a", "a", "b")
    q.processAllAvailable()
    mem.addData("a", "c")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cm_out")
    val batch = Sketches.cmBuild(
      Seq("a", "a", "b", "a", "c").toDF("item"), col("item"))
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("sketch state is fixed-size and cell-wise mergeable") {
    val a = (1 to 100).map(i => s"t${i % 7}").toDF("item")
    val b = (1 to 50).map(i => s"t${i % 5}").toDF("item")
    val merged = Relational.mergePartialStates(
      Sketches.cmBuild(a, col("item")), Sketches.cmBuild(b, col("item")),
      keys = Seq("j", "cell"), states = Seq("cnt"))
    val direct = Sketches.cmBuild(a.union(b), col("item"))
    assert(merged.count() <= Sketches.Depth.toLong * Sketches.Width)
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty)
  }
}
