package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import graft.ops.{AsOf, Graph}

/** ScalaCheck contracts for the temporal/graph operators: distributed
  * results equal a driver-side reference implementation for arbitrary
  * inputs, not just fixtures. */
class TemporalPropertySpec extends SparkSpec {

  test("as-of backward equals the per-key sorted-scan model") {
    val rows = Gen.listOf(Gen.zip(
      Gen.chooseNum(0, 3),     // key
      Gen.chooseNum(0L, 50L))) // ts
    checkProp(Prop.forAll(rows, rows) { (lRows, rRows) =>
      import spark.implicits._
      if (lRows.isEmpty || rRows.isEmpty) true
      else {
        val l = lRows.zipWithIndex
          .map { case ((k, t), i) => (i.toLong, k.toLong, t) }
        val r = rRows.zipWithIndex
          .map { case ((k, t), i) => (i.toLong + 10000, k.toLong, t) }
        val out = AsOf.backward(
          l.toDF("id", "k", "t"), r.toDF("id", "k", "t"),
          col("k"), col("k"), col("t"), col("t"), col("id"),
          leftCols = Seq("lid" -> col("id")),
          rightCols = Seq("rid" -> col("id")))
          .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
        // model: for each left row, the right row of the same key with
        // the greatest ts <= left ts; ties on ts -> max id
        val model = l.flatMap { case (lid, k, t) =>
          val cands = r.filter(x => x._2 == k && x._3 <= t)
          if (cands.isEmpty) None
          else Some(lid -> cands.maxBy(x => (x._3, x._1))._1)
        }.toMap
        out == model
      }
    }, minTests = 30)
  }

  test("connected components equal a driver union-find on random graphs") {
    val edges = Gen.listOf(Gen.zip(Gen.chooseNum(0L, 25L), Gen.chooseNum(0L, 25L)))
    checkProp(Prop.forAll(edges) { es =>
      import spark.implicits._
      if (es.isEmpty) true
      else {
        val out = Graph.connectedComponents(es.toDF("a", "b"),
          col("a"), col("b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // driver union-find with min-id representative
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        def union(a: Long, b: Long): Unit = {
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        es.foreach { case (a, b) => union(a, b) }
        val model = es.flatMap { case (a, b) => Seq(a, b) }.distinct
          .map(x => x -> find(x)).toMap
        out == model
      }
    }, minTests = 25)
  }
}
