package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import graft.ops.Relational

/** ScalaCheck contracts for the relational core (SURVEY.md §5.2.3):
  * reference semantics hold for arbitrary inputs, not just fixtures. */
class RelationalPropertySpec extends SparkSpec {

  private val smallInts = Gen.listOf(Gen.chooseNum(-20, 20))

  test("J1 set difference equals model set difference for any int sets") {
    checkProp(Prop.forAll(smallInts, smallInts) { (r, s) =>
      import spark.implicits._
      val out = Relational.setDifference(r.toDF("x"), s.toDF("x"))
        .collect().map(_.getInt(0)).toSet
      out == (r.toSet -- s.toSet)
    }, minTests = 25)
  }

  test("J1 set difference holds for string elements (any comparable type)") {
    val words = Gen.listOf(Gen.oneOf("apple", "pear", "fig", "kiwi", "plum"))
    checkProp(Prop.forAll(words, words) { (r, s) =>
      import spark.implicits._
      val out = Relational.setDifference(r.toDF("x"), s.toDF("x"))
        .collect().map(_.getString(0)).toSet
      out == (r.toSet -- s.toSet)
    }, minTests = 20)
  }

  test("salted sum equals plain sum for arbitrary keyed data") {
    val rows = Gen.listOf(Gen.zip(Gen.chooseNum(0, 5), Gen.chooseNum(-100L, 100L)))
    checkProp(Prop.forAll(rows) { data =>
      import spark.implicits._
      if (data.isEmpty) true
      else {
        val df = data.toDF("k", "v")
        val salted = Relational.saltedSum(df, Seq("k"), col("v"), "total", salts = 4)
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val model = data.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        salted == model
      }
    }, minTests = 20)
  }

  test("O1 top-k per group returns the true top-k") {
    val rows = Gen.listOf(Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(0, 50)))
    checkProp(Prop.forAll(rows) { data =>
      import spark.implicits._
      if (data.isEmpty) true
      else {
        val df = data.zipWithIndex.map { case ((g, v), i) => (g, v, i) }
          .toDF("g", "v", "id")
        val out = Relational.topKPerGroup(df, Seq(col("g")),
          Seq(col("v").desc, col("id")), 2)
          .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
        val model = data.zipWithIndex.map { case ((g, v), i) => (g, v, i) }
          .groupBy(_._1).values.flatMap(
            _.sortBy(t => (-t._2, t._3)).take(2)).toSet
        out.toSet == model
      }
    }, minTests = 20)
  }

  test("A5 grouped concat is order-insensitive (deterministic nesting)") {
    val rows = Gen.listOfN(12, Gen.zip(Gen.chooseNum(0, 2), Gen.chooseNum(10, 99)))
    checkProp(Prop.forAll(rows) { data =>
      import spark.implicits._
      if (data.isEmpty) true
      else {
        def run(d: List[(Int, Int)]) =
          Relational.groupedConcat(d.toDF("g", "v"), Seq(col("g")),
            col("v").cast("string"), "items")
            .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
        run(data) == run(scala.util.Random.shuffle(data))
      }
    }, minTests = 15)
  }

  test("rrfFuse: hand-computed fusion — both-lists id outranks " +
    "single-list ids, absent ranker contributes zero") {
    import spark.implicits._
    // id 10 in both lists (ranks 2 and 1): 1/62 + 1/61
    // id 20 only lexical (rank 1):         1/61
    // id 30 only semantic (rank 2):        1/62
    val lex = Seq((20L, 1L), (10L, 2L)).toDF("id", "rank")
    val sem = Seq((10L, 1L), (30L, 2L)).toDF("id", "rank")
    val out = Relational.rrfFuse(Seq(lex, sem), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq(
      (1L, 10L, r9(1.0 / 62 + 1.0 / 61)),
      (2L, 20L, r9(1.0 / 61)),
      (3L, 30L, r9(1.0 / 62))))
  }

  test("retrievalEval: hand-computed MRR/DCG contributions, irrelevant " +
    "docs contribute exactly zero") {
    import spark.implicits._
    val sys = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("rank", "doc_id")
    val rel = Seq((10L, 3L), (30L, 1L), (99L, 5L)).toDF("doc_id", "rel")
    val out = Relational.retrievalEval(sys, rel)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // rank1 doc10 rel3: rr 1, dcg 3/log2(2)=3; rank2 doc20 rel0: zeros;
    // rank3 doc30 rel1: rr 1/3, dcg 1/log2(4)=0.5; off-list doc99 ignored
    assert(out.toSeq == Seq(
      (1L, 10L, 3L, 1.0, 3.0),
      (2L, 20L, 0L, 0.0, 0.0),
      (3L, 30L, 1L, BigDecimal(1.0 / 3).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, 0.5)))
  }
}
