package graft

import org.apache.spark.sql.functions._
import graft.ops.{Relational, Sampling}

/** Deterministic sampling and the skew-resilient salted join. */
class SamplingSpec extends SparkSpec {

  private def docs(n: Int) =
    spark.createDataFrame((0 until n).map(i => (i.toLong, s"doc body $i")))
      .toDF("doc_id", "text")

  test("hashSample: deterministic, partitioning-independent, ~fraction") {
    val d = docs(2000)
    val a = Sampling.hashSample(d, col("text"), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(d.repartition(13), col("text"), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // md5 is uniform: 25% ± a loose tolerance
    assert(a.size > 2000 * 0.18 && a.size < 2000 * 0.32, s"got ${a.size}")
    // fraction 1 keeps everything
    assert(Sampling.hashSample(d, col("text"), 1.0).count() == 2000)
    // below-granularity fractions fail fast instead of selecting nothing
    val e = intercept[IllegalArgumentException] {
      Sampling.hashSample(d, col("text"), 0.001)
    }
    assert(e.getMessage.contains("granularity"))
  }

  test("hashSample: nested fractions — the 12.5% sample is inside the 25%") {
    val d = docs(1000)
    val small = Sampling.hashSample(d, col("text"), 0.125)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val big = Sampling.hashSample(d, col("text"), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big) && small.nonEmpty)
  }

  test("stratifiedTopK: k per stratum, hash-ordered, deterministic") {
    val d = docs(100).withColumn("stratum", pmod(col("doc_id"), lit(4)))
    val out = Sampling.stratifiedTopK(d, col("stratum"), col("text"),
      col("doc_id"), k = 5)
    val counts = out.groupBy("stratum").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(0L -> 5L, 1L -> 5L, 2L -> 5L, 3L -> 5L))
    val again = Sampling.stratifiedTopK(d.repartition(7), col("stratum"),
      col("text"), col("doc_id"), k = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("tokenBudgetSample: prefix in hash order, boundary doc included, " +
    "budgets independent per source") {
    import spark.implicits._
    val docs = (1 to 40).map { i =>
      (i.toLong, if (i % 2 == 0) "web" else "code", s"doc body number $i", 10L)
    }.toDF("doc_id", "source", "text", "n_toks")
    val out = graft.ops.Sampling.tokenBudgetSample(docs, col("source"),
      col("text"), col("doc_id"), col("n_toks"), budget = 35L)
    val bySrc = out.groupBy("source")
      .agg(count(lit(1)).as("n"), max("cum_tokens").as("maxcum"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // 10 tokens/doc, budget 35: cum 10,20,30,40 — the 40 row is the
    // boundary doc (30 < 35) and the 50 row is out ⇒ exactly 4 per source
    assert(bySrc == Map("web" -> (4L, 40L), "code" -> (4L, 40L)))
    // the kept set is the hash-order PREFIX: re-deriving the order over
    // the full input picks the same doc_ids
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(md5(col("text")), col("doc_id"))
    val expected = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4).select("doc_id").as[Long].collect().toSet
    assert(out.select("doc_id").as[Long].collect().toSet == expected)
  }

  test("assignSplit: partition of the corpus, stable, ~requested fractions") {
    val d = docs(2000)
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = d.select(col("doc_id"),
      graft.ops.Sampling.assignSplit(col("text"), splits).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    // total partition: every doc in exactly one split, none in "rest"
    assert(out.length == 2000 && out.forall(x =>
      Set("train", "val", "test")(x._2)))
    val counts = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(counts("train") > 1400 && counts("train") < 1800, counts.toString)
    assert(counts("val") > 100 && counts("val") < 350, counts.toString)
    // stability: identical assignment on a repartitioned copy
    val again = d.repartition(7).select(col("doc_id"),
      graft.ops.Sampling.assignSplit(col("text"), splits).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == out.toMap)
    // the train split contains the 80% hashSample exactly (nesting)
    val sample80 = graft.ops.Sampling.hashSample(d, col("text"), 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.toMap.filter(_._2 == "train").keySet == sample80)
    // a split below the byte granularity fails fast instead of silently
    // receiving zero rows (its cutoff collapses into the previous one)
    val e = intercept[IllegalArgumentException] {
      graft.ops.Sampling.assignSplit(col("text"),
        Seq("train" -> 0.999, "holdout" -> 0.001))
    }
    assert(e.getMessage.contains("holdout"))
  }

  test("saltedJoin equals the plain join, including skewed keys") {
    val rng = new scala.util.Random(5)
    // 80% of left rows share one hot key
    val left = spark.createDataFrame((0 until 500).map { i =>
      (i.toLong, if (rng.nextDouble() < 0.8) 7L else rng.nextInt(20).toLong)
    }).toDF("row_id", "k")
    val right = spark.createDataFrame((0 until 20).map(i =>
      (i.toLong, s"dim$i"))).toDF("rk", "name")
    val salted = Relational.saltedJoin(left, right, col("k"), col("rk"), salts = 4)
      .select("row_id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val plain = left.join(right, col("k") === col("rk"))
      .select("row_id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain && salted.size == 500)
  }

  test("weightedSample: per-row probability, monotone nesting, " +
    "deterministic, clamps") {
    val d = docs(2000)
    // weight 1 keeps everything, weight 0 (and negative) keeps nothing
    assert(Sampling.weightedSample(d, col("text"), lit(1.0)).count() == 2000)
    assert(Sampling.weightedSample(d, col("text"), lit(5.0)).count() == 2000)
    assert(Sampling.weightedSample(d, col("text"), lit(0.0)).count() == 0)
    assert(Sampling.weightedSample(d, col("text"), lit(-1.0)).count() == 0)
    // constant weight w matches hashSample(w) exactly (same predicate)
    val w25 = Sampling.weightedSample(d, col("text"), lit(0.25))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val h25 = Sampling.hashSample(d, col("text"), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(w25 == h25)
    // raising a row's weight never drops it (nested samples)
    val w50 = Sampling.weightedSample(d, col("text"), lit(0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(w25.subsetOf(w50))
    // per-row weights: rows with weight 1 all kept, weight 0 all dropped
    val mixed = Sampling.weightedSample(d, col("text"),
        when(col("doc_id") % 2 === 0, lit(1.0)).otherwise(lit(0.0)))
      .select("doc_id").collect().map(_.getLong(0))
    assert(mixed.length == 1000 && mixed.forall(_ % 2 == 0))
  }

  test("clusterSafeSplits: a near-dup cluster never straddles splits; " +
    "singletons match assignSplit on their own id") {
    val d = docs(50)
    // pairs 1-2, 2-3 form one cluster {1,2,3}; 10-11 another
    val pairs = spark.createDataFrame(Seq(
      (1L, 2L), (2L, 3L), (10L, 11L))).toDF("id_a", "id_b")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.clusterSafeSplits(
        d, col("doc_id"), pairs, col("id_a"), col("id_b"), splits)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length == 50)
    val byId = out.map(r => r._1 -> r).toMap
    // cluster members share the min-id rep AND the split
    assert(Seq(1L, 2L, 3L).map(byId(_)._2).forall(_ == 1L))
    assert(Seq(1L, 2L, 3L).map(byId(_)._3).distinct.size == 1)
    assert(Seq(10L, 11L).map(byId(_)._2).forall(_ == 10L))
    assert(Seq(10L, 11L).map(byId(_)._3).distinct.size == 1)
    // a singleton is its own rep and gets the plain assignSplit value
    val expected = d.filter(col("doc_id") === 7)
      .select(Sampling.assignSplit(col("doc_id").cast("string"), splits))
      .head().getString(0)
    assert(byId(7L)._2 == 7L && byId(7L)._3 == expected)
    // deterministic under repartitioning
    val again = Sampling.clusterSafeSplits(
        d.repartition(7), col("doc_id"), pairs.repartition(3),
        col("id_a"), col("id_b"), splits)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(again.toSet == out.toSet)
  }
}
