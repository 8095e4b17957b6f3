package graft

import org.apache.spark.sql.functions._

import graft.ops.Linkage

/** Entity resolution: blocked fuzzy pairs (Linkage.blockedFuzzyPairs). */
class LinkageSpec extends SparkSpec {

  private def recs(rows: (Long, String, String)*) =
    spark.createDataFrame(rows).toDF("id", "blk", "name")

  test("within-block pairs at edit distance <= maxDist, cross-block never") {
    val df = recs(
      (1L, "us", "john smith"), (2L, "us", "jon smith"),   // dist 1
      (3L, "us", "mary jones"),                            // far from both
      (4L, "uk", "john smith"))                            // same name, other block
    val out = Linkage.blockedFuzzyPairs(df, col("id"), col("blk"),
        col("name"), maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet == Set((1L, 2L, 1L)))
  }

  test("pairs are canonical (id_a < id_b, no self-pairs), dist exact") {
    val df = recs(
      (10L, "b", "abcde"), (11L, "b", "abXde"), (12L, "b", "abcde"))
    val out = Linkage.blockedFuzzyPairs(df, col("id"), col("blk"),
        col("name"), maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // exact duplicate at dist 0, substitution at dist 1, each pair once
    assert(out == Set((10L, 11L, 1L), (10L, 12L, 0L), (11L, 12L, 1L)))
  }

  test("sortedNeighborPairs: matches brute-force within-window pairs, " +
    "catches what a corrupted block key would split") {
    // sorted by name: aaa1 aaa2 aaa3 aab1 zzz9
    val df = recs(
      (5L, "x", "aaa2"), (1L, "x", "aaa1"), (9L, "x", "zzz9"),
      (3L, "x", "aab1"), (7L, "x", "aaa3"))
    val out = Linkage.sortedNeighborPairs(df, col("id"), col("name"),
        window = 2, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over the name-sorted order with window 2
    val sorted = Seq((1L, "aaa1"), (5L, "aaa2"), (7L, "aaa3"),
      (3L, "aab1"), (9L, "zzz9"))
    val brute = (for {
      i <- sorted.indices; j <- (i + 1) until math.min(i + 3, sorted.length)
      d = {
        val (x, y) = (sorted(i)._2, sorted(j)._2)
        // all same length here: count substitutions
        x.zip(y).count { case (a, b) => a != b }.toLong
      }
      if d <= 2
    } yield (sorted(i)._1, sorted(j)._1, d)).toSet
    assert(out == brute && out.nonEmpty)
    // window 1 under repartitioning stays deterministic
    val again = Linkage.sortedNeighborPairs(df.repartition(5), col("id"),
        col("name"), window = 2, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == out)
  }

  test("maxDist > 2: oversized blocks are dropped whole (legacy guard) " +
    "and the drop is OBSERVED via a CapMetrics counter, never silent") {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("graft_bucket_caps") && !row.isNullAt(0))
            seen.add(row.getLong(0))
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val big = (0L until 10L).map(i => (i, "hot", s"name$i"))
      val small = Seq((100L, "cold", "alpha"), (101L, "cold", "alphb"))
      val df = recs(big ++ small: _*)
      val out = Linkage.blockedFuzzyPairs(df, col("id"), col("blk"),
          col("name"), maxDist = 3, maxBlock = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(out.toSet == Set((100L, 101L)))
      // QueryExecutionListener delivery is async — poll for the metric
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      import scala.jdk.CollectionConverters._
      assert(seen.asScala.exists(_ >= 1L),
        "dropped oversized block was not observed by graft_bucket_caps")
    } finally spark.listenerManager.unregister(listener)
  }

  test("prefix-keyed deletion neighborhood stays exact on texts far " +
    "longer than prefixLen, including edits beyond and at the boundary") {
    val pad = "abcdefghij" * 9 // 90 chars, way past the default P = 32
    val rows = Seq(
      (1L, "hot", "k" + pad),             // base, 91 chars
      (2L, "hot", "k" + pad + "XY"),      // 2 inserts at the far END
      (3L, "hot", "k" + pad.drop(2)),     // 2 deletes INSIDE the prefix
      (4L, "hot", ("k" + pad).updated(31, 'Z').updated(32, 'Z')), // subs AT the boundary
      (5L, "hot", "completely different text that shares nothing at all ok"),
      (6L, "hot", "k" + pad),             // exact duplicate of 1
      (7L, "hot", "ZZZ" + pad.drop(1)))   // front churn: d3 from row 1, a MISS
    // maxBlock = 2 forces the whole block through the deletion path
    val out = Linkage.blockedFuzzyPairs(recs(rows: _*), col("id"),
        col("blk"), col("name"), maxDist = 2, maxBlock = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == brutePairs(rows, 2))
    assert(out.contains((1L, 2L, 2L)) && out.contains((1L, 3L, 2L)) &&
      out.contains((1L, 4L, 2L)) && out.contains((1L, 6L, 0L)))
    // a tight prefixLen (4) must still be exact — only cheaper keys
    val tight = Linkage.blockedFuzzyPairs(recs(rows: _*), col("id"),
        col("blk"), col("name"), maxDist = 2, maxBlock = 2, prefixLen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tight == out)
  }

  // ---- deletion-neighborhood path (oversized blocks, maxDist <= 2) ----

  private def bruteLev(x: String, y: String): Int = {
    val d = Array.tabulate(x.length + 1, y.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to x.length; j <- 1 to y.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
    d(x.length)(y.length)
  }

  private def brutePairs(rows: Seq[(Long, String, String)], maxDist: Int) =
    (for {
      Seq((ia, ba, na), (ib, bb, nb)) <- rows.sortBy(_._1).combinations(2)
      if ba == bb
      d = bruteLev(na, nb)
      if d <= maxDist
    } yield (ia, ib, d.toLong)).toSet

  test("oversized blocks switch to the deletion-neighborhood join and " +
    "produce the exact uncapped pair set (sf3 regression)") {
    // one block far over maxBlock: planted dist-1/2 neighbors, a dist-3
    // miss, repeated names, and an unrelated small block
    val hot = Seq(
      (1L, "hot", "john smith"), (2L, "hot", "jon smith"),   // del, d1
      (3L, "hot", "john smyth"),                             // sub, d1 of 1
      (4L, "hot", "johnn smith"),                            // ins, d1 of 1
      (5L, "hot", "mary jones"), (6L, "hot", "mary jones"),  // dup, d0
      (7L, "hot", "completely other"),
      (8L, "hot", "jxhn smxth"))                             // d2 of 1
    val cold = Seq((100L, "cold", "alpha"), (101L, "cold", "alphb"))
    val rows = hot ++ cold
    val out = Linkage.blockedFuzzyPairs(recs(rows: _*), col("id"),
        col("blk"), col("name"), maxDist = 2, maxBlock = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == brutePairs(rows, 2))
    assert(out.contains((1L, 8L, 2L)) && out.contains((5L, 6L, 0L)))
  }

  test("deletion-neighborhood recall equals brute force on random " +
    "mutated strings (property)") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcdef"
    def word(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    def mutate(s: String, edits: Int): String = (1 to edits).foldLeft(s) {
      (t, _) =>
        if (t.isEmpty) word(1)
        else rnd.nextInt(3) match {
          case 0 => // substitute
            val i = rnd.nextInt(t.length)
            t.updated(i, alpha(rnd.nextInt(alpha.length)))
          case 1 => // delete
            val i = rnd.nextInt(t.length); t.take(i) + t.drop(i + 1)
          case _ => // insert
            val i = rnd.nextInt(t.length + 1)
            t.take(i) + alpha(rnd.nextInt(alpha.length)) + t.drop(i)
        }
    }
    // 60 base words, each with a planted 0/1/2/3-edit neighbor; ONE block
    // forced through the variant path (maxBlock = 2)
    val rows = (0 until 60).flatMap { k =>
      val base = word(6 + rnd.nextInt(6))
      Seq((k * 2L, "b", base), (k * 2L + 1, "b", mutate(base, k % 4)))
    }
    for (d <- 0 to 2) {
      val out = Linkage.blockedFuzzyPairs(recs(rows: _*), col("id"),
          col("blk"), col("name"), maxDist = d, maxBlock = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(out == brutePairs(rows, d), s"maxDist=$d mismatch")
    }
  }

  test("deletionVariants: exact alphabet, distinct, empty-string safe") {
    import spark.implicits._
    val vs = Seq("abc", "a", "", "aaa").toDF("s")
      .select(col("s"), Linkage.deletionVariants(col("s"), 2).as("v"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(vs("abc") == Set("abc", "bc", "ac", "ab", "c", "b", "a"))
    assert(vs("a") == Set("a", ""))
    assert(vs("") == Set(""))
    assert(vs("aaa") == Set("aaa", "aa", "a")) // duplicates collapsed
  }
}
