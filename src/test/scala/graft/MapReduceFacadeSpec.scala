package graft

import graft.ops.{MRJob, MapReduceFacade}

/** The reference's MR programming contract through the typed façade
  * (SURVEY.md §2.9; a1p1_ahuja.py:30–37 map/reduce override surface,
  * a1p1:84–88 None-drop). */
class MapReduceFacadeSpec extends SparkSpec {

  object WordCountJob extends MRJob[Int, String, String, Long, Long] {
    def map(k: Int, v: String): IterableOnce[(String, Long)] =
      v.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).map(_ -> 1L)
    def reduce(k: String, vs: Iterator[Long]): Option[Long] = Some(vs.sum)
  }

  /** Reducer returning None suppresses the key (P5 HAVING semantics). */
  object FrequentOnlyJob extends MRJob[Int, String, String, Long, Long] {
    def map(k: Int, v: String): IterableOnce[(String, Long)] =
      v.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).map(_ -> 1L)
    def reduce(k: String, vs: Iterator[Long]): Option[Long] = {
      val n = vs.sum
      if (n >= 2) Some(n) else None
    }
  }

  test("MRJob WordCount through the facade") {
    import spark.implicits._
    val ds = Seq(
      (1, "The horse raced past the barn fell"),
      (4, "I burn, I pine, I perish")).toDS()
    val out = MapReduceFacade.run(ds, WordCountJob).collect().toMap
    assert(out("the") == 2)
    assert(out("i") == 3)
    assert(out("barn") == 1)
  }

  test("MRJob None-drop: reduce returning None suppresses the key") {
    import spark.implicits._
    val ds = Seq((1, "a a b"), (2, "a c")).toDS()
    val out = MapReduceFacade.run(ds, FrequentOnlyJob).collect().toMap
    assert(out == Map("a" -> 3))
  }
}
