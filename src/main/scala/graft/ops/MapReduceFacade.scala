package graft.ops

import org.apache.spark.sql.{Dataset, Encoder}

/** The reference's MapReduce programming contract (SURVEY.md §2.9) as a
  * thin typed-Dataset façade.
  *
  * `Assignment 1/a1p1_ahuja.py:30–37` defines the user surface: override
  * `map(k, v) → [(k2, v2)]` and `reduce(k2, vs) → v3 | None` (None drops
  * the key — HAVING semantics, a1p1:84–88). The toy runtime's chunking,
  * barrier, hash-partitioning and shuffle (a1p1:53–143) are exactly
  * Spark's `flatMap` → `groupByKey` → `flatMapGroups` execution, so the
  * façade is ~10 lines and inherits Tungsten shuffle, spill and AQE.
  */
abstract class MRJob[K, V, K2, V2, OUT] extends Serializable {
  def map(k: K, v: V): IterableOnce[(K2, V2)]
  /** Return None to suppress the key (reference's None-drop contract). */
  def reduce(k: K2, vs: Iterator[V2]): Option[OUT]
}

object MapReduceFacade {
  def run[K, V, K2: Encoder, V2, OUT](ds: Dataset[(K, V)], job: MRJob[K, V, K2, V2, OUT])(
      implicit kvEnc: Encoder[(K2, V2)], outEnc: Encoder[(K2, OUT)]): Dataset[(K2, OUT)] =
    ds.flatMap { case (k, v) => job.map(k, v) }
      .groupByKey(_._1)
      .flatMapGroups { (k2, rows) =>
        job.reduce(k2, rows.map(_._2)).map(out => (k2, out)).iterator
      }
}
