package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** A9 (SURVEY.md §2.6): Gram matrix Σ xᵀx as a typed Aggregator.
  *
  * The reference computes `map(outer(x,x)).reduce(+)` (`a2_ahuja.py:271`) —
  * shipping a d×d matrix per row through the reduce. Here the buffer is one
  * flat d² double array per *partition* (map-side partial aggregation), so
  * the shuffle carries #partitions × d² doubles, not #rows × d².
  * For d ≤ a few hundred (70/140 in the reference) that is O(MB) total at
  * any input scale — the classic tree-aggregation posture for 100 TB.
  */
class GramAggregator(d: Int) extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
  def zero: Array[Double] = new Array[Double](d * d)

  def reduce(buf: Array[Double], x: Seq[Double]): Array[Double] = {
    val xi = x.toArray
    var i = 0
    while (i < d) {
      val vi = xi(i)
      if (vi != 0.0) {
        val base = i * d
        var j = 0
        while (j < d) { buf(base + j) += vi * xi(j); j += 1 }
      }
      i += 1
    }
    buf
  }

  def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  def finish(buf: Array[Double]): Seq[Double] = buf.toSeq

  def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
