package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio of a text column — the classic cheap
  * repetitiveness signal for training-data quality (Gopher's
  * "compression ratio" filter): templated/boilerplate documents compress
  * far below natural prose, machine-generated keyword stuffing even
  * lower. Complements the n-gram repetition operators — zlib sees
  * long-range and sub-token repetition that token-level n-grams miss.
  *
  * A native codegen `Expression` (the HashKernels pattern): the per-row
  * Deflater loop stays in tight JVM code inside whole-stage codegen — a
  * Scala UDF here would break the codegen span AND pay
  * serialization per row. Level 6, no dictionary, one Deflater per call
  * (no shared state → thread-safe under codegen).
  *
  * Determinism: fixed input → fixed output within a JVM/zlib build, so
  * specs and reruns are stable; the exact byte count is zlib-version-
  * dependent, which is why the ratio is rows-only territory for the
  * cross-engine oracle (like the float32 image kernels). */
object CompressFunctions {
  /** compressedBytes / rawBytes of the UTF-8 encoding (1.0 for empty). */
  def compressRatio(text: Column): Column =
    GraftExpressionBridge.column(
      CompressRatio(GraftExpressionBridge.expression(text)))
}

object CompressKernel {
  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = new java.util.zip.Deflater(6, false)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.end()
  }
}

case class CompressRatio(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def nullSafeEval(text: Any): Any =
    CompressKernel.ratio(text.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CompressKernel.ratio($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_compress_ratio"
}
