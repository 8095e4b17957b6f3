package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup hash kernels.
  *
  * Spark's higher-order functions (`transform`/`aggregate`/`zip_with`) are
  * `CodegenFallback` — a k×|shingles| minhash loop written with them runs
  * interpreted, allocating an array per lambda application, and breaks the
  * surrounding whole-stage-codegen span. These expressions keep the hot
  * loops in tight JIT'd JVM code over primitive arrays and participate in
  * codegen via a single static call (SURVEY.md §7.3 "custom Catalyst
  * Expression ... performance upgrades over UDFs, same semantics").
  *
  * Hash values reproduce Spark's `xxhash64(...)` function bit-for-bit
  * (seed 42, same chaining), so swapping the HOF implementations for these
  * kernels leaves every query's output unchanged.
  */
object HashFunctions {

  /** Distinct (sorted) 64-bit hashes of token n-gram shingles.
    * Equals `xxhash64(concat_ws(" ", <window>))` per window, deduplicated. */
  def shingleHash64(tokens: Column, n: Int): Column =
    GraftExpressionBridge.column(
      ShingleHash64(GraftExpressionBridge.expression(tokens), n))

  /** MinHash signature → LSH band buckets over pre-hashed shingles.
    * bucket[b] = xxhash64 of the b-th length-`rowsPerBand` slice of
    * sig, where sig[i] = min over shingle hashes h of xxhash64(h, i). */
  def minhashBuckets(shingleHashes: Column, k: Int, rowsPerBand: Int): Column =
    GraftExpressionBridge.column(
      MinHashBuckets(GraftExpressionBridge.expression(shingleHashes), k, rowsPerBand))

  /** 64-bit SimHash of a token array: per token, xxhash64 contributes ±1 to
    * each bit position; result bit b is set iff the position-b sum > 0. */
  def simhash64(tokens: Column): Column =
    GraftExpressionBridge.column(
      SimHash64(GraftExpressionBridge.expression(tokens)))

  /** Random-hyperplane LSH bucket of a double vector: `planes` sign bits
    * (plane components ±1 derived from xxhash64(p, j), bit 13), packed
    * MSB-first into a long. */
  def hyperplaneBucket(vec: Column, planes: Int, offset: Int = 0): Column =
    GraftExpressionBridge.column(
      HyperplaneBucket(GraftExpressionBridge.expression(vec), planes, offset))

  /** M4 chunked-md5 signature of an int32 vector (reference-parity
    * remainder chunking; hex digit `idx` of each chunk digest). */
  def md5ChunkSignature(vec: Column, idx: Int): Column =
    GraftExpressionBridge.column(
      Md5ChunkSignature(GraftExpressionBridge.expression(vec), idx))
}

/** Static kernels (objects get Java static forwarders, so generated code
  * can call them directly). */
object ShingleKernel {
  private final val Seed = 42L

  /** tokens → sorted distinct xxhash64 of each n-token window joined by a
    * single space (the whole-tokens string when fewer than n tokens). */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) {
      // single shingle: all tokens joined (empty string for zero tokens)
      var total = 0
      var i = 0
      val bs = new Array[Array[Byte]](m)
      while (i < m) { bs(i) = tokens.getUTF8String(i).getBytes; total += bs(i).length; i += 1 }
      val buf = new Array[Byte](total + math.max(0, m - 1))
      var off = 0
      i = 0
      while (i < m) {
        if (i > 0) { buf(off) = ' '; off += 1 }
        System.arraycopy(bs(i), 0, buf, off, bs(i).length); off += bs(i).length
        i += 1
      }
      return UnsafeArrayData.fromPrimitiveArray(
        Array(XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, off, Seed)))
    }
    val bs = new Array[Array[Byte]](m)
    var i = 0
    var maxWin = 0
    while (i < m) { bs(i) = tokens.getUTF8String(i).getBytes; i += 1 }
    i = 0
    var winLen = n - 1 // separators
    while (i < n) { winLen += bs(i).length; i += 1 }
    maxWin = winLen
    // first pass just for max window byte length
    i = 1
    while (i <= m - n) {
      winLen += bs(i + n - 1).length - bs(i - 1).length
      if (winLen > maxWin) maxWin = winLen
      i += 1
    }
    val buf = new Array[Byte](maxWin)
    val w = m - n + 1
    val hashes = new Array[Long](w)
    i = 0
    while (i < w) {
      var off = 0
      var j = i
      while (j < i + n) {
        if (j > i) { buf(off) = ' '; off += 1 }
        System.arraycopy(bs(j), 0, buf, off, bs(j).length); off += bs(j).length
        j += 1
      }
      hashes(i) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, off, Seed)
      i += 1
    }
    java.util.Arrays.sort(hashes)
    // in-place unique
    var out = 0
    i = 0
    while (i < w) {
      if (i == 0 || hashes(i) != hashes(i - 1)) { hashes(out) = hashes(i); out += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hashes, out))
  }
}

object MinHashKernel {
  private final val Seed = 42L

  def compute(sh: ArrayData, k: Int, rowsPerBand: Int): ArrayData = {
    val hs = sh.toLongArray()
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val hh = XXH64.hashLong(hs(i), Seed)
      var j = 0
      while (j < k) {
        val v = XXH64.hashInt(j, hh)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    val nBands = k / rowsPerBand
    val buckets = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var acc = Seed
      var j = b * rowsPerBand
      val end = j + rowsPerBand
      while (j < end) { acc = XXH64.hashLong(sig(j), acc); j += 1 }
      buckets(b) = acc
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(buckets)
  }
}

object SimHashKernel {
  private final val Seed = 42L

  def compute(tokens: ArrayData): Long = {
    val sums = new Array[Int](64)
    val m = tokens.numElements()
    var i = 0
    while (i < m) {
      val t = tokens.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes(), Seed)
      var b = 0
      while (b < 64) {
        if (((h >> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** M4 (a2_ahuja.py:99–120): chunked-md5 signature of an int32 vector.
  * Operates on ArrayData directly (no per-element boxing) with one
  * reusable MessageDigest + byte buffer per thread. */
object SignatureKernel {
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def compute(v: ArrayData, idx: Int): UTF8String = {
    val arr = v.toIntArray()
    val n = arr.length
    val pieces = 128
    val step = n / pieces
    val mod = n % pieces
    val md = md5.get()
    val out = new Array[Byte](math.min(pieces, n))
    val buf = java.nio.ByteBuffer.allocate((step + 1) * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var s = 0
    var i = 0
    while (i < pieces && s < n) {
      val len = if (i < mod) step + 1 else step
      buf.clear()
      var j = 0
      while (j < len) { buf.putInt(arr(s + j)); j += 1 }
      md.reset()
      md.update(buf.array(), 0, len * 4)
      val digest = md.digest()
      // hex digit `idx`: digit 2k = high nibble of byte k, 2k+1 = low
      val b = digest(idx / 2) & 0xff
      val nib = if (idx % 2 == 0) b >>> 4 else b & 0xf
      out(i) = java.lang.Character.forDigit(nib, 16).toByte
      s += len
      i += 1
    }
    UTF8String.fromBytes(out, 0, i)
  }
}

object HyperplaneKernel {
  private final val Seed = 42L

  // (planes, offset, d) → flattened planes×d ±1 sign matrix. The signs are
  // a pure function of seeded hashes, so they are computed once per JVM and
  // the per-row work becomes a straight FMA loop instead of O(planes·d)
  // hash calls per row. Key packed to avoid per-row tuple allocation.
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Long, Array[Double]]()

  // key packing is exact only for offset/d < 2^24 (planes is bounded to 63
  // by HyperplaneBucket); out-of-range inputs take the uncached loop below
  // rather than silently aliasing cache keys. The cache is also capped:
  // a pathological stream of distinct dims recomputes instead of growing
  // without bound.
  private final val KeyRange = 1 << 24
  private final val MaxCacheEntries = 256

  private def signs(planes: Int, offset: Int, d: Int): Array[Double] = {
    val key = java.lang.Long.valueOf(
      (planes.toLong << 48) | (offset.toLong << 24) | d.toLong)
    var m = signCache.get(key)
    if (m == null) {
      m = new Array[Double](planes * d)
      var p = 0
      while (p < planes) {
        val hp = XXH64.hashInt(offset + p, Seed)
        var j = 0
        while (j < d) {
          // plane component ±1 from bit 13 of xxhash64(p, j) — identical
          // derivation to the uncached loop, just precomputed
          m(p * d + j) = if (((XXH64.hashInt(j, hp) >> 13) & 1L) == 1L) 1.0 else -1.0
          j += 1
        }
        p += 1
      }
      if (signCache.size >= MaxCacheEntries) signCache.clear()
      signCache.putIfAbsent(key, m)
    }
    m
  }

  /** Identical bucket derivation without the sign-matrix cache — the
    * correctness path for inputs whose (offset, d) cannot be packed into
    * the cache key. */
  private def computeUncached(x: Array[Double], planes: Int, offset: Int): Long = {
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val hp = XXH64.hashInt(offset + p, Seed)
      var acc = 0.0
      var j = 0
      while (j < x.length) {
        acc += x(j) * (if (((XXH64.hashInt(j, hp) >> 13) & 1L) == 1L) 1.0 else -1.0)
        j += 1
      }
      bucket = bucket * 2 + (if (acc > 0) 1L else 0L)
      p += 1
    }
    bucket
  }

  /** `offset` selects a disjoint plane range [offset, offset+planes) —
    * multi-band LSH uses offset = band * planes. */
  def compute(vec: ArrayData, planes: Int, offset: Int): Long = {
    val x = vec.toDoubleArray()
    if (offset < 0 || offset >= KeyRange || x.length >= KeyRange)
      return computeUncached(x, planes, offset)
    val m = signs(planes, offset, x.length)
    var bucket = 0L
    var p = 0
    var base = 0
    while (p < planes) {
      var acc = 0.0
      var j = 0
      while (j < x.length) {
        acc += x(j) * m(base + j)
        j += 1
      }
      bucket = bucket * 2 + (if (acc > 0) 1L else 0L)
      p += 1
      base += x.length
    }
    bucket
  }
}

/** SQL-facing expressions: constructor params are bound-checked eagerly
  * (the SQL builder passes user literals) and the child type is validated
  * via `checkInputDataTypes`, so a misuse like `graft_simhash64(5)` fails
  * analysis with a clear message instead of a runtime ClassCastException. */
private[functions] object KernelTypeCheck {
  def arrayOf(child: Expression, elem: DataType, fn: String): TypeCheckResult =
    child.dataType match {
      case ArrayType(`elem`, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn expects array<${elem.simpleString}>, got ${other.simpleString}")
    }
}

case class ShingleHash64(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle width n must be >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult =
    KernelTypeCheck.arrayOf(child, StringType, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(tokens: Any): Any =
    ShingleKernel.compute(tokens.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernel.compute($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_shingle_hash64"
}

case class MinHashBuckets(child: Expression, k: Int, rowsPerBand: Int)
    extends UnaryExpression {
  require(k >= 1 && rowsPerBand >= 1 && k % rowsPerBand == 0,
    s"need k >= 1, rowsPerBand >= 1 and rowsPerBand | k; got k=$k rowsPerBand=$rowsPerBand")
  override def checkInputDataTypes(): TypeCheckResult =
    KernelTypeCheck.arrayOf(child, LongType, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(sh: Any): Any =
    MinHashKernel.compute(sh.asInstanceOf[ArrayData], k, rowsPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashKernel.compute($c, $k, $rowsPerBand)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash_buckets"
}

case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    KernelTypeCheck.arrayOf(child, StringType, prettyName)
  override def dataType: DataType = LongType
  override def nullSafeEval(tokens: Any): Any =
    SimHashKernel.compute(tokens.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashKernel.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash64"
}

case class Md5ChunkSignature(child: Expression, idx: Int)
    extends UnaryExpression {
  require(idx >= 0 && idx < 32, s"md5 hex digit index must be in [0, 32), got $idx")
  override def checkInputDataTypes(): TypeCheckResult =
    KernelTypeCheck.arrayOf(child, IntegerType, prettyName)
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    SignatureKernel.compute(v.asInstanceOf[ArrayData], idx)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SignatureKernel.compute($c, $idx)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_md5_chunk_signature"
}

case class HyperplaneBucket(child: Expression, planes: Int, offset: Int = 0)
    extends UnaryExpression {
  require(planes >= 1 && planes <= 63, s"planes must be in [1, 63], got $planes")
  require(offset >= 0, s"plane offset must be >= 0, got $offset")
  override def checkInputDataTypes(): TypeCheckResult =
    KernelTypeCheck.arrayOf(child, DoubleType, prettyName)
  override def dataType: DataType = LongType
  override def nullSafeEval(vec: Any): Any =
    HyperplaneKernel.compute(vec.asInstanceOf[ArrayData], planes, offset)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HyperplaneKernel.compute($c, $planes, $offset)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_hyperplane_bucket"
}
