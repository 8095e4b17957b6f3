package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Registers the graft kernel expressions as SQL functions via the public
  * `SparkSessionExtensions` mechanism, so `spark.sql` users can call them
  * directly:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  *   ...
  * spark.sql("SELECT graft_simhash64(tokens) FROM t")
  * }}}
  *
  * Scalar parameters (n, k, bands…) are passed as literal arguments.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def arity(fn: String, children: Seq[Expression],
                    min: Int, max: Int): Unit =
    if (children.length < min || children.length > max) {
      val expected = if (min == max) s"$min" else s"$min to $max"
      throw new IllegalArgumentException(
        s"$fn expects $expected arguments, got ${children.length}")
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer rule: key-less |Δts| <= w joins become binned equi-joins
    // (BinTemporalRangeJoin scaladoc) instead of nested-loop products
    ext.injectOptimizerRule(_ => graft.plans.BinTemporalRangeJoin)

    def info(name: String, usage: String) = {
      val _ = usage // shown via SQL DESCRIBE only with the extended ctor
      new ExpressionInfo("graft.functions.HashFunctions", name)
    }

    ext.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "graft_simhash64(tokens) - 64-bit SimHash of a string array"),
      (children: Seq[Expression]) => {
        arity("graft_simhash64", children, 1, 1)
        SimHash64(children.head)
      }))

    ext.injectFunction((FunctionIdentifier("graft_shingle_hash64"),
      info("graft_shingle_hash64",
        "graft_shingle_hash64(tokens, n) - distinct 64-bit n-gram shingle hashes"),
      (children: Seq[Expression]) => {
        arity("graft_shingle_hash64", children, 2, 2)
        ShingleHash64(children.head, intArg(children(1), "n"))
      }))

    ext.injectFunction((FunctionIdentifier("graft_minhash_buckets"),
      info("graft_minhash_buckets",
        "graft_minhash_buckets(shingleHashes, k, rowsPerBand) - minhash LSH band buckets"),
      (children: Seq[Expression]) => {
        arity("graft_minhash_buckets", children, 3, 3)
        MinHashBuckets(children.head,
          intArg(children(1), "k"), intArg(children(2), "rowsPerBand"))
      }))

    ext.injectFunction((FunctionIdentifier("graft_hyperplane_bucket"),
      info("graft_hyperplane_bucket",
        "graft_hyperplane_bucket(vec, planes[, offset]) - random-hyperplane LSH bucket"),
      (children: Seq[Expression]) => {
        arity("graft_hyperplane_bucket", children, 2, 3)
        HyperplaneBucket(children.head,
          intArg(children(1), "planes"),
          if (children.length > 2) intArg(children(2), "offset") else 0)
      }))

    ext.injectFunction((FunctionIdentifier("graft_md5_chunk_signature"),
      info("graft_md5_chunk_signature",
        "graft_md5_chunk_signature(intVec, idx) - 128-chunk md5 signature"),
      (children: Seq[Expression]) => {
        arity("graft_md5_chunk_signature", children, 2, 2)
        Md5ChunkSignature(children.head, intArg(children(1), "idx"))
      }))

    // the text-cleaning surface: compositions of Spark's own codegen'd
    // expressions (TextCleanExprs — the one definition behind both the
    // DataFrame API and these SQL functions)
    def composed(name: String, usage: String,
                 build: Expression => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage),
        (children: Seq[Expression]) => {
          arity(name, children, 1, 1)
          build(children.head)
        }))

    composed("graft_redact_pii",
      "graft_redact_pii(text) - redact emails/URLs/IPv4s/phones with typed placeholders",
      TextCleanExprs.redactPii)
    composed("graft_html_to_text",
      "graft_html_to_text(html) - strip script/style/tags, decode entities, collapse whitespace",
      TextCleanExprs.htmlToText)
    composed("graft_html_title",
      "graft_html_title(html) - first <title> contents, '' when absent",
      TextCleanExprs.htmlTitle)

    ext.injectFunction((FunctionIdentifier("graft_compress_ratio"),
      info("graft_compress_ratio",
        "graft_compress_ratio(text) - deflate bytes / raw bytes (repetitiveness signal)"),
      (children: Seq[Expression]) => {
        arity("graft_compress_ratio", children, 1, 1)
        CompressRatio(children.head)
      }))
  }
}
