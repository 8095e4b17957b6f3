package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector kernels over `array<float>` embedding columns (SURVEY.md §2.6
  * M7/M9, A7/A8 + the training-data-pipeline similarity-search operators).
  *
  * Reference semantics:
  *  - A7/A8 grand mean/variance of vectors (`a2_ahuja.py:260–266`):
  *    map-to-one-key reduceByKey → here `posexplode` + per-dimension
  *    aggregation (partial-agg'd map-side; shuffle carries 1 row per dim,
  *    not per input row).
  *  - M7 z-score standardization (`a2_ahuja.py:260–268`).
  *  - M9 Euclidean distance (`a2_ahuja.py:299–310`).
  *  - Brute-force cosine top-k: baseline ANN; the scale path buckets by an
  *    LSH/SimHash prefix first (see [[Dedup]] / [[Lsh]]) so the cross
  *    product never materializes at 100 TB.
  *
  * All folds run in array order (deterministic per row). Cross-row sums use
  * integer-scaled ("micro") accumulation: associative and exact, so results
  * are independent of partition merge order — required both for the DuckDB
  * oracle hash and for run-to-run stability on a real cluster.
  */
object VectorOps {

  /** Σ f(x) over an array column, left-fold in array order (double). */
  def foldSum(v: Column, f: Column => Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + f(x))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column = sqrt(foldSum(v, x => x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  def euclidean(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => x.cast("double") - y.cast("double")),
      lit(0.0), (acc, d) => acc + d * d))

  /** O4 (a2:224–227, spec2 p.3 (f)): "first k … last k" preview string of
    * an array column — the reference's feature-vector print contract. */
  def headTailPreview(arr: Column, k: Int = 3): Column =
    concat_ws(" ",
      concat(
        transform(slice(arr, 1, k), x => x.cast("string")),
        array(lit("...")),
        transform(slice(arr, -k, k), x => x.cast("string"))))

  /** Per-row L2 norms (M9 building block), deterministically ordered. */
  def norms(df: DataFrame, id: Column, vec: Column): DataFrame =
    df.select(id.as("vec_id"), l2Norm(vec).as("norm")).orderBy("vec_id")

  /** A7/A8: per-dimension mean and population variance across all rows.
    *
    * Cross-row float sums are order-dependent in IEEE double; instead each
    * value is scaled to an exact integer number of millionths and summed
    * EXACTLY (associative ⇒ plan- and partition-order-independent). The
    * squared term is ~1e12 per unit-scale row, so both sums accumulate in
    * DECIMAL(38,0) — a BIGINT sum of squares would wrap silently past
    * ~9 million rows. The shuffle carries `dim` rows total regardless of
    * input size.
    */
  def dimStats(df: DataFrame, vec: Column): DataFrame = {
    val micro = round(col("v").cast("double") * 1e6).cast("long")
    df.select(posexplode(vec).as(Seq("dim", "v")))
      .select(col("dim"), micro.as("vu"))
      .groupBy("dim")
      .agg(
        count(lit(1)).as("n"),
        sum(col("vu").cast("decimal(38,0)")).cast("double").as("s1"),
        // cast BEFORE multiplying: the long×long product itself would
        // overflow first for |value| > ~3e3 (|vu| > ~3e9)
        sum(col("vu").cast("decimal(19,0)") * col("vu").cast("decimal(19,0)"))
          .cast("double").as("s2"))
      .select(
        col("dim"),
        col("n"),
        (col("s1") / col("n") / 1e6).as("mean"),
        ((col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n"))) / 1e12)
          .as("var_pop"))
      .orderBy("dim")
  }

  /** M7: z-score standardize every vector against the corpus per-dimension
    * stats. Stats (O(dim) values) are computed distributed, then joined
    * back as a broadcast — the data side is a single narrow map. */
  def standardize(df: DataFrame, id: Column, vec: Column): DataFrame = {
    val stats = dimStats(df, vec)
      .agg(
        collect_list(struct(col("dim"), col("mean"))).as("ms"),
        collect_list(struct(col("dim"), col("var_pop"))).as("vs"))
      .select(
        transform(array_sort(col("ms")), s => s.getField("mean")).as("mu"),
        transform(array_sort(col("vs")), s => sqrt(s.getField("var_pop"))).as("sigma"))
    df.select(id.as("vec_id"), vec.as("v"))
      .crossJoin(broadcast(stats))
      .select(
        col("vec_id"),
        zip_with(col("v"), sequence(lit(0), size(col("v")) - 1),
          (x, i) => (x.cast("double") - element_at(col("mu"), i + 1))
            / element_at(col("sigma"), i + 1)).as("z"))
  }

  /** M7 in long form: (vec_id, dim, z) rows — the harness-comparable and
    * DuckDB-oracle-expressible shape of [[standardize]]. The per-dim stats
    * (O(dim) rows) are broadcast-joined back onto the exploded data, so the
    * data side never shuffles before the final deterministic sort. */
  def standardizeLong(df: DataFrame, id: Column, vec: Column): DataFrame = {
    val stats = dimStats(df, vec)
      .select(col("dim"), col("mean"), sqrt(col("var_pop")).as("sigma"))
    df.select(id.as("vec_id"), posexplode(vec).as(Seq("dim", "x")))
      .join(broadcast(stats), "dim")
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        ((col("x").cast("double") - col("mean")) / col("sigma")).as("z"))
      .orderBy("vec_id", "dim")
  }

  /** Brute-force cosine top-k: every query row against the full corpus.
    * The query side is broadcast (must be small); ranking is a window over
    * the corpus side, so only k rows per query survive the shuffle.
    * This is the correctness baseline ANN; see [[Dedup.embeddingNearDupLsh]]
    * for the bucketed scale path. */
  def knnCosine(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("nbr_id"), col("embedding").as("cv"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    // cos rounded to 4dp: bit-stable across engines (same fold order), so
    // the ranking — tie-broken on nbr_id — is oracle-reproducible.
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        round(cosine(col("qv"), col("cv")), 4).as("cos_r"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_r").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** All pairs (query, neighbor) above a cosine threshold, rounded for
    * cross-engine comparability. */
  def cosinePairsAbove(corpus: DataFrame, queries: DataFrame,
                       threshold: Double): DataFrame = {
    val c = corpus.select(col("vec_id").as("nbr_id"), col("embedding").as("cv"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        round(cosine(col("qv"), col("cv")), 4).as("cos_r"))
      .filter(col("cos_r") >= threshold)
      .orderBy("query_id", "nbr_id")
  }

  /** Approximate nearest neighbours via multi-band random-hyperplane LSH —
    * the scale path behind the brute-force [[knnCosine]] baseline.
    *
    * Corpus and (small, broadcast) query side are bucketed per band with
    * disjoint plane ranges; candidates = corpus rows sharing ANY band
    * bucket with a query. The band join carries ids only, candidate pairs
    * are `distinct`ed, vectors are joined back once and exact cosine is
    * computed once per candidate — then a window keeps the top k. The
    * corpus is scanned, never cross-joined: at 100 TB the pair space is
    * |candidates| (bucket-bounded), not |queries|×|corpus|.
    */
  def annLshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 planes: Int = 6, bands: Int = 4): DataFrame = {
    def banded(df: DataFrame, idAs: String) = df
      .select(col("vec_id").as(idAs),
        explode(Dedup.hyperplaneBands(col("embedding"), planes, bands)).as("bb"))
      .select(col(idAs), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cands = banded(corpus, "nbr_id")
      .join(broadcast(banded(queries, "query_id")), Seq("band", "bucket"))
      .filter(col("query_id") =!= col("nbr_id"))
      .select("query_id", "nbr_id")
      .distinct()
    val scored = cands
      .join(corpus.select(col("vec_id").as("nbr_id"), col("embedding").as("cv")), "nbr_id")
      .join(broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))),
        "query_id")
      .select(col("query_id"), col("nbr_id"),
        round(cosine(col("qv"), col("cv")), 4).as("cos_r"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_r").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** Per-label centroid separation — the class-geometry diagnostic for a
    * labeled embedding set (are classes collapsing? which pairs are
    * confusable?): centroid per label in exact integer micro-units
    * (sum div n per dimension — same quantization contract as
    * [[Clustering]]), then pairwise squared L2 between centroids.
    *
    * Exact at any scale: per-(label, dim) sums partial-aggregate
    * map-side, the centroid table is labels×dims rows no matter the
    * corpus size, and the pairwise stage joins only that tiny table on
    * `dim`. Output: (label_a, label_b, dist2) with label_a < label_b,
    * dist2 in micro² units. */
  def labelCentroidDists(df: DataFrame, label: Column,
                         vec: Column): DataFrame = {
    val cent = df
      .select(label.as("label"), Clustering.quantize(vec, 8.0, 1e6).as("q"))
      .select(col("label"), posexplode(col("q")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      // nonnegative after the +8 shift, so floor(double quotient) ==
      // integer division (quotient ~1e7, error 1e-9, gap-to-integer 1/n)
      .select(col("label"), col("dim"),
        floor(col("s") / col("n")).cast("long").as("c"))
    val a = cent.select(col("label").as("label_a"), col("dim"),
      col("c").as("ca"))
    val b = cent.select(col("label").as("label_b"), col("dim"),
      col("c").as("cb"))
    a.join(b, Seq("dim"))
      .filter(col("label_a") < col("label_b"))
      .groupBy("label_a", "label_b")
      .agg(sum((col("ca") - col("cb")) * (col("ca") - col("cb")))
        .as("dist2"))
  }
}
