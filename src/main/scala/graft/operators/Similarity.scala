package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.Vectors._

/** Similarity search over the embeddings table (array<float>, 64-dim).
  *
  * - Brute-force cosine top-k is the exactness baseline: broadcast the
  *   (small) query set against the full corpus — one pass, no shuffle of
  *   the corpus, scales linearly with corpus partitions.
  * - LSH (random hyperplanes) is the 100 TB path: candidates come from a
  *   bucket equi-join instead of a cross join, trading recall for a
  *   shuffle keyed on a compact signature. Verified for recall in the
  *   spec suite, not by the SQL oracle.
  * - Near-dup pairs (cosine >= threshold) use the same kernels.
  *
  * All vector math is codegen'd higher-order functions (Vectors.scala)
  * in strict fold-left double order — bit-identical to the DuckDB
  * oracle's list_sum/list_transform.
  */
object Similarity {

  val TopK = 10
  val NumQueries = 10 // query set = vec_id < 10
  val CosineDupThreshold = 0.45

  /** cosine(a,b) = dot(unit(a), unit(b)): vectors are normalized ONCE per
    * row (norm amortized over all pairs they appear in), so each of the
    * O(n·q) / O(n²) pair evaluations costs a single fold — 3× less work
    * than dot/(|a|·|b|) per pair. The oracle mirrors this arithmetic
    * structure exactly (u_i = v_i / sqrt(Σv²), then fold-left dot). */
  private def withUnit(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
      .select(col("vec_id"), transform(col("v"), _ / col("nrm")).as("u"))

  /** SQL mirror of [[withUnit]]'s normalization for the DuckDB oracle. */
  private val sqlUnit: String =
    """select vec_id,
      |  list_transform(embedding::DOUBLE[],
      |    x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y * y)))) as u
      |from embeddings""".stripMargin

  private def sqlDotU(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a.u) + 1), i -> $a.u[i] * $b.u[i]))"

  /** Embedding dimension of the fixture corpus (FIXTURES.md). */
  val Dim = 64

  private def cosExpr(a: Column, b: Column): Column = dot(a, b)

  /** Brute-force exact top-k neighbors for each query vector. */
  def bruteForceTopK(emb: DataFrame, k: Int): DataFrame = {
    val unit = withUnit(emb)
    val corpus = unit.select(col("vec_id").as("neighbor_id"), col("u").as("cv"))
    val queries = unit.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("u").as("qv"))
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosExpr(col("qv"), col("cv")))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        round(col("cos"), 6).as("cos_sim"))
  }

  val annBruteForce: Q = Q.df(
    "ann_cosine_topk",
    s"""with e as ($sqlUnit),
       |q as (select * from e where vec_id < $NumQueries),
       |pairs as (
       |  select q.vec_id as query_id, c.vec_id as neighbor_id,
       |    ${sqlDotU("q", "c")} as cos
       |  from q, e c where q.vec_id <> c.vec_id)
       |select query_id, neighbor_id, rnk, round(cos, 6) as cos_sim
       |from (select *, cast(row_number() over (
       |        partition by query_id order by cos desc, neighbor_id) as bigint) as rnk
       |      from pairs) t
       |where rnk <= $TopK
       |order by query_id, rnk""".stripMargin) { (s, dir) =>
    bruteForceTopK(Tables.df(s, dir, "embeddings"), TopK)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** All near-duplicate pairs by cosine >= threshold (embedding dedup).
    *
    * Exact all-pairs is inherently O(n²) compare, but it needs NO
    * driver-side state: the corpus is split into `blocks` id-hash blocks
    * and the B·(B+1)/2 ordered block pairs become an equi-join key, so
    * every vector pair meets in exactly one task. Per-task memory and
    * work are bounded by (n/B)² regardless of corpus size; shuffle
    * volume is ~B/2 copies of the (already-normalized) vectors, never
    * the pair matrix. Scale by raising B: tasks grow as B², per-task
    * cost shrinks as 1/B². For corpora where even that is too much, the
    * recall-trading path is the hyperplane-LSH candidate join below.
    * The dot fold order matches the DuckDB oracle exactly (same kernel
    * as [[bruteForceTopK]], which hash-matches).
    */
  def cosinePairs(emb: DataFrame, threshold: Double, blocks: Int = 16): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val unit = withUnit(emb)
      .withColumn("blk", pmod(col("vec_id"), lit(blocks)).cast("int"))
    val blockPairs = (for { a <- 0 until blocks; b <- a until blocks }
      yield (a, b)).toDF("b1", "b2")
    // each side replicated to every block pair it participates in; the
    // (b1, b2) composite key gives B·(B+1)/2-way join parallelism
    val left = unit.select(col("vec_id").as("i1"), col("u").as("u1"),
        col("blk").as("b1")).join(broadcast(blockPairs), Seq("b1"))
    val right = unit.select(col("vec_id").as("i2"), col("u").as("u2"),
        col("blk").as("b2")).join(broadcast(blockPairs), Seq("b2"))
    left.join(right, Seq("b1", "b2"))
      // cross-block pairs appear once (b1 < b2); same-block needs i1 < i2
      .filter(col("b1") =!= col("b2") || col("i1") < col("i2"))
      .withColumn("cos", cosExpr(col("u1"), col("u2")))
      .filter(col("cos") >= threshold)
      .select(least(col("i1"), col("i2")).as("d1"),
        greatest(col("i1"), col("i2")).as("d2"),
        round(col("cos"), 6).as("cos_sim"))
  }

  val dedupEmbeddingCosine: Q = Q.df(
    "dedup_embedding_cosine",
    s"""with e as ($sqlUnit)
       |select a.vec_id as d1, b.vec_id as d2,
       |  round(${sqlDotU("a", "b")}, 6) as cos_sim
       |from e a join e b on a.vec_id < b.vec_id
       |where ${sqlDotU("a", "b")} >= $CosineDupThreshold
       |order by d1, d2""".stripMargin) { (s, dir) =>
    cosinePairs(Tables.df(s, dir, "embeddings"), CosineDupThreshold)
      .orderBy(col("d1"), col("d2"))
  }

  // ---- LSH (random hyperplanes) — the scale path -------------------------

  /** L hash tables × b sign bits each: a vector lands in one bucket per
    * table; candidates are the union of same-bucket vectors over the L
    * tables. More tables → higher recall; fewer bits → denser buckets.
    * (Same trade-off as MinHash banding.) */
  val NumTables = 8
  val BitsPerTable = 6

  /** Deterministic pseudo-random hyperplanes (seed 42), dim 64. */
  private def planes: Seq[Seq[Seq[Double]]] = {
    val rnd = new Random(42)
    Seq.fill(NumTables)(Seq.fill(BitsPerTable)(Seq.fill(64)(rnd.nextGaussian())))
  }

  /** Per-table sign-bit bucket: bit i = (v · plane_i) >= 0. */
  private def tableBucket(v: Column, table: Int): Column =
    planes(table).zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(v, planeLit) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** (vec_id, v, table, bucket) — one row per table. */
  def lshKeys(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .select(col("vec_id"), col("v"), explode(array((0 until NumTables).map(t =>
        struct(lit(t).as("table"), tableBucket(col("v"), t).as("bucket"))): _*)).as("tb"))
      .select(col("vec_id"), col("v"), col("tb.table"), col("tb.bucket"))

  /** ANN via bucket equi-join: only same-bucket candidates (union over
    * tables) are scored. Approximate by construction → rows-only check +
    * recall spec. At 100 TB the bucket join replaces the O(n·q) scan and
    * shuffles on the compact (table, bucket) key. */
  def lshTopK(emb: DataFrame, k: Int): DataFrame = {
    val keys = lshKeys(emb)
    val vecs = withUnit(emb).select(col("vec_id"), col("u").as("v"))
    // candidate id pairs first (dedup before carrying vectors around)
    val pairs = keys.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("table"), col("bucket"))
      .join(keys.select(col("vec_id").as("neighbor_id"), col("table"), col("bucket")),
        Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct() // a pair may collide in several tables
    pairs
      .join(broadcast(vecs.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))), Seq("query_id"))
      .join(vecs.select(col("vec_id").as("neighbor_id"), col("v").as("cv")),
        Seq("neighbor_id"))
      .withColumn("cos", cosExpr(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        round(col("cos"), 6).as("cos_sim"))
  }

  val annLsh: Q = Q.rowsOnly("ann_lsh_topk") { (s, dir) =>
    lshTopK(Tables.df(s, dir, "embeddings"), TopK)
      .orderBy(col("query_id"), col("rnk"))
  }

  val queries: Seq[Q] = Seq(annBruteForce, dedupEmbeddingCosine, annLsh)
}
