package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.DotProduct
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
  private[graft] def withUnit(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
      .select(col("vec_id"), transform(col("v"), _ / col("nrm")).as("u"))

  /** SQL mirror of [[withUnit]]'s normalization for the DuckDB oracle. */
  private[operators] val sqlUnit: String =
    """select vec_id,
      |  list_transform(embedding::DOUBLE[],
      |    x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y * y)))) as u
      |from embeddings""".stripMargin

  private[operators] def sqlDotU(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a.u) + 1), i -> $a.u[i] * $b.u[i]))"

  /** Embedding dimension of the fixture corpus (FIXTURES.md). */
  val Dim = 64

  /** Pair-scoring kernel: the codegen'd native dot (same fold order as
    * the interpreted [[dot]] and the oracle — bit-identical results). */
  private def cosExpr(a: Column, b: Column): Column = dotNative(a, b)

  /** Brute-force exact top-k neighbors for each query vector. */
  def bruteForceTopK(emb: DataFrame, k: Int): DataFrame =
    bruteForceTopKFromUnit(emb.sparkSession, withUnit(emb), k)

  /** Entry path over the SHARED normalized corpus (one normalize pass
    * per session × corpus instead of one per consumer). */
  private[operators] def bruteForceTopKShared(
      s: org.apache.spark.sql.SparkSession, dir: String, k: Int): DataFrame =
    bruteForceTopKFromUnit(s, sharedUnitVecs(s, dir), k)

  private def bruteForceTopKFromUnit(s: org.apache.spark.sql.SparkSession,
      unit: DataFrame, k: Int): DataFrame = {
    DotProduct.ensureRegistered(s)
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

  private def bruteForceOracle: String =
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
       |order by query_id, rnk""".stripMargin

  val annBruteForce: Q = Q.df("ann_cosine_topk", bruteForceOracle) { (s, dir) =>
    bruteForceTopKShared(s, dir, TopK)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** One id-hash block of normalized vectors should fit comfortably in
    * a task (two are resident per cogroup task): 64 MB per block keeps
    * a pair inside a typical executor task's memory share. */
  val TargetBlockBytes: Long = 64L << 20

  /** Block count for [[cosinePairs]], derived from the corpus instead
    * of hard-coded so the exact path survives a 100× corpus without
    * retuning: B rises linearly with n·dim·8 / [[TargetBlockBytes]]
    * (per-task memory stays ≤ 2 blocks of bounded size) and never drops
    * below the B whose B·(B+1)/2 cogroup tasks cover the cluster's
    * parallelism. Capped at 4096 (16.8M tasks — far beyond any sane
    * exact run; past that the LSH/SemDeDup paths are the answer). Pure
    * function so the scaling law is spec-checkable. */
  def cosineBlocks(n: Long, dim: Int, parallelism: Int): Int = {
    val memB = (n * dim * 8L + TargetBlockBytes - 1) / TargetBlockBytes
    val parB = math.ceil(math.sqrt(2.0 * parallelism)).toLong
    math.max(1L, math.min(4096L, math.max(memB, parB))).toInt
  }

  /** All near-duplicate pairs by cosine >= threshold (embedding dedup).
    *
    * Exact all-pairs is inherently O(n²) compare, but it needs NO
    * driver-side state: the corpus is split into B id-hash blocks
    * and the B·(B+1)/2 ordered block pairs become a cogroup key, so
    * every vector pair meets in exactly one task. Per-task memory and
    * work are bounded by (n/B)² regardless of corpus size; shuffle
    * volume is ~B/2 copies of the (already-normalized) vectors, never
    * the pair matrix. B defaults to [[cosineBlocks]] — sized from a
    * count+dim pre-pass (two scalars to the driver, model-only) — and
    * scales with the corpus: tasks grow as B², per-task cost shrinks as
    * 1/B². For corpora where even that is too much, the recall-trading
    * path is the hyperplane-LSH candidate join below. The dot fold
    * order matches the DuckDB oracle exactly (same kernel as
    * [[bruteForceTopK]], which hash-matches); B only repartitions the
    * pair space, so the result set is B-invariant.
    */
  def cosinePairs(emb: DataFrame, threshold: Double, blocks: Int = 0): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val blocksResolved =
      if (blocks > 0) blocks
      else {
        val r = emb.agg(count(lit(1)),
          first(size(col("embedding")))).head()
        cosineBlocks(r.getLong(0), if (r.isNullAt(1)) Dim else r.getInt(1),
          spark.sparkContext.defaultParallelism)
      }
    val unit = withUnit(emb).as[(Long, Array[Double])]
    // replicate each side to its block pairs: key = b1 * blocks + b2
    // (b1 <= b2). Shuffle volume is ~B/2 copies of the normalized
    // vectors — never the O(n²) pair matrix.
    val nB = blocksResolved
    val leftKeyed = unit.flatMap { case (id, u) =>
      val b = (id % nB).toInt
      (b until nB).map(b2 => (b * nB + b2, id, u))
    }
    val rightKeyed = unit.flatMap { case (id, u) =>
      val b = (id % nB).toInt
      (0 to b).map(b1 => (b1 * nB + b, id, u))
    }
    // cogroup = both blocks of a pair land in one task; the kernel is a
    // primitive-double nested loop (same fold order as [[dot]] and the
    // oracle), with zero per-pair array serialization — the per-task
    // footprint is two blocks, (n/B)·dim·8 bytes each, tuned via B.
    leftKeyed.groupByKey(_._1)
      .cogroup(rightKeyed.groupByKey(_._1)) { (key, ls, rs) =>
        val sameBlock = (key / nB) == (key % nB)
        val lArr = ls.toArray
        val rArr = rs.toArray
        lArr.iterator.flatMap { case (_, i1, u1) =>
          rArr.iterator.flatMap { case (_, i2, u2) =>
            if (sameBlock && i1 >= i2) Iterator.empty
            else {
              var acc = 0.0
              var k = 0
              while (k < u1.length) { acc += u1(k) * u2(k); k += 1 }
              if (acc >= threshold)
                Iterator.single((math.min(i1, i2), math.max(i1, i2), acc))
              else Iterator.empty
            }
          }
        }
      }
      .toDF("d1", "d2", "cos")
      .select(col("d1"), col("d2"), round(col("cos"), 6).as("cos_sim"))
  }

  /** The pair kernel's dot is the same strict fold-left double order as
    * `graft_dot` ([[graft.functions.DotProduct]], the codegen'd Catalyst
    * expression used by [[bruteForceTopK]]) and as the oracle's
    * `list_sum(list_transform(...))` — one shared arithmetic contract
    * across the scalar expression, the cogroup kernel, and DuckDB, which
    * is why all three hash-match bit-exactly. */
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

  private lazy val planeMatrix: Array[Array[Array[Double]]] =
    planes.map(_.map(_.toArray).toArray).toArray

  /** (vec_id, table, bucket) — one row per table; per-table bucket is
    * the sign-bit word: bit i = (v · plane_i) >= 0.
    *
    * All NumTables×BitsPerTable plane dots per vector run in ONE
    * primitive flatMap kernel over the plane matrix (the
    * [[graft.operators.Dedup.minhashSignatures]] pattern): the kernel is
    * a tight double loop with zero per-plane allocation and zero
    * shuffle. The earlier declarative form evaluated 48 interpreted
    * higher-order-function dots per row (HOFs don't codegen), which
    * dominated the operator's cost. */
  def lshKeys(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val pm = planeMatrix
    emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .as[(Long, Array[Double])]
      .flatMap { case (id, v) =>
        val out = new Array[(Long, Int, Long)](pm.length)
        var t = 0
        while (t < pm.length) {
          val tp = pm(t)
          var bucket = 0L
          var i = 0
          while (i < tp.length) {
            val p = tp(i)
            var acc = 0.0
            var k = 0
            while (k < p.length) { acc += v(k) * p(k); k += 1 }
            if (acc >= 0.0) bucket |= 1L << i
            i += 1
          }
          out(t) = (id, t, bucket)
          t += 1
        }
        out
      }
      .toDF("vec_id", "table", "bucket")
  }

  /** ANN via bucket equi-join: only same-bucket candidates (union over
    * tables) are scored. Approximate by construction → rows-only check +
    * recall spec. At 100 TB the bucket join replaces the O(n·q) scan and
    * shuffles on the compact (table, bucket) key. */
  def lshTopK(emb: DataFrame, k: Int): DataFrame = {
    DotProduct.ensureRegistered(emb.sparkSession)
    // The query side is keyed from a PRE-filtered scan: a filter above
    // the typed flatMap kernel is opaque to Catalyst (no pushdown), so
    // filtering first keeps the kernel from running over the whole
    // corpus twice — parquet pushdown prunes the query scan instead.
    lshTopKFrom(lshKeys(emb),
      lshKeys(emb.filter(col("vec_id") < NumQueries)),
      withUnit(emb), k)
  }

  /** Entry path: same serve over the SHARED bucket table and unit
    * vectors (the stored index halves) instead of re-running both
    * corpus kernels per invocation; the query side is a narrow filter
    * of the shared bucket table (per-row function, identical rows). */
  private def lshTopKShared(s: org.apache.spark.sql.SparkSession,
      dir: String, k: Int): DataFrame = {
    DotProduct.ensureRegistered(s)
    val keys = sharedLshKeys(s, dir)
    lshTopKFrom(keys, keys.filter(col("vec_id") < NumQueries),
      sharedUnitVecs(s, dir), k)
  }

  private def lshTopKFrom(corpusKeys: DataFrame, queryKeys: DataFrame,
      unit: DataFrame, k: Int): DataFrame = {
    val vecs = unit.select(col("vec_id"), col("u").as("v"))
    // candidate id pairs first (dedup before carrying vectors around)
    val pairs = queryKeys
      .select(col("vec_id").as("query_id"), col("table"), col("bucket"))
      .join(corpusKeys.select(col("vec_id").as("neighbor_id"), col("table"), col("bucket")),
        Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      // a pair may collide in several tables; dedup BEFORE scoring so
      // the same neighbor can't occupy two top-k slots. The shuffle is
      // 16-byte id pairs bounded by the candidate count — far cheaper
      // than carrying duplicate 64-dim vectors into the scoring join.
      .distinct()
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

  /** Like IVF, the hyperplane-LSH pipeline is fully deterministic (the
    * planes are seeded literals), so "approximate" does not mean
    * "unverifiable": the oracle embeds the 48 planes as VALUES rows,
    * recomputes each vector's per-table sign-bit bucket over the RAW
    * embedding (same sequential dot fold → identical signs), joins
    * same-bucket candidates, and re-ranks by the unit-vector cosine —
    * the exact pair of [[lshKeys]]/[[lshTopK]]. */
  /** The seeded hyperplanes as a VALUES list (shared by the LSH and
    * graph-beam oracles). */
  private def planeRowsSql: String =
    planes.zipWithIndex.flatMap { case (tbl, t) =>
      tbl.zipWithIndex.map { case (p, i) =>
        s"($t, ${1L << i}, [${p.mkString(", ")}]::DOUBLE[])"
      }
    }.mkString(",\n    ")

  private def lshOracle: String = {
    val planeRows = planeRowsSql
    val dotPv =
      "list_sum(list_transform(range(1, len(e.v) + 1), i -> p.pv[i] * e.v[i]))"
    s"""with p(tbl, bitval, pv) as (values
       |    $planeRows),
       |e as (select vec_id, embedding::DOUBLE[] as v from embeddings),
       |keys as (
       |  select e.vec_id, p.tbl,
       |    sum(case when $dotPv >= 0 then p.bitval else 0 end) as bucket
       |  from e cross join p group by e.vec_id, p.tbl),
       |cand as (
       |  select distinct q.vec_id as query_id, c.vec_id as neighbor_id
       |  from keys q join keys c on q.tbl = c.tbl and q.bucket = c.bucket
       |  where q.vec_id < $NumQueries and q.vec_id <> c.vec_id),
       |u as ($sqlUnit),
       |pairs as (
       |  select cand.query_id, cand.neighbor_id,
       |    ${sqlDotU("uq", "uc")} as cos
       |  from cand
       |  join u uq on uq.vec_id = cand.query_id
       |  join u uc on uc.vec_id = cand.neighbor_id)
       |select query_id, neighbor_id, rnk, round(cos, 6) as cos_sim
       |from (select *, cast(row_number() over (
       |        partition by query_id order by cos desc, neighbor_id) as bigint) as rnk
       |      from pairs) t
       |where rnk <= $TopK
       |order by query_id, rnk""".stripMargin
  }

  val annLsh: Q = Q.df("ann_lsh_topk", lshOracle) { (s, dir) =>
    lshTopKShared(s, dir, TopK)
      .orderBy(col("query_id"), col("rnk"))
  }

  // ---- IVF (coarse-quantizer inverted lists) — the other scale path ------

  /** IVF-flat with a TRAINED spherical-k-means coarse quantizer: every
    * corpus vector is assigned to its nearest of [[NumCentroids]] unit
    * centroids (one inverted list per centroid); a query probes only its
    * [[NProbe]] nearest lists. Candidates come from a bucket equi-join
    * exactly like the hyperplane-LSH path, but the bucket geometry is
    * Voronoi cells — trained on the corpus, as a real ANN index build
    * trains its quantizer. Training is [[trainCentroids]] (Lloyd
    * iterations from a seeded init); the assignment expression,
    * inverted-list join, and exact re-rank are unchanged. */
  val NumCentroids = 32
  val NProbe = 4

  /** Lloyd iterations for the coarse quantizer. 2-3 captures most of the
    * objective gain on any corpus (k-means converges geometrically and
    * the quantizer only shapes candidate RECALL — the re-rank is exact);
    * a fixed count also keeps index builds schedulable at 100 TB, where
    * each iteration is one corpus pass. */
  val KmeansIters = 2

  /** Deterministic pseudo-random unit centroids (seed 7), dim 64 — the
    * k-means INIT. */
  private[operators] def initCentroids: Array[Array[Double]] = {
    val rnd = new Random(7)
    Array.fill(NumCentroids) {
      val v = Array.fill(Dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
  }

  /** Centroids of the most recent [[ivfTopK]] run. The IVF oracle embeds
    * the TRAINED centroids as literals, and training reads the data, so
    * the oracle text can only be rendered after the query has run —
    * Verify executes every query before reading any oracle (Q.oracle is
    * late-bound), and check compares the dump against the oracle built
    * from the same run's centroids. Falls back to the seeded init when
    * nothing has trained (an oracle rendered for an entry that never ran
    * is never compared). */
  @volatile private var lastTrained: Array[Array[Double]] = null

  /** One trained quantizer per corpus, shared by EVERY vector consumer
    * (IVF search, cluster assignment, semantic dedup, balanced
    * sampling): the first caller pays the Lloyd passes, the rest reuse
    * the model — how a pipeline actually treats an index build. Keyed
    * by fixture dir; training is deterministic per corpus (seeded init,
    * fixed iteration count). */
  private[operators] val trainedCache =
    new graft.plans.Memo[String, Array[Array[Double]]]

  private[graft] def trainedCentroids(emb: DataFrame, dir: String)
      : Array[Array[Double]] =
    trainedCache.once(dir)(trainCentroids(emb))

  /** Per-partition primitive kernel: dot against every centroid, return
    * the indices of the `take` best (descending, index tiebreak). The
    * assignment runs n·C·dim multiplies — the hot path of IVF build —
    * so it stays a tight double loop rather than an interpreted
    * higher-order-function fold. */
  private[graft] def nearestCentroids(u: Array[Double], take: Int,
      cm: Array[Array[Double]]): Array[Int] = {
    val scores = new Array[Double](cm.length)
    var c = 0
    while (c < cm.length) {
      val cv = cm(c)
      var acc = 0.0
      var k = 0
      while (k < cv.length) { acc += u(k) * cv(k); k += 1 }
      scores(c) = acc
      c += 1
    }
    scores.indices.sortBy(i => (-scores(i), i)).take(take).toArray
  }

  /** Spherical k-means training for the coarse quantizer: assign each
    * unit vector to its max-dot centroid, replace each centroid with the
    * NORMALIZED mean of its list (the closed-form maximizer of the
    * within-list dot objective), keep the old centroid for empty lists.
    *
    * Distributed shape: assignment is a primitive map over a broadcast
    * centroid matrix (zero shuffle); the update is one aggregateByKey
    * carrying C partial (sum[dim], count) pairs per partition — shuffle
    * volume C·dim·8 bytes per partition, independent of corpus size.
    * Only the C×dim model ever reaches the driver (the same contract as
    * any trained-model collect; C=32, dim=64 → 16 KB). At 100 TB this is
    * 2-3 linear passes, exactly how FAISS-style IVF builds train on a
    * sample or the full corpus. */
  def trainCentroids(emb: DataFrame, iters: Int = KmeansIters): Array[Array[Double]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val unit = withUnit(emb).as[(Long, Array[Double])]
    var cm = initCentroids
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(cm)
      val partials = unit.rdd
        .map { case (_, u) => (nearestCentroids(u, 1, bc.value)(0), (u, 1L)) }
        .aggregateByKey((new Array[Double](Dim), 0L))(
          { case ((s, n), (u, c)) =>
            var k = 0; while (k < s.length) { s(k) += u(k); k += 1 }; (s, n + c)
          },
          { case ((s1, n1), (s2, n2)) =>
            var k = 0; while (k < s1.length) { s1(k) += s2(k); k += 1 }
            (s1, n1 + n2)
          })
        .collect() // C model rows, not data
      bc.unpersist(blocking = false)
      val next = cm.map(_.clone())
      partials.foreach { case (c, (sums, n)) =>
        val m = new Array[Double](sums.length)
        var nrm = 0.0
        var k = 0
        while (k < sums.length) { m(k) = sums(k) / n; nrm += m(k) * m(k); k += 1 }
        nrm = math.sqrt(nrm)
        if (nrm > 0) {
          var j = 0
          while (j < m.length) { m(j) /= nrm; j += 1 }
          next(c) = m
        }
      }
      cm = next
      it += 1
    }
    cm
  }

  def ivfTopK(emb: DataFrame, k: Int, dir: String): DataFrame = {
    val spark = emb.sparkSession
    DotProduct.ensureRegistered(spark)
    import spark.implicits._
    val cm = trainedCentroids(emb, dir)
    lastTrained = cm
    // corpus: single nearest centroid = inverted-list key — served from
    // the SHARED assignment artifact (one assign pass per session ×
    // corpus, not one per invocation)
    val corpus = sharedIvfAssign(spark, dir)
      .select(col("vec_id").as("neighbor_id"), col("u").as("cv"), col("cid"))
    // queries: NProbe nearest centroids, one candidate join per probe;
    // each corpus vector lives in exactly one list, so a (query,
    // neighbor) pair joins at most once — no distinct needed. The query
    // scan is PRE-filtered (parquet pushdown) — a typed filter above
    // the kernel would deserialize the whole corpus to keep 10 rows.
    val queries = withUnit(emb.filter(col("vec_id") < NumQueries))
      .as[(Long, Array[Double])]
      .flatMap { case (id, u) =>
        nearestCentroids(u, NProbe, cm).map(c => (id, u, c))
      }
      .toDF("query_id", "qv", "cid")
    queries.join(corpus, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosExpr(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** The IVF entry stays oracle-able WITH a trained quantizer: the
    * TRAINED centroid matrix (from [[lastTrained]], late-bound — see its
    * doc) is embedded in the SQL as VALUES literals (Double.toString
    * round-trips exactly, and list_sum folds in the same sequential
    * order as the primitive kernel), the assignment argmax and probe
    * ranking reproduce [[nearestCentroids]]'s (-score, index) tiebreak,
    * and the final top-k mirrors [[ivfTopK]] bit-for-bit. Run-to-run
    * training noise is irrelevant to the compare: the dumped result and
    * the rendered oracle come from the SAME run's centroids. */
  /** `c(cid, v)` VALUES rows for a trained centroid matrix. */
  private def sqlCentroidValues(cm: Array[Array[Double]]): String = {
    val rows = cm.zipWithIndex.map { case (v, i) =>
      s"($i, [${v.mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n    ")
    s"c(cid, v) as (values\n    $rows)"
  }

  /** Coarse-quantizer CTEs shared by the IVF and IVFPQ oracles: every
    * vector ranked against every centroid ((-dot, cid) order, exactly
    * [[nearestCentroids]]'s tiebreak), single-cell assignment, and the
    * query probe set. Requires `c` and `e` in scope. */
  private def sqlAssignProbeCtes: String =
    s"""scored as (
       |  select e.vec_id, e.u, c.cid,
       |    row_number() over (partition by e.vec_id
       |      order by list_sum(list_transform(range(1, len(e.u) + 1),
       |        i -> c.v[i] * e.u[i])) desc, c.cid) as crn
       |  from e cross join c),
       |assign as (select vec_id, u, cid from scored where crn = 1),
       |probes as (select vec_id, u, cid from scored
       |           where vec_id < $NumQueries and crn <= $NProbe)""".stripMargin

  private def ivfOracle: String = {
    val cm = Option(lastTrained).getOrElse(initCentroids)
    s"""with ${sqlCentroidValues(cm)},
       |e as ($sqlUnit),
       |$sqlAssignProbeCtes,
       |pairs as (
       |  select q.vec_id as query_id, a.vec_id as neighbor_id,
       |    ${sqlDotU("q", "a")} as cos
       |  from probes q join assign a on q.cid = a.cid
       |  where q.vec_id <> a.vec_id)
       |select query_id, neighbor_id, rnk, round(cos, 6) as cos_sim
       |from (select *, cast(row_number() over (
       |        partition by query_id order by cos desc, neighbor_id) as bigint) as rnk
       |      from pairs) t
       |where rnk <= $TopK
       |order by query_id, rnk""".stripMargin
  }

  val annIvf: Q = Q.df("ann_ivf_topk", ivfOracle) { (s, dir) =>
    ivfTopK(Tables.df(s, dir, "embeddings"), TopK, dir)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Cosine radius for [[ivfRangeSearch]], calibrated to the fixture
    * corpus: at dim 64 random-ish unit vectors concentrate near
    * orthogonality (the q0.99 of query-corpus cosines is ≈ 0.29 at
    * sf0.01), so 0.25 selects the genuine near-neighbor tail (~10² of
    * ~10⁵ brute-force pairs) at every fixture scale without going
    * empty. */
  val RangeTau = 0.25

  /** RANGE (radius) search through the IVF index — the other primitive
    * every vector API exposes beside top-k (FAISS `range_search`,
    * pgvector `<->` + WHERE): return EVERY corpus vector with
    * cos ≥ τ of the query, however many there are. Same probed
    * inverted-list candidate join as [[ivfTopK]], but the per-query
    * top-k WINDOW disappears entirely — the radius predicate is a plain
    * filter on the scored pairs, so the plan has no per-query state at
    * all and the result streams at whatever size the data dictates
    * (the right shape for "collect every near-duplicate of these
    * seeds": a k cap would truncate dense neighborhoods arbitrarily).
    * Recall caveat is the IVF one, stated honestly: candidates outside
    * the [[NProbe]] probed cells are unseen, and the ORACLE runs the
    * same probed computation (trained-centroid literals), so the gate
    * pins the index semantics, not brute force. */
  def ivfRangeSearch(emb: DataFrame, tau: Double, dir: String): DataFrame = {
    val spark = emb.sparkSession
    DotProduct.ensureRegistered(spark)
    import spark.implicits._
    val cm = trainedCentroids(emb, dir)
    lastTrained = cm
    // shared assignment artifact + pre-filtered query scan (see ivfTopK)
    val corpus = sharedIvfAssign(spark, dir)
      .select(col("vec_id").as("neighbor_id"), col("u").as("cv"), col("cid"))
    val queries = withUnit(emb.filter(col("vec_id") < NumQueries))
      .as[(Long, Array[Double])]
      .flatMap { case (id, u) =>
        nearestCentroids(u, NProbe, cm).map(c => (id, u, c))
      }
      .toDF("query_id", "qv", "cid")
    queries.join(corpus, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosExpr(col("qv"), col("cv")))
      .filter(col("cos") >= tau)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** Same trained-quantizer CTEs as [[ivfOracle]]; the tail swaps the
    * top-k window for the radius predicate. */
  private def ivfRangeOracle: String = {
    val cm = Option(lastTrained).getOrElse(initCentroids)
    s"""with ${sqlCentroidValues(cm)},
       |e as ($sqlUnit),
       |$sqlAssignProbeCtes,
       |pairs as (
       |  select q.vec_id as query_id, a.vec_id as neighbor_id,
       |    ${sqlDotU("q", "a")} as cos
       |  from probes q join assign a on q.cid = a.cid
       |  where q.vec_id <> a.vec_id)
       |select query_id, neighbor_id, round(cos, 6) as cos_sim
       |from pairs where cos >= $RangeTau
       |order by query_id, neighbor_id""".stripMargin
  }

  val annRangeSearch: Q = Q.df("ann_range_search", ivfRangeOracle) { (s, dir) =>
    ivfRangeSearch(Tables.df(s, dir, "embeddings"), RangeTau, dir)
      .orderBy(col("query_id"), col("neighbor_id"))
  }

  // ---- Filtered ANN (metadata predicate at query time) --------------------

  /** The filtered-search predicate: even-label corpus vectors only.
    * Rendered identically in [[sqlFilteredPred]]. */
  private def filteredPred: Column = col("label") % 2 === 0
  private val sqlFilteredPred = "label % 2 = 0"

  /** FILTERED ANN — top-k under a metadata predicate, the query shape
    * every real vector deployment serves ("similar docs, but only
    * lang='en' / not-deleted / in-tenant"). The predicate is applied to
    * the INVERTED LISTS before the candidate join (pre-filtering), not
    * to the ranked output (post-filtering): a post-filter on a
    * selective predicate starves the result below k because the k
    * unfiltered winners may all fail it, while the pre-filtered probe
    * ranks only eligible vectors and keeps k full within the probed
    * cells. The coarse quantizer is the SHARED per-corpus model — one
    * index serves filtered and unfiltered traffic; only the list
    * traversal changes, exactly how FAISS/Vespa-style engines run
    * predicate-filtered scans.
    *
    * Scale shape: the predicate reaches the parquet scan (pushed
    * filter on a metadata column) and everything downstream shrinks by
    * its selectivity; no post-hoc k-starvation retries. */
  def ivfFilteredTopK(emb: DataFrame, k: Int, dir: String): DataFrame = {
    val spark = emb.sparkSession
    DotProduct.ensureRegistered(spark)
    import spark.implicits._
    val cm = trainedCentroids(emb, dir)
    lastTrained = cm
    // the predicate is a NARROW filter over the shared assignment
    // artifact (cell + unit vector are per-row functions, so filtering
    // the artifact ≡ assigning the filtered corpus); one index serves
    // filtered and unfiltered traffic
    val corpus = sharedIvfAssign(spark, dir)
      .filter(filteredPred)
      .select(col("vec_id").as("neighbor_id"), col("u").as("cv"), col("cid"))
    val queries = withUnit(emb.filter(col("vec_id") < NumQueries))
      .as[(Long, Array[Double])]
      .flatMap { case (id, u) =>
        nearestCentroids(u, NProbe, cm).map(c => (id, u, c))
      }
      .toDF("query_id", "qv", "cid")
    queries.join(corpus, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosExpr(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** [[ivfOracle]] with the predicate applied to the corpus side (the
    * assignment CTE joins back to the labels); same late-bound trained
    * centroids. */
  private def ivfFilteredOracle: String = {
    val cm = Option(lastTrained).getOrElse(initCentroids)
    s"""with ${sqlCentroidValues(cm)},
       |e as ($sqlUnit),
       |$sqlAssignProbeCtes,
       |assignf as (
       |  select a.* from assign a
       |  join embeddings em on a.vec_id = em.vec_id
       |  where em.$sqlFilteredPred),
       |pairs as (
       |  select q.vec_id as query_id, a.vec_id as neighbor_id,
       |    ${sqlDotU("q", "a")} as cos
       |  from probes q join assignf a on q.cid = a.cid
       |  where q.vec_id <> a.vec_id)
       |select query_id, neighbor_id, rnk, round(cos, 6) as cos_sim
       |from (select *, cast(row_number() over (
       |        partition by query_id order by cos desc, neighbor_id) as bigint) as rnk
       |      from pairs) t
       |where rnk <= $TopK
       |order by query_id, rnk""".stripMargin
  }

  val annFiltered: Q = Q.df("ann_filtered_topk", ivfFilteredOracle) {
    (s, dir) =>
      ivfFilteredTopK(Tables.df(s, dir, "embeddings"), TopK, dir)
        .orderBy(col("query_id"), col("rnk"))
  }

  // ---- Product quantization (ADC scoring) --------------------------------

  /** PQ geometry: M subspaces × Ks codewords over the unit vectors.
    * 64 dims → 8 one-byte codes per vector: 32× memory compression of
    * the corpus representation, the compression every billion-vector
    * ANN deployment runs (Jégou et al., PAMI 2011). */
  val PqM = 8
  val PqSubDim: Int = Dim / PqM
  val PqKs = 16
  val PqIters = 2

  /** Seeded deterministic codebook init (scale ≈ the per-dim magnitude
    * of a 64-dim unit vector). */
  private[operators] def initCodebooks: Array[Array[Array[Double]]] = {
    val rnd = new Random(13)
    Array.fill(PqM, PqKs)(Array.fill(PqSubDim)(rnd.nextGaussian() * 0.125))
  }

  /** L2-nearest codeword: ascending-k scan, strict less — lowest index
    * wins ties, the same order as the oracle's (dist asc, k asc)
    * row_number; the distance folds dims ascending like list_sum. */
  private[graft] def nearestCode(sub: Array[Double],
      codes: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var k = 0
    while (k < codes.length) {
      val c = codes(k)
      var d = 0.0
      var i = 0
      while (i < c.length) { val t = sub(i) - c(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = k }
      k += 1
    }
    best
  }

  private def subOf(u: Array[Double], m: Int): Array[Double] =
    java.util.Arrays.copyOfRange(u, m * PqSubDim, (m + 1) * PqSubDim)

  /** Plain-L2 Lloyd per subspace, all M subspaces in one distributed
    * pass per iteration: assignment is a primitive flatMap over the
    * broadcast codebooks (zero shuffle), the update one aggregateByKey
    * carrying M·Ks partial (sum[subDim], count) pairs per partition —
    * model-sized shuffle, model-only collect (M·Ks·subDim = 1024
    * doubles), exactly the [[trainCentroids]] contract. */
  def trainCodebooks(emb: DataFrame,
      iters: Int = PqIters): Array[Array[Array[Double]]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val unit = withUnit(emb).as[(Long, Array[Double])]
    var cb = initCodebooks
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(cb)
      val partials = unit.rdd
        .flatMap { case (_, u) =>
          (0 until PqM).iterator.map { m =>
            val sub = subOf(u, m)
            ((m, nearestCode(sub, bc.value(m))), (sub, 1L))
          }
        }
        .aggregateByKey((new Array[Double](PqSubDim), 0L))(
          { case ((s, n), (u, c)) =>
            var k = 0; while (k < s.length) { s(k) += u(k); k += 1 }; (s, n + c)
          },
          { case ((s1, n1), (s2, n2)) =>
            var k = 0; while (k < s1.length) { s1(k) += s2(k); k += 1 }
            (s1, n1 + n2)
          })
        .collect() // M·Ks model rows, not data
      bc.unpersist(blocking = false)
      val next = cb.map(_.map(_.clone()))
      partials.foreach { case ((m, k), (sums, n)) =>
        if (n > 0) next(m)(k) = sums.map(_ / n)
      }
      cb = next
      it += 1
    }
    cb
  }

  @volatile private var lastPq: Array[Array[Array[Double]]] = null

  private val pqCache =
    new graft.plans.Memo[String, Array[Array[Array[Double]]]]

  private[graft] def trainedCodebooks(emb: DataFrame, dir: String)
      : Array[Array[Array[Double]]] =
    pqCache.once(dir)(trainCodebooks(emb))

  // ---- shared ENCODED serving artifacts (one per session × corpus) --------
  //
  // The trained-artifact discipline (centroids, codebooks, neighbor
  // graph, unit vectors) extended to the ENCODED CORPUS itself: a
  // serving deployment encodes its corpus when the index is BUILT, not
  // once per query batch, so each cache below holds the one-pass encode
  // every quantized serve previously re-ran per invocation (guide §2.4:
  // remove redundant passes — at 100 TB these are the stored code
  // tables a serving fleet mounts read-only). All are deterministic
  // derivations of the fixture + the shared trained models,
  // materialized once per (session, dir) and released on the bench's
  // family-boundary drain. The BUILD cost is benched explicitly by
  // [[annIndexBuild]], which re-trains, re-encodes and re-writes the
  // full artifact on EVERY invocation with no memo anywhere on its
  // path — the encode is charged to a build cell, not hidden in
  // warm-ups. Bit-equality of each artifact to the per-invocation
  // derivation it replaces is pinned by [[graft.EncodedArtifactSpec]].

  private val ivfAssignCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), DataFrame](
      graft.plans.Checkpoints.free)

  /** (vec_id, label, cid, u): the corpus's IVF inverted-list assignment
    * against the shared trained quantizer, with the metadata label
    * carried so FILTERED serving is a narrow filter over the artifact
    * (the cell and the unit vector of a row are per-row functions, so
    * filtering the artifact ≡ assigning the filtered corpus). */
  private[graft] def sharedIvfAssign(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    ivfAssignCache.once((s, dir)) {
      val emb = Tables.df(s, dir, "embeddings")
      val cm = trainedCentroids(emb, dir)
      import s.implicits._
      graft.plans.Checkpoints.materialize(
        emb.select(col("vec_id"), col("label").cast("long").as("label"),
            asDouble(col("embedding")).as("v"))
          .withColumn("nrm", norm(col("v")))
          .select(col("vec_id"), col("label"),
            transform(col("v"), _ / col("nrm")).as("u"))
          .as[(Long, Long, Array[Double])]
          .map { case (id, lab, u) =>
            (id, lab, nearestCentroids(u, 1, cm)(0), u)
          }
          .toDF("vec_id", "label", "cid", "u"))
    }

  private val pqCodesCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), DataFrame](
      graft.plans.Checkpoints.free)

  /** (neighbor_id, cid, m, code): the PQ-encoded corpus with its coarse
    * cell — one flatMap pass against both trained models. [[pqTopK]]
    * projects the cell away (rows are 1:1 with the cell-less encode);
    * [[ivfPqTopK]] keys its probe join on it. */
  private[graft] def sharedPqCodes(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    pqCodesCache.once((s, dir)) {
      val emb = Tables.df(s, dir, "embeddings")
      val cm = trainedCentroids(emb, dir)
      val cb = trainedCodebooks(emb, dir)
      import s.implicits._
      graft.plans.Checkpoints.materialize(
        withUnit(emb).as[(Long, Array[Double])]
          .flatMap { case (id, u) =>
            val cid = nearestCentroids(u, 1, cm)(0)
            (0 until PqM).iterator
              .map(m => (id, cid, m, nearestCode(subOf(u, m), cb(m))))
          }
          .toDF("neighbor_id", "cid", "m", "code"))
    }

  private val sqCodesCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), DataFrame](
      graft.plans.Checkpoints.free)

  /** (neighbor_id, cid, qv, scale): the SQ8-encoded corpus with its
    * coarse cell ([[ivfSqEncode]]'s output). Flat SQ8 ignores the cell;
    * IVF-SQ8 probes on it. */
  private[graft] def sharedSqCodes(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    sqCodesCache.once((s, dir)) {
      val emb = Tables.df(s, dir, "embeddings")
      graft.plans.Checkpoints.materialize(
        ivfSqEncode(emb, trainedCentroids(emb, dir)))
    }

  private val binCodesCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), DataFrame](
      graft.plans.Checkpoints.free)

  /** (vec_id, h1, h2): the sign-bit code table ([[binaryCodes]]). */
  private[graft] def sharedBinaryCodes(
      s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    binCodesCache.once((s, dir))(graft.plans.Checkpoints.materialize(
      binaryCodes(Tables.df(s, dir, "embeddings"))))

  private val lshKeysCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), DataFrame](
      graft.plans.Checkpoints.free)

  /** (vec_id, table, bucket): the hyperplane-LSH bucket table
    * ([[lshKeys]] over the full corpus; the query side is a narrow
    * filter of it — the bucket of a row is a per-row function). */
  private[graft] def sharedLshKeys(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    lshKeysCache.once((s, dir))(graft.plans.Checkpoints.materialize(
      lshKeys(Tables.df(s, dir, "embeddings"))))

  /** ADC (asymmetric distance computation) top-k: the corpus exists
    * only as M small code columns; each query scores a neighbor as
    * Σ_m dot(query_m, codeword_{m,code}) — M table lookups instead of a
    * 64-dim dot against raw data it no longer stores. The per-subspace
    * partial dots flow through the SORTED-list fold so the total is
    * order-independent and bit-equal to the oracle (a production kernel
    * would precompute the M×Ks lookup table per query and sum in m
    * order; the sorted fold here costs the same adds and keeps the
    * cross-engine determinism contract). Codebook and query relations
    * are model-sized broadcasts — the corpus side only ever carries
    * (id, m, code). */
  /** Shared ADC tail: per-(query, neighbor) sorted-fold of the M
    * per-subspace dots, then the per-query top-k — the scoring
    * semantics BOTH PQ entries must share bit-for-bit (the composed
    * IVFPQ differs only in candidate generation). Input columns:
    * query_id, neighbor_id, qv (query subvector), cv (codeword). */
  private def adcTopK(pairs: DataFrame, k: Int): DataFrame =
    pairs
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("d", cosExpr(col("qv"), col("cv")))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(aggregate(sort_array(collect_list(col("d"))), lit(0.0d),
        (a, x) => a + x).as("score"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        round(col("score"), 6).as("adc_score"))

  def pqTopK(emb: DataFrame, k: Int, dir: String): DataFrame = {
    val spark = emb.sparkSession
    DotProduct.ensureRegistered(spark)
    import spark.implicits._
    val cb = trainedCodebooks(emb, dir)
    lastPq = cb
    // code table from the SHARED encode (cell projected away — rows are
    // 1:1 with the cell-less encode); query subvectors from a
    // PRE-filtered scan (parquet pushdown, not a typed corpus filter)
    val codes = sharedPqCodes(spark, dir)
      .select(col("neighbor_id"), col("m"), col("code"))
    val cbDf = (for { m <- 0 until PqM; c <- 0 until PqKs }
      yield (m, c, cb(m)(c))).toDF("m", "code", "cv")
    val queries = withUnit(emb.filter(col("vec_id") < NumQueries))
      .as[(Long, Array[Double])]
      .flatMap { case (id, u) =>
        (0 until PqM).iterator.map(m => (id, m, subOf(u, m)))
      }
      .toDF("query_id", "m", "qv")
    adcTopK(codes.join(broadcast(cbDf), Seq("m", "code"))
      .join(broadcast(queries), Seq("m")), k)
  }

  /** `cb(m, k, v)` VALUES rows for trained codebooks. */
  private def sqlCodebookValues(cb: Array[Array[Array[Double]]]): String = {
    val rows = (for { m <- 0 until PqM; k <- 0 until PqKs } yield
      s"($m, $k, [${cb(m)(k).mkString(", ")}]::DOUBLE[])").mkString(",\n    ")
    s"cb(m, k, v) as (values\n    $rows)"
  }

  /** PQ encoding CTEs shared by the PQ and IVFPQ oracles: per-vector
    * subvectors and the L2-nearest codeword per (vector, subspace) —
    * (dist asc, k asc), exactly [[nearestCode]]'s order. Requires `cb`
    * and `e` in scope. */
  private def sqlPqEncodeCtes: String =
    s"""sub as (
       |  select vec_id, ms.m,
       |    list_transform(range(1, $PqSubDim + 1),
       |      i -> u[ms.m * $PqSubDim + i]) as s
       |  from e cross join (select unnest(range($PqM)) as m) ms),
       |codes as (
       |  select vec_id, m, k as code from (
       |    select sub.vec_id, sub.m, cb.k,
       |      row_number() over (partition by sub.vec_id, sub.m
       |        order by list_sum(list_transform(range(1, $PqSubDim + 1),
       |          i -> (sub.s[i] - cb.v[i]) * (sub.s[i] - cb.v[i]))) asc,
       |          cb.k asc) as rn
       |    from sub join cb on sub.m = cb.m) t
       |  where rn = 1)""".stripMargin

  /** Sorted-fold ADC scores + top-k tail shared by both PQ oracles.
    * Requires `dots(query_id, neighbor_id, d)` in scope. */
  private def sqlAdcTail: String =
    s"""scores as (
       |  select query_id, neighbor_id,
       |    list_reduce(list_sort(list(d)), (a, b) -> a + b) as score
       |  from dots group by query_id, neighbor_id)
       |select query_id, neighbor_id, rnk, round(score, 6) as adc_score
       |from (select *, cast(row_number() over (partition by query_id
       |        order by score desc, neighbor_id) as bigint) as rnk
       |      from scores) t
       |where rnk <= $TopK
       |order by query_id, rnk""".stripMargin

  /** Late-bound like [[ivfOracle]]: the TRAINED codebooks embed as
    * VALUES literals, encoding reproduces [[nearestCode]]'s (dist asc,
    * k asc) order, and the score folds the per-subspace dots over a
    * sorted list on both sides. */
  private def pqOracle: String = {
    val cb = Option(lastPq).getOrElse(initCodebooks)
    s"""with ${sqlCodebookValues(cb)},
       |e as ($sqlUnit),
       |$sqlPqEncodeCtes,
       |dots as (
       |  select qs.vec_id as query_id, c.vec_id as neighbor_id,
       |    list_sum(list_transform(range(1, $PqSubDim + 1),
       |      i -> qs.s[i] * cb.v[i])) as d
       |  from codes c
       |  join cb on cb.m = c.m and cb.k = c.code
       |  join sub qs on qs.m = c.m
       |  where qs.vec_id < $NumQueries and qs.vec_id <> c.vec_id),
       |$sqlAdcTail""".stripMargin
  }

  val annPq: Q = Q.df("ann_pq_adc_topk", pqOracle) { (s, dir) =>
    pqTopK(Tables.df(s, dir, "embeddings"), TopK, dir)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Refine depth: the ADC shortlist re-ranked exactly is
    * [[RerankFactor]]·k deep per query. */
  val RerankFactor = 4

  /** Two-stage PQ search with exact re-ranking — the "refine" stage
    * (IVFADC+R, Jégou et al. §VI) every production PQ deployment runs:
    * stage 1 scores the whole corpus through 32×-compressed codes and
    * keeps only [[RerankFactor]]·k candidates per query; stage 2
    * fetches JUST those candidates' raw vectors and re-scores with the
    * exact cosine, repairing the quantization error ADC introduces near
    * the decision boundary. The raw-vector fetch is the scarce resource
    * at 100 TB: this plan touches raw vectors for queries×(R·k) rows
    * only — the shortlist (query-count-bounded, never corpus-sized)
    * BROADCASTS to the corpus scan, so the refine is one broadcast hash
    * join + a per-query top-k window, never a corpus shuffle. */
  def pqRerankTopK(emb: DataFrame, k: Int, dir: String): DataFrame = {
    DotProduct.ensureRegistered(emb.sparkSession)
    val shortlist = pqTopK(emb, k * RerankFactor, dir)
      .select(col("query_id"), col("neighbor_id"))
    // refine fetches raw unit vectors from the SHARED normalized corpus
    val unit = sharedUnitVecs(emb.sparkSession, dir)
    val queries = unit.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("u").as("qv"))
    unit.select(col("vec_id").as("neighbor_id"), col("u").as("cv"))
      .join(broadcast(shortlist), Seq("neighbor_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("cos", cosExpr(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** Late-bound like [[pqOracle]] (same trained-codebook literals and
    * encode/ADC CTEs), then the exact-cosine refine over the
    * [[RerankFactor]]·k shortlist — the same two stages the Spark plan
    * runs, in the same tie order (ADC: score desc, id; refine: cos
    * desc, id). */
  private def pqRerankOracle: String = {
    val cb = Option(lastPq).getOrElse(initCodebooks)
    s"""with ${sqlCodebookValues(cb)},
       |e as ($sqlUnit),
       |$sqlPqEncodeCtes,
       |dots as (
       |  select qs.vec_id as query_id, c.vec_id as neighbor_id,
       |    list_sum(list_transform(range(1, $PqSubDim + 1),
       |      i -> qs.s[i] * cb.v[i])) as d
       |  from codes c
       |  join cb on cb.m = c.m and cb.k = c.code
       |  join sub qs on qs.m = c.m
       |  where qs.vec_id < $NumQueries and qs.vec_id <> c.vec_id),
       |scores as (
       |  select query_id, neighbor_id,
       |    list_reduce(list_sort(list(d)), (a, b) -> a + b) as score
       |  from dots group by query_id, neighbor_id),
       |short as (
       |  select query_id, neighbor_id
       |  from (select *, row_number() over (partition by query_id
       |          order by score desc, neighbor_id) as rn from scores) t
       |  where rn <= ${TopK * RerankFactor}),
       |exact as (
       |  select s.query_id, s.neighbor_id, ${sqlDotU("q", "c")} as cos
       |  from short s
       |  join e q on q.vec_id = s.query_id
       |  join e c on c.vec_id = s.neighbor_id)
       |select query_id, neighbor_id, rnk, round(cos, 6) as cos_sim
       |from (select *, cast(row_number() over (partition by query_id
       |        order by cos desc, neighbor_id) as bigint) as rnk
       |      from exact) t
       |where rnk <= $TopK
       |order by query_id, rnk""".stripMargin
  }

  val annPqRerank: Q = Q.df("ann_pq_rerank", pqRerankOracle) { (s, dir) =>
    pqRerankTopK(Tables.df(s, dir, "embeddings"), TopK, dir)
      .orderBy(col("query_id"), col("rnk"))
  }

  // ---- IVF + PQ composed (the billion-vector index shape) ----------------

  /** IVFPQ — the composition every billion-vector deployment actually
    * runs (FAISS's IVFx,PQy; Jégou et al. §V): the coarse quantizer
    * restricts candidates to [[NProbe]] probed Voronoi cells AND the
    * corpus exists only as per-cell PQ codes, so a query touches
    * (NProbe/C) of the lists and scores each candidate with M table
    * lookups instead of a raw-vector dot. Both models come from the
    * shared per-corpus trained caches (one Lloyd run each, reused
    * across entries like a real index build). Candidate generation is
    * the IVF bucket equi-join; scoring is the ADC sorted-fold — the
    * corpus side only ever carries (id, cell, m, code), 32×-compressed.
    * The oracle composes the two late-bound oracles' machinery with the
    * cell-membership join added to the ADC dots. */
  def ivfPqTopK(emb: DataFrame, k: Int, dir: String): DataFrame = {
    val spark = emb.sparkSession
    DotProduct.ensureRegistered(spark)
    import spark.implicits._
    val cm = trainedCentroids(emb, dir)
    val cb = trainedCodebooks(emb, dir)
    lastTrained = cm
    lastPq = cb
    // corpus representation: cell id + M one-byte codes per vector —
    // the SHARED encode; queries from a PRE-filtered scan
    val codes = sharedPqCodes(spark, dir)
    val cbDf = (for { m <- 0 until PqM; c <- 0 until PqKs }
      yield (m, c, cb(m)(c))).toDF("m", "code", "cv")
    // queries carry their probed cells crossed with their subvectors
    val queries = withUnit(emb.filter(col("vec_id") < NumQueries))
      .as[(Long, Array[Double])]
      .flatMap { case (id, u) =>
        for {
          c <- nearestCentroids(u, NProbe, cm).iterator
          m <- (0 until PqM).iterator
        } yield (id, c, m, subOf(u, m))
      }
      .toDF("query_id", "cid", "m", "qv")
    adcTopK(codes.join(broadcast(cbDf), Seq("m", "code"))
      .join(broadcast(queries), Seq("cid", "m")), k)
  }

  /** Late-bound composition of [[ivfOracle]]'s assignment/probe CTEs
    * and [[pqOracle]]'s encode/ADC CTEs — all four fragments SHARED
    * with those oracles textually, so a tie-break or fold fix lands in
    * every entry at once — with cell membership joined into the
    * dots. */
  private def ivfPqOracle: String =
    ivfPqOracleFor(Option(lastTrained).getOrElse(initCentroids),
      Option(lastPq).getOrElse(initCodebooks))

  /** [[ivfPqOracle]] rendered against an EXPLICIT model pair — the
    * persisted-index entries embed their own (stored / base-trained)
    * models instead of the session's full-corpus ones. */
  private def ivfPqOracleFor(cm: Array[Array[Double]],
      cb: Array[Array[Array[Double]]],
      candidateWhere: String = ""): String = {
    s"""with ${sqlCentroidValues(cm)},
       |${sqlCodebookValues(cb)},
       |e as ($sqlUnit),
       |$sqlAssignProbeCtes,
       |$sqlPqEncodeCtes,
       |dots as (
       |  select p.vec_id as query_id, cv.vec_id as neighbor_id,
       |    list_sum(list_transform(range(1, $PqSubDim + 1),
       |      i -> qs.s[i] * cb.v[i])) as d
       |  from codes cv
       |  join assign a on a.vec_id = cv.vec_id
       |  join probes p on p.cid = a.cid
       |  join cb on cb.m = cv.m and cb.k = cv.code
       |  join sub qs on qs.m = cv.m and qs.vec_id = p.vec_id
       |  where p.vec_id <> cv.vec_id$candidateWhere),
       |$sqlAdcTail""".stripMargin
  }

  val annIvfPq: Q = Q.df("ann_ivfpq_topk", ivfPqOracle) { (s, dir) =>
    ivfPqTopK(Tables.df(s, dir, "embeddings"), TopK, dir)
      .orderBy(col("query_id"), col("rnk"))
  }

  // ---- Persisted index: store, serve, incremental add --------------------

  /** Corpus slice treated as the "incoming batch" by the incremental
    * entry: vec_id ≡ this (mod 10) — a deterministic ~10% independent
    * of corpus scale, the ANN analogue of
    * [[Dedup.IncrementalBatchSource]]'s source-keyed batch. */
  val AnnBatchMod = 9

  /** Models embedded by the incremental entry's late-bound oracle: the
    * BASE-trained pair read back from the stored index (same contract
    * as [[lastTrained]] — dump and oracle come from one run). */
  @volatile private var lastBaseCm: Array[Array[Double]] = null
  @volatile private var lastBaseCb: Array[Array[Array[Double]]] = null

  /** Write a complete servable index — coarse centroids, PQ codebooks,
    * and the encoded corpus — as three parquet tables under `root`.
    * This is the artifact a real deployment ships: the corpus-sized
    * piece is `codes` at (id, cell, M one-byte codes) ≈ 32×-compressed;
    * the two model tables are KB-sized. Encoding is the same primitive
    * flatMap as [[ivfPqTopK]] — one pass, zero shuffle. The code table
    * is laid out CELL-PARTITIONED (`partitionBy("cid")` — one
    * directory per inverted list, the [[graft.operators.LexIndex]]
    * bucket discipline and the reference's PSMA intent,
    * doradb-storage/src/col/sma.rs:9-44): a serve that probes NProbe
    * cells per query then reads only the probed cells' FILES, not the
    * whole corpus — at 100 TB the index I/O per query batch is
    * ~NProbe/C of the index bytes instead of all of them. */
  private def writeIndex(emb: DataFrame, cm: Array[Array[Double]],
      cb: Array[Array[Array[Double]]], root: String): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    cm.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
      .toDF("cid", "cv").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/centroids")
    (for { m <- 0 until PqM; c <- 0 until PqKs } yield (m, c, cb(m)(c)))
      .toDF("m", "code", "cv").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/codebooks")
    withUnit(emb).as[(Long, Array[Double])]
      .flatMap { case (id, u) =>
        val cid = nearestCentroids(u, 1, cm)(0)
        (0 until PqM).iterator
          .map(m => (id, cid, m, nearestCode(subOf(u, m), cb(m))))
      }
      .toDF("neighbor_id", "cid", "m", "code")
      .write.mode("overwrite").partitionBy("cid").parquet(s"$root/codes")
  }

  /** The standard query batch's unit vectors, collected ONCE — a
    * model-sized collect ([[NumQueries]] rows × 64 doubles; doubles
    * survive a JVM collect exactly). From it every stored serve
    * derives (a) the probed-cell set as a PARTITION predicate on the
    * cell-partitioned code table (≤ [[NumQueries]]·[[NProbe]] values,
    * spec-counted in [[graft.AnnIndexLayoutSpec]] — the
    * `TextIndexSpec` bucket-pruning discipline) and (b) the probed
    * query rows as a LOCAL relation, so the serve job scans no
    * embeddings at all — the planner sees literal cells to prune to,
    * and the broadcast side costs nothing to compute. */
  private def collectedQueryBatch(emb: DataFrame): Seq[(Long, Array[Double])] = {
    val spark = emb.sparkSession
    import spark.implicits._
    // filter BEFORE normalizing: the predicate reaches the parquet scan
    // (a typed filter above the Dataset would deserialize and normalize
    // the whole corpus to keep NumQueries rows); per-row normalization
    // commutes with the id filter bit-exactly
    withUnit(emb.filter(col("vec_id") < NumQueries))
      .as[(Long, Array[Double])].collect().toSeq.sortBy(_._1)
  }

  /** Read a stored model pair back. Doubles round-trip parquet exactly,
    * so the served results are bit-equal to the training run's; sorts
    * pin the collect order. Model-sized collects only (C×dim + M·Ks
    * codewords ≈ KBs). */
  private def readModels(spark: org.apache.spark.sql.SparkSession,
      root: String)
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    import spark.implicits._
    val cm = spark.read.parquet(s"$root/centroids")
      .select(col("cid"), col("cv")).as[(Int, Array[Double])]
      .collect().sortBy(_._1).map(_._2)
    val flat = spark.read.parquet(s"$root/codebooks")
      .select(col("m"), col("code"), col("cv"))
      .as[(Int, Int, Array[Double])].collect()
    val cb = Array.ofDim[Array[Double]](PqM, PqKs)
    flat.foreach { case (m, c, v) => cb(m)(c) = v }
    (cm, cb)
  }

  /** Serve IVFPQ queries from a STORED index at `root`: models are
    * read back from the model tables (not taken from memory) and the
    * candidate side is the stored `codes` parquet — the fresh-process
    * read path. Queries (raw vectors — ADC is asymmetric) carry probed
    * cells × subvectors against the read-back centroids; scoring is
    * the shared [[adcTopK]] tail. */
  private[graft] def serveFromIndex(s: org.apache.spark.sql.SparkSession,
      dir: String, root: String,
      k: Int,
      tombstones: Option[org.apache.spark.sql.Column] = None): (DataFrame,
        (Array[Array[Double]], Array[Array[Array[Double]]])) = {
    DotProduct.ensureRegistered(s)
    import s.implicits._
    val (cm, cb) = readModels(s, root)
    val cbDf = s.read.parquet(s"$root/codebooks")
    val batch = collectedQueryBatch(Tables.df(s, dir, "embeddings"))
    val probed = batch
      .flatMap { case (_, u) => nearestCentroids(u, NProbe, cm) }
      .distinct.sorted
    val queries = batch.flatMap { case (id, u) =>
      for {
        c <- nearestCentroids(u, NProbe, cm)
        m <- 0 until PqM
      } yield (id, c, m, subOf(u, m))
    }.toDF("query_id", "cid", "m", "qv")
    // deletes are served as TOMBSTONES: the stored code rows of deleted
    // vectors are excluded BEFORE list probing (pre-filter — the
    // ann_filtered_topk lesson: post-filtering the ranked list starves
    // k), so the index files never rewrite on delete and a compaction
    // job can drop tombstoned codes lazily — the standard
    // vector-store delete path. The probed-cell predicate lands on the
    // PARTITION column of the cell-partitioned code table, so the scan
    // reads only the probed cells' directories.
    val codes = tombstones.foldLeft(s.read.parquet(s"$root/codes")
        .filter(col("cid").isInCollection(probed)))(
      (c, dead) => c.filter(!dead))
    (adcTopK(codes.join(broadcast(cbDf), Seq("m", "code"))
      .join(broadcast(queries), Seq("cid", "m")), k), (cm, cb))
  }

  /** One stored FULL-corpus index per (session, fixture dir) — built
    * from the shared trained caches (no extra Lloyd runs) and written
    * once; and one BASE index (corpus minus the incoming batch, models
    * trained on the base ONLY — the frozen-codebook regime incremental
    * ingestion actually runs). Both under fresh temp roots; the Memo
    * guarantees at-most-once builds under concurrent first touch.
    * Path-valued memos carry a release that deletes the index root:
    * without it every family-boundary [[graft.plans.Memo.drainAll]]
    * would orphan a corpus-sized codes directory on disk for the
    * process lifetime (the next family's warm-up rebuilds under a
    * fresh root). */
  private val fullIndexCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), String](
      graft.plans.Scratch.deleteTree)
  private val baseIndexCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), String](
      graft.plans.Scratch.deleteTree)

  private def tempIndexRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-ann-$tag").toString

  private[graft] def fullIndexRoot(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    fullIndexCache.once((s, dir)) {
      val emb = Tables.df(s, dir, "embeddings")
      val root = tempIndexRoot("full")
      writeIndex(emb, trainedCentroids(emb, dir), trainedCodebooks(emb, dir),
        root)
      root
    }

  private[graft] def baseIndexRoot(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    baseIndexCache.once((s, dir)) {
      val base = Tables.df(s, dir, "embeddings")
        .filter(col("vec_id") % 10 =!= AnnBatchMod)
      val root = tempIndexRoot("base")
      writeIndex(base, trainCentroids(base), trainCodebooks(base), root)
      root
    }

  /** Scratch root the build-accounting cell overwrites per invocation
    * (memoized per (session, dir) only so the family drain can delete
    * the directory — the build WORK itself is never memoized). */
  private val buildScratchCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), String](
      graft.plans.Scratch.deleteTree)

  /** The INDEX BUILD itself as a benched, oracle-checked cell — the
    * accounting counterpart of the shared encoded artifacts
    * ([[sharedIvfAssign]]/[[sharedPqCodes]]/[[sharedSqCodes]] et al.):
    * every invocation RE-TRAINS both quantizers, RE-ENCODES the full
    * corpus and RE-WRITES the servable artifact, with no memo anywhere
    * on the path, so the bench charges the build cost to this cell
    * instead of hiding it in untimed warm-ups. Output is the written
    * index's per-cell manifest (rows + an order-independent integer
    * checksum of the codes), which the late-bound oracle recomputes by
    * replaying assignment + encode against the same trained models. */
  val annIndexBuild: Q = Q.df("ann_index_build", indexBuildOracle) {
    (s, dir) =>
      val emb = Tables.df(s, dir, "embeddings")
      val cm = trainCentroids(emb)   // fresh Lloyd passes, not the memo
      val cb = trainCodebooks(emb)   // fresh per-subspace Lloyd passes
      lastTrained = cm
      lastPq = cb
      val root = buildScratchCache.once((s, dir))(tempIndexRoot("build"))
      writeIndex(emb, cm, cb, root)
      s.read.parquet(s"$root/codes")
        .groupBy(col("cid"))
        .agg(count(lit(1)).cast("long").as("code_rows"),
          sum(col("code") * (col("m") + lit(1))).cast("long").as("code_sum"))
        .select(col("cid").cast("long").as("cid"), col("code_rows"),
          col("code_sum"))
        .orderBy(col("cid"))
  }

  /** Late-bound manifest oracle for [[annIndexBuild]]: assignment +
    * PQ encode replayed against the run's trained models, aggregated
    * per cell. */
  private def indexBuildOracle: String = {
    val cm = Option(lastTrained).getOrElse(initCentroids)
    val cb = Option(lastPq).getOrElse(initCodebooks)
    s"""with ${sqlCentroidValues(cm)},
       |${sqlCodebookValues(cb)},
       |e as ($sqlUnit),
       |$sqlAssignProbeCtes,
       |$sqlPqEncodeCtes
       |select cast(a.cid as bigint) as cid,
       |  cast(count(*) as bigint) as code_rows,
       |  cast(sum(c.code * (c.m + 1)) as bigint) as code_sum
       |from codes c join assign a on a.vec_id = c.vec_id
       |group by a.cid
       |order by cid""".stripMargin
  }

  /** Persisted-index serving: train once, WRITE the index (centroids +
    * codebooks + encoded corpus), then answer the standard query set
    * entirely from the stored artifact — the deployment shape the
    * in-session [[annIvfPq]] memoization stands in for. Results are
    * bit-equal to [[annIvfPq]] (parquet round-trips both models and
    * codes exactly), so the same late-bound oracle verifies the
    * store+serve round trip end to end. */
  val annIndexPersist: Q = Q.df("ann_index_persist", ivfPqOracle) { (s, dir) =>
    val root = fullIndexRoot(s, dir)
    val (res, (cm, cb)) = serveFromIndex(s, dir, root, TopK)
    lastTrained = cm
    lastPq = cb
    res.orderBy(col("query_id"), col("rnk"))
  }

  /** Tombstone modulus for [[annIndexDelete]] (vec_id % 7 == 3 deleted). */
  val AnnDeleteMod = 3

  /** DELETE from the persisted index without rewriting it: serve the
    * standard query set with a tombstone set excluded from the stored
    * code rows before list probing. k stays full (survivors re-rank
    * up), the index artifact is untouched on disk, and the oracle is
    * the same late-bound IVFPQ oracle with the tombstone predicate on
    * the candidate side — deletion semantics hash-verified, not
    * asserted. Completes the index lifecycle: build → persist →
    * incremental add → delete. */
  val annIndexDelete: Q = Q.df(
    "ann_index_delete",
    ivfPqOracleFor(
      Option(lastTrained).getOrElse(initCentroids),
      Option(lastPq).getOrElse(initCodebooks),
      s" and cv.vec_id % 7 <> $AnnDeleteMod")) { (s, dir) =>
    val root = fullIndexRoot(s, dir)
    val (res, (cm, cb)) = serveFromIndex(s, dir, root, TopK,
      tombstones = Some(col("neighbor_id") % 7 === AnnDeleteMod))
    lastTrained = cm
    lastPq = cb
    res.orderBy(col("query_id"), col("rnk"))
  }

  /** Compacted index root: the stored code lists rewritten WITHOUT the
    * tombstoned rows — the OPTIMIZE job [[annIndexDelete]]'s lazy
    * tombstones defer to. Models are copied by parquet round trip
    * (exact for doubles), so the compacted index serves bit-equal to
    * tombstone-filtered serving on the original — which is exactly
    * what the entry's oracle and [[IndexCompactSpec]] prove. At 100 TB
    * this is the same economics as [[Dml.dmlCompactRewrite]]: deletes
    * stay O(1) at write time, and a background rewrite reclaims the
    * dead rows (and the per-probe scan cost) when their fraction
    * justifies one pass over the code table. */
  private val compactIndexCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), String](
      graft.plans.Scratch.deleteTree)

  private[graft] def compactIndexRoot(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    compactIndexCache.once((s, dir)) {
      val full = fullIndexRoot(s, dir)
      val root = tempIndexRoot("compact")
      Seq("centroids", "codebooks").foreach(t =>
        s.read.parquet(s"$full/$t").coalesce(1)
          .write.mode("overwrite").parquet(s"$root/$t"))
      s.read.parquet(s"$full/codes")
        .filter(col("neighbor_id") % 7 =!= AnnDeleteMod)
        .write.mode("overwrite").partitionBy("cid").parquet(s"$root/codes")
      root
    }

  /** Serve the standard query set from the COMPACTED index with no
    * tombstone predicate anywhere — deletion is now physical. The
    * oracle is [[annIndexDelete]]'s (tombstone-filtered candidates),
    * so compaction-then-serve ≡ tombstone-filtered-serve is
    * hash-verified end to end, and the spec adds the row-count shrink
    * the values can't show. */
  val annIndexCompact: Q = Q.df(
    "ann_index_compact",
    ivfPqOracleFor(
      Option(lastTrained).getOrElse(initCentroids),
      Option(lastPq).getOrElse(initCodebooks),
      s" and cv.vec_id % 7 <> $AnnDeleteMod")) { (s, dir) =>
    val root = compactIndexRoot(s, dir)
    val (res, (cm, cb)) = serveFromIndex(s, dir, root, TopK)
    lastTrained = cm
    lastPq = cb
    res.orderBy(col("query_id"), col("rnk"))
  }

  /** Incremental add without retrain: the base index stores ~90% of
    * the corpus with models trained on the base alone; the incoming
    * batch is encoded against the STORED codebooks (read back, frozen
    * — per-batch work is one encode pass over the batch, nothing
    * corpus-sized recomputes) and unioned with the stored codes for
    * serving. The oracle embeds the base-trained models and encodes
    * the whole corpus against them — exactly what stored-base ∪
    * encoded-batch amounts to, so frozen-model ingestion is
    * hash-verified, not asserted. */
  val annIndexIncremental: Q = Q.df(
    "ann_index_incremental",
    ivfPqOracleFor(
      Option(lastBaseCm).getOrElse(initCentroids),
      Option(lastBaseCb).getOrElse(initCodebooks))) { (s, dir) =>
    import s.implicits._
    DotProduct.ensureRegistered(s)
    val root = baseIndexRoot(s, dir)
    val (cm, cb) = readModels(s, root)
    lastBaseCm = cm
    lastBaseCb = cb
    val batchCodes = withUnit(Tables.df(s, dir, "embeddings")
        .filter(col("vec_id") % 10 === AnnBatchMod))
      .as[(Long, Array[Double])]
      .flatMap { case (id, u) =>
        val cid = nearestCentroids(u, 1, cm)(0)
        (0 until PqM).iterator
          .map(m => (id, cid, m, nearestCode(subOf(u, m), cb(m))))
      }
      .toDF("neighbor_id", "cid", "m", "code")
    val cbDf = s.read.parquet(s"$root/codebooks")
    val batch2 = collectedQueryBatch(Tables.df(s, dir, "embeddings"))
    val probedCells = batch2
      .flatMap { case (_, u) => nearestCentroids(u, NProbe, cm) }
      .distinct.sorted
    val queries = batch2.flatMap { case (id, u) =>
      for {
        c <- nearestCentroids(u, NProbe, cm)
        m <- 0 until PqM
      } yield (id, c, m, subOf(u, m))
    }.toDF("query_id", "cid", "m", "qv")
    // probed-cell predicate prunes the stored (cell-partitioned) base
    // segment's scan; the fresh batch side gets the same row filter
    val probed = col("cid").isInCollection(probedCells)
    val codes = s.read.parquet(s"$root/codes").filter(probed)
      .unionByName(batchCodes.filter(probed))
    adcTopK(codes.join(broadcast(cbDf), Seq("m", "code"))
      .join(broadcast(queries), Seq("cid", "m")), TopK)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Recall@k of both ANN paths against the exact top-k — the index-
    * quality evaluation every ANN deployment runs before trading recall
    * for throughput. Pure composition of the three kernels above: the
    * candidate lists are tiny (NumQueries·k rows) so the recall join is
    * driver-free and broadcast-sized no matter the corpus scale — the
    * cost is the three index probes themselves, each already bounded
    * (brute force broadcasts only the query set; LSH/IVF shuffle only
    * bucket keys). The oracle nests the three entry oracles verbatim as
    * derived tables, so recall stays hash-checked end to end. */
  val annRecall: Q = Q.df(
    "ann_recall_at_k", {
      // ivfOracle / ivfPqOracle embed the run's trained models
      // (late-bound).
      s"""with exact as (select query_id, neighbor_id from ($bruteForceOracle) t),
         |lshk as (select query_id, neighbor_id from ($lshOracle) t),
         |ivfk as (select query_id, neighbor_id from ($ivfOracle) t),
         |ivfpqk as (select query_id, neighbor_id from ($ivfPqOracle) t)
         |select exact.query_id,
         |  round(cast(sum(case when l.neighbor_id is not null then 1 else 0 end)
         |          as double) / cast($TopK as double), 6) as lsh_recall,
         |  round(cast(sum(case when i.neighbor_id is not null then 1 else 0 end)
         |          as double) / cast($TopK as double), 6) as ivf_recall,
         |  round(cast(sum(case when p.neighbor_id is not null then 1 else 0 end)
         |          as double) / cast($TopK as double), 6) as ivfpq_recall
         |from exact
         |left join lshk l on l.query_id = exact.query_id
         |  and l.neighbor_id = exact.neighbor_id
         |left join ivfk i on i.query_id = exact.query_id
         |  and i.neighbor_id = exact.neighbor_id
         |left join ivfpqk p on p.query_id = exact.query_id
         |  and p.neighbor_id = exact.neighbor_id
         |group by exact.query_id
         |order by exact.query_id""".stripMargin
    }) { (s, dir) =>
    val emb = Tables.df(s, dir, "embeddings")
    val keys = Seq("query_id", "neighbor_id")
    // all four probes run over the SHARED artifacts (normalized corpus,
    // bucket table, assignment, code table) — the recall audit pays the
    // probes, not four corpus re-encodes
    val exact = bruteForceTopKShared(s, dir, TopK)
      .select("query_id", "neighbor_id")
    val lsh = lshTopKShared(s, dir, TopK).select("query_id", "neighbor_id")
      .withColumn("in_lsh", lit(1))
    val ivf = ivfTopK(emb, TopK, dir).select("query_id", "neighbor_id")
      .withColumn("in_ivf", lit(1))
    val ivfpq = ivfPqTopK(emb, TopK, dir).select("query_id", "neighbor_id")
      .withColumn("in_ivfpq", lit(1))
    exact
      .join(lsh, keys, "left")
      .join(ivf, keys, "left")
      .join(ivfpq, keys, "left")
      .groupBy(col("query_id"))
      .agg(
        round(sum(coalesce(col("in_lsh"), lit(0))).cast("double")
          / lit(TopK).cast("double"), 6).as("lsh_recall"),
        round(sum(coalesce(col("in_ivf"), lit(0))).cast("double")
          / lit(TopK).cast("double"), 6).as("ivf_recall"),
        round(sum(coalesce(col("in_ivfpq"), lit(0))).cast("double")
          / lit(TopK).cast("double"), 6).as("ivfpq_recall"))
      .orderBy(col("query_id"))
  }

  // ---- hybrid retrieval: reciprocal-rank fusion ---------------------------

  /** Fused list length per query. */
  val FuseK = 5

  /** Lexical candidate list bound (top-N by BM25). */
  val LexK = 100

  /** RRF smoothing constant (Cormack/Clarke/Buettcher's k = 60). */
  val RrfC = 60

  /** Hybrid retrieval fusion — the standard RAG-corpus retrieval shape:
    * a DENSE ranked list per query (cosine top-k over embeddings) fused
    * with a LEXICAL ranked list (BM25 over the aligned documents table;
    * doc_id ≡ vec_id in the fixtures) by reciprocal-rank fusion,
    * rrf(d) = Σ_lists 1/(C + rank_list(d)) with the classic C = 60. A
    * document absent from a list contributes nothing for it — RRF is
    * defined over the union of bounded candidate lists, never the
    * corpus.
    *
    * Scale shape: both inputs are k-BOUNDED lists, so fusion is one
    * broadcast join + one per-query window over ≤ TopK rows per query.
    * The lexical list is a distributed top-N (orderBy.limit →
    * TakeOrderedAndProject: per-partition heaps, no global sort) and
    * the dense list is the ANN family's candidate generator — swap
    * [[bruteForceTopK]] for [[lshTopK]]/[[ivfTopK]] at corpus scales
    * where exact scoring is the bottleneck; the fusion stage is
    * retriever-agnostic. Ranks are integers and the two reciprocal
    * terms are summed in a fixed spelled order, so the score is
    * bit-identical cross-engine (ties broken by neighbor id). */
  /** The RRF oracle text — named so [[retrievalEvalNdcg]] can nest it
    * verbatim (the [[annRecall]] composition discipline). */
  private def rrfOracle: String =
    s"""with dense as (select query_id, neighbor_id, rnk
       |  from ($bruteForceOracle) t),
       |lexr as (select doc_id, lrnk from (
       |    select doc_id, cast(row_number() over (
       |        order by bm25 desc, doc_id) as bigint) as lrnk
       |    from (${TextAnalysis.bm25OracleSql}) b) r
       |  where lrnk <= $LexK),
       |qids as (select distinct query_id from dense),
       |keys as (select distinct query_id, neighbor_id from (
       |    select query_id, neighbor_id from dense
       |    union all
       |    select q.query_id, l.doc_id as neighbor_id
       |    from qids q cross join lexr l) t
       |  where query_id <> neighbor_id),
       |fused as (select k.query_id, k.neighbor_id,
       |    coalesce(1.0 / ($RrfC.0 + cast(d.rnk as double)), 0.0)
       |      + coalesce(1.0 / ($RrfC.0 + cast(l.lrnk as double)), 0.0) as rrf
       |  from keys k
       |  left join dense d on d.query_id = k.query_id
       |    and d.neighbor_id = k.neighbor_id
       |  left join lexr l on l.doc_id = k.neighbor_id)
       |select query_id, neighbor_id, fused_rank, round(rrf, 6) as rrf_score
       |from (select *, cast(row_number() over (partition by query_id
       |        order by rrf desc, neighbor_id) as bigint) as fused_rank
       |      from fused) t
       |where fused_rank <= $FuseK
       |order by query_id, fused_rank""".stripMargin

  val hybridRrf: Q = Q.df("retrieval_rrf_fusion", rrfOracle) { (s, dir) =>
    rrfBuild(s, dir).orderBy(col("query_id"), col("fused_rank"))
  }

  /** The dense and lexical ranked lists, each materialized ONCE per
    * (session, fixture dir) and shared by every retrieval consumer
    * (fusion, nDCG evaluation, bench warm-ups) — the
    * [[graft.operators.Graph.sharedOrderEdges]] convention. Both are
    * k-bounded (queries·TopK and LexK rows) so the cache owns two tiny
    * stored block sets per corpus, and neither retrieval pipeline ever
    * re-runs per consumer. */
  private val denseListCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), DataFrame](
      graft.plans.Checkpoints.free)
  private val lexListCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), DataFrame](
      graft.plans.Checkpoints.free)

  private[graft] def sharedDenseList(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    denseListCache.once((s, dir))(graft.plans.Checkpoints.materialize(
      bruteForceTopKShared(s, dir, TopK)
        .select(col("query_id"), col("neighbor_id"), col("rnk"))))

  private[graft] def sharedLexList(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    lexListCache.once((s, dir))(graft.plans.Checkpoints.materialize(
      TextAnalysis.bm25Frame(s, dir)
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(LexK)
        .select(col("doc_id"),
          row_number().over(Window.orderBy(col("bm25").desc, col("doc_id")))
            .cast("long").as("lrnk"))))

  /** RRF construction over the shared ranked lists — split out so the
    * plan-shape spec can assert the broadcast-shaped fusion on the
    * live plan. The returned plan bottoms out in the two STORED lists,
    * so consumption is a join over k-bounded blocks, never a corpus
    * re-scan. */
  private[graft] def rrfBuild(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val dense = sharedDenseList(s, dir)
    val lex = sharedLexList(s, dir)
    // RRF is over the UNION of the two bounded candidate lists: a
    // lexical-only document must stay retrievable (it scores by its
    // lexical term alone), and a query's own document is excluded on
    // both routes (dense already self-excludes)
    val keys = dense.select(col("query_id"), col("neighbor_id"))
      .unionByName(dense.select(col("query_id")).distinct()
        .crossJoin(broadcast(lex.select(col("doc_id").as("neighbor_id")))))
      .filter(col("query_id") =!= col("neighbor_id"))
      .distinct()
    val fused = keys
      .join(dense, Seq("query_id", "neighbor_id"), "left")
      .join(broadcast(lex), keys("neighbor_id") === lex("doc_id"), "left")
      .select(col("query_id"), col("neighbor_id"),
        (coalesce(
          lit(1.0d) / (lit(RrfC.toDouble) + col("rnk").cast("double")),
          lit(0.0d)) +
          coalesce(
            lit(1.0d) / (lit(RrfC.toDouble) + col("lrnk").cast("double")),
            lit(0.0d))).as("rrf"))
    fused
      .withColumn("fused_rank", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("rrf").desc, col("neighbor_id"))).cast("long"))
      .filter(col("fused_rank") <= FuseK)
      .select(col("query_id"), col("neighbor_id"), col("fused_rank"),
        round(col("rrf"), 6).as("rrf_score"))
  }

  /** Evaluation cut-off for [[retrievalEvalNdcg]] — the fused list's
    * own depth, so all three systems are judged at the same k. */
  val EvalK: Int = FuseK

  /** Retrieval quality evaluation — the retrieval analogue of
    * [[annRecall]]: judge the fused, dense-only, and lexical-only
    * rankings with nDCG@k and MRR@k against a deterministic relevance
    * rule (a neighbor is relevant iff it shares the query vector's
    * `label` — the label-match qrels every ANN/retrieval benchmark
    * uses when no human judgments exist). Binary-relevance DCG@k =
    * Σ rel_i / log2(i+1); the ideal ranking puts all R relevant
    * documents first, so IDCG folds the same series to min(k, R);
    * MRR = 1/first-relevant-rank. Both folds run over SORTED bounded
    * lists (k ≤ 5 terms per cell); each term divides an exact-integer
    * relevance by log2 of an exact-integer rank, so cross-engine
    * agreement rests on the shared log2-then-round(6) policy the
    * window-distribution entries established (JVM and DuckDB log2 can
    * differ in the last ulp; round(6) absorbs it) — not on raw
    * bit-equality of the folds.
    *
    * Scale shape: the three ranked lists are k-bounded (3·queries·k
    * rows total); relevance is two label-table scans each joining a
    * BROADCAST list; the ideal-gain side joins the label histogram
    * (distinct-label-sized). Nothing corpus-shaped survives past the
    * list construction, and both input lists come from the shared
    * per-corpus caches — one retrieval run serves every consumer. The
    * oracle nests the RRF, dense, and BM25 oracles verbatim. */
  val retrievalEvalNdcg: Q = Q.df(
    "retrieval_eval_ndcg",
    s"""with fusedq as (select query_id, neighbor_id, fused_rank as rnk
       |  from ($rrfOracle) f where fused_rank <= $EvalK),
       |denseq as (select query_id, neighbor_id, rnk
       |  from ($bruteForceOracle) t where rnk <= $EvalK),
       |lexr as (select doc_id, lrnk from (
       |    select doc_id, cast(row_number() over (
       |        order by bm25 desc, doc_id) as bigint) as lrnk
       |    from (${TextAnalysis.bm25OracleSql}) b) r
       |  where lrnk <= $LexK),
       |qids as (select distinct query_id from denseq),
       |lexq as (select query_id, neighbor_id, rnk from (
       |    select q.query_id, l.doc_id as neighbor_id,
       |      cast(row_number() over (partition by q.query_id
       |        order by l.lrnk) as bigint) as rnk
       |    from qids q cross join lexr l
       |    where q.query_id <> l.doc_id) t
       |  where rnk <= $EvalK),
       |lists as (
       |  select 'dense' as retriever, query_id, neighbor_id, rnk from denseq
       |  union all
       |  select 'fused' as retriever, query_id, neighbor_id, rnk from fusedq
       |  union all
       |  select 'lexical' as retriever, query_id, neighbor_id, rnk from lexq),
       |lab as (select vec_id, label from embeddings),
       |scored as (select l.retriever, l.query_id, l.rnk,
       |    case when ql.label = nl.label then 1.0 else 0.0 end as rel
       |  from lists l
       |  join lab ql on ql.vec_id = l.query_id
       |  join lab nl on nl.vec_id = l.neighbor_id),
       |perq as (select retriever, query_id,
       |    list_reduce(list_sort(
       |      list(rel / log2(cast(rnk as double) + 1.0))),
       |      (a, b) -> a + b) as dcg,
       |    min(case when rel > 0 then rnk end) as fr
       |  from scored group by retriever, query_id),
       |labcnt as (select label, count(*) as lc from lab group by label),
       |ideal as (select q.query_id,
       |    least($EvalK, c.lc - 1) as m
       |  from qids q
       |  join lab ql on ql.vec_id = q.query_id
       |  join labcnt c on c.label = ql.label),
       |idcg as (select query_id,
       |    case when m >= 1 then list_reduce(list_sort(
       |        list_transform(range(1, m + 1),
       |          i -> 1.0 / log2(cast(i as double) + 1.0))),
       |        (a, b) -> a + b)
       |      else 0.0 end as ideal_dcg
       |  from ideal)
       |select p.retriever, p.query_id,
       |  round(case when i.ideal_dcg > 0 then p.dcg / i.ideal_dcg
       |    else 0.0 end, 6) as ndcg,
       |  round(case when p.fr is not null
       |    then 1.0 / cast(p.fr as double) else 0.0 end, 6) as mrr
       |from perq p join idcg i on i.query_id = p.query_id
       |order by p.retriever, p.query_id""".stripMargin) { (s, dir) =>
    val emb = Tables.df(s, dir, "embeddings")
    val labels = emb.select(col("vec_id"), col("label"))
    val ranked = rrfBuild(s, dir)
    val dense = sharedDenseList(s, dir)
    val lex = sharedLexList(s, dir)
    val qids = dense.select(col("query_id")).distinct()
    val denseL = dense.filter(col("rnk") <= EvalK)
      .select(lit("dense").as("retriever"), col("query_id"),
        col("neighbor_id"), col("rnk"))
    val fusedL = ranked.filter(col("fused_rank") <= EvalK)
      .select(lit("fused").as("retriever"), col("query_id"),
        col("neighbor_id"), col("fused_rank").as("rnk"))
    val lexL = qids.crossJoin(broadcast(lex))
      .filter(col("query_id") =!= col("doc_id"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("lrnk")))
        .cast("long"))
      .filter(col("rnk") <= EvalK)
      .select(lit("lexical").as("retriever"), col("query_id"),
        col("doc_id").as("neighbor_id"), col("rnk"))
    val lists = denseL.unionByName(fusedL).unionByName(lexL)
    // relevance: two label-table passes, each joining the BROADCAST
    // k-bounded list side
    val ql = labels.select(col("vec_id").as("query_id"),
      col("label").as("ql"))
    val nl = labels.select(col("vec_id").as("neighbor_id"),
      col("label").as("nl"))
    val scored = nl
      .join(broadcast(ql.join(broadcast(lists), Seq("query_id"))),
        Seq("neighbor_id"))
      .withColumn("rel",
        when(col("ql") === col("nl"), lit(1.0d)).otherwise(lit(0.0d)))
    val perQ = scored
      .withColumn("term",
        col("rel") / log2(col("rnk").cast("double") + lit(1.0d)))
      .groupBy(col("retriever"), col("query_id"))
      .agg(
        aggregate(sort_array(collect_list(col("term"))), lit(0.0d),
          (a, x) => a + x).as("dcg"),
        min(when(col("rel") > 0, col("rnk"))).as("fr"))
    // ideal gain: R relevant documents exist corpus-wide (the label
    // histogram is distinct-label-sized and broadcasts)
    val labCnt = labels.groupBy(col("label")).agg(count(lit(1)).as("lc"))
    val ideal = ql.join(broadcast(qids), Seq("query_id"))
      .join(broadcast(labCnt), col("ql") === col("label"))
      .withColumn("m", least(lit(EvalK.toLong), col("lc") - 1L))
      .withColumn("ideal_dcg",
        when(col("m") >= 1L,
          aggregate(
            sort_array(transform(sequence(lit(1L), col("m")),
              i => lit(1.0d) / log2(i.cast("double") + lit(1.0d)))),
            lit(0.0d), (a, x) => a + x))
          .otherwise(lit(0.0d)))
      .select(col("query_id"), col("ideal_dcg"))
    perQ
      .join(broadcast(ideal), Seq("query_id"))
      .select(col("retriever"), col("query_id"),
        round(when(col("ideal_dcg") > 0, col("dcg") / col("ideal_dcg"))
          .otherwise(lit(0.0d)), 6).as("ndcg"),
        round(when(col("fr").isNotNull,
            lit(1.0d) / col("fr").cast("double"))
          .otherwise(lit(0.0d)), 6).as("mrr"))
      .orderBy(col("retriever"), col("query_id"))
  }

  /** Expansion terms kept per query by [[prfExpansion]]. */
  val PrfTerms = 5

  /** Pseudo-relevance-feedback query expansion (Rocchio/RM-style, the
    * classic retrieval second pass): treat each query's dense top-k as
    * the relevant feedback set, mine the terms that recur across those
    * documents (feedback document frequency), drop the original global
    * query terms, and keep the top [[PrfTerms]] per query — the terms a
    * second retrieval round would OR into the query. All-integer
    * (distinct-pair counts, rank ties by term asc) → exact
    * cross-engine.
    *
    * Scale shape: the feedback set is k-BOUNDED per query (the dense
    * top-k), so it broadcasts into the per-doc distinct-token stream —
    * the corpus-sized side is scanned once and reduced by the join
    * before any shuffle; the global query-term exclusion is a 3-row
    * broadcast anti-join; ranking is a per-query window over ≤ k·terms
    * rows. No global sorts, nothing driver-sized. */
  val prfExpansion: Q = Q.df(
    "retrieval_prf_expansion",
    s"""with dense as (select query_id, neighbor_id
       |  from ($bruteForceOracle) t),
       |toks as (select distinct doc_id, tok from (
       |  select doc_id, unnest(string_split(text, ' ')) as tok
       |  from documents) t),
       |q as (select tok from (
       |  select tok, cast(count(*) as bigint) as df from toks group by tok
       |  order by df desc, tok asc limit 3) t),
       |fb as (select d.query_id, t.tok, cast(count(*) as bigint) as df_fb
       |  from dense d join toks t on t.doc_id = d.neighbor_id
       |  where t.tok not in (select tok from q)
       |  group by d.query_id, t.tok)
       |select query_id, tok as term, rnk, df_fb from (
       |  select *, cast(row_number() over (partition by query_id
       |    order by df_fb desc, tok asc) as bigint) as rnk from fb) z
       |where rnk <= $PrfTerms
       |order by query_id, rnk""".stripMargin) { (s, dir) =>
    import graft.plans.Checkpoints
    val dense = sharedDenseList(s, dir)
      .select(col("query_id"), col("neighbor_id"))
    // the distinct (doc, token) stream feeds BOTH the global-df query
    // terms and the feedback counts — materialize it once so the
    // corpus is scanned (and the distinct shuffled) a single time; the
    // final frame is PrfTerms·queries rows, so it is materialized and
    // the token stream freed before returning
    val toks = Checkpoints.materialize(Tables.df(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("tok"))
      .distinct())
    val qterms = toks.groupBy("tok").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok").asc).limit(3)
      .select(col("tok"))
    val fb = toks.join(broadcast(dense),
        toks("doc_id") === col("neighbor_id"))
      .join(broadcast(qterms), Seq("tok"), "left_anti")
      .groupBy(col("query_id"), col("tok"))
      .agg(count(lit(1)).as("df_fb"))
    val out = Checkpoints.materialize(
      fb.withColumn("rnk", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("df_fb").desc, col("tok").asc)).cast("long"))
        .filter(col("rnk") <= PrfTerms)
        .select(col("query_id"), col("tok").as("term"), col("rnk"),
          col("df_fb")))
    Checkpoints.free(toks)
    out.orderBy(col("query_id"), col("rnk"))
  }

  // ---- kNN label propagation ----------------------------------------------

  /** Neighbors consulted per unlabeled vector. */
  val PropK = 5

  /** Holdout selector: every 10th id plays "unlabeled". */
  val HoldoutMod = 10

  /** Semi-supervised label propagation — the pipeline step that turns a
    * small labeled seed set into weak labels for the rest of a corpus
    * (domain tagging, quality-tier assignment): each held-out vector
    * takes the majority label of its [[PropK]] nearest labeled
    * neighbors by cosine, ties broken toward the smaller label id.
    *
    * Scale shape: identical to [[bruteForceTopK]] — the labeled corpus
    * streams once per partition against the (broadcastable) holdout
    * side; per-query state is a k-row heap, never the pair matrix. At a
    * scale where the holdout side itself is corpus-sized, the candidate
    * generator swaps for the LSH bucket join ([[lshTopK]]) with the
    * same vote tail — that swap is recall-traded, so the exact form
    * stays the oracle. */
  def knnPropagate(emb: DataFrame, k: Int = PropK): DataFrame = {
    DotProduct.ensureRegistered(emb.sparkSession)
    val unit = withUnit(emb)
    val labels = emb.select(col("vec_id"), col("label").cast("long").as("label"))
    knnPropagateFrom(unit.join(labels, "vec_id"), k)
  }

  /** Entry path: the labeled unit vectors come from the shared
    * assignment artifact (vec_id, label, u already joined per row) —
    * no per-invocation normalize pass and no corpus-sized label join. */
  private def knnPropagateShared(s: org.apache.spark.sql.SparkSession,
      dir: String, k: Int = PropK): DataFrame = {
    DotProduct.ensureRegistered(s)
    knnPropagateFrom(
      sharedIvfAssign(s, dir).select(col("vec_id"), col("u"), col("label")),
      k)
  }

  /** Core over a (vec_id, u, label) relation. */
  private def knnPropagateFrom(u: DataFrame, k: Int): DataFrame = {
    val train = u.filter(col("vec_id") % HoldoutMod =!= 0)
      .select(col("vec_id").as("nid"), col("u").as("cv"), col("label"))
    val hold = u.filter(col("vec_id") % HoldoutMod === 0)
      .select(col("vec_id").as("query_id"), col("u").as("qv"),
        col("label").as("true_label"))
    val topk = train.crossJoin(broadcast(hold))
      .withColumn("cos", cosExpr(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("nid"))))
      .filter(col("rnk") <= k)
    topk.groupBy(col("query_id"), col("true_label"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("votes").desc, col("label"))))
      .filter(col("vr") === 1)
      .select(col("query_id"), col("label").as("pred_label"),
        col("votes"), col("true_label"),
        (col("label") === col("true_label")).as("correct"))
  }

  private def knnPropagateOracle: String =
    s"""with e as ($sqlUnit),
       |l as (select e.vec_id, e.u, cast(m.label as bigint) as label
       |      from e join embeddings m on m.vec_id = e.vec_id),
       |train as (select * from l where vec_id % $HoldoutMod <> 0),
       |hold as (select vec_id as query_id, u,
       |           label as true_label from l where vec_id % $HoldoutMod = 0),
       |scored as (
       |  select h.query_id, h.true_label, t.label,
       |    row_number() over (partition by h.query_id
       |      order by ${sqlDotU("h", "t")} desc, t.vec_id) as rnk
       |  from hold h cross join train t),
       |votes as (
       |  select query_id, true_label, label, count(*) as votes
       |  from scored where rnk <= $PropK
       |  group by query_id, true_label, label),
       |best as (
       |  select *, row_number() over (partition by query_id
       |    order by votes desc, label) as vr from votes)
       |select query_id, label as pred_label, votes, true_label,
       |  label = true_label as correct
       |from best where vr = 1
       |order by query_id""".stripMargin

  val knnPropagateQ: Q = Q.df("knn_label_propagation", knnPropagateOracle) {
    (s, dir) =>
      knnPropagateShared(s, dir)
        .orderBy(col("query_id"))
  }

  /** Hard negatives kept per anchor. */
  val HardNegK = 3

  /** Hard-negative mining — the contrastive-training data-prep step:
    * for each anchor vector, the top-[[HardNegK]] most similar vectors
    * with a DIFFERENT label (the negatives a margin loss learns most
    * from; random negatives are too easy to carry gradient). Same
    * broadcast-anchor shape as [[bruteForceTopK]] with a label-mismatch
    * predicate fused into the scan; the corpus-scale candidate path is
    * the LSH bucket join, exactly as for [[knnPropagate]]. Anchors here
    * are the query slice (vec_id < NumQueries). */
  def hardNegatives(emb: DataFrame, k: Int = HardNegK): DataFrame = {
    DotProduct.ensureRegistered(emb.sparkSession)
    val labels = emb.select(col("vec_id"), col("label").cast("long").as("label"))
    hardNegativesFrom(withUnit(emb).join(labels, "vec_id"), k)
  }

  /** Entry path: labeled unit vectors from the shared assignment
    * artifact (no per-invocation normalize or label join — the
    * [[knnPropagateShared]] discipline). */
  private def hardNegativesShared(s: org.apache.spark.sql.SparkSession,
      dir: String, k: Int = HardNegK): DataFrame = {
    DotProduct.ensureRegistered(s)
    hardNegativesFrom(
      sharedIvfAssign(s, dir).select(col("vec_id"), col("u"), col("label")),
      k)
  }

  private def hardNegativesFrom(u: DataFrame, k: Int): DataFrame = {
    val anchors = u.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("anchor_id"), col("u").as("av"),
        col("label").as("anchor_label"))
    val corpus = u.select(col("vec_id").as("neg_id"), col("u").as("cv"),
      col("label").as("neg_label"))
    corpus.crossJoin(broadcast(anchors))
      .filter(col("neg_label") =!= col("anchor_label"))
      .withColumn("cos", cosExpr(col("av"), col("cv")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("anchor_id"))
          .orderBy(col("cos").desc, col("neg_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("anchor_id"), col("anchor_label"), col("neg_id"),
        col("neg_label"), col("rnk"), round(col("cos"), 6).as("cos_sim"))
  }

  private def hardNegativesOracle: String =
    s"""with e as ($sqlUnit),
       |l as (select e.vec_id, e.u, cast(m.label as bigint) as label
       |      from e join embeddings m on m.vec_id = e.vec_id),
       |a as (select vec_id as anchor_id, u,
       |        label as anchor_label from l where vec_id < $NumQueries),
       |scored as (
       |  select a.anchor_id, a.anchor_label, c.vec_id as neg_id,
       |    c.label as neg_label, ${sqlDotU("a", "c")} as cos
       |  from a cross join l c where c.label <> a.anchor_label)
       |select anchor_id, anchor_label, neg_id, neg_label,
       |  cast(rnk as bigint) as rnk, round(cos, 6) as cos_sim
       |from (select *, row_number() over (partition by anchor_id
       |        order by cos desc, neg_id) as rnk from scored) t
       |where rnk <= $HardNegK
       |order by anchor_id, rnk""".stripMargin

  val hardNegativesQ: Q = Q.df("embed_hard_negatives", hardNegativesOracle) {
    (s, dir) =>
      hardNegativesShared(s, dir)
        .orderBy(col("anchor_id"), col("rnk"))
  }

  /** Margin ratio a best-match pair must clear: best / second-best
    * cosine (the Artetxe–Schwenk ratio criterion, simplified to the
    * forward direction + a mutual-best flag). */
  val MarginThreshold = 1.01

  /** Margin-based cross-side pair mining — the bitext-mining shape: the
    * corpus splits into two sides (here by vec_id parity; in a real
    * pipeline, by language or by snapshot), and a pair (a, b) is
    * accepted when b is a's best cross-side match AND the best beats
    * the SECOND best by a margin — absolute cosine alone over-fires in
    * dense hubs, the margin test is what makes mined pairs precise.
    * `mutual` additionally marks pairs where a is also b's best (the
    * full bidirectional criterion).
    *
    * Shape: one scored frame (side A × broadcast side B, same
    * broadcast-anchor scan as [[bruteForceTopK]]) feeds BOTH ranking
    * directions — cos(a,b) is symmetric, so the backward ranks come
    * from a second window over the same rows, not a second scan. At
    * corpus scale the cross join is replaced by LSH/IVF candidate
    * generation exactly as for the sibling entries; the margin logic is
    * unchanged on candidate sets that contain each side's top-2. */
  def marginPairs(emb: DataFrame, minMargin: Double): DataFrame =
    marginPairsFrom(emb.sparkSession, withUnit(emb), minMargin)

  private def marginPairsFrom(s: org.apache.spark.sql.SparkSession,
      u: DataFrame, minMargin: Double): DataFrame = {
    DotProduct.ensureRegistered(s)
    val a = u.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("a_id"), col("u").as("av"))
    val b = u.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("b_id"), col("u").as("bv"))
    val scored = a.crossJoin(broadcast(b))
      .withColumn("cos", cosExpr(col("av"), col("bv")))
      .select(col("a_id"), col("b_id"), col("cos"))
    val ranked = scored
      .withColumn("ra", row_number().over(
        Window.partitionBy(col("a_id"))
          .orderBy(col("cos").desc, col("b_id"))))
      .withColumn("rb", row_number().over(
        Window.partitionBy(col("b_id"))
          .orderBy(col("cos").desc, col("a_id"))))
    val best = ranked.filter(col("ra") === 1)
      .select(col("a_id"), col("b_id"), col("cos"),
        (col("rb") === 1).as("mutual"))
    val second = ranked.filter(col("ra") === 2)
      .select(col("a_id"), col("cos").as("cos2"))
    best.join(second, "a_id")
      .filter(col("cos") / col("cos2") >= minMargin)
      .select(col("a_id"), col("b_id"),
        round(col("cos"), 6).as("cos_sim"),
        round(col("cos") / col("cos2"), 6).as("margin"),
        col("mutual"))
      .orderBy(col("a_id"))
  }

  private def marginPairsOracle: String =
    s"""with e as ($sqlUnit),
       |a as (select vec_id as a_id, u from e where vec_id % 2 = 0),
       |b as (select vec_id as b_id, u from e where vec_id % 2 = 1),
       |scored as (select a.a_id, b.b_id, ${sqlDotU("a", "b")} as cos
       |           from a cross join b),
       |ranked as (select *,
       |    row_number() over (partition by a_id
       |                       order by cos desc, b_id) as ra,
       |    row_number() over (partition by b_id
       |                       order by cos desc, a_id) as rb
       |  from scored),
       |best as (select a_id, b_id, cos, (rb = 1) as mutual
       |         from ranked where ra = 1),
       |sec as (select a_id, cos as cos2 from ranked where ra = 2)
       |select a_id, best.b_id, round(best.cos, 6) as cos_sim,
       |  round(best.cos / sec.cos2, 6) as margin, mutual
       |from best join sec using (a_id)
       |where best.cos / sec.cos2 >= $MarginThreshold
       |order by a_id""".stripMargin

  val marginPairsQ: Q = Q.df("embed_margin_pairs", marginPairsOracle) {
    (s, dir) =>
      // shared normalized corpus (one normalize pass per session)
      marginPairsFrom(s, sharedUnitVecs(s, dir), MarginThreshold)
  }

  // ---- embedding-space benchmark decontamination -------------------------

  /** Minimum cosine against any benchmark vector for a corpus document
    * to count as contaminated. Set below the n-gram decontamination
    * bar deliberately: embedding contamination catches PARAPHRASED
    * benchmark leakage that exact n-gram overlap misses, so its
    * threshold trades precision for recall. */
  val EmbedContamThreshold = 0.35

  /** Embedding-space decontamination — the semantic complement to
    * [[graft.operators.Corpus.decontaminate]]'s n-gram screen: a corpus
    * document is flagged when its embedding's cosine against ANY
    * benchmark-source vector reaches [[EmbedContamThreshold]], catching
    * paraphrases and translations that share no exact n-gram with the
    * benchmark. Returns one row per contaminated document with its hit
    * count and worst (highest) cosine.
    *
    * Scale shape: the benchmark side is the small one by construction
    * (a benchmark is thousands of rows; the corpus is the 100 TB side),
    * so its unit vectors broadcast and the corpus is scanned ONCE with
    * the filter + max/count fused — the [[hardNegatives]] shape. max
    * and count are order-independent, so the result is deterministic
    * under any partitioning (no summation-order contract needed). */
  def embeddingDecontaminate(emb: DataFrame, docs: DataFrame,
      benchSource: String,
      threshold: Double = EmbedContamThreshold,
      unitOpt: Option[DataFrame] = None): DataFrame = {
    DotProduct.ensureRegistered(emb.sparkSession)
    val side = docs.select(col("doc_id"), col("source"))
    val u = unitOpt.getOrElse(withUnit(emb))
      .join(side, col("vec_id") === col("doc_id"))
    val bench = u.filter(col("source") === benchSource)
      .select(col("vec_id").as("bench_id"), col("u").as("bv"))
    val corpus = u.filter(col("source") =!= benchSource)
      .select(col("vec_id").as("cid"), col("u").as("cv"))
    corpus.crossJoin(broadcast(bench))
      .withColumn("cos", cosExpr(col("cv"), col("bv")))
      .filter(col("cos") >= threshold)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_bench_hits"), max(col("cos")).as("mx"))
      .select(col("cid").as("doc_id"), col("n_bench_hits"),
        round(col("mx"), 6).as("max_cos"))
  }

  private def embedDecontamOracle: String =
    s"""with e as ($sqlUnit),
       |b as (select e.vec_id, e.u from e
       |      join documents d on d.doc_id = e.vec_id
       |      where d.source = '${Corpus.BenchmarkSource}'),
       |c as (select e.vec_id, e.u from e
       |      join documents d on d.doc_id = e.vec_id
       |      where d.source <> '${Corpus.BenchmarkSource}'),
       |s as (select c.vec_id as cid, ${sqlDotU("c", "b")} as cos
       |      from c cross join b)
       |select cid as doc_id, cast(count(*) as bigint) as n_bench_hits,
       |  round(max(cos), 6) as max_cos
       |from s where cos >= $EmbedContamThreshold
       |group by cid order by doc_id""".stripMargin

  val embedDecontamQ: Q = Q.df("decontaminate_embedding", embedDecontamOracle) {
    (s, dir) =>
      embeddingDecontaminate(Tables.df(s, dir, "embeddings"),
        Tables.df(s, dir, "documents"), Corpus.BenchmarkSource,
        unitOpt = Some(sharedUnitVecs(s, dir)))
        .orderBy(col("doc_id"))
  }

  // ---- Graph-walk ANN (NSW-family beam search) ----------------------------

  /** kNN out-degree before symmetrization (degree cap is 2·M after). */
  val GraphM = 6
  /** Beam width (live frontier per query). */
  val BeamWidth = 8
  /** Expansion rounds. */
  val BeamRounds = 4
  /** Fixed entry nodes: the first [[GraphEntryPoints]] corpus ids past
    * the query range — the NSW/HNSW "entry point" made deterministic. */
  val GraphEntryPoints = 4

  /** Bounded kNN neighbor graph: per-node top-[[GraphM]] among LSH
    * bucket-mates by cosine — the navigable-small-world build reusing
    * the seeded-hyperplane buckets as the candidate generator (a real
    * HNSW build does the same with its own beam; buckets bound the
    * candidate pair count to collisions, never n²). Per-node truncation
    * to M keeps the graph |V|·M rows — the serving artifact is linear in
    * the corpus, and each beam round below touches at most B·M of it per
    * query. */
  def neighborGraph(emb: DataFrame): DataFrame = {
    DotProduct.ensureRegistered(emb.sparkSession)
    val keys = lshKeys(emb)
    val vecs = withUnit(emb)
    val pairs = keys
      .select(col("vec_id").as("src"), col("table"), col("bucket"))
      .join(keys.select(col("vec_id").as("dst"), col("table"), col("bucket")),
        Seq("table", "bucket"))
      .filter(col("src") =!= col("dst"))
      // dedup collisions across tables BEFORE carrying vectors around
      .select(col("src"), col("dst")).distinct()
    val knn = pairs
      .join(vecs.select(col("vec_id").as("src"), col("u").as("su")), Seq("src"))
      .join(vecs.select(col("vec_id").as("dst"), col("u").as("du")), Seq("dst"))
      .withColumn("cos", cosExpr(col("su"), col("du")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))))
      .filter(col("rn") <= GraphM)
      .select(col("src"), col("dst"), col("cos"))
    // NSW links are UNDIRECTED: a directed kNN digraph routes poorly
    // (greedy walks fall off the reverse-edge side of the small world).
    // Symmetrize, then re-cap per node at 2·M so a hub's in-degree
    // cannot blow the per-round frontier bound.
    knn.unionByName(knn.select(col("dst").as("src"), col("src").as("dst"),
        col("cos")))
      .distinct()
      .withColumn("rn2", row_number().over(
        Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))))
      .filter(col("rn2") <= 2 * GraphM)
      .select(col("src"), col("dst"))
  }

  /** The neighbor graph is the INDEX — built once per (session, dir)
    * like the IVF/PQ codebooks, shared by the entry, the bench warm-ups
    * and the recall spec. */
  private val graphCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), DataFrame](
      graft.plans.Checkpoints.free)

  private[graft] def sharedNeighborGraph(
      s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graphCache.once((s, dir))(graft.plans.Checkpoints.materialize(
      neighborGraph(Tables.df(s, dir, "embeddings"))))

  /** The normalized-vector half of the graph-index serving artifact,
    * built once per (session, dir) like [[sharedNeighborGraph]] — a
    * production graph index stores unit vectors next to the edge lists
    * (the walk's scorer reads them per candidate, never re-deriving
    * them from the raw corpus). Before this was shared, every walk
    * CELL re-scanned and re-normalized the corpus (and every ROUND of
    * every walk re-ran that subtree inside its broadcast build). */
  private val unitCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), DataFrame](
      graft.plans.Checkpoints.free)

  private[graft] def sharedUnitVecs(
      s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    unitCache.once((s, dir))(graft.plans.Checkpoints.materialize(
      withUnit(Tables.df(s, dir, "embeddings"))))

  /** Greedy beam search over the neighbor graph — the query-time half of
    * the NSW family. Start every query at the fixed entry nodes; each
    * round expands the current top-[[BeamWidth]] of the visited set
    * through the graph's out-edges, scores only the NEWLY reached
    * nodes, and re-ranks. Top-k of the visited set is the answer.
    *
    * Everything is deterministic (seeded planes → deterministic graph;
    * fixed entry points; total tie order by neighbor id), so the oracle
    * replays the identical walk as an unrolled materialized-CTE chain.
    *
    * Scale shape: per round the frontier join is B rows per query
    * against an M-out-degree graph — candidates ≤ q·B·M, scored against
    * a broadcast query set; the corpus is touched only through the
    * graph artifact and the id-keyed vector lookups. No round depends
    * on corpus size, which is what makes graph ANN the serving-stack
    * winner: work is O(q·B·M·R), index is O(n·M). */
  /** The iterated frontier-expansion walk shared by the flat and the
    * layered entries: visited₀ = score(seeds); each round expands the
    * current top-[[BeamWidth]] through `edges`, anti-joins the
    * already-visited, scores only the fresh nodes, re-ranks. Returns
    * the final MATERIALIZED visited relation (caller owns its blocks;
    * they are model-sized — ≤ q·(seeds + R·B·deg) rows). */
  private def beamWalk(queries0: DataFrame, corpus0: DataFrame,
      edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    import graft.plans.Checkpoints
    // Materialize the two relations every round re-reads ONCE per walk.
    // Each round runs as its own checkpoint-separated job, so Catalyst
    // can never reuse an exchange across rounds: without this the
    // query-vector subtree and the normalized-corpus subtree (a full
    // embeddings scan + per-row normalization) are re-executed by every
    // round's broadcast build — R+1 redundant scans per walk (guide
    // §2.4: remove shuffles/passes outright). At 100 TB the corpus
    // relation is the stored normalized-vector half of the index
    // artifact; materializing it once per serve batch is the local
    // stand-in for mounting that artifact.
    // AQE off for the walk's micro-jobs: every relation in the loop is
    // query-batch-sized (the corpus-sized sides stream through single
    // scan stages with no shuffle), so runtime re-planning can never
    // change a join strategy or coalesce anything that matters — it
    // only adds one scheduler round-trip and a re-optimization per
    // shuffle stage, which at ~25 micro-plans per walk is pure driver
    // latency. Scale-independent: the walk's shuffles carry ≤ q·B·deg
    // rows regardless of corpus size.
    // Walk shuffles carry query-batch-sized frames (≤ q·B·deg rows), so
    // partition them by BATCH size, not by cluster width: 32 (or 200)
    // near-empty reducers per round is pure task-scheduling overhead at
    // any scale. Overridable for genuinely large serving batches.
    val sess = seeds.sparkSession
    val walkParts = sess.conf.getOption("spark.graft.walk.partitions")
      .getOrElse("8")
    val aqeKey = "spark.sql.adaptive.enabled"
    val spKey = "spark.sql.shuffle.partitions"
    // The flip + walk + restore run under a global lock: the session
    // conf is SHARED session state, and two concurrent walks (the SQL
    // server runs each connection on its own thread) could interleave
    // set/restore so that one walk re-reads the other's degraded values
    // as the "previous" state and leaks AQE=off / 8 partitions
    // permanently. Walk bodies are query-batch-sized micro-plans, so
    // serializing them costs nothing next to their own runtime;
    // single-threaded callers (bench, Verify) see no behavior change.
    // WalkConcurrencySpec pins the restore under concurrent walks.
    Similarity.walkConfLock.synchronized {
      val prevAqe = sess.conf.get(aqeKey)
      val prevSp = sess.conf.get(spKey)
      sess.conf.set(aqeKey, "false")
      sess.conf.set(spKey, walkParts)
      try beamWalkBody(queries0, corpus0, edges, seeds, rounds)
      finally { sess.conf.set(aqeKey, prevAqe); sess.conf.set(spKey, prevSp) }
    }
  }

  /** Lock for [[beamWalk]]'s session-conf flip (see its comment). */
  private[operators] val walkConfLock = new Object

  /** True when `p` is only narrow ops (project/filter/alias) over an
    * already-materialized LogicalRDD leaf — re-checkpointing such a
    * frame would copy blocks for nothing. */
  private def matRooted(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
    p match {
      case _: org.apache.spark.sql.execution.LogicalRDD => true
      case _: org.apache.spark.sql.catalyst.plans.logical.Project |
           _: org.apache.spark.sql.catalyst.plans.logical.Filter |
           _: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
        matRooted(p.children.head)
      case _ => false
    }

  private def ensureMat(df: DataFrame): (DataFrame, Boolean) =
    if (matRooted(df.queryExecution.logical)) (df, false)
    else (graft.plans.Checkpoints.materialize(df), true)

  private def beamWalkBody(queries0: DataFrame, corpus0: DataFrame,
      edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    import graft.plans.Checkpoints
    val (queries, freeQ) = ensureMat(queries0)
    val (corpus, freeC) = ensureMat(corpus0)
    // Broadcast the QUERY-SIZED side of every join explicitly (guide
    // §3.1): candidate/beam/visited relations are bounded by the query
    // batch (≤ q·(seeds + R·B·deg) rows) at ANY corpus size, while
    // edges/corpus are corpus-sized — after materialization their
    // LogicalRDD stats no longer advertise the parquet sizes, and
    // without the hints Catalyst falls back to sort-merge joins that
    // shuffle the corpus-sized side every round.
    def score(cand: DataFrame): DataFrame = corpus
      .join(broadcast(cand.join(broadcast(queries), Seq("query_id"))),
        Seq("neighbor_id"))
      .withColumn("cos", cosExpr(col("qv"), col("cv")))
      .select(col("query_id"), col("neighbor_id"), col("cos"))
    var visited = Checkpoints.materialize(score(seeds))
    for (_ <- 1 to rounds) {
      val beam = visited
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("cos").desc, col("neighbor_id"))))
        .filter(col("rn") <= BeamWidth)
        .select(col("query_id"), col("neighbor_id"))
      val reached = broadcast(beam)
        .join(edges, beam("neighbor_id") === edges("src"))
        .select(col("query_id"), col("dst").as("neighbor_id"))
        .filter(col("neighbor_id") =!= col("query_id"))
      // One distinct over the union replaces the old pre-score
      // distinct + already-visited anti-join (two extra shuffled/
      // broadcast plans per round): re-scoring a duplicate candidate
      // is free — the scorer streams the corpus blocks once per round
      // regardless of probe count, and cos is deterministic, so the
      // union-level dedup yields the identical visited SET.
      val next = Checkpoints.materialize(
        visited.unionByName(score(reached)).distinct())
      Checkpoints.free(visited)
      visited = next
    }
    if (freeQ) Checkpoints.free(queries)
    if (freeC) Checkpoints.free(corpus)
    visited
  }

  private def topKOf(visited: DataFrame, k: Int): DataFrame =
    visited
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        round(col("cos"), 6).as("cos_sim"))

  /** The fixed global entry window every flat walk seeds from. */
  private def defaultEntryFilter: org.apache.spark.sql.Column =
    col("neighbor_id") >= NumQueries &&
      col("neighbor_id") < NumQueries + GraphEntryPoints

  /** Serve the standard query set by beam walk over an ARBITRARY edge
    * relation (in-memory graph, stored parquet graph, stored ∪
    * freshly-inserted) — the shared query-time half of every lifecycle
    * entry. `entries` is the seed-node id relation (one `neighbor_id`
    * column): derived from a filter for the in-session entries, read
    * from the stored artifact for the compacted index. */
  /** The standard-query-set walk's full VISITED relation over an
    * arbitrary edge relation and seed entry list — shared by plain
    * serving (top-k of it) and filtered serving (predicate before the
    * top-k). */
  private def walkVisited(s: org.apache.spark.sql.SparkSession,
      dir: String, edges: DataFrame, entries: DataFrame): DataFrame = {
    DotProduct.ensureRegistered(s)
    val vecs = sharedUnitVecs(s, dir)
    val queries = vecs.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("u").as("qv"))
    val corpus = vecs.select(col("vec_id").as("neighbor_id"), col("u").as("cv"))
    val seeds = queries.select(col("query_id"))
      .crossJoin(broadcast(entries.select(col("neighbor_id"))))
    beamWalk(queries, corpus, edges, seeds, BeamRounds)
  }

  private def serveGraphWalkFrom(s: org.apache.spark.sql.SparkSession,
      dir: String, edges: DataFrame, entries: DataFrame, k: Int)
      : DataFrame =
    topKOf(walkVisited(s, dir, edges, entries), k)

  /** [[serveGraphWalkFrom]] with seeds picked from the corpus by a
    * predicate (the delete entry excludes tombstoned entries). */
  private def serveGraphWalk(s: org.apache.spark.sql.SparkSession,
      dir: String, edges: DataFrame,
      entryFilter: org.apache.spark.sql.Column, k: Int): DataFrame =
    serveGraphWalkFrom(s, dir, edges,
      Tables.df(s, dir, "embeddings")
        .select(col("vec_id").as("neighbor_id"))
        .filter(entryFilter),
      k)

  def graphBeamTopK(s: org.apache.spark.sql.SparkSession, dir: String,
      k: Int): DataFrame =
    serveGraphWalk(s, dir, sharedNeighborGraph(s, dir),
      defaultEntryFilter, k)

  private val beamDotPv =
    "list_sum(list_transform(range(1, len(e.v) + 1), i -> p.pv[i] * e.v[i]))"

  /** Shared oracle prelude: planes, raw vectors, per-table buckets,
    * unit vectors. */
  private def beamPreludeSql: String =
    s"""with p(tbl, bitval, pv) as (values
       |    $planeRowsSql),
       |e as (select vec_id, embedding::DOUBLE[] as v from embeddings),
       |keys as materialized (
       |  select e.vec_id, p.tbl,
       |    sum(case when $beamDotPv >= 0 then p.bitval else 0 end) as bucket
       |  from e cross join p group by e.vec_id, p.tbl),
       |u as materialized ($sqlUnit)""".stripMargin

  /** Graph-build fragment (cand → per-node top-M → symmetrize → cap
    * 2M), CTE names prefixed so the layered oracle can build two
    * graphs in one chain. */
  private def graphBuildSql(p: String, keysRel: String): String =
    s"""${p}cand as materialized (
       |  select distinct a.vec_id as src, b.vec_id as dst
       |  from $keysRel a join $keysRel b
       |    on a.tbl = b.tbl and a.bucket = b.bucket
       |  where a.vec_id <> b.vec_id),
       |${p}knn as materialized (
       |  select src, dst, cos from (
       |    select ${p}cand.src, ${p}cand.dst, ${sqlDotU("us", "ud")} as cos,
       |      row_number() over (partition by ${p}cand.src
       |        order by ${sqlDotU("us", "ud")} desc, ${p}cand.dst) as rn
       |    from ${p}cand join u us on us.vec_id = ${p}cand.src
       |              join u ud on ud.vec_id = ${p}cand.dst) t
       |  where rn <= $GraphM),
       |${p}sym as materialized (
       |  select src, dst, cos from ${p}knn
       |  union
       |  select dst as src, src as dst, cos from ${p}knn),
       |${p}edges as materialized (
       |  select src, dst from (
       |    select src, dst, row_number() over (partition by src
       |        order by cos desc, dst) as rn2 from ${p}sym) t
       |  where rn2 <= ${2 * GraphM})""".stripMargin

  /** Unrolled beam rounds continuing from `<p>v0` over `edgesRel`:
    * each round expand / anti-visit / score / union, MATERIALIZED
    * (the iterative-oracle rule). Ends at `<p>v$rounds`. */
  private def beamRoundsSql(p: String, edgesRel: String,
      rounds: Int): String =
    (1 to rounds).map { r =>
      s"""${p}x$r as materialized (
         |  select distinct b.query_id, ed.dst as neighbor_id
         |  from (select *, row_number() over (partition by query_id
         |          order by cos desc, neighbor_id) as rn from ${p}v${r - 1}) b
         |  join $edgesRel ed on ed.src = b.neighbor_id
         |  where b.rn <= $BeamWidth and ed.dst <> b.query_id),
         |${p}n$r as materialized (
         |  select x.query_id, x.neighbor_id, ${sqlDotU("uq", "uc")} as cos
         |  from ${p}x$r x join u uq on uq.vec_id = x.query_id
         |             join u uc on uc.vec_id = x.neighbor_id
         |  where not exists (select 1 from ${p}v${r - 1} v
         |    where v.query_id = x.query_id
         |      and v.neighbor_id = x.neighbor_id)),
         |${p}v$r as materialized (
         |  select * from ${p}v${r - 1} union all select * from ${p}n$r),
         |""".stripMargin
    }.mkString

  private def beamFinalSql(visitedRel: String): String =
    s"""fin as (select *, cast(row_number() over (partition by query_id
       |    order by cos desc, neighbor_id) as bigint) as rnk
       |  from $visitedRel)
       |select query_id, neighbor_id, rnk, round(cos, 6) as cos_sim
       |from fin where rnk <= $TopK
       |order by query_id, rnk""".stripMargin

  /** The identical walk in DuckDB: graph build (bucket join → per-node
    * top-M), then [[BeamRounds]] unrolled rounds. */
  private def graphBeamOracle: String =
    s"""$beamPreludeSql,
       |${graphBuildSql("", "keys")},
       |q as (select vec_id as query_id, u from u where vec_id < $NumQueries),
       |v0 as materialized (
       |  select q.query_id, c.vec_id as neighbor_id,
       |    ${sqlDotU("q", "c")} as cos
       |  from q cross join u c
       |  where c.vec_id >= $NumQueries
       |    and c.vec_id < ${NumQueries + GraphEntryPoints}),
       |${beamRoundsSql("", "edges", BeamRounds)}${beamFinalSql(s"v$BeamRounds")}"""
      .stripMargin

  val annGraphBeam: Q = Q.df("ann_graph_beam", graphBeamOracle) { (s, dir) =>
    graphBeamTopK(s, dir, TopK).orderBy(col("query_id"), col("rnk"))
  }

  /** FILTERED graph search — [[annFiltered]]'s query shape served from
    * the NSW graph: the walk routes through EVERY node (pre-filtering
    * the graph would fragment its connectivity — the reason production
    * filtered-HNSW routes through non-matching nodes and filters at
    * candidate emission), and only the visited set is restricted to
    * the metadata predicate before the final top-k, so k re-ranks
    * densely over matching neighbors. Same `label % 2 = 0` predicate
    * as the IVF filtered entry — the serving-feature matrix now covers
    * both index families. At very low predicate selectivity the beam
    * should widen with 1/selectivity (ACORN-style) to keep k full;
    * at this fixture's ~0.5 the standard beam suffices (spec-checked
    * by the oracle's full-k output). */
  def graphFilteredTopK(s: org.apache.spark.sql.SparkSession, dir: String,
      k: Int): DataFrame = {
    val emb = Tables.df(s, dir, "embeddings")
    val visited = walkVisited(s, dir, sharedNeighborGraph(s, dir),
      emb.select(col("vec_id").as("neighbor_id")).filter(defaultEntryFilter))
    val allowed = emb.filter(filteredPred)
      .select(col("vec_id").as("neighbor_id"))
    topKOf(visited.join(allowed, Seq("neighbor_id")), k)
  }

  private def graphFilteredOracle: String =
    s"""$beamPreludeSql,
       |${graphBuildSql("", "keys")},
       |q as (select vec_id as query_id, u from u where vec_id < $NumQueries),
       |v0 as materialized (
       |  select q.query_id, c.vec_id as neighbor_id,
       |    ${sqlDotU("q", "c")} as cos
       |  from q cross join u c
       |  where c.vec_id >= $NumQueries
       |    and c.vec_id < ${NumQueries + GraphEntryPoints}),
       |${beamRoundsSql("", "edges", BeamRounds)}fv as (
       |  select v.* from v$BeamRounds v
       |  join embeddings em on em.vec_id = v.neighbor_id
       |  where em.$sqlFilteredPred),
       |${beamFinalSql("fv")}""".stripMargin

  val annGraphFiltered: Q = Q.df("ann_graph_filtered", graphFilteredOracle) {
    (s, dir) =>
      graphFilteredTopK(s, dir, TopK).orderBy(col("query_id"), col("rnk"))
  }

  // ---- hierarchical (HNSW-style) two-layer beam search ---------------------

  /** Upper-layer membership: every 8th vector — the deterministic
    * stand-in for HNSW's geometric level draw (expected 1/8 of nodes
    * on layer 1, none higher at fixture scale). */
  val LayerMod = 8

  /** Fixed layer-1 entry nodes (the first layer-1 ids past the query
    * range — present at every fixture scale). */
  val L1Entries: Seq[Long] = Seq(16L, 24L, 32L, 40L)

  /** Layer-1 walk rounds (the coarse route-to-region phase). */
  val L1Rounds = 2

  private val layerCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), DataFrame](
      graft.plans.Checkpoints.free)

  /** Layer-1 neighbor graph: the same bounded build over ONLY the
    * layer-1 nodes (the LSH key kernel runs on the filtered eighth of
    * the corpus — pushdown prunes before the kernel). */
  private[graft] def sharedLayerGraph(
      s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    layerCache.once((s, dir))(graft.plans.Checkpoints.materialize(
      neighborGraph(Tables.df(s, dir, "embeddings")
        .filter(col("vec_id") % LayerMod === 0))))

  /** HNSW-style hierarchical search: a SHORT walk on the sparse upper
    * layer routes each query to its region (2 rounds over the 1/8
    * graph), and the top-[[GraphEntryPoints]] of that walk seed the
    * full layer-0 beam — replacing the flat entry's FIXED global entry
    * points with query-adaptive ones. This is exactly why HNSW layers
    * exist: entry quality, not candidate volume. Work adds q·B·M·2 on
    * a graph 1/8 the size; everything stays deterministic, so the
    * oracle chains the two walks (two graph builds, two unrolled
    * round chains) and hash-verifies the whole hierarchy. */
  /** The two-layer walk over ARBITRARY edge relations and layer-1
    * entry list — shared by the in-session entry (memoized graphs) and
    * the persisted entry (stored parquet artifacts). */
  private def hnswLayeredVisited(s: org.apache.spark.sql.SparkSession,
      dir: String, e0: DataFrame, e1: DataFrame,
      entries1: DataFrame): DataFrame = {
    DotProduct.ensureRegistered(s)
    val vecs = sharedUnitVecs(s, dir)
    val queries = vecs.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("u").as("qv"))
    val corpus = vecs.select(col("vec_id").as("neighbor_id"), col("u").as("cv"))
    val seeds1 = queries.select(col("query_id"))
      .crossJoin(broadcast(entries1.select(col("neighbor_id"))))
    val v1 = beamWalk(queries, corpus, e1, seeds1, L1Rounds)
    val seeds0 = v1
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rn") <= GraphEntryPoints)
      .select(col("query_id"), col("neighbor_id"))
    val v0 = beamWalk(queries, corpus, e0, seeds0, BeamRounds)
    // beamWalk materialized score(seeds0) eagerly, so the layer-1
    // visited set can be released before the result is consumed
    graft.plans.Checkpoints.free(v1)
    v0
  }

  private def hnswLayeredWalk(s: org.apache.spark.sql.SparkSession,
      dir: String, e0: DataFrame, e1: DataFrame, entries1: DataFrame,
      k: Int): DataFrame =
    topKOf(hnswLayeredVisited(s, dir, e0, e1, entries1), k)

  def hnswLayeredTopK(s: org.apache.spark.sql.SparkSession, dir: String,
      k: Int): DataFrame =
    hnswLayeredWalk(s, dir,
      sharedNeighborGraph(s, dir), sharedLayerGraph(s, dir),
      Tables.df(s, dir, "embeddings")
        .select(col("vec_id").as("neighbor_id"))
        .filter(col("neighbor_id").isin(L1Entries: _*)),
      k)

  private def hnswLayeredOracle: String =
    s"""$beamPreludeSql,
       |keys1 as materialized (
       |  select * from keys where vec_id % $LayerMod = 0),
       |${graphBuildSql("", "keys")},
       |${graphBuildSql("l1", "keys1")},
       |q as (select vec_id as query_id, u from u where vec_id < $NumQueries),
       |av0 as materialized (
       |  select q.query_id, c.vec_id as neighbor_id,
       |    ${sqlDotU("q", "c")} as cos
       |  from q cross join u c
       |  where c.vec_id in (${L1Entries.mkString(", ")})),
       |${beamRoundsSql("a", "l1edges", L1Rounds)}bv0 as materialized (
       |  select query_id, neighbor_id, cos from (
       |    select *, row_number() over (partition by query_id
       |      order by cos desc, neighbor_id) as rn from av$L1Rounds) t
       |  where rn <= $GraphEntryPoints),
       |${beamRoundsSql("b", "edges", BeamRounds)}${beamFinalSql(s"bv$BeamRounds")}"""
      .stripMargin

  val annHnswLayered: Q = Q.df("ann_hnsw_layered", hnswLayeredOracle) {
    (s, dir) =>
      hnswLayeredTopK(s, dir, TopK).orderBy(col("query_id"), col("rnk"))
  }

  /** The HIERARCHICAL graph persisted as ONE serving artifact: base
    * edges, upper-layer edges, AND the layer-1 routing entry list —
    * everything a serving fleet mounts (a stored HNSW ships its entry
    * points and all layers, not just layer 0; the flat
    * [[graphIndexRoot]] covered only the base graph). Index size is
    * O(n·M) + O(n·M/[[LayerMod]]) + O(1); the serve stays
    * O(q·B·M·(R₁+R₀)) over id-keyed joins. */
  private val hnswIndexCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), String](
      graft.plans.Scratch.deleteTree)

  private[graft] def hnswIndexRoot(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    hnswIndexCache.once((s, dir)) {
      val root = tempIndexRoot("hnsw")
      sharedNeighborGraph(s, dir)
        .write.mode("overwrite").parquet(s"$root/edges0")
      sharedLayerGraph(s, dir)
        .write.mode("overwrite").parquet(s"$root/edges1")
      // routing entries are model-sized (a handful of ids): one file
      Tables.df(s, dir, "embeddings")
        .select(col("vec_id").as("neighbor_id"))
        .filter(col("neighbor_id").isin(L1Entries: _*))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$root/entries1")
      root
    }

  /** Serve the standard query set ENTIRELY from the stored two-layer
    * artifact — the fresh-process read path for the hierarchical
    * index. The walk is deterministic and long/double columns
    * round-trip parquet exactly, so results are bit-equal to
    * [[hnswLayeredTopK]] and the SAME two-walk unrolled oracle
    * verifies the store+serve round trip; [[graft.GraphIndexSpec]]
    * pins bit-equality and the frozen-file witness directly. */
  val annHnswPersist: Q = Q.df("ann_hnsw_persist", hnswLayeredOracle) {
    (s, dir) =>
      val root = hnswIndexRoot(s, dir)
      hnswLayeredWalk(s, dir,
        s.read.parquet(s"$root/edges0"),
        s.read.parquet(s"$root/edges1"),
        s.read.parquet(s"$root/entries1"),
        TopK)
        .orderBy(col("query_id"), col("rnk"))
  }

  // ---- binary (sign-bit) quantization + Hamming rerank --------------------

  /** Hamming candidate budget before the exact rerank. */
  val HammingCandidates = 50

  /** 1-bit-per-dimension sign codes: bit i set iff v[i] >= 0, packed
    * into two 32-bit words (two words, not one 64-bit code, so neither
    * engine ever shifts into the sign bit — `1::BIGINT << 63` is
    * engine-defined). 64 dims × 8-byte doubles → 16 bytes: a 32×
    * compression whose distance is two XOR+popcounts — the binary
    * quantization modern vector stores run their first-pass scan on. */
  def binaryCodes(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .select(col("vec_id"),
        expr("aggregate(sequence(0, 31), 0L, (acc, i) -> " +
          "acc + if(v[i] >= 0d, shiftleft(1L, i), 0L))").as("h1"),
        expr("aggregate(sequence(32, 63), 0L, (acc, i) -> " +
          "acc + if(v[i] >= 0d, shiftleft(1L, i - 32), 0L))").as("h2"))

  /** Two-stage retrieval: Hamming distance over the 16-byte codes
    * selects [[HammingCandidates]] per query (the cheap scan — at
    * 100 TB this pass reads 1/32 of the raw corpus bytes and the code
    * table is what stays hot), then the exact cosine reranks only the
    * candidates (id-keyed vector fetch). Sign codes, popcounts, and
    * the rerank fold are all exact cross-engine, so unlike LSH/IVF the
    * oracle replays BOTH stages bit-for-bit. */
  def binaryHammingTopK(emb: DataFrame, k: Int): DataFrame =
    binaryHammingFrom(emb.sparkSession, binaryCodes(emb), withUnit(emb), k)

  /** Entry path over the SHARED code table + normalized corpus. */
  private def binaryHammingShared(s: org.apache.spark.sql.SparkSession,
      dir: String, k: Int): DataFrame =
    binaryHammingFrom(s, sharedBinaryCodes(s, dir), sharedUnitVecs(s, dir), k)

  private def binaryHammingFrom(s: org.apache.spark.sql.SparkSession,
      codes: DataFrame, unit: DataFrame, k: Int): DataFrame = {
    DotProduct.ensureRegistered(s)
    val qCodes = codes.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"),
        col("h1").as("q1"), col("h2").as("q2"))
    val cand = codes.select(col("vec_id").as("neighbor_id"),
        col("h1"), col("h2"))
      .crossJoin(broadcast(qCodes))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("hamming",
        (expr("bit_count(h1 ^ q1)") + expr("bit_count(h2 ^ q2)"))
          .cast("long"))
      .withColumn("crn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("hamming"), col("neighbor_id"))))
      .filter(col("crn") <= HammingCandidates)
      .select(col("query_id"), col("neighbor_id"), col("hamming"))
    cand
      .join(broadcast(unit.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), col("u").as("qv"))),
        Seq("query_id"))
      .join(unit.select(col("vec_id").as("neighbor_id"), col("u").as("cv")),
        Seq("neighbor_id"))
      .withColumn("cos", cosExpr(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        round(col("cos"), 6).as("cos_sim"), col("hamming"))
  }

  private def binaryHammingOracle: String =
    s"""with e as (select vec_id, embedding::DOUBLE[] as v from embeddings),
       |codes as materialized (
       |  select vec_id,
       |    cast(list_sum(list_transform(range(1, 33), i ->
       |      case when v[i] >= 0 then (1::BIGINT << (i - 1))
       |           else 0::BIGINT end)) as bigint) as h1,
       |    cast(list_sum(list_transform(range(33, 65), i ->
       |      case when v[i] >= 0 then (1::BIGINT << (i - 33))
       |           else 0::BIGINT end)) as bigint) as h2
       |  from e),
       |cand as materialized (
       |  select q.vec_id as query_id, c.vec_id as neighbor_id,
       |    cast(bit_count(xor(c.h1, q.h1))
       |       + bit_count(xor(c.h2, q.h2)) as bigint) as hamming
       |  from codes q join codes c on q.vec_id <> c.vec_id
       |  where q.vec_id < $NumQueries),
       |topc as materialized (
       |  select query_id, neighbor_id, hamming from (
       |    select *, row_number() over (partition by query_id
       |      order by hamming, neighbor_id) as crn from cand) t
       |  where crn <= $HammingCandidates),
       |u as ($sqlUnit),
       |pairs as (
       |  select topc.query_id, topc.neighbor_id, topc.hamming,
       |    ${sqlDotU("uq", "uc")} as cos
       |  from topc join u uq on uq.vec_id = topc.query_id
       |            join u uc on uc.vec_id = topc.neighbor_id)
       |select query_id, neighbor_id, rnk, round(cos, 6) as cos_sim, hamming
       |from (select *, cast(row_number() over (partition by query_id
       |        order by cos desc, neighbor_id) as bigint) as rnk
       |      from pairs) t
       |where rnk <= $TopK
       |order by query_id, rnk""".stripMargin

  val annBinaryHamming: Q = Q.df("ann_binary_hamming", binaryHammingOracle) {
    (s, dir) =>
      binaryHammingShared(s, dir, TopK)
        .orderBy(col("query_id"), col("rnk"))
  }

  // ---- scalar (int8) quantization + asymmetric rerank ---------------------

  /** Candidate budget of the int8 first pass before the exact rerank. */
  val SqCandidates = 50

  /** SCALAR-QUANTIZED (SQ8) serving — the third compression point in
    * the taxonomy, between raw floats and PQ/binary: each unit vector
    * stores 64 int8 codes + one scale (max-abs symmetric grid, the
    * `embed_quantize_int8` transform made a SERVING pass), an 8×
    * compression whose first-pass score is the ASYMMETRIC distance
    * scale·Σ qᵢ·codeᵢ — the float query never quantizes, which is why
    * SQ8 loses almost no recall (only the corpus side rounds). Top
    * [[SqCandidates]] per query then pay the exact rerank. Codes are
    * exact integers, the dot folds in index order, and the one scale
    * multiply comes last, so every approx score is bit-identical
    * cross-engine and the ORACLE REPLAYS the quantized scan itself. */
  def sqTopK(emb: DataFrame, k: Int): DataFrame = {
    val unit = withUnit(emb)
    val codes = unit
      .withColumn("m", array_max(transform(col("u"), x => abs(x))))
      .select(col("vec_id").as("neighbor_id"),
        transform(col("u"),
          x => floor(x * lit(127.0d) / col("m") + lit(0.5d))).as("qv"),
        (col("m") / lit(127.0d)).as("scale"))
    sqTopKFrom(emb.sparkSession, codes, unit, k)
  }

  /** Entry path: the flat SQ8 scan over the SHARED code table (the
    * [[ivfSqEncode]] kernel's output with the cell ignored — the
    * kernel's codes are bit-equal to the declarative encode above, as
    * the shared ivfsq oracle CTE already proves) and the shared
    * normalized corpus for the exact rerank. */
  private def sqTopKShared(s: org.apache.spark.sql.SparkSession,
      dir: String, k: Int): DataFrame =
    sqTopKFrom(s,
      sharedSqCodes(s, dir).select(col("neighbor_id"), col("qv"),
        col("scale")),
      sharedUnitVecs(s, dir), k)

  private def sqTopKFrom(s: org.apache.spark.sql.SparkSession,
      codes: DataFrame, unit: DataFrame, k: Int): DataFrame = {
    DotProduct.ensureRegistered(s)
    val queries = unit.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("u").as("qu"))
    val cand = codes
      .crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("approx", col("scale") *
        aggregate(zip_with(col("qv"), col("qu"), (c, q) => c * q),
          lit(0.0d), (a, x) => a + x))
      .withColumn("crn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("approx").desc, col("neighbor_id"))))
      .filter(col("crn") <= SqCandidates)
      .select(col("query_id"), col("neighbor_id"), col("approx"))
    cand
      .join(broadcast(unit.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), col("u").as("qv2"))),
        Seq("query_id"))
      .join(unit.select(col("vec_id").as("neighbor_id"), col("u").as("cv")),
        Seq("neighbor_id"))
      .withColumn("cos", cosExpr(col("qv2"), col("cv")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        round(col("cos"), 6).as("cos_sim"),
        round(col("approx"), 6).as("sq_cos"))
  }

  private def sqOracle: String =
    s"""with u as materialized ($sqlUnit),
       |c8 as materialized (
       |  select vec_id,
       |    list_transform(u, x -> floor(x * 127.0 / m + 0.5)) as qv,
       |    m / 127.0 as scale
       |  from (select vec_id, u,
       |          list_max(list_transform(u, x -> abs(x))) as m
       |        from u) t),
       |q as (select vec_id as query_id, u from u
       |      where vec_id < $NumQueries),
       |ap as materialized (
       |  select q.query_id, c.vec_id as neighbor_id,
       |    c.scale * list_sum(list_transform(range(1, len(q.u) + 1),
       |      i -> c.qv[i] * q.u[i])) as approx
       |  from q cross join c8 c where c.vec_id <> q.query_id),
       |cand as materialized (
       |  select query_id, neighbor_id, approx from (
       |    select *, row_number() over (partition by query_id
       |      order by approx desc, neighbor_id) as crn from ap) t
       |  where crn <= $SqCandidates),
       |pairs as (
       |  select cand.query_id, cand.neighbor_id, cand.approx,
       |    ${sqlDotU("uq", "uc")} as cos
       |  from cand join u uq on uq.vec_id = cand.query_id
       |            join u uc on uc.vec_id = cand.neighbor_id)
       |select query_id, neighbor_id, rnk, round(cos, 6) as cos_sim,
       |  round(approx, 6) as sq_cos
       |from (select *, cast(row_number() over (partition by query_id
       |        order by cos desc, neighbor_id) as bigint) as rnk
       |      from pairs) t
       |where rnk <= $TopK
       |order by query_id, rnk""".stripMargin

  val annSqTopK: Q = Q.df("ann_sq_topk", sqOracle) { (s, dir) =>
    sqTopKShared(s, dir, TopK)
      .orderBy(col("query_id"), col("rnk"))
  }

  // ---- IVF + SQ8 composed (sublinear probes over 8× codes) ----------------

  /** IVF-SQ8 — the FAISS `IVFx,SQ8` shape: the shared trained coarse
    * quantizer restricts candidates to [[NProbe]] probed cells (the
    * [[ivfPqTopK]] composition) while the corpus side exists only as
    * per-cell SQ8 codes (the [[sqTopK]] representation), so a query
    * scores (NProbe/C) of the corpus at 8× compression with the
    * near-exact recall flat SQ8 measured ([[annRecallQuantized]] ≈1.0)
    * minus only the probe loss — the best recall/compression point the
    * taxonomy offers, now sublinear. One encode pass (cell + codes +
    * scale per vector, zero shuffle); candidate generation is the
    * broadcast probe join; the asymmetric scale·Σ qᵢ·codeᵢ first pass
    * feeds the exact top-[[SqCandidates]] rerank. Codes are exact
    * integers and the fold order matches [[sqTopK]]'s, so the ORACLE
    * REPLAYS assignment, probing, the quantized scan, and the rerank
    * bit-for-bit (late-bound trained centroids, as [[ivfOracle]]). */
  def ivfSqTopK(emb: DataFrame, k: Int, dir: String): DataFrame = {
    val cm = trainedCentroids(emb, dir)
    lastTrained = cm
    // shared encode + shared normalized corpus for the exact rerank
    ivfSqServe(emb, k, cm, sharedSqCodes(emb.sparkSession, dir),
      unitOpt = Some(sharedUnitVecs(emb.sparkSession, dir)))
  }

  /** One encode pass: cell id + 64 int8 codes + one scale per vector
    * (zero shuffle — the write's partitioning is the scan's). */
  private[graft] def ivfSqEncode(emb: DataFrame,
      cm: Array[Array[Double]]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    withUnit(emb).as[(Long, Array[Double])]
      .map { case (id, u) =>
        val m = u.map(math.abs).max
        (id, nearestCentroids(u, 1, cm)(0),
          u.map(x => math.floor(x * 127.0 / m + 0.5)), m / 127.0)
      }
      .toDF("neighbor_id", "cid", "qv", "scale")
  }

  /** The probed asymmetric scan + exact rerank over an ARBITRARY codes
    * relation — shared by the in-session entry and the persisted one
    * (the codes side may be freshly encoded or read back from the
    * stored artifact). */
  private[graft] def ivfSqServe(emb: DataFrame, k: Int,
      cm: Array[Array[Double]], codes: DataFrame,
      unitOpt: Option[DataFrame] = None): DataFrame = {
    val spark = emb.sparkSession
    DotProduct.ensureRegistered(spark)
    import spark.implicits._
    // queries: raw unit vectors (ADC is asymmetric) × probed cells —
    // built as a LOCAL relation from the collected query batch
    val batch = collectedQueryBatch(emb)
    val probed = batch
      .flatMap { case (_, u) => nearestCentroids(u, NProbe, cm) }
      .distinct.sorted
    val queries = batch.flatMap { case (id, u) =>
      nearestCentroids(u, NProbe, cm).map(c => (id, c, u))
    }.toDF("query_id", "cid", "qu")
    // the probed-cell predicate reaches the codes relation BEFORE the
    // join: on a stored (cell-partitioned) code table it is a partition
    // filter — the scan reads only probed cells' files; on a fresh
    // encode it is a cheap row filter
    val cand = codes.filter(col("cid").isInCollection(probed))
      .join(broadcast(queries), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("approx", col("scale") *
        aggregate(zip_with(col("qv"), col("qu"), (c, q) => c * q),
          lit(0.0d), (a, x) => a + x))
      .withColumn("crn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("approx").desc, col("neighbor_id"))))
      .filter(col("crn") <= SqCandidates)
      .select(col("query_id"), col("neighbor_id"), col("approx"))
    val u = unitOpt.getOrElse(withUnit(emb))
    cand
      .join(broadcast(u.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), col("u").as("qv2"))),
        Seq("query_id"))
      .join(u.select(col("vec_id").as("neighbor_id"), col("u").as("cv")),
        Seq("neighbor_id"))
      .withColumn("cos", cosExpr(col("qv2"), col("cv")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        round(col("cos"), 6).as("cos_sim"),
        round(col("approx"), 6).as("sq_cos"))
  }

  /** Late-bound IVF-SQ8 oracle: [[sqlAssignProbeCtes]] (shared with
    * IVF/IVFPQ) composed with [[sqOracle]]'s encode CTE, the probed
    * quantized scan, and the exact rerank tail. */
  private def ivfSqOracle: String =
    ivfSqOracleFor(Option(lastTrained).getOrElse(initCentroids))

  /** [[ivfSqOracle]] rendered against an EXPLICIT centroid matrix and
    * an optional candidate predicate — the lifecycle entries embed
    * their own (stored / base-trained) model and tombstone filter. */
  private def ivfSqOracleFor(cm: Array[Array[Double]],
      candidateWhere: String = ""): String = {
    s"""with ${sqlCentroidValues(cm)},
       |e as ($sqlUnit),
       |$sqlAssignProbeCtes,
       |c8 as materialized (
       |  select vec_id,
       |    list_transform(u, x -> floor(x * 127.0 / m + 0.5)) as qv,
       |    m / 127.0 as scale
       |  from (select vec_id, u,
       |          list_max(list_transform(u, x -> abs(x))) as m
       |        from e) t),
       |ap as materialized (
       |  select p.vec_id as query_id, c8.vec_id as neighbor_id,
       |    c8.scale * list_sum(list_transform(range(1, len(p.u) + 1),
       |      i -> c8.qv[i] * p.u[i])) as approx
       |  from probes p
       |  join assign a on a.cid = p.cid
       |  join c8 on c8.vec_id = a.vec_id
       |  where a.vec_id <> p.vec_id$candidateWhere),
       |cand as materialized (
       |  select query_id, neighbor_id, approx from (
       |    select *, row_number() over (partition by query_id
       |      order by approx desc, neighbor_id) as crn from ap) t
       |  where crn <= $SqCandidates),
       |pairs as (
       |  select cand.query_id, cand.neighbor_id, cand.approx,
       |    ${sqlDotU("uq", "uc")} as cos
       |  from cand join e uq on uq.vec_id = cand.query_id
       |            join e uc on uc.vec_id = cand.neighbor_id)
       |select query_id, neighbor_id, rnk, round(cos, 6) as cos_sim,
       |  round(approx, 6) as sq_cos
       |from (select *, cast(row_number() over (partition by query_id
       |        order by cos desc, neighbor_id) as bigint) as rnk
       |      from pairs) t
       |where rnk <= $TopK
       |order by query_id, rnk""".stripMargin
  }

  val annIvfSq: Q = Q.df("ann_ivfsq_topk", ivfSqOracle) { (s, dir) =>
    ivfSqTopK(Tables.df(s, dir, "embeddings"), TopK, dir)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** The IVF-SQ8 index PERSISTED as a servable artifact: the trained
    * centroid table + the encoded corpus (cell, 64 int8 codes, scale —
    * 8×-compressed, the corpus-sized piece) as parquet under a
    * memoized temp root, the [[writeIndex]] discipline for the SQ
    * family. Serving reads BOTH back (models from the model table, not
    * memory — the fresh-process read path); int codes and doubles
    * round-trip parquet exactly, so stored serve ≡ in-memory serve
    * bit-for-bit and the SAME late-bound oracle verifies the round
    * trip. [[graft.SimilaritySpec]] pins bit-equality + frozen files. */
  private val ivfsqIndexCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), String](
      graft.plans.Scratch.deleteTree)

  private[graft] def ivfsqIndexRoot(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    ivfsqIndexCache.once((s, dir)) {
      val root = tempIndexRoot("ivfsq")
      val emb = Tables.df(s, dir, "embeddings")
      val cm = trainedCentroids(emb, dir)
      import s.implicits._
      cm.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
        .toDF("cid", "cv").coalesce(1)
        .write.mode("overwrite").parquet(s"$root/centroids")
      ivfSqEncode(emb, cm).write.mode("overwrite").partitionBy("cid")
        .parquet(s"$root/codes")
      root
    }

  /** Distinct probed cells of the standard query batch against the
    * centroid table stored at `root` — spec support: the expected
    * `selectedPartitions` count of a pruned code-table scan
    * ([[graft.AnnIndexLayoutSpec]]). Query-batch-sized. */
  private[graft] def probedCellsOf(s: org.apache.spark.sql.SparkSession,
      dir: String, root: String): Seq[Int] = {
    import s.implicits._
    val cm = readCentroids(s, root)
    withUnit(Tables.df(s, dir, "embeddings")
        .filter(col("vec_id") < NumQueries))
      .as[(Long, Array[Double])]
      .flatMap { case (_, u) => nearestCentroids(u, NProbe, cm).iterator }
      .distinct().collect().toSeq.sorted
  }

  /** Stored centroid table read back (sorted by cid — doubles
    * round-trip parquet exactly, the [[readModels]] discipline). */
  private[graft] def readCentroids(s: org.apache.spark.sql.SparkSession,
      root: String): Array[Array[Double]] = {
    import s.implicits._
    s.read.parquet(s"$root/centroids")
      .select(col("cid"), col("cv")).as[(Int, Array[Double])]
      .collect().sortBy(_._1).map(_._2)
  }

  val annIvfSqPersist: Q = Q.df("ann_ivfsq_persist", ivfSqOracle) {
    (s, dir) =>
      val root = ivfsqIndexRoot(s, dir)
      val cm = readCentroids(s, root)
      lastTrained = cm
      ivfSqServe(Tables.df(s, dir, "embeddings"), TopK, cm,
        s.read.parquet(s"$root/codes"),
        unitOpt = Some(sharedUnitVecs(s, dir)))
        .orderBy(col("query_id"), col("rnk"))
  }

  /** Tombstone-delete on the stored IVF-SQ8 index: deleted vectors'
    * code rows are excluded BEFORE list probing (the [[annIndexDelete]]
    * semantics — pre-filter, k stays full, artifact untouched, O(1) at
    * write time). */
  val annIvfSqDelete: Q = Q.df(
    "ann_ivfsq_delete",
    ivfSqOracleFor(Option(lastTrained).getOrElse(initCentroids),
      s" and a.vec_id % 7 <> $AnnDeleteMod")) { (s, dir) =>
    val root = ivfsqIndexRoot(s, dir)
    val cm = readCentroids(s, root)
    lastTrained = cm
    ivfSqServe(Tables.df(s, dir, "embeddings"), TopK, cm,
      s.read.parquet(s"$root/codes")
        .filter(col("neighbor_id") % 7 =!= AnnDeleteMod),
      unitOpt = Some(sharedUnitVecs(s, dir)))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Compacted IVF-SQ8 root: code table rewritten without tombstoned
    * rows, centroids copied by exact parquet round trip — the OPTIMIZE
    * fold, [[compactIndexRoot]]'s economics on the SQ family. */
  private val ivfsqCompactCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), String](
      graft.plans.Scratch.deleteTree)

  private[graft] def ivfsqCompactRoot(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    ivfsqCompactCache.once((s, dir)) {
      val full = ivfsqIndexRoot(s, dir)
      val root = tempIndexRoot("ivfsqcompact")
      s.read.parquet(s"$full/centroids").coalesce(1)
        .write.mode("overwrite").parquet(s"$root/centroids")
      s.read.parquet(s"$full/codes")
        .filter(col("neighbor_id") % 7 =!= AnnDeleteMod)
        .write.mode("overwrite").partitionBy("cid").parquet(s"$root/codes")
      root
    }

  /** Serve from the COMPACTED IVF-SQ8 index, no tombstone predicate
    * anywhere — oracle is [[annIvfSqDelete]]'s, so compact-then-serve
    * ≡ tombstone-filtered-serve is hash-verified. */
  val annIvfSqCompact: Q = Q.df(
    "ann_ivfsq_compact",
    ivfSqOracleFor(Option(lastTrained).getOrElse(initCentroids),
      s" and a.vec_id % 7 <> $AnnDeleteMod")) { (s, dir) =>
    val root = ivfsqCompactRoot(s, dir)
    val cm = readCentroids(s, root)
    lastTrained = cm
    ivfSqServe(Tables.df(s, dir, "embeddings"), TopK, cm,
      s.read.parquet(s"$root/codes"),
      unitOpt = Some(sharedUnitVecs(s, dir)))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Base-trained centroids of the SQ incremental entry's late-bound
    * oracle (the [[lastBaseCm]] contract for this family). */
  @volatile private var lastIvfSqBaseCm: Array[Array[Double]] = null

  /** Frozen SQ base index: centroids trained on the corpus MINUS the
    * mod-[[AnnBatchMod]] batch, base slice encoded and stored. */
  private val ivfsqBaseCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), String](
      graft.plans.Scratch.deleteTree)

  private[graft] def ivfsqBaseRoot(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    ivfsqBaseCache.once((s, dir)) {
      val root = tempIndexRoot("ivfsqbase")
      val base = Tables.df(s, dir, "embeddings")
        .filter(col("vec_id") % 10 =!= AnnBatchMod)
      val cm = trainCentroids(base)
      import s.implicits._
      cm.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
        .toDF("cid", "cv").coalesce(1)
        .write.mode("overwrite").parquet(s"$root/centroids")
      ivfSqEncode(base, cm).write.mode("overwrite").partitionBy("cid")
        .parquet(s"$root/codes")
      root
    }

  /** Incremental add without retrain: the incoming batch encodes
    * against the STORED base-trained centroids (read back, frozen —
    * per-batch work is one encode pass over the batch; the per-vector
    * SQ scale is self-contained, so SQ has no other model to freeze)
    * and serving unions stored ∪ batch codes. The oracle embeds the
    * base-trained centroids and encodes the WHOLE corpus against them
    * — exactly what stored-base ∪ encoded-batch amounts to, so
    * frozen-model ingestion is hash-verified, not asserted. */
  val annIvfSqIncremental: Q = Q.df(
    "ann_ivfsq_incremental",
    ivfSqOracleFor(Option(lastIvfSqBaseCm).getOrElse(initCentroids))) {
    (s, dir) =>
      val root = ivfsqBaseRoot(s, dir)
      val cm = readCentroids(s, root)
      lastIvfSqBaseCm = cm
      val batch = ivfSqEncode(Tables.df(s, dir, "embeddings")
        .filter(col("vec_id") % 10 === AnnBatchMod), cm)
      ivfSqServe(Tables.df(s, dir, "embeddings"), TopK, cm,
        s.read.parquet(s"$root/codes").unionByName(batch),
        unitOpt = Some(sharedUnitVecs(s, dir)))
        .orderBy(col("query_id"), col("rnk"))
  }

  /** Late-bound oracle + model hook for the STREAMING IVF-SQ8 ingest
    * entry (the runtime drive lives in
    * [[graft.streaming.EventsStream.runAnnAppendStream]]; the oracle
    * must live here with the models). Same contract as
    * [[annIvfSqIncremental]]: the base-trained centroids encode the
    * whole corpus. */
  private[graft] def ivfSqBaseOracle: String =
    ivfSqOracleFor(Option(lastIvfSqBaseCm).getOrElse(initCentroids))

  private[graft] def noteIvfSqBaseCm(cm: Array[Array[Double]]): Unit =
    lastIvfSqBaseCm = cm

  /** STREAMING segment ingestion for the stored IVF-SQ8 index — the
    * [[graft.streaming.EventsStream]] runtime driving
    * [[ivfSqEncode]]-per-micro-batch appends against the FROZEN
    * stored base (the `stream_index_append` discipline on the vector
    * family): each admitted file's batch encodes against the stored
    * base-trained centroids into its own cell-partitioned delta
    * segment (replay-guarded), and serving unions base ∪ segments
    * through the probed-cell-pruned [[ivfSqServe]]. Results are
    * bit-equal to [[annIvfSqIncremental]] (same rows, same ranking
    * keys — union order is irrelevant under the deterministic
    * tie-break), so the SAME late-bound oracle verifies the streamed
    * ingest end to end. */
  val annIvfSqStream: Q = Q.df(
    "stream_ann_append",
    ivfSqOracleFor(Option(lastIvfSqBaseCm).getOrElse(initCentroids))) {
    (s, dir) =>
      graft.streaming.EventsStream.runAnnAppendStream(s, dir)
        .orderBy(col("query_id"), col("rnk"))
  }

  /** Recall@k audit for the QUANTIZED serving family (SQ8 + binary) —
    * the [[annRecall]] discipline extended to the compression points
    * it didn't cover: overlap of each method's top-k with the exact
    * top-k, per query, as oracle-checked data. The numbers document
    * the compression/recall trade the taxonomy claims: 8× SQ8 should
    * sit near 1.0 (only the corpus side rounds), 32× sign-bit codes
    * lower — measured, not asserted ([[graft.SimilaritySpec]] gates
    * the ordering). */
  val annRecallQuantized: Q = Q.df(
    "ann_recall_quantized", {
      s"""with exact as (select query_id, neighbor_id
         |  from ($bruteForceOracle) t),
         |sqk as (select query_id, neighbor_id from ($sqOracle) t),
         |bink as (select query_id, neighbor_id
         |  from ($binaryHammingOracle) t),
         |ivfsqk as (select query_id, neighbor_id
         |  from ($ivfSqOracle) t)
         |select exact.query_id,
         |  round(cast(sum(case when s.neighbor_id is not null
         |          then 1 else 0 end) as double)
         |    / cast($TopK as double), 6) as sq_recall,
         |  round(cast(sum(case when b.neighbor_id is not null
         |          then 1 else 0 end) as double)
         |    / cast($TopK as double), 6) as bin_recall,
         |  round(cast(sum(case when v.neighbor_id is not null
         |          then 1 else 0 end) as double)
         |    / cast($TopK as double), 6) as ivfsq_recall
         |from exact
         |left join sqk s on s.query_id = exact.query_id
         |  and s.neighbor_id = exact.neighbor_id
         |left join bink b on b.query_id = exact.query_id
         |  and b.neighbor_id = exact.neighbor_id
         |left join ivfsqk v on v.query_id = exact.query_id
         |  and v.neighbor_id = exact.neighbor_id
         |group by exact.query_id
         |order by exact.query_id""".stripMargin
    }) { (s, dir) =>
    val emb = Tables.df(s, dir, "embeddings")
    val keys = Seq("query_id", "neighbor_id")
    // shared-artifact probes (see annRecall)
    val exact = bruteForceTopKShared(s, dir, TopK)
      .select("query_id", "neighbor_id")
    val sq = sqTopKShared(s, dir, TopK).select("query_id", "neighbor_id")
      .withColumn("in_sq", lit(1))
    val bin = binaryHammingShared(s, dir, TopK)
      .select("query_id", "neighbor_id")
      .withColumn("in_bin", lit(1))
    val ivfsq = ivfSqTopK(emb, TopK, dir).select("query_id", "neighbor_id")
      .withColumn("in_ivfsq", lit(1))
    exact
      .join(sq, keys, "left")
      .join(bin, keys, "left")
      .join(ivfsq, keys, "left")
      .groupBy(col("query_id"))
      .agg(
        round(sum(coalesce(col("in_sq"), lit(0))).cast("double")
          / lit(TopK).cast("double"), 6).as("sq_recall"),
        round(sum(coalesce(col("in_bin"), lit(0))).cast("double")
          / lit(TopK).cast("double"), 6).as("bin_recall"),
        round(sum(coalesce(col("in_ivfsq"), lit(0))).cast("double")
          / lit(TopK).cast("double"), 6).as("ivfsq_recall"))
      .orderBy(col("query_id"))
  }

  // ---- stored NSW graph lifecycle: persist / incremental / delete ---------

  /** The neighbor graph persisted as the serving ARTIFACT — a parquet
    * edge table under a memoized temp root (released, dir deleted, on
    * family drain). At 100 TB the graph IS the index: O(n·M) rows, the
    * thing a serving fleet mounts read-only while walks stay
    * O(q·B·M·R); persisting it is what separates an index from a
    * per-session memo. */
  private val graphIndexCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), String](
      graft.plans.Scratch.deleteTree)

  private[graft] def graphIndexRoot(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    graphIndexCache.once((s, dir)) {
      val root = tempIndexRoot("graph")
      sharedNeighborGraph(s, dir)
        .write.mode("overwrite").parquet(s"$root/edges")
      root
    }

  /** BASE graph (corpus minus the incoming batch, vec_id % 10 ≠
    * [[AnnBatchMod]]), stored — the frozen artifact the incremental
    * entry inserts against, the graph twin of [[baseIndexRoot]]'s
    * frozen codebooks. */
  private val graphBaseCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), String](
      graft.plans.Scratch.deleteTree)

  private[graft] def graphBaseRoot(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    graphBaseCache.once((s, dir)) {
      val root = tempIndexRoot("graphbase")
      neighborGraph(Tables.df(s, dir, "embeddings")
          .filter(col("vec_id") % 10 =!= AnnBatchMod))
        .write.mode("overwrite").parquet(s"$root/edges")
      root
    }

  private[graft] def storedGraphEdges(s: org.apache.spark.sql.SparkSession,
      root: String): DataFrame = s.read.parquet(s"$root/edges")

  /** Persisted-graph serving: build once, WRITE the edge table, then
    * answer the standard query set entirely from the stored artifact —
    * the fresh-process read path. The walk is deterministic and long/
    * double columns round-trip parquet exactly, so results are
    * bit-equal to [[graphBeamTopK]] and the SAME unrolled-CTE oracle
    * verifies the store+serve round trip ([[GraphIndexSpec]] pins
    * served-from-store ≡ in-memory directly too). */
  val annGraphPersist: Q = Q.df("ann_graph_persist", graphBeamOracle) {
    (s, dir) =>
      serveGraphWalk(s, dir,
        storedGraphEdges(s, graphIndexRoot(s, dir)),
        defaultEntryFilter, TopK)
        .orderBy(col("query_id"), col("rnk"))
  }

  /** Insert-walk rounds (HNSW's efConstruction beam, kept shorter than
    * the serve walk: neighbors only need to be good, not exhaustive). */
  val InsertRounds = 2

  /** Incremental node insert against the FROZEN stored graph: each new
    * vector beam-searches its own neighbors over the stored base graph
    * (the standard HNSW insert — search first, then link), takes its
    * top-[[GraphM]] visited as links, and serving runs over stored ∪
    * new edges (both directions) with the stored files untouched —
    * per-batch work is O(batch·B·M·R), nothing corpus-sized rebuilds.
    * Batch-parallel inserts link only to the frozen graph (no
    * intra-batch links — the deterministic distributed form; sequential
    * HNSW would let later inserts see earlier ones). The batch is
    * broadcast as the walk's query set: bounded by the INGEST BATCH
    * size by contract (a production batch is model-sized next to the
    * corpus; the fixture's 10% slice stands in for it). The oracle
    * replays the base build, the insert walk, the link selection and
    * the serve walk as one materialized-CTE chain — frozen-graph
    * ingestion hash-verified, not asserted. */
  /** The insert walk's product — each batch node's top-[[GraphM]]
    * links into the frozen base graph — memoized per (session, dir)
    * like the index roots, with [[graft.plans.Checkpoints.free]] as
    * the release: the batch and the base artifact are immutable for a
    * session's lifetime, so re-running the walk per execution (bench
    * warm-ups + samples) only re-derived the identical edge set while
    * leaking each run's localCheckpoint blocks until session end. The
    * cached frame is batch × M rows — ingest-batch-sized, never
    * corpus-sized. */
  private val incrEdgesCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), DataFrame](
      graft.plans.Checkpoints.free)

  /** Run the insert walk fresh (no memo): each batch node
    * beam-searches its neighbors over the frozen stored base, top-M
    * visited become its links. Returns the MATERIALIZED link table
    * (batch × M rows); the caller owns its blocks. */
  private def buildIncrementalEdges(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    DotProduct.ensureRegistered(s)
    val stored = storedGraphEdges(s, graphBaseRoot(s, dir))
    val vecs = sharedUnitVecs(s, dir)
    val corpus = vecs.select(col("vec_id").as("neighbor_id"),
      col("u").as("cv"))
    val batch = vecs.filter(col("vec_id") % 10 === AnnBatchMod)
      .select(col("vec_id").as("query_id"), col("u").as("qv"))
    val iseeds = batch.select(col("query_id"))
      .crossJoin(broadcast(corpus.filter(defaultEntryFilter)
        .select(col("neighbor_id"))))
    val ivisited = beamWalk(batch, corpus, stored, iseeds, InsertRounds)
    val newEdges = graft.plans.Checkpoints.materialize(ivisited
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rn") <= GraphM)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst")))
    graft.plans.Checkpoints.free(ivisited)
    newEdges
  }

  private def incrementalEdges(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    incrEdgesCache.once((s, dir))(buildIncrementalEdges(s, dir))

  /** Serve over stored ∪ new edges (both directions), stored files
    * untouched. */
  private def serveWithInserted(s: org.apache.spark.sql.SparkSession,
      dir: String, newEdges: DataFrame): DataFrame = {
    val stored = storedGraphEdges(s, graphBaseRoot(s, dir))
    val combined = stored
      .unionByName(newEdges)
      .unionByName(newEdges.select(col("dst").as("src"),
        col("src").as("dst")))
    serveGraphWalk(s, dir, combined, defaultEntryFilter, TopK)
      .orderBy(col("query_id"), col("rnk"))
  }

  val annGraphIncremental: Q = Q.df(
    "ann_graph_incremental", graphIncrementalOracle) { (s, dir) =>
    serveWithInserted(s, dir, incrementalEdges(s, dir))
  }

  /** Scale-audit drive: rebuild the insert walk EVERY sample
    * (bypassing the session memo, which exists to amortize serving
    * sessions) so the audited time carries the per-batch insert cost —
    * the O(batch·B·M·R) contract — not just the serve. The fixture's
    * batch is a 10% corpus slice, so batch work scales 10× per decade
    * exactly like the corpus term; a super-linear insert surfaces in
    * the decade-ratio gate. Executes to the noop sink itself so the
    * sample's link-table blocks can be FREED here (the Checkpoints
    * discipline — 9 audit samples of leaked localCheckpoint blocks is
    * the accumulation pattern the Memo drain work exists to prevent). */
  private[graft] def auditIncrementalInsert(
      s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val newEdges = buildIncrementalEdges(s, dir)
    try serveWithInserted(s, dir, newEdges)
      .write.format("noop").mode("overwrite").save()
    finally graft.plans.Checkpoints.free(newEdges)
  }

  /** Tombstone-delete on the stored graph: serve with the tombstone
    * set (vec_id % 7 = [[AnnDeleteMod]], the [[annIndexDelete]]
    * convention) excluded from BOTH edge endpoints and from the entry
    * seeds before the walk — a deleted node is neither routable
    * through nor returnable, the stored artifact never rewrites, and k
    * stays full (survivors re-rank up). Entry id 10 is itself
    * tombstoned at the fixture modulus, so the entry also exercises
    * serving on a reduced seed set. Oracle: the same chain over the
    * tombstone-filtered edge relation. */
  val annGraphDelete: Q = Q.df("ann_graph_delete", graphDeleteOracle) {
    (s, dir) =>
      serveGraphWalk(s, dir,
        storedGraphEdges(s, graphIndexRoot(s, dir))
          .filter(col("src") % 7 =!= AnnDeleteMod &&
            col("dst") % 7 =!= AnnDeleteMod),
        defaultEntryFilter && col("neighbor_id") % 7 =!= AnnDeleteMod,
        TopK)
        .orderBy(col("query_id"), col("rnk"))
  }

  /** Compacted graph root: the stored edge table rewritten WITHOUT
    * edges touching tombstoned nodes, plus the surviving entry-point
    * list — the OPTIMIZE pass [[annGraphDelete]]'s lazy tombstones
    * defer to, completing the graph index's 5-step lifecycle (build →
    * persist → incremental → delete → compact) exactly as
    * [[compactIndexRoot]] did for IVFPQ. The entry list is PART of the
    * artifact (a real graph index ships its entry points with its
    * edges), so serving needs no tombstone predicate anywhere: deleted
    * nodes are physically unroutable and unseedable. Same 100 TB
    * economics as the IVFPQ pass — deletes stay O(1), one background
    * edge-table rewrite reclaims the dead rows and the per-walk
    * filter. */
  private val graphCompactCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), String](
      graft.plans.Scratch.deleteTree)

  private[graft] def graphCompactRoot(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    graphCompactCache.once((s, dir)) {
      val full = graphIndexRoot(s, dir)
      val root = tempIndexRoot("graphcompact")
      s.read.parquet(s"$full/edges")
        .filter(col("src") % 7 =!= AnnDeleteMod &&
          col("dst") % 7 =!= AnnDeleteMod)
        .write.mode("overwrite").parquet(s"$root/edges")
      // the entry list is model-sized (a handful of ids): one file
      Tables.df(s, dir, "embeddings")
        .select(col("vec_id").as("neighbor_id"))
        .filter(defaultEntryFilter && col("neighbor_id") % 7 =!= AnnDeleteMod)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$root/entries")
      root
    }

  /** Serve the standard query set from the COMPACTED graph with no
    * tombstone predicate anywhere — deletion is now physical, and both
    * the edges and the seed entry points come from the stored
    * artifact. The oracle is [[annGraphDelete]]'s (tombstone-filtered
    * edges + seeds), so compact-then-serve ≡ tombstone-filtered-serve
    * is hash-verified end to end; [[GraphIndexSpec]] adds the
    * bit-equality and edge-count-shrink assertions the values can't
    * show. */
  val annGraphCompact: Q = Q.df("ann_graph_compact", graphDeleteOracle) {
    (s, dir) =>
      val root = graphCompactRoot(s, dir)
      serveGraphWalkFrom(s, dir, storedGraphEdges(s, root),
        s.read.parquet(s"$root/entries"), TopK)
        .orderBy(col("query_id"), col("rnk"))
  }

  // ---- incremental insert into the stored TWO-LAYER graph -----------------

  /** Batch modulus for the hierarchical incremental entry. NOT
    * [[AnnBatchMod]] (9): layer-1 eligibility is vec_id % [[LayerMod]]
    * = 0, and 9 (mod 10) ∩ 0 (mod 8) is EMPTY (2k ≡ 7 mod 8 has no
    * solution), so a mod-9 batch could never exercise the upper-layer
    * insert path. With 8, vec_ids ≡ 8 (mod 40) are batch AND
    * layer-eligible — the entry inserts into both layers every run. */
  val HnswBatchMod = 8

  /** Frozen two-layer BASE artifact (corpus minus the mod-
    * [[HnswBatchMod]] batch): both edge tables + the routing entries,
    * the hierarchical twin of [[graphBaseRoot]]. */
  private val hnswBaseCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), String](
      graft.plans.Scratch.deleteTree)

  private[graft] def hnswBaseRoot(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    hnswBaseCache.once((s, dir)) {
      val root = tempIndexRoot("hnswbase")
      val emb = Tables.df(s, dir, "embeddings")
      neighborGraph(emb.filter(col("vec_id") % 10 =!= HnswBatchMod))
        .write.mode("overwrite").parquet(s"$root/edges0")
      neighborGraph(emb.filter(col("vec_id") % 10 =!= HnswBatchMod &&
          col("vec_id") % LayerMod === 0))
        .write.mode("overwrite").parquet(s"$root/edges1")
      emb.select(col("vec_id").as("neighbor_id"))
        .filter(col("neighbor_id").isin(L1Entries: _*))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$root/entries1")
      root
    }

  /** The HNSW insert, faithful to the paper's shape: each batch node
    * ROUTES through the frozen upper layer (the L1 walk from the
    * stored entries) to query-adaptive L0 entry points, beam-searches
    * the frozen base graph from them, and links to its top-[[GraphM]]
    * visited; nodes drawn into layer 1 (vec_id % [[LayerMod]] = 0)
    * additionally search the frozen L1 graph and link there too. Both
    * link tables are batch-sized; the stored artifact is never
    * rewritten; batch-parallel inserts link only to the frozen graphs
    * (the deterministic distributed form, as in the flat entry).
    * Returns the materialized links with a `layer` column. */
  private val hnswIncrCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), DataFrame](
      graft.plans.Checkpoints.free)

  /** The routed HNSW insert over ARBITRARY frozen relations (edge
    * tables, routing entries, batch) — shared by the pristine-base
    * incremental entry and the lifecycle CHAIN (insert onto an
    * already-tombstoned artifact). Returns the materialized links
    * with a `layer` column. */
  private def hnswInsertLinks(s: org.apache.spark.sql.SparkSession,
      dir: String, stored0: DataFrame, stored1: DataFrame,
      entries: DataFrame, batch: DataFrame): DataFrame = {
    DotProduct.ensureRegistered(s)
    val vecs = sharedUnitVecs(s, dir)
    val corpus = vecs.select(col("vec_id").as("neighbor_id"),
      col("u").as("cv"))
    def seedsOf(q: DataFrame): DataFrame = q.select(col("query_id"))
      .crossJoin(broadcast(entries.select(col("neighbor_id"))))
    // route: L1 walk from the stored entries → L0 entry points
    val v1 = beamWalk(batch, corpus, stored1, seedsOf(batch), L1Rounds)
    val seeds0 = v1
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rn") <= GraphEntryPoints)
      .select(col("query_id"), col("neighbor_id"))
    val v0 = beamWalk(batch, corpus, stored0, seeds0, InsertRounds)
    def topLinks(v: DataFrame, layer: Int): DataFrame = v
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rn") <= GraphM)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"),
        lit(layer).as("layer"))
    // layer-1 draw: those batch nodes also search + link the L1 graph
    val batch1 = batch.filter(col("query_id") % LayerMod === 0)
    val v1b = beamWalk(batch1, corpus, stored1, seedsOf(batch1),
      InsertRounds)
    val links = graft.plans.Checkpoints.materialize(
      topLinks(v0, 0).unionByName(topLinks(v1b, 1)))
    Seq(v1, v0, v1b).foreach(graft.plans.Checkpoints.free)
    links
  }

  private[graft] def hnswIncrEdges(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    hnswIncrCache.once((s, dir)) {
      val root = hnswBaseRoot(s, dir)
      val batch = sharedUnitVecs(s, dir)
        .filter(col("vec_id") % 10 === HnswBatchMod)
        .select(col("vec_id").as("query_id"), col("u").as("qv"))
      hnswInsertLinks(s, dir,
        s.read.parquet(s"$root/edges0"),
        s.read.parquet(s"$root/edges1"),
        s.read.parquet(s"$root/entries1"), batch)
    }

  /** Serve the standard query set over frozen-base ∪ freshly-inserted
    * edges on BOTH layers (links symmetrized, stored files untouched)
    * — the hierarchical index keeps accepting nodes without a rebuild,
    * per-batch work O(batch·B·M·R) on each layer it touches. */
  val annHnswIncremental: Q = Q.df(
    "ann_hnsw_incremental", hnswIncrementalOracle) { (s, dir) =>
    val root = hnswBaseRoot(s, dir)
    val links = hnswIncrEdges(s, dir)
    def combined(layer: Int, stored: DataFrame): DataFrame = {
      val n = links.filter(col("layer") === layer)
        .select(col("src"), col("dst"))
      stored.unionByName(n)
        .unionByName(n.select(col("dst").as("src"), col("src").as("dst")))
    }
    hnswLayeredWalk(s, dir,
      combined(0, s.read.parquet(s"$root/edges0")),
      combined(1, s.read.parquet(s"$root/edges1")),
      s.read.parquet(s"$root/entries1"),
      TopK)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Oracle for [[annHnswIncremental]]: both base builds over filtered
    * key sets, the routed L0 insert walk (L1 route → L0 search → top-M
    * links), the L1 insert walk for the layer-eligible batch subset,
    * then the full two-layer serve over the combined edge relations —
    * every visited-set decision of build, insert, and serve replayed
    * and hash-verified. */
  private def hnswIncrementalOracle: String =
    s"""$beamPreludeSql,
       |keysb as materialized (
       |  select * from keys where vec_id % 10 <> $HnswBatchMod),
       |keysb1 as materialized (
       |  select * from keysb where vec_id % $LayerMod = 0),
       |${graphBuildSql("b0", "keysb")},
       |${graphBuildSql("b1", "keysb1")},
       |bq as (select vec_id as query_id, u from u
       |       where vec_id % 10 = $HnswBatchMod),
       |iv0 as materialized (
       |  select bq.query_id, c.vec_id as neighbor_id,
       |    ${sqlDotU("bq", "c")} as cos
       |  from bq cross join u c
       |  where c.vec_id in (${L1Entries.mkString(", ")})),
       |${beamRoundsSql("i", "b1edges", L1Rounds)}jv0 as materialized (
       |  select query_id, neighbor_id, cos from (
       |    select *, row_number() over (partition by query_id
       |      order by cos desc, neighbor_id) as rn from iv$L1Rounds) t
       |  where rn <= $GraphEntryPoints),
       |${beamRoundsSql("j", "b0edges", InsertRounds)}newe0 as materialized (
       |  select query_id as src, neighbor_id as dst from (
       |    select *, row_number() over (partition by query_id
       |      order by cos desc, neighbor_id) as rn from jv$InsertRounds) t
       |  where rn <= $GraphM),
       |kv0 as materialized (
       |  select * from iv0 where query_id % $LayerMod = 0),
       |${beamRoundsSql("k", "b1edges", InsertRounds)}newe1 as materialized (
       |  select query_id as src, neighbor_id as dst from (
       |    select *, row_number() over (partition by query_id
       |      order by cos desc, neighbor_id) as rn from kv$InsertRounds) t
       |  where rn <= $GraphM),
       |all0 as materialized (
       |  select src, dst from b0edges
       |  union all select src, dst from newe0
       |  union all select dst as src, src as dst from newe0),
       |all1 as materialized (
       |  select src, dst from b1edges
       |  union all select src, dst from newe1
       |  union all select dst as src, src as dst from newe1),
       |q as (select vec_id as query_id, u from u where vec_id < $NumQueries),
       |sv0 as materialized (
       |  select q.query_id, c.vec_id as neighbor_id,
       |    ${sqlDotU("q", "c")} as cos
       |  from q cross join u c
       |  where c.vec_id in (${L1Entries.mkString(", ")})),
       |${beamRoundsSql("s", "all1", L1Rounds)}tv0 as materialized (
       |  select query_id, neighbor_id, cos from (
       |    select *, row_number() over (partition by query_id
       |      order by cos desc, neighbor_id) as rn from sv$L1Rounds) t
       |  where rn <= $GraphEntryPoints),
       |${beamRoundsSql("t", "all0", BeamRounds)}${beamFinalSql(s"tv$BeamRounds")}"""
      .stripMargin

  // ---- two-layer lifecycle completion: delete + compact -------------------

  /** Tombstone-delete on the stored TWO-LAYER artifact ([[annGraphDelete]]
    * one level up, closing the r16 lifecycle asymmetry): the tombstone
    * set (vec_id % 7 = [[AnnDeleteMod]]) is excluded from BOTH endpoints
    * of BOTH layers' edge tables and from the layer-1 routing entries
    * before the walk — a deleted node is neither routable in L1 nor
    * returnable from L0 (every served id is an entry seed, an L1 edge
    * dst, or an L0 edge dst — all filtered), the stored files never
    * rewrite, deletes stay O(1). Entry id 24 (≡ 3 mod 7) is itself
    * tombstoned, so the route also runs on a reduced entry set. Oracle:
    * the layered chain over the filtered relations. */
  val annHnswDelete: Q = Q.df("ann_hnsw_delete", hnswDeleteOracle) {
    (s, dir) =>
      val root = hnswIndexRoot(s, dir)
      val live = (c: String) => col(c) % 7 =!= AnnDeleteMod
      hnswLayeredWalk(s, dir,
        s.read.parquet(s"$root/edges0")
          .filter(live("src") && live("dst")),
        s.read.parquet(s"$root/edges1")
          .filter(live("src") && live("dst")),
        s.read.parquet(s"$root/entries1").filter(live("neighbor_id")),
        TopK)
        .orderBy(col("query_id"), col("rnk"))
  }

  /** Compacted two-layer root: BOTH edge tables rewritten without
    * edges touching tombstoned nodes, plus the surviving entry list —
    * the OPTIMIZE pass [[annHnswDelete]]'s lazy tombstones defer to,
    * completing the hierarchical index's lifecycle (build → persist →
    * incremental → delete → compact) exactly as [[graphCompactRoot]]
    * did for the flat graph. Serving mounts the artifact with no
    * tombstone predicate anywhere: deleted nodes are physically
    * unroutable (L1), unreturnable (L0), and unseedable (entries). */
  private val hnswCompactCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), String](
      graft.plans.Scratch.deleteTree)

  private[graft] def hnswCompactRoot(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    hnswCompactCache.once((s, dir)) {
      val full = hnswIndexRoot(s, dir)
      val root = tempIndexRoot("hnswcompact")
      val live = (c: String) => col(c) % 7 =!= AnnDeleteMod
      Seq("edges0", "edges1").foreach { t =>
        s.read.parquet(s"$full/$t")
          .filter(live("src") && live("dst"))
          .write.mode("overwrite").parquet(s"$root/$t")
      }
      s.read.parquet(s"$full/entries1")
        .filter(live("neighbor_id"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$root/entries1")
      root
    }

  /** Serve the standard query set from the COMPACTED two-layer
    * artifact — edges of both layers and the routing entries all come
    * from the store, no tombstone predicate anywhere. The oracle is
    * [[annHnswDelete]]'s, so compact-then-serve ≡ tombstone-filtered-
    * serve is hash-verified end to end; [[graft.GraphIndexSpec]] adds
    * bit-equality, both layers' edge-count shrink, and the
    * full-artifact-untouched witness. */
  val annHnswCompact: Q = Q.df("ann_hnsw_compact", hnswDeleteOracle) {
    (s, dir) =>
      val root = hnswCompactRoot(s, dir)
      hnswLayeredWalk(s, dir,
        s.read.parquet(s"$root/edges0"),
        s.read.parquet(s"$root/edges1"),
        s.read.parquet(s"$root/entries1"),
        TopK)
        .orderBy(col("query_id"), col("rnk"))
  }

  /** FILTERED two-layer search — [[annGraphFiltered]]'s query shape on
    * the hierarchical index: the walk routes through EVERY node on
    * both layers (pre-filtering fragments connectivity — the reason
    * filtered-HNSW engines route through non-matching nodes), and only
    * the visited set is restricted to the metadata predicate before
    * the final top-k. Completes the serving-feature matrix: the
    * predicate now composes with all three index families (IVF, flat
    * NSW, layered HNSW). */
  val annHnswFiltered: Q = Q.df("ann_hnsw_filtered", hnswFilteredOracle) {
    (s, dir) =>
      val emb = Tables.df(s, dir, "embeddings")
      val visited = hnswLayeredVisited(s, dir,
        sharedNeighborGraph(s, dir), sharedLayerGraph(s, dir),
        emb.select(col("vec_id").as("neighbor_id"))
          .filter(col("neighbor_id").isin(L1Entries: _*)))
      val allowed = emb.filter(filteredPred)
        .select(col("vec_id").as("neighbor_id"))
      topKOf(visited.join(allowed, Seq("neighbor_id")), TopK)
        .orderBy(col("query_id"), col("rnk"))
  }

  /** Oracle for [[annHnswFiltered]]: the layered chain with the
    * metadata filter applied to the visited set before the final
    * ranking — both walks replayed unfiltered, exactly the Spark
    * plan's route-everywhere/filter-at-emission semantics. */
  private def hnswFilteredOracle: String =
    s"""$beamPreludeSql,
       |keys1 as materialized (
       |  select * from keys where vec_id % $LayerMod = 0),
       |${graphBuildSql("", "keys")},
       |${graphBuildSql("l1", "keys1")},
       |q as (select vec_id as query_id, u from u where vec_id < $NumQueries),
       |av0 as materialized (
       |  select q.query_id, c.vec_id as neighbor_id,
       |    ${sqlDotU("q", "c")} as cos
       |  from q cross join u c
       |  where c.vec_id in (${L1Entries.mkString(", ")})),
       |${beamRoundsSql("a", "l1edges", L1Rounds)}bv0 as materialized (
       |  select query_id, neighbor_id, cos from (
       |    select *, row_number() over (partition by query_id
       |      order by cos desc, neighbor_id) as rn from av$L1Rounds) t
       |  where rn <= $GraphEntryPoints),
       |${beamRoundsSql("b", "edges", BeamRounds)}fv as (
       |  select v.* from bv$BeamRounds v
       |  join embeddings em on em.vec_id = v.neighbor_id
       |  where em.$sqlFilteredPred),
       |${beamFinalSql("fv")}""".stripMargin

  /** Oracle for [[annHnswDelete]] / [[annHnswCompact]]: the layered
    * chain ([[hnswLayeredOracle]]) with the tombstone filter applied to
    * both layers' edge relations and the entry seeds. */
  private def hnswDeleteOracle: String =
    s"""$beamPreludeSql,
       |keys1 as materialized (
       |  select * from keys where vec_id % $LayerMod = 0),
       |${graphBuildSql("", "keys")},
       |${graphBuildSql("l1", "keys1")},
       |d0 as materialized (
       |  select src, dst from edges
       |  where src % 7 <> $AnnDeleteMod and dst % 7 <> $AnnDeleteMod),
       |d1 as materialized (
       |  select src, dst from l1edges
       |  where src % 7 <> $AnnDeleteMod and dst % 7 <> $AnnDeleteMod),
       |q as (select vec_id as query_id, u from u where vec_id < $NumQueries),
       |av0 as materialized (
       |  select q.query_id, c.vec_id as neighbor_id,
       |    ${sqlDotU("q", "c")} as cos
       |  from q cross join u c
       |  where c.vec_id in (${L1Entries.mkString(", ")})
       |    and c.vec_id % 7 <> $AnnDeleteMod),
       |${beamRoundsSql("a", "d1", L1Rounds)}bv0 as materialized (
       |  select query_id, neighbor_id, cos from (
       |    select *, row_number() over (partition by query_id
       |      order by cos desc, neighbor_id) as rn from av$L1Rounds) t
       |  where rn <= $GraphEntryPoints),
       |${beamRoundsSql("b", "d0", BeamRounds)}${beamFinalSql(s"bv$BeamRounds")}"""
      .stripMargin

  // ---- two-layer lifecycle CHAIN: delete → insert → compact → serve -------

  /** The composed lifecycle the per-stage entries exercise only from a
    * pristine base: the stored two-layer BASE artifact is first
    * tombstoned (vec_id % 7 = [[AnnDeleteMod]], lazy — files
    * untouched), the mod-[[HnswBatchMod]] batch is then inserted ONTO
    * the tombstoned artifact (route and search run over live edges and
    * the reduced entry set, so no new link can point at a deleted
    * node; tombstoned batch members do not insert), and a compaction
    * folds (live base ∪ inserted links, symmetrized) into a fresh
    * chained artifact whose serve carries no tombstone predicate
    * anywhere. The oracle replays the whole chain — base builds,
    * live-filtered insert walks, combined-edge serve — so stage
    * COMPOSITION is hash-verified, not assumed from per-stage greens;
    * [[graft.GraphIndexSpec]] adds the frozen-base witness and the
    * no-dead-endpoint invariant on the chained artifact. */
  private val hnswChainCache =
    new graft.plans.Memo[(org.apache.spark.sql.SparkSession, String), String](
      graft.plans.Scratch.deleteTree)

  private[graft] def hnswChainRoot(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    hnswChainCache.once((s, dir)) {
      val base = hnswBaseRoot(s, dir)
      val root = tempIndexRoot("hnswchain")
      val live = (c: String) => col(c) % 7 =!= AnnDeleteMod
      val live0 = s.read.parquet(s"$base/edges0")
        .filter(live("src") && live("dst"))
      val live1 = s.read.parquet(s"$base/edges1")
        .filter(live("src") && live("dst"))
      val entries = s.read.parquet(s"$base/entries1")
        .filter(live("neighbor_id"))
      val batch = sharedUnitVecs(s, dir)
        .filter(col("vec_id") % 10 === HnswBatchMod &&
          col("vec_id") % 7 =!= AnnDeleteMod)
        .select(col("vec_id").as("query_id"), col("u").as("qv"))
      val links = hnswInsertLinks(s, dir, live0, live1, entries, batch)
      def combined(layer: Int, stored: DataFrame): DataFrame = {
        val n = links.filter(col("layer") === layer)
          .select(col("src"), col("dst"))
        stored.unionByName(n)
          .unionByName(n.select(col("dst").as("src"), col("src").as("dst")))
      }
      combined(0, live0).write.mode("overwrite").parquet(s"$root/edges0")
      combined(1, live1).write.mode("overwrite").parquet(s"$root/edges1")
      entries.coalesce(1).write.mode("overwrite").parquet(s"$root/entries1")
      graft.plans.Checkpoints.free(links)
      root
    }

  val annHnswLifecycleChain: Q = Q.df(
    "ann_hnsw_lifecycle_chain", hnswChainOracle) { (s, dir) =>
    val root = hnswChainRoot(s, dir)
    hnswLayeredWalk(s, dir,
      s.read.parquet(s"$root/edges0"),
      s.read.parquet(s"$root/edges1"),
      s.read.parquet(s"$root/entries1"),
      TopK)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Oracle for [[annHnswLifecycleChain]]: base builds over the
    * batch-less key sets, tombstone-filtered edge relations, the
    * LIVE batch's routed insert walks over them, then the two-layer
    * serve over (live base ∪ inserted links symmetrized) with the
    * reduced entry set — the walk oracle over (frozen ∪ inserted) ∖
    * tombstones, every stage's visited-set decision replayed. */
  private def hnswChainOracle: String =
    s"""$beamPreludeSql,
       |keysb as materialized (
       |  select * from keys where vec_id % 10 <> $HnswBatchMod),
       |keysb1 as materialized (
       |  select * from keysb where vec_id % $LayerMod = 0),
       |${graphBuildSql("b0", "keysb")},
       |${graphBuildSql("b1", "keysb1")},
       |live0 as materialized (
       |  select src, dst from b0edges
       |  where src % 7 <> $AnnDeleteMod and dst % 7 <> $AnnDeleteMod),
       |live1 as materialized (
       |  select src, dst from b1edges
       |  where src % 7 <> $AnnDeleteMod and dst % 7 <> $AnnDeleteMod),
       |bq as (select vec_id as query_id, u from u
       |       where vec_id % 10 = $HnswBatchMod
       |         and vec_id % 7 <> $AnnDeleteMod),
       |iv0 as materialized (
       |  select bq.query_id, c.vec_id as neighbor_id,
       |    ${sqlDotU("bq", "c")} as cos
       |  from bq cross join u c
       |  where c.vec_id in (${L1Entries.mkString(", ")})
       |    and c.vec_id % 7 <> $AnnDeleteMod),
       |${beamRoundsSql("i", "live1", L1Rounds)}jv0 as materialized (
       |  select query_id, neighbor_id, cos from (
       |    select *, row_number() over (partition by query_id
       |      order by cos desc, neighbor_id) as rn from iv$L1Rounds) t
       |  where rn <= $GraphEntryPoints),
       |${beamRoundsSql("j", "live0", InsertRounds)}newe0 as materialized (
       |  select query_id as src, neighbor_id as dst from (
       |    select *, row_number() over (partition by query_id
       |      order by cos desc, neighbor_id) as rn from jv$InsertRounds) t
       |  where rn <= $GraphM),
       |kv0 as materialized (
       |  select * from iv0 where query_id % $LayerMod = 0),
       |${beamRoundsSql("k", "live1", InsertRounds)}newe1 as materialized (
       |  select query_id as src, neighbor_id as dst from (
       |    select *, row_number() over (partition by query_id
       |      order by cos desc, neighbor_id) as rn from kv$InsertRounds) t
       |  where rn <= $GraphM),
       |all0 as materialized (
       |  select src, dst from live0
       |  union all select src, dst from newe0
       |  union all select dst as src, src as dst from newe0),
       |all1 as materialized (
       |  select src, dst from live1
       |  union all select src, dst from newe1
       |  union all select dst as src, src as dst from newe1),
       |q as (select vec_id as query_id, u from u where vec_id < $NumQueries),
       |sv0 as materialized (
       |  select q.query_id, c.vec_id as neighbor_id,
       |    ${sqlDotU("q", "c")} as cos
       |  from q cross join u c
       |  where c.vec_id in (${L1Entries.mkString(", ")})
       |    and c.vec_id % 7 <> $AnnDeleteMod),
       |${beamRoundsSql("s", "all1", L1Rounds)}tv0 as materialized (
       |  select query_id, neighbor_id, cos from (
       |    select *, row_number() over (partition by query_id
       |      order by cos desc, neighbor_id) as rn from sv$L1Rounds) t
       |  where rn <= $GraphEntryPoints),
       |${beamRoundsSql("t", "all0", BeamRounds)}${beamFinalSql(s"tv$BeamRounds")}"""
      .stripMargin

  /** Oracle for [[annGraphIncremental]]: base build over the filtered
    * key set, unrolled insert walk for the batch nodes, top-M link
    * selection, then the serve walk over the combined edges. */
  private def graphIncrementalOracle: String =
    s"""$beamPreludeSql,
       |keysb as materialized (
       |  select * from keys where vec_id % 10 <> $AnnBatchMod),
       |${graphBuildSql("g", "keysb")},
       |bq as (select vec_id as query_id, u from u
       |       where vec_id % 10 = $AnnBatchMod),
       |iv0 as materialized (
       |  select bq.query_id, c.vec_id as neighbor_id,
       |    ${sqlDotU("bq", "c")} as cos
       |  from bq cross join u c
       |  where c.vec_id >= $NumQueries
       |    and c.vec_id < ${NumQueries + GraphEntryPoints}),
       |${beamRoundsSql("i", "gedges", InsertRounds)}newe as materialized (
       |  select query_id as src, neighbor_id as dst from (
       |    select *, row_number() over (partition by query_id
       |      order by cos desc, neighbor_id) as rn from iv$InsertRounds) t
       |  where rn <= $GraphM),
       |alledges as materialized (
       |  select src, dst from gedges
       |  union all select src, dst from newe
       |  union all select dst as src, src as dst from newe),
       |q as (select vec_id as query_id, u from u where vec_id < $NumQueries),
       |sv0 as materialized (
       |  select q.query_id, c.vec_id as neighbor_id,
       |    ${sqlDotU("q", "c")} as cos
       |  from q cross join u c
       |  where c.vec_id >= $NumQueries
       |    and c.vec_id < ${NumQueries + GraphEntryPoints}),
       |${beamRoundsSql("s", "alledges", BeamRounds)}${beamFinalSql(s"sv$BeamRounds")}"""
      .stripMargin

  /** Oracle for [[annGraphDelete]]: the flat-walk chain over the
    * tombstone-filtered edge relation and entry set. */
  private def graphDeleteOracle: String =
    s"""$beamPreludeSql,
       |${graphBuildSql("", "keys")},
       |dedges as materialized (
       |  select src, dst from edges
       |  where src % 7 <> $AnnDeleteMod and dst % 7 <> $AnnDeleteMod),
       |q as (select vec_id as query_id, u from u where vec_id < $NumQueries),
       |v0 as materialized (
       |  select q.query_id, c.vec_id as neighbor_id,
       |    ${sqlDotU("q", "c")} as cos
       |  from q cross join u c
       |  where c.vec_id >= $NumQueries
       |    and c.vec_id < ${NumQueries + GraphEntryPoints}
       |    and c.vec_id % 7 <> $AnnDeleteMod),
       |${beamRoundsSql("", "dedges", BeamRounds)}${beamFinalSql(s"v$BeamRounds")}"""
      .stripMargin

  val queries: Seq[Q] =
    Seq(annBruteForce, dedupEmbeddingCosine, annLsh, annIvf, annRangeSearch,
      annFiltered,
      annPq, annPqRerank,
      annIvfPq, annIndexBuild, annIndexPersist, annIndexIncremental,
      annIndexDelete, annIndexCompact, annRecall,
      annGraphBeam, annGraphFiltered, annHnswLayered, annHnswPersist,
      annHnswIncremental, annHnswDelete, annHnswCompact, annHnswFiltered,
      annHnswLifecycleChain,
      annBinaryHamming, annSqTopK, annIvfSq, annIvfSqPersist,
      annIvfSqIncremental, annIvfSqDelete, annIvfSqCompact, annIvfSqStream,
      annRecallQuantized,
      annGraphPersist, annGraphIncremental, annGraphDelete, annGraphCompact,
      hybridRrf, retrievalEvalNdcg, prfExpansion, knnPropagateQ,
      hardNegativesQ, marginPairsQ, embedDecontamQ)
}
