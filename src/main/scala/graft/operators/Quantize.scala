package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Symmetric per-vector int8 quantization of the embedding column —
  * the storage-side operator that makes a 100 TB embedding corpus
  * 4× smaller (and its ANN scans 4× less I/O-bound): each vector is
  * scaled by max|x|/127 and rounded to [-127, 127] bytes, the standard
  * scalar-quantization baseline of FAISS/vector-store indexes.
  *
  * Everything is a zero-shuffle primitive kernel (quantization is
  * per-row), and every number it emits is deterministic: the rounding
  * is floor(x·127/m + 0.5) — exact IEEE ops, bit-identical in any
  * engine, unlike banker's-rounding library calls — so the audit
  * entry (per-vector quantized extrema, L1 mass, reconstruction MSE)
  * is fully oracle-checked. The recall cost of quantization is spec-
  * measured ([[graft.QuantizeSpec]]): top-k over DEQUANTIZED vectors
  * against the exact float ranking.
  */
object Quantize {

  /** Quantized levels: symmetric [-127, 127]. */
  val QMax = 127.0

  /** (vec_id, q: Array[Long], scale): the quantization kernel. A zero
    * max-magnitude vector quantizes to all-zero with scale 0 (guarded,
    * not divided). */
  private def quantize(v: Array[Double]): (Array[Long], Double) = {
    var m = 0.0
    var i = 0
    while (i < v.length) { val a = math.abs(v(i)); if (a > m) m = a; i += 1 }
    val q = new Array[Long](v.length)
    if (m > 0.0) {
      var j = 0
      while (j < v.length) {
        q(j) = math.floor(v(j) * QMax / m + 0.5).toLong
        j += 1
      }
    }
    (q, if (m > 0.0) m / QMax else 0.0)
  }

  /** Per-vector quantization audit: quantized extrema, L1 mass, and
    * reconstruction MSE (sum of squared dequantization error over the
    * dimension, index order — the same sequential fold every oracle
    * list_sum uses). */
  def quantizeStats(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col("vec_id"),
        graft.functions.Vectors.asDouble(col("embedding")).as("v"))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        val (q, scale) = quantize(v)
        var qmin = Long.MaxValue
        var qmax = Long.MinValue
        var l1 = 0L
        var se = 0.0
        var i = 0
        while (i < v.length) {
          val qi = q(i)
          if (qi < qmin) qmin = qi
          if (qi > qmax) qmax = qi
          l1 += math.abs(qi)
          val e = v(i) - qi * scale
          se += e * e
          i += 1
        }
        (id, qmin, qmax, l1, se / v.length)
      }
      .toDF("vec_id", "q_min", "q_max", "q_l1", "mse")
      .select(col("vec_id"), col("q_min"), col("q_max"), col("q_l1"),
        round(col("mse"), 9).as("recon_mse"))
  }

  val quantizeInt8: Q = Q.df(
    "embed_quantize_int8",
    s"""with e as (select vec_id, embedding::DOUBLE[] as v from embeddings),
       |p as (select vec_id, v,
       |        list_max(list_transform(v, x -> abs(x))) as m from e),
       |q as (select vec_id, v, m,
       |        case when m > 0
       |             then list_transform(v, x -> floor(x * $QMax / m + 0.5))
       |             else list_transform(v, x -> cast(0.0 as double)) end as qv,
       |        case when m > 0 then m / $QMax else cast(0.0 as double) end
       |          as scale
       |      from p)
       |select vec_id,
       |  cast(list_min(qv) as bigint) as q_min,
       |  cast(list_max(qv) as bigint) as q_max,
       |  cast(list_sum(list_transform(qv, x -> abs(x))) as bigint) as q_l1,
       |  round(list_sum(list_transform(range(1, len(v) + 1),
       |          i -> (v[i] - qv[i] * scale) * (v[i] - qv[i] * scale)))
       |        / len(v), 9) as recon_mse
       |from q order by vec_id""".stripMargin) { (s, dir) =>
    quantizeStats(Tables.df(s, dir, "embeddings")).orderBy(col("vec_id"))
  }

  /** The embeddings table with each vector replaced by its DEQUANTIZED
    * form (float, as stored) — what an int8-backed index actually
    * scores against; input to the recall spec. */
  def dequantized(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col("vec_id"),
        graft.functions.Vectors.asDouble(col("embedding")).as("v"))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        val (q, scale) = quantize(v)
        (id, q.map(qi => (qi * scale).toFloat))
      }
      .toDF("vec_id", "embedding")
  }

  // ---- PCA top component (power iteration) --------------------------------

  /** Power iterations for the dominant eigenvector — geometric
    * convergence; 40 is overkill for any real spectral gap, and the
    * compare never depends on it (same-run oracle). */
  val PcaIters = 40

  /** (mean, pc1) of the most recent training run — late-bound into the
    * oracle, the [[Similarity.annIvf]] contract: the dump and the
    * rendered SQL come from the SAME run's model, so distributed
    * float-sum order in training is irrelevant to the compare. */
  @volatile private var lastPc: (Array[Double], Array[Double]) = _

  /** Train the top principal component: ONE distributed pass aggregates
    * (Σv, Σ v·vᵀ, n) — model-sized partials (64 + 64² doubles), a
    * treeAggregate so no single reducer sees every partition — then the
    * driver forms the covariance and power-iterates from a seeded start
    * (model-only math, microseconds at dim 64). This is the training
    * recipe every embedding-compression step uses (PCA whitening /
    * dimensionality reduction before indexing). Sign is fixed so the
    * largest-magnitude coordinate is positive. */
  def trainPc(emb: DataFrame): (Array[Double], Array[Double]) = {
    val spark = emb.sparkSession
    import spark.implicits._
    val d = Similarity.Dim
    val vs = emb.select(col("vec_id"),
      graft.functions.Vectors.asDouble(col("embedding")).as("v"))
      .as[(Long, Array[Double])].rdd.map(_._2)
    val (sum, outer, n) = vs.treeAggregate(
      (new Array[Double](d), new Array[Double](d * d), 0L))(
      { case ((s, o, cnt), v) =>
        var i = 0
        while (i < d) {
          s(i) += v(i)
          var j = 0
          while (j < d) { o(i * d + j) += v(i) * v(j); j += 1 }
          i += 1
        }
        (s, o, cnt + 1)
      },
      { case ((s1, o1, n1), (s2, o2, n2)) =>
        var k = 0
        while (k < s1.length) { s1(k) += s2(k); k += 1 }
        k = 0
        while (k < o1.length) { o1(k) += o2(k); k += 1 }
        (s1, o1, n1 + n2)
      })
    val mean = sum.map(_ / n)
    val cov = Array.tabulate(d * d)(k =>
      outer(k) / n - mean(k / d) * mean(k % d))
    // seeded start + power iteration with per-step normalization
    val rnd = new scala.util.Random(13)
    var w = Array.fill(d)(rnd.nextDouble() - 0.5)
    var it = 0
    while (it < PcaIters) {
      val nw = new Array[Double](d)
      var i = 0
      while (i < d) {
        var acc = 0.0
        var j = 0
        while (j < d) { acc += cov(i * d + j) * w(j); j += 1 }
        nw(i) = acc
        i += 1
      }
      var nrm = 0.0
      i = 0
      while (i < d) { nrm += nw(i) * nw(i); i += 1 }
      nrm = math.sqrt(nrm)
      i = 0
      while (i < d) { nw(i) = nw(i) / nrm; i += 1 }
      w = nw
      it += 1
    }
    val top = w.indices.maxBy(i => math.abs(w(i)))
    if (w(top) < 0) w = w.map(-_)
    lastPc = (mean, w)
    lastPc
  }

  /** Project every vector onto the trained top component — the reduced
    * coordinate an indexing pipeline stores. The projection kernel is a
    * zero-shuffle primitive loop whose fold order (ascending i of
    * (v[i] − mean[i])·w[i] from 0.0) the oracle pins with an explicit
    * list_reduce sequential fold — never list_sum, whose internal
    * accumulation order is an engine implementation detail. */
  def pcaProject(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (mean, w) = trainPc(emb)
    val d = Similarity.Dim
    emb.select(col("vec_id"),
      graft.functions.Vectors.asDouble(col("embedding")).as("v"))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        var acc = 0.0
        var i = 0
        while (i < d) { acc += (v(i) - mean(i)) * w(i); i += 1 }
        (id, acc)
      }
      .toDF("vec_id", "raw")
      // round via the SQL round() (HALF_UP) — the same rounding the
      // oracle's round() applies; a kernel-side rint would be HALF_EVEN
      .select(col("vec_id"), round(col("raw"), 6).as("pc1"))
  }

  private def pcaOracle: String = {
    val (mean, w) = Option(lastPc).getOrElse(
      (Array.fill(Similarity.Dim)(0.0), Array.fill(Similarity.Dim)(1.0)))
    s"""with m(mv) as (values ([${mean.mkString(", ")}]::DOUBLE[])),
       |w(wv) as (values ([${w.mkString(", ")}]::DOUBLE[])),
       |e as (select vec_id, embedding::DOUBLE[] as v from embeddings)
       |select vec_id,
       |  round(list_reduce(
       |    list_prepend(cast(0 as double),
       |      list_transform(range(1, ${Similarity.Dim + 1}),
       |        i -> (v[i] - mv[i]) * wv[i])),
       |    (acc, x) -> acc + x), 6) as pc1
       |from e cross join m cross join w
       |order by vec_id""".stripMargin
  }

  val embPca: Q = Q.df("embed_pca_project", pcaOracle) { (s, dir) =>
    pcaProject(Tables.df(s, dir, "embeddings")).orderBy(col("vec_id"))
  }

  /** Fixed-point scale for the dimension-stats audit (micro-units). */
  val DimStatScale = 1000000.0

  /** Per-dimension corpus statistics of the embedding column — the
    * calibration input every quantization scheme reads first (per-dim
    * ranges decide symmetric-vs-asymmetric scales and clip points; a
    * dimension whose range dwarfs the rest is a PCA/whitening or
    * outlier-clip candidate). One posexplode + one map-side-combined
    * groupBy on the dimension id — |dims| output rows at any corpus
    * size. Sums are fixed-point micro-units (round(v·1e6) per value,
    * summed as int64): a float sum would be partitioning-order-
    * dependent, the same determinism trade the PageRank ranks make. */
  val embDimStats: Q = Q.df(
    "embed_dim_stats",
    """with v as (select generate_subscripts(embedding, 1) - 1 as dim,
      |    cast(round(cast(unnest(embedding) as double) * 1000000)
      |      as bigint) as si
      |  from embeddings)
      |select cast(dim as bigint) as dim, cast(count(*) as bigint) as n,
      |  cast(sum(si) as bigint) as sum_micro,
      |  cast(min(si) as bigint) as min_micro,
      |  cast(max(si) as bigint) as max_micro
      |from v group by dim order by dim""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("dim").cast("long").as("dim"),
        round(col("v").cast("double") * 1000000).cast("long").as("si"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"), sum("si").as("sum_micro"),
        min("si").as("min_micro"), max("si").as("max_micro"))
      .orderBy(col("dim"))
  }

  val queries: Seq[Q] = Seq(quantizeInt8, embPca, embDimStats)
}
