package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.DotProduct
import graft.functions.Vectors._

/** Embedding clustering as a first-class surface: spherical-k-means
  * cluster assignment, SemDeDup-style semantic deduplication, and
  * cluster-balanced diversity sampling — the clustering consumers of a
  * training-data pipeline, sharing one trained quantizer per corpus.
  *
  * The reference has no vector surface at all (beyond-reference, like
  * the rest of the embedding family); the nearest published analogues
  * are FAISS-style IVF builds and the SemDeDup recipe (cluster first,
  * then compare only within clusters), both re-expressed here in
  * Spark's execution model:
  *
  * - TRAINING is [[Similarity.trainCentroids]] — 2 Lloyd passes,
  *   broadcast centroid matrix, aggregateByKey partials, model-only
  *   collect (C×dim = 16 KB). Trained ONCE per corpus and memoized
  *   ([[centroidsFor]]): every consumer below reuses the same index,
  *   exactly how a pipeline shares one trained quantizer across jobs.
  * - ASSIGNMENT is a zero-shuffle primitive kernel over the broadcast
  *   matrix ([[Similarity.nearestCentroids]]).
  * - SEMANTIC DEDUP turns the O(n²) all-pairs compare into
  *   per-Voronoi-cell all-pairs: candidates meet in a hash equi-join on
  *   the cluster id, so pair work is Σ|cell|² and the shuffle carries
  *   each vector once per side — the SemDeDup observation that
  *   near-duplicates co-locate under a coarse quantizer.
  * - BALANCED SAMPLING is one window per cluster key (deterministic
  *   hash order), the diversity-sampling step that caps any one
  *   cluster's contribution to a training mix.
  *
  * All three entries are oracle-checked with the TRAINED centroids
  * embedded as SQL literals (late-bound, the [[Similarity.annIvf]]
  * contract: the dump and the oracle come from the same run's model).
  */
object Cluster {

  /** Fixture dir of the most recent run, so each late-bound oracle
    * renders the same model its entry just used. The model itself lives
    * in [[Similarity.trainedCache]] — ONE training per corpus shared
    * with IVF search (the first vector consumer pays the Lloyd passes,
    * every other entry reuses the index). */
  @volatile private var lastDir: String = null

  private def centroidsFor(emb: DataFrame, dir: String): Array[Array[Double]] = {
    lastDir = dir
    Similarity.trainedCentroids(emb, dir)
  }

  private def currentModel: Array[Array[Double]] =
    Option(lastDir).flatMap(Similarity.trainedCache.get).getOrElse(
      Similarity.initCentroids)

  /** (vec_id, u, cid): unit vectors labeled with their nearest trained
    * centroid — primitive kernel, zero shuffle. */
  private def assigned(emb: DataFrame, dir: String): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cm = centroidsFor(emb, dir)
    Similarity.withUnit(emb).as[(Long, Array[Double])]
      .map { case (id, u) =>
        (id, u, Similarity.nearestCentroids(u, 1, cm)(0).toLong)
      }
      .toDF("vec_id", "u", "cid")
  }

  /** Oracle CTE prelude: trained-centroid literals + unit vectors +
    * argmax assignment (the [[Similarity.annIvf]] oracle's construction,
    * with the same (-score, index) tiebreak as `nearestCentroids`). */
  private def assignSql: String = {
    val centroidRows = currentModel.zipWithIndex.map { case (v, i) =>
      s"($i, [${v.mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n    ")
    s"""c(cid, v) as (values
       |    $centroidRows),
       |e as (${Similarity.sqlUnit}),
       |scored as (
       |  select e.vec_id, e.u, c.cid,
       |    row_number() over (partition by e.vec_id
       |      order by list_sum(list_transform(range(1, len(e.u) + 1),
       |                 i -> c.v[i] * e.u[i])) desc, c.cid) as crn
       |  from e cross join c),
       |assign as (select vec_id, u, cast(cid as bigint) as cid
       |           from scored where crn = 1)""".stripMargin
  }

  // ---- k-means cluster assignment ----------------------------------------

  /** Every vector's cluster id + its cluster's population. One kernel
    * pass for assignment, one shuffle on cid for the size window —
    * the partition-key histogram a pipeline uses to spot degenerate
    * clusters before sampling from them. */
  def kmeansAssign(emb: DataFrame, dir: String): DataFrame =
    assigned(emb, dir)
      .select(col("vec_id"), col("cid"),
        count(lit(1)).over(Window.partitionBy(col("cid")))
          .as("cluster_size"))

  val clusterKmeans: Q = Q.df(
    "cluster_embeddings_kmeans",
    s"""with $assignSql
       |select vec_id, cid,
       |  count(*) over (partition by cid) as cluster_size
       |from assign order by vec_id""".stripMargin) { (s, dir) =>
    kmeansAssign(Tables.df(s, dir, "embeddings"), dir)
      .orderBy(col("vec_id"))
  }

  // ---- semantic dedup (SemDeDup shape) -----------------------------------

  /** Pairs above this cosine within one cluster count as semantic
    * duplicates. Same threshold as the exact all-pairs entry
    * ([[Similarity.CosineDupThreshold]]), so the output is provably a
    * SUBSET of `dedup_embedding_cosine` — the recall loss is exactly the
    * cross-cluster pairs the quantizer separated, and the spec measures
    * it rather than hand-waving it. */
  val SemanticThreshold: Double = Similarity.CosineDupThreshold

  /** Intra-cluster near-duplicate pairs: self-join on the cluster id
    * (d1 < d2), exact cosine re-check via the codegen dot kernel. Pair
    * work is Σ|cell|² instead of n² — the scale mechanism SemDeDup
    * exists for; the equi-join shuffles each vector once per side, never
    * the pair matrix. */
  def semanticPairs(emb: DataFrame, dir: String, threshold: Double): DataFrame = {
    DotProduct.ensureRegistered(emb.sparkSession)
    // The assignment kernel feeds BOTH sides of the self-join; checkpoint
    // it once so the typed map (and the training scan under it) does not
    // re-execute per branch — the jaccardPairs lesson. The checkpointed
    // frame is (id, 64-dim unit vector, cid): ~3 MB at sf0.1.
    val a = assigned(emb, dir).localCheckpoint()
    val left = a.select(col("vec_id").as("d1"), col("u").as("u1"), col("cid"))
    val right = a.select(col("vec_id").as("d2"), col("u").as("u2"), col("cid"))
    left.join(right, Seq("cid"))
      .filter(col("d1") < col("d2"))
      .withColumn("cos", call_function(DotProduct.fnName, col("u1"), col("u2")))
      .filter(col("cos") >= threshold)
      .select(col("d1"), col("d2"), col("cid"),
        round(col("cos"), 6).as("cos_sim"))
  }

  val dedupSemantic: Q = Q.df(
    "dedup_semantic",
    s"""with $assignSql
       |select a.vec_id as d1, b.vec_id as d2, a.cid,
       |  round(${Similarity.sqlDotU("a", "b")}, 6) as cos_sim
       |from assign a join assign b
       |  on a.cid = b.cid and a.vec_id < b.vec_id
       |where ${Similarity.sqlDotU("a", "b")} >= $SemanticThreshold
       |order by d1, d2""".stripMargin) { (s, dir) =>
    semanticPairs(Tables.df(s, dir, "embeddings"), dir, SemanticThreshold)
      .orderBy(col("d1"), col("d2"))
  }

  // ---- cluster-balanced diversity sampling -------------------------------

  /** Vectors kept per cluster. */
  val PerCluster = 5

  /** Knuth multiplicative shuffle key — the same pure-integer
    * pseudo-random order the corpus split uses ([[Corpus]]), exact in
    * any engine. */
  private val OrderExpr = "(vec_id * 2654435761) % 4294967296"

  /** At most [[PerCluster]] vectors per cluster, chosen in deterministic
    * pseudo-random order — caps any cluster's contribution to a
    * training mix (diversity sampling over the quantizer's cells). One
    * window per cluster key; no global sort, no driver state. */
  def clusterBalancedSample(emb: DataFrame, dir: String, m: Int): DataFrame =
    assigned(emb, dir)
      .select(col("cid"), col("vec_id"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("cid"))
          .orderBy(expr(OrderExpr), col("vec_id"))).cast("long"))
      .filter(col("rnk") <= m)

  val sampleClusterBalanced: Q = Q.df(
    "sample_cluster_balanced",
    s"""with $assignSql
       |select cid, vec_id, rnk from (
       |  select cid, vec_id, cast(row_number() over (partition by cid
       |    order by $OrderExpr, vec_id) as bigint) as rnk
       |  from assign) t
       |where rnk <= $PerCluster
       |order by cid, rnk""".stripMargin) { (s, dir) =>
    clusterBalancedSample(Tables.df(s, dir, "embeddings"), dir, PerCluster)
      .orderBy(col("cid"), col("rnk"))
  }

  // ---- clustering-quality evaluation --------------------------------------

  /** Cluster purity against the fixture's ground-truth `label` column —
    * the standard external clustering evaluation (majority-label share
    * per cluster), the same "grade the index, don't trust it" move as
    * `ann_recall_at_k`. Per cluster: population, majority label
    * (smallest label wins ties, deterministically), its count, and
    * purity = top_count / cluster_size.
    *
    * Scale shape: the assignment kernel is zero-shuffle; the label
    * attach is an equi-join on vec_id (co-partitioned key both sides);
    * the (cid, label) histogram is one map-side-combined aggregation
    * whose output is |clusters|·|labels| rows — independent of corpus
    * row count, so the ranking window is driver-scale-free. */
  val clusterPurity: Q = Q.df(
    "cluster_purity", {
      s"""with $assignSql,
         |j as (select a.cid, e.label
         |      from assign a join embeddings e on a.vec_id = e.vec_id),
         |cnt as (select cid, label, cast(count(*) as bigint) as c
         |        from j group by cid, label),
         |ranked as (select cid, label, c,
         |    row_number() over (partition by cid order by c desc, label) as rn,
         |    sum(c) over (partition by cid) as n
         |  from cnt)
         |select cid, cast(n as bigint) as cluster_size,
         |  cast(label as bigint) as top_label, c as top_count,
         |  round(cast(c as double) / cast(n as double), 6) as purity
         |from ranked where rn = 1 order by cid""".stripMargin
    }) { (s, dir) =>
    val emb = Tables.df(s, dir, "embeddings")
    val cnt = assigned(emb, dir).select(col("vec_id"), col("cid"))
      .join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
      .groupBy(col("cid"), col("label")).agg(count(lit(1)).as("c"))
    val byCluster = Window.partitionBy(col("cid"))
    cnt
      .withColumn("rn", row_number().over(
        byCluster.orderBy(col("c").desc, col("label"))))
      .withColumn("n", sum(col("c")).over(byCluster))
      .filter(col("rn") === 1)
      .select(col("cid"), col("n").as("cluster_size"),
        col("label").cast("long").as("top_label"), col("c").as("top_count"),
        round(col("c").cast("double") / col("n").cast("double"), 6)
          .as("purity"))
      .orderBy(col("cid"))
  }

  // ---- supervised class balancing -----------------------------------------

  /** Class-balanced downsampling on the ground-truth `label` column —
    * the supervised sibling of [[sampleClusterBalanced]]: every class is
    * cut to the size of the SMALLEST class (the classic fix for a
    * frequency-skewed label distribution before fine-tune/eval), with
    * membership chosen by deterministic hash rank so reruns reproduce
    * the same sample.
    *
    * Scale shape: the per-class rank is a window partitioned by label
    * (|labels| concurrent sorts of class-sized groups — a skewed class
    * sorts in parallel across its range partitions); the cut size k is
    * a |labels|-row aggregate collapsed to ONE scalar row and broadcast,
    * so no corpus-sized state ever converges on the driver. */
  val sampleClassBalance: Q = Q.df(
    "sample_class_balance",
    """with ranked as (
      |  select vec_id, label, cast(row_number() over (partition by label
      |    order by md5(cast(vec_id as varchar)), vec_id) as bigint) as rk
      |  from embeddings),
      |m as (select min(cnt) as k from
      |  (select count(*) as cnt from embeddings group by label))
      |select vec_id, cast(label as bigint) as label, rk
      |from ranked, m where rk <= m.k
      |order by label, rk""".stripMargin) { (s, dir) =>
    val emb = Tables.df(s, dir, "embeddings")
    val k = emb.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
      .agg(min(col("cnt")).as("k"))
    emb.select(col("vec_id"), col("label"),
        md5(col("vec_id").cast("string")).as("h"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("label")).orderBy(col("h"), col("vec_id")))
        .cast("long"))
      .crossJoin(broadcast(k))
      .filter(col("rk") <= col("k"))
      .select(col("vec_id"), col("label").cast("long").as("label"), col("rk"))
      .orderBy(col("label"), col("rk"))
  }

  // ---- farthest-point (k-center) coreset ----------------------------------

  /** Coreset size for the k-center entry. */
  val KCenter = 8

  /** Farthest-point sampling (the greedy 2-approximation to the
    * k-center problem — Gonzalez 1985): seed at vec_id 0, then k−1
    * times add the vector FARTHEST from the selected set (cosine
    * distance on unit vectors; ties to the smaller id). The coreset a
    * data-pruning pass keeps when it wants COVERAGE rather than
    * proportional mass — every point ends within 2× the optimal
    * k-center radius of a selected point.
    *
    * Scale shape: the selected set is k unit vectors — model-sized
    * driver state, the [[Similarity]] centroid contract — broadcast
    * into one distance-update scan per round (running min distance, so
    * each round costs ONE pass, not |selected| passes); the argmax is
    * a 1-row TakeOrdered. k rounds total, each materialized and the
    * predecessor freed. */
  def kcenterSample(emb: DataFrame, k: Int = KCenter): DataFrame = {
    DotProduct.ensureRegistered(emb.sparkSession)
    import graft.plans.Checkpoints
    val unit = Checkpoints.materialize(Similarity.withUnit(emb))
    def vecOf(id: Long): Array[Double] =
      unit.filter(col("vec_id") === id).select(col("u"))
        .collect()(0).getSeq[Double](0).toArray
    var selected = Vector((0L, 0.0)) // (id, dist at selection)
    // running min-distance frame: vec_id, u, d
    var cur = Checkpoints.materialize(
      unit.select(col("vec_id"), col("u"),
        (lit(1.0d) - dotNative(col("u"),
          lit(vecOf(0L)).cast("array<double>"))).as("d")))
    var i = 1
    while (i < k) {
      val next = cur.filter(!col("vec_id").isInCollection(selected.map(_._1)))
        .orderBy(col("d").desc, col("vec_id")).limit(1)
        .select(col("vec_id"), col("d")).collect()(0)
      val (nid, nd) = (next.getLong(0), next.getDouble(1))
      selected :+= ((nid, nd))
      if (i < k - 1) {
        val nv = lit(vecOf(nid)).cast("array<double>")
        val upd = Checkpoints.materialize(
          cur.select(col("vec_id"), col("u"),
            least(col("d"), lit(1.0d) - dotNative(col("u"), nv)).as("d")))
        Checkpoints.free(cur)
        cur = upd
      }
      i += 1
    }
    Checkpoints.free(cur)
    Checkpoints.free(unit)
    val spark = emb.sparkSession
    import spark.implicits._
    selected.zipWithIndex
      .map { case ((id, d), r) => (r.toLong + 1L, id, d) }
      .toDF("rank", "vec_id", "d")
      .select(col("rank"), col("vec_id"),
        round(col("d"), 6).as("dist_at_selection"))
  }

  private def kcenterOracle: String = {
    val rounds = (1 until KCenter).map { i =>
      val p = i - 1
      s"""pick$i as materialized (select vec_id, d from d$p
         |  where vec_id not in (select vec_id from sel$p)
         |  order by d desc, vec_id limit 1),
         |sel$i as materialized (
         |  select * from sel$p union all
         |  select ${i + 1}::bigint, vec_id, d from pick$i),
         |d$i as materialized (
         |  select d$p.vec_id, d$p.u,
         |    least(d$p.d, 1.0 - ${Similarity.sqlDotU("d$p", "pv")}) as d
         |  from d$p cross join
         |    (select e2.u from e e2 join pick$i on e2.vec_id = pick$i.vec_id)
         |      pv)"""
        .stripMargin.replace("d$p", s"d$p")
    }.mkString(",\n")
    s"""with e as materialized (${Similarity.sqlUnit}),
       |sel0(rank, vec_id, d) as (values (1::bigint, 0::bigint, 0.0)),
       |d0 as materialized (
       |  select e.vec_id, e.u,
       |    1.0 - ${Similarity.sqlDotU("e", "s")} as d
       |  from e cross join (select u from e where vec_id = 0) s),
       |$rounds
       |select rank, vec_id, round(d, 6) as dist_at_selection
       |from sel${KCenter - 1} order by rank""".stripMargin
  }

  val kcenterQ: Q = Q.df("sample_kcenter", kcenterOracle) { (s, dir) =>
    kcenterSample(Tables.df(s, dir, "embeddings")).orderBy(col("rank"))
  }

  /** SIMPLIFIED silhouette (Hruschka et al.): per point,
    * a = distance to its OWN centroid, b = min distance to any OTHER
    * centroid, s = (b−a)/max(a,b) ∈ [−1, 1] — the O(n·k)
    * clustering-quality readout that replaces the O(n²) full silhouette
    * at scale (the same substitution every large-scale evaluator
    * makes), reported as a per-cluster mean. The cluster id is the
    * serving assignment (dot-product argmax over the shared trained
    * model), while distances are Euclidean to the literal centroids —
    * so a point a non-unit centroid "owns" by dot but not by distance
    * scores NEGATIVE, which is exactly the mis-fit signal the metric
    * exists to surface. Per-point doubles are bit-identical cross-engine
    * (same ascending-index squared-diff fold, one sqrt, order-free min);
    * the per-cluster mean folds the SORTED value list. Per-group state
    * is bounded by cluster size; at 100 TB swap the fold for a
    * decimal-exact streaming sum — the metric itself stays one kernel
    * pass + one cluster-keyed aggregate. */
  def silhouetteSimplified(emb: DataFrame, dir: String): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cm = centroidsFor(emb, dir)
    val pts = Similarity.withUnit(emb).as[(Long, Array[Double])]
      .map { case (id, u) =>
        val own = Similarity.nearestCentroids(u, 1, cm)(0)
        def dist(c: Array[Double]): Double = {
          var s = 0.0
          var i = 0
          while (i < u.length) { val d = u(i) - c(i); s += d * d; i += 1 }
          math.sqrt(s)
        }
        val a = dist(cm(own))
        var b = Double.MaxValue
        var k = 0
        while (k < cm.length) {
          if (k != own) { val d = dist(cm(k)); if (d < b) b = d }
          k += 1
        }
        (id, own.toLong, (b - a) / math.max(a, b))
      }.toDF("vec_id", "cid", "sil")
    pts.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_points"),
        sort_array(collect_list(col("sil"))).as("ss"))
      .select(col("cid"), col("n_points"),
        round(aggregate(col("ss"), lit(0.0d), (a, x) => a + x)
          / col("n_points").cast("double"), 6).as("mean_sil"))
  }

  val clusterSilhouette: Q = Q.df(
    "cluster_silhouette",
    s"""with $assignSql,
       |d as (select a.vec_id, a.cid as own, c.cid as k,
       |    sqrt(list_sum(list_transform(range(1, len(a.u) + 1),
       |      i -> (a.u[i] - c.v[i]) * (a.u[i] - c.v[i])))) as d
       |  from assign a cross join c),
       |ab as (select vec_id, own,
       |    min(case when k = own then d end) as a,
       |    min(case when k <> own then d end) as b
       |  from d group by vec_id, own),
       |s as (select own as cid, (b - a) / greatest(a, b) as sil from ab),
       |g as (select cid, cast(count(*) as bigint) as n_points,
       |    list_sort(list(sil)) as ss from s group by cid)
       |select cid, n_points,
       |  round(list_reduce(list_prepend(cast(0 as double), ss),
       |      (acc, x) -> acc + x) / cast(n_points as double), 6) as mean_sil
       |from g order by cid""".stripMargin) { (s, dir) =>
    silhouetteSimplified(Tables.df(s, dir, "embeddings"), dir)
      .orderBy(col("cid"))
  }

  val queries: Seq[Q] =
    Seq(clusterKmeans, dedupSemantic, sampleClusterBalanced, clusterPurity,
      sampleClassBalance, kcenterQ, clusterSilhouette)
}
