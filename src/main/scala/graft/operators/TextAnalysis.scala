package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.Text

/** Text-analysis operators over the documents table: token counting,
  * language ID, quality scoring, fingerprinting (SURVEY north-star set).
  * Every computation is a codegen'd column expression — one scan pass,
  * no shuffle, embarrassingly parallel at any scale.
  */
object TextAnalysis {

  val textTokens: Q = Q.df(
    "text_tokens",
    """select doc_id,
      |  cast(len(str_split(text, ' ')) as bigint) as n_tokens,
      |  cast(len(regexp_extract_all(text, '\w+|[^\w\s]')) as bigint) as n_bpe,
      |  cast(length(text) as bigint) as n_chars
      |from documents order by doc_id""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "documents")
      .select(
        col("doc_id"),
        Text.tokenCount(col("text")).as("n_tokens"),
        Text.bpeTokenCount(col("text")).as("n_bpe"),
        length(col("text")).cast("long").as("n_chars"))
      .orderBy(col("doc_id"))
  }

  val textLangId: Q = Q.df(
    "text_langid", {
      val en = Text.sqlStopwordHits("text", "en")
      val de = Text.sqlStopwordHits("text", "de")
      val fr = Text.sqlStopwordHits("text", "fr")
      val es = Text.sqlStopwordHits("text", "es")
      s"""select doc_id, lang,
         |  case when $en = 0 and $de = 0 and $fr = 0 and $es = 0 then 'und'
         |       when $en >= $de and $en >= $fr and $en >= $es then 'en'
         |       when $de >= $fr and $de >= $es then 'de'
         |       when $fr >= $es then 'fr'
         |       else 'es' end as lang_pred,
         |  $en as hits_en
         |from documents order by doc_id""".stripMargin
    }) { (s, dir) =>
    Tables.df(s, dir, "documents")
      .select(
        col("doc_id"), col("lang"),
        Text.langId(col("text")).as("lang_pred"),
        Text.stopwordHits(col("text"), "en").as("hits_en"))
      .orderBy(col("doc_id"))
  }

  /** Language confusion matrix — the audit a multilingual ingest runs
    * on its language-ID stage: declared label vs [[Text.langId]]'s
    * prediction, with per-cell counts and the per-declared-language
    * agreement rate. High off-diagonal mass means either mislabeled
    * metadata or a classifier blind spot; both change routing and
    * per-language sampling weights downstream. |langs|² rows from one
    * map-side-combined groupBy over the classifier scan — the rate is
    * a window share over the tiny matrix, nothing driver-sized. */
  val langConfusion: Q = Q.df(
    "corpus_lang_confusion", {
      val en = Text.sqlStopwordHits("text", "en")
      val de = Text.sqlStopwordHits("text", "de")
      val fr = Text.sqlStopwordHits("text", "fr")
      val es = Text.sqlStopwordHits("text", "es")
      s"""with pred as (select lang,
         |  case when $en = 0 and $de = 0 and $fr = 0 and $es = 0 then 'und'
         |       when $en >= $de and $en >= $fr and $en >= $es then 'en'
         |       when $de >= $fr and $de >= $es then 'de'
         |       when $fr >= $es then 'fr'
         |       else 'es' end as lang_pred
         |from documents),
         |m as (select lang, lang_pred, cast(count(*) as bigint) as n
         |      from pred group by lang, lang_pred)
         |select lang, lang_pred, n,
         |  round(cast(n as double)
         |    / cast(sum(n) over (partition by lang) as double), 6)
         |    as share,
         |  lang = lang_pred as agree
         |from m order by lang, lang_pred""".stripMargin
    }) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    Tables.df(s, dir, "documents")
      .select(col("lang"), Text.langId(col("text")).as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .select(col("lang"), col("lang_pred"), col("n"),
        round(col("n").cast("double")
          / sum(col("n")).over(Window.partitionBy(col("lang")))
            .cast("double"), 6).as("share"),
        (col("lang") === col("lang_pred")).as("agree"))
      .orderBy(col("lang"), col("lang_pred"))
  }

  val textQuality: Q = Q.df(
    "text_quality", {
      val stop = Text.sqlStopwordHits("text", "en")
      val nTok = "cast(len(str_split(text, ' ')) as bigint)"
      val avgLen =
        s"cast(length(text) - ($nTok - 1) as double) / cast($nTok as double)"
      val stopRatio = s"cast($stop as double) / cast($nTok as double)"
      s"""select doc_id,
         |  $avgLen as avg_token_len,
         |  cast(len(regexp_extract_all(text, '[^\\w\\s]')) as bigint) as punct_cnt,
         |  (case when $nTok between 20 and 1000 then cast(0.4 as double)
         |        else cast(0.0 as double) end)
         |  + (case when $avgLen between cast(3.0 as double) and cast(10.0 as double)
         |          then cast(0.3 as double) else cast(0.0 as double) end)
         |  + $stopRatio * cast(0.3 as double) as quality
         |from documents order by doc_id""".stripMargin
    }) { (s, dir) =>
    Tables.df(s, dir, "documents")
      .select(
        col("doc_id"),
        Text.avgTokenLen(col("text")).as("avg_token_len"),
        Text.punctCount(col("text")).as("punct_cnt"),
        Text.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))
  }

  val textFingerprint: Q = Q.df(
    "text_fingerprint",
    """select doc_id, md5(lower(text)) as fp
      |from documents order by doc_id""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "documents")
      .select(col("doc_id"), Text.md5Fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))
  }

  /** Rolling token-stream fingerprints as a primitive per-doc kernel
    * (zero shuffle; the earlier higher-order-function fold evaluated
    * interpreted per token). */
  def rollingFingerprints(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        (id, Text.rollingFingerprint(text.split(" ", -1)))
      }
      .toDF("doc_id", "rolling_fp")
  }

  /** The token hash is [[Text.fnv64]], emulated bit-exactly in hugeint
    * SQL (same construction as the dedup_simhash oracle), so the rolling
    * fold is fully oracle-checked — it was rows-only while it used an
    * engine-internal hash. */
  private def rollingOracle: String =
    s"""select doc_id,
       |  list_reduce(
       |    list_prepend(0::bigint,
       |      list_transform(string_split(text, ' '), tok ->
       |        cast(${Text.sqlFnv64("tok")}
       |          % 4294967296::hugeint as bigint))),
       |    (a, hh) -> (a * 31 + hh) % 1099511627776) as rolling_fp
       |from documents order by doc_id""".stripMargin

  val textRollingFingerprint: Q = Q.df("text_fingerprint_rolling",
    rollingOracle) { (s, dir) =>
    rollingFingerprints(Tables.df(s, dir, "documents"))
      .orderBy(col("doc_id"))
  }

  /** Feature-hashing buckets (the "hashing trick" dimensionality). */
  val HashBuckets = 64

  /** Feature hashing (Weinberger et al.): each document rendered as a
    * fixed-dimensional sparse count vector by hashing tokens into
    * [[HashBuckets]] buckets — the vocabulary-free featurization a
    * streaming/linear-model pipeline uses when it cannot afford a
    * learned dictionary. Output per doc: nonzero count, Σc² (the
    * squared L2 mass, integer-exact), and the sparse vector itself as
    * a canonical "bucket:count" string sorted by bucket.
    *
    * Zero shuffle at any corpus size: one Dataset kernel pass builds
    * each doc's bucket counts in a [[HashBuckets]]-slot array. The
    * token hash is [[Text.fnv64]] mod 2³² mod B, mirrored bit-exactly
    * in hugeint SQL for the oracle (the rolling-fingerprint pattern). */
  def featureHash(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val counts = new Array[Long](HashBuckets)
        text.split(" ", -1).foreach { tok =>
          val b = ((Text.fnv64(tok) & 0xFFFFFFFFL) % HashBuckets).toInt
          counts(b) += 1L
        }
        var nnz = 0L
        var sq = 0L
        val sb = new StringBuilder
        var b = 0
        while (b < HashBuckets) {
          if (counts(b) > 0) {
            nnz += 1L
            sq += counts(b) * counts(b)
            if (sb.nonEmpty) sb.append(' ')
            sb.append(b).append(':').append(counts(b))
          }
          b += 1
        }
        (id, nnz, sq, sb.toString)
      }
      .toDF("doc_id", "nnz", "sq_mass", "features")
  }

  val textFeatureHash: Q = Q.df(
    "text_feature_hashing",
    s"""with tok as (select doc_id,
       |    unnest(string_split(text, ' ')) as tok from documents),
       |b as (select doc_id,
       |    cast(${Text.sqlFnv64("tok")} % 4294967296::hugeint
       |         % $HashBuckets as bigint) as bucket from tok),
       |cnt as (select doc_id, bucket, cast(count(*) as bigint) as c
       |        from b group by doc_id, bucket)
       |select doc_id, cast(count(*) as bigint) as nnz,
       |  cast(sum(c * c) as bigint) as sq_mass,
       |  string_agg(bucket || ':' || c, ' ' order by bucket) as features
       |from cnt group by doc_id order by doc_id""".stripMargin) { (s, dir) =>
    featureHash(Tables.df(s, dir, "documents")).orderBy(col("doc_id"))
  }

  /** Buckets for the linear classifier's hashed feature space. */
  val ClassifierBuckets = 4096

  /** Deterministic per-bucket weight — the stand-in for a TRAINED
    * model's weight vector: Knuth multiplicative scatter of the bucket
    * id into [-1000, 1000]. Integer-exact on both engines. */
  def classifierWeight(bucket: Int): Long =
    ((bucket.toLong * 2654435761L) & 0xFFFFFFFFL) % 2001L - 1000L

  /** fastText-style linear quality classifier INFERENCE (Joulin et al.
    * 2016, the architecture CCNet and the LLaMA data pipeline use as a
    * binary quality filter): each document becomes a bag of hashed
    * unigram + adjacent-bigram features (`wordNgrams=2`), every
    * feature votes its bucket's weight, and the sign of the summed
    * vote is the keep/drop decision. The "trained" weights here are
    * formula-derived from the bucket id (see [[classifierWeight]]) so
    * the oracle can reproduce them exactly; a real model would
    * broadcast its `ClassifierBuckets`-sized weight array to the same
    * kernel — identical plan shape either way.
    *
    * Scale shape: ZERO shuffle — one Dataset kernel pass scores each
    * document in a single loop (the model is O(buckets), never
    * corpus-sized), exactly how a 100 TB quality-filter stage runs:
    * score+filter fused into the ingest scan. All arithmetic is
    * integer (Σ of ±1000 votes), so the compare is hash-exact. */
  def classifierScore(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val toks = text.split(" ", -1)
        var dot = 0L
        var n = 0L
        def vote(feat: String): Unit = {
          val b = ((Text.fnv64(feat) & 0xFFFFFFFFL) % ClassifierBuckets).toInt
          dot += classifierWeight(b)
          n += 1L
        }
        toks.foreach(vote)
        var i = 0
        while (i < toks.length - 1) {
          vote(toks(i) + "_" + toks(i + 1))
          i += 1
        }
        (id, n, dot, if (dot >= 0L) "keep" else "drop")
      }
      .toDF("doc_id", "n_feats", "dot", "label")
  }

  /** Shared oracle fragment: per-doc integer vote sum (`doc_id, dot`)
    * — consumed by the score entry and the AUC evaluation. */
  private def classifierDotCte: String =
    s"""tok as (select doc_id, unnest(string_split(text, ' ')) as tok,
       |    generate_subscripts(string_split(text, ' '), 1) as pos
       |  from documents),
       |feats as (
       |  select doc_id, tok as feat from tok
       |  union all
       |  select doc_id, feat from (
       |    select doc_id, tok || '_' || lead(tok) over
       |      (partition by doc_id order by pos) as feat from tok)
       |  where feat is not null),
       |w as (select doc_id,
       |    (cast(${Text.sqlFnv64("feat")} % 4294967296::hugeint
       |          % $ClassifierBuckets as bigint)
       |     * 2654435761) % 4294967296 % 2001 - 1000 as w
       |  from feats),
       |dots as (select doc_id, cast(count(*) as bigint) as n_feats,
       |    cast(sum(w) as bigint) as dot
       |  from w group by doc_id)""".stripMargin

  val textClassifierScore: Q = Q.df(
    "text_classifier_score",
    s"""with $classifierDotCte
       |select doc_id, n_feats, dot,
       |  case when dot >= 0 then 'keep' else 'drop' end as label
       |from dots order by doc_id""".stripMargin) { (s, dir) =>
    classifierScore(Tables.df(s, dir, "documents")).orderBy(col("doc_id"))
  }

  /** Classifier EVALUATION: per-source ROC-AUC of the vote score
    * against a deterministic relevance rule (`doc_id % 3 = 0` — the
    * fixture's stand-in for held-out labels, the same device the
    * retrieval-eval entry uses for qrels). AUC is computed by the
    * Mann-Whitney rank-sum identity, with TIES (integer vote sums
    * collide) handled by average ranks; every intermediate is kept in
    * integer HALF-UNITS — 2·avgRank = 2·minRank + (tieCount − 1) — so
    * the only floating-point step is the final division, identical on
    * both engines. AUC = (Σ_pos avgRank − n₊(n₊+1)/2) / (n₊·n₋).
    *
    * Scale shape: one score pass (the zero-shuffle kernel), one
    * per-source sort for ranks (partitioned window, no global sort),
    * and a source-cardinality output — the standard offline
    * model-QA report over any corpus size. */
  def classifierAuc(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val scored = classifierScore(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .withColumn("pos", (col("doc_id") % 3 === 0).cast("long"))
    val bySrc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
    val byDot = bySrc.orderBy(col("dot"))
    val tie = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"), col("dot"))
    val ranked = scored
      .withColumn("min_rank", rank().over(byDot).cast("long"))
      .withColumn("tie_cnt", count(lit(1)).over(tie))
      .withColumn("avg_rank2",
        lit(2L) * col("min_rank") + col("tie_cnt") - lit(1L))
    ranked.groupBy(col("source"))
      .agg(sum(col("pos")).as("n_pos"),
        sum(lit(1L) - col("pos")).as("n_neg"),
        sum(when(col("pos") === 1L, col("avg_rank2"))
          .otherwise(lit(0L))).as("rank2_pos"))
      .select(col("source"), col("n_pos"), col("n_neg"),
        // Degenerate-slice guard: a source with zero positives (or
        // negatives) has no defined AUC. Spark's Divide by zero yields
        // NULL but DuckDB's IEEE float division yields NaN/inf, so the
        // guard is explicit NULL on BOTH sides (the ratio() convention
        // the Markov attribution entries use).
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round((col("rank2_pos") - col("n_pos") * (col("n_pos") + 1))
            .cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), 6)).as("auc"))
  }

  val textClassifierAuc: Q = Q.df(
    "classifier_eval_auc",
    s"""with $classifierDotCte,
       |scored as (select d.doc_id, d.dot, doc.source,
       |    case when d.doc_id % 3 = 0 then 1 else 0 end as pos
       |  from dots d join documents doc using (doc_id)),
       |ranked as (select source, pos,
       |    2 * rank() over (partition by source order by dot)
       |      + count(*) over (partition by source, dot) - 1 as avg_rank2
       |  from scored)
       |select source, cast(sum(pos) as bigint) as n_pos,
       |  cast(sum(1 - pos) as bigint) as n_neg,
       |  case when sum(pos) > 0 and sum(1 - pos) > 0 then
       |    round(cast(sum(case when pos = 1 then avg_rank2 else 0 end)
       |          - sum(pos) * (sum(pos) + 1) as double)
       |      / (2.0 * sum(pos) * sum(1 - pos)), 6)
       |  else null end as auc
       |from ranked group by source order by source""".stripMargin) {
    (s, dir) =>
      classifierAuc(Tables.df(s, dir, "documents")).orderBy(col("source"))
  }

  /** Per-source precision / recall / F1 / Cohen's kappa of the
    * classifier's keep decision against the deterministic relevance
    * rule — the confusion-matrix report every filtering-model rollout
    * reads next to its AUC. Every metric is ONE division of exact
    * integer counts (F1 as 2tp/(2tp+fp+fn); kappa via the integer
    * identity (n·(tp+tn) − marg)/(n² − marg) with
    * marg = (tp+fp)(tp+fn)+(fn+tn)(fp+tn) — the (po−pe)/(1−pe) form
    * with the 1/n's cleared), so cross-engine parity needs no float
    * folds; degenerate slices guard to NULL on both sides. Scale: one
    * score pass + a source-cardinality aggregate. */
  def classifierPrf(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val scored = classifierScore(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .withColumn("pred", (col("dot") >= 0).cast("long"))
      .withColumn("act", (col("doc_id") % 3 === 0).cast("long"))
    val c = scored.groupBy(col("source")).agg(
      sum(when(col("pred") === 1 && col("act") === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(col("pred") === 1 && col("act") === 0, 1L).otherwise(0L)).as("fp"),
      sum(when(col("pred") === 0 && col("act") === 1, 1L).otherwise(0L)).as("fn"),
      sum(when(col("pred") === 0 && col("act") === 0, 1L).otherwise(0L)).as("tn"))
    val n = col("tp") + col("fp") + col("fn") + col("tn")
    val marg = (col("tp") + col("fp")) * (col("tp") + col("fn")) +
      (col("fn") + col("tn")) * (col("fp") + col("tn"))
    c.select(col("source"), col("tp"), col("fp"), col("fn"), col("tn"),
      when(col("tp") + col("fp") > 0,
        round(col("tp").cast("double") / (col("tp") + col("fp")), 6))
        .as("prec"),
      when(col("tp") + col("fn") > 0,
        round(col("tp").cast("double") / (col("tp") + col("fn")), 6))
        .as("rec"),
      when(lit(2) * col("tp") + col("fp") + col("fn") > 0,
        round((lit(2) * col("tp")).cast("double") /
          (lit(2) * col("tp") + col("fp") + col("fn")), 6)).as("f1"),
      when(n * n =!= marg,
        round((n * (col("tp") + col("tn")) - marg).cast("double") /
          (n * n - marg), 6)).as("kappa"))
  }

  val textClassifierPrf: Q = Q.df(
    "classifier_eval_prf",
    s"""with $classifierDotCte,
       |s as (select d.doc_id, doc.source,
       |    case when d.dot >= 0 then 1 else 0 end as pred,
       |    case when d.doc_id % 3 = 0 then 1 else 0 end as act
       |  from dots d join documents doc using (doc_id)),
       |c as (select source,
       |    cast(sum(case when pred = 1 and act = 1 then 1 else 0 end) as bigint) as tp,
       |    cast(sum(case when pred = 1 and act = 0 then 1 else 0 end) as bigint) as fp,
       |    cast(sum(case when pred = 0 and act = 1 then 1 else 0 end) as bigint) as fn,
       |    cast(sum(case when pred = 0 and act = 0 then 1 else 0 end) as bigint) as tn
       |  from s group by source)
       |select source, tp, fp, fn, tn,
       |  case when tp + fp > 0
       |    then round(cast(tp as double) / (tp + fp), 6) end as prec,
       |  case when tp + fn > 0
       |    then round(cast(tp as double) / (tp + fn), 6) end as rec,
       |  case when 2 * tp + fp + fn > 0
       |    then round(cast(2 * tp as double) / (2 * tp + fp + fn), 6)
       |    end as f1,
       |  case when (tp+fp+fn+tn) * (tp+fp+fn+tn)
       |         <> (tp+fp)*(tp+fn) + (fn+tn)*(fp+tn)
       |    then round(cast((tp+fp+fn+tn) * (tp+tn)
       |           - ((tp+fp)*(tp+fn) + (fn+tn)*(fp+tn)) as double)
       |      / ((tp+fp+fn+tn) * (tp+fp+fn+tn)
       |         - ((tp+fp)*(tp+fn) + (fn+tn)*(fp+tn))), 6)
       |    end as kappa
       |from c order by source""".stripMargin) { (s, dir) =>
    classifierPrf(Tables.df(s, dir, "documents")).orderBy(col("source"))
  }

  /** Reliability table (the data behind a calibration diagram): vote
    * scores clamped to [−5000, 4999] and binned at width 1000 (the
    * shift-then-floor-divide keeps the operand non-negative, where
    * Spark `div` and DuckDB `//` agree), with per-bin count and
    * empirical positive rate. A well-calibrated filter shows acc rising
    * monotonically with the score bin — the check run before picking a
    * keep threshold. One score pass, bin-cardinality output. */
  def classifierReliability(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    classifierScore(docs)
      .withColumn("act", (col("doc_id") % 3 === 0).cast("long"))
      .withColumn("bin",
        (expr("(greatest(least(dot, 4999L), -5000L) + 5000L) div 1000")
          - lit(5)).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("act")).as("n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n"), 6).as("acc"))

  val textClassifierReliability: Q = Q.df(
    "classifier_eval_reliability",
    s"""with $classifierDotCte
       |select (greatest(least(dot, 4999), -5000) + 5000) // 1000 - 5 as bin,
       |  cast(count(*) as bigint) as n,
       |  cast(sum(case when doc_id % 3 = 0 then 1 else 0 end) as bigint)
       |    as n_pos,
       |  round(cast(sum(case when doc_id % 3 = 0 then 1 else 0 end)
       |      as double) / count(*), 6) as acc
       |from dots group by 1 order by bin""".stripMargin) { (s, dir) =>
    classifierReliability(Tables.df(s, dir, "documents"))
      .orderBy(col("bin"))
  }

  // ---- on-engine classifier TRAINING (fixed-point distillation loop) ------

  /** Training rounds / fixed-point target scale / damping (the Jacobi
    * step is divided by H·[[TrainDamp]]) / train-test split modulus for
    * [[classifierTrain]]. Six rounds at damp 64 converge on every
    * fixture scale (mistakes strictly decreasing, spec-pinned). */
  val TrainRounds = 6
  val TrainScale: Long = 1L << 20
  val TrainDamp: Long = 64L
  val TrainSplitMod = 5

  /** Hashed-feature rows (doc_id, bucket, c) over the SAME
    * unigram+adjacent-bigram space the deployed classifier scores —
    * one kernel pass, map-side combined into per-doc-bucket counts. */
  private def trainFeatures(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = text.split(" ", -1)
        val bs = scala.collection.mutable.ArrayBuffer.empty[Int]
        def b(f: String): Int =
          ((Text.fnv64(f) & 0xFFFFFFFFL) % ClassifierBuckets).toInt
        toks.foreach(t => bs += b(t))
        var i = 0
        while (i < toks.length - 1) { bs += b(toks(i) + "_" + toks(i + 1)); i += 1 }
        bs.groupBy(identity).iterator
          .map { case (k, v) => (id, k, v.size.toLong) }
      }
      .toDF("doc_id", "bucket", "c")
  }

  /** Supervised labels for the training demo: a deterministic CONTENT
    * rule (more `fast` tokens than `slow` — near-balanced on the
    * fixture), the stand-in for human quality labels exactly as
    * `doc_id % 3` stands in for relevance in the eval family; content-
    * derived so the label is actually LEARNABLE from the n-gram
    * features (an id-derived label has no signal to train on). */
  private def trainLabels(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"),
      when(expr("size(filter(split(text, ' '), x -> x = 'fast'))") >
          expr("size(filter(split(text, ' '), x -> x = 'slow'))"), 1L)
        .otherwise(-1L).as("y"))

  /** TRAIN the quality classifier ON-ENGINE — the pipeline stage the
    * inference entry ([[classifierScore]], formula weights) left to an
    * external trainer. Logistic-regression shape in its exactly-
    * replayable fixed-point form: per round, one distributed pass
    * computes the least-squares gradient against ±[[TrainScale]]
    * targets (the IRLS working response of the logistic fit, held
    * fixed) and the update divides per-bucket by the DIAGONAL
    * curvature H_b = Σ c² times [[TrainDamp]] — a Jacobi/diagonal-
    * Newton step whose division is symmetric integer floor-division,
    * so every round replays bit-exact in the oracle's unrolled CTEs
    * (the `text_bpe_merge_loop` discipline applied to a supervised
    * loop; a transcendental sigmoid would not replay cross-engine,
    * the diagonal-quadratic surrogate does).
    *
    * Scale shape: the MODEL is bucket-sized (≤ [[ClassifierBuckets]]
    * rows — broadcast into every join), the per-round work is one
    * feature-table join + two map-side-combined aggregations (the
    * treeAggregate shape), and the driver sees only per-round scalar
    * diagnostics — never a corpus-sized row. At 100 TB the same six
    * rounds are six scans of the (hash-bucketed) feature table.
    * Output: the training TRACE (round, training mistakes, model L1
    * mass) — strictly decreasing mistakes spec-pinned; held-out AUC ≥
    * floor pinned via the [[classifierAuc]] machinery in
    * [[graft.TextSpec]]. */
  def classifierTrain(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val docs = Tables.df(s, dir, "documents")
    val train = docs.filter(col("doc_id") % TrainSplitMod =!= 0)
    val cnt = graft.plans.Checkpoints.materialize(trainFeatures(train))
    val lab = graft.plans.Checkpoints.materialize(
      trainLabels(train).select(col("doc_id"), col("y")))
    // The MODEL-sized pieces (curvature, weights, the Jacobi step) live
    // on the DRIVER: ≤ ClassifierBuckets (4096) longs — the
    // trainCentroids model-collect contract. The driver update replays
    // the exact integer algebra the per-round DataFrame join computed
    // (truncating long division on nonnegative operands ≡ the old
    // symmetric `div`), but the model is now a LOCAL relation: no
    // per-round checkpoint job for w, no per-round h-table join, and a
    // visibly smaller plan for Catalyst to re-plan each round — the
    // round's only corpus-sized passes are the gradient and the
    // re-score, which is the algorithm's floor.
    val hMap: Map[Int, Long] =
      cnt.groupBy(col("bucket")).agg(sum(col("c") * col("c")).as("h"))
        .as[(Int, Long)].collect().toMap
    try {
      var wMap: Map[Int, Long] = null
      val trace = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
      // z is MATERIALIZED once per round and reused by BOTH its
      // consumers — the mistake diagnostic of round t and the gradient
      // of round t+1.
      var z: org.apache.spark.sql.DataFrame =
        lab.select(col("doc_id"), lit(0L).as("z"))
      var zOwned = false
      for (t <- 1 to TrainRounds) {
        // gradient: the round's corpus-sized pass, model-sized collect
        val g = cnt.join(z, Seq("doc_id")).join(lab, Seq("doc_id"))
          .groupBy(col("bucket"))
          .agg(sum((col("z") - col("y") * lit(TrainScale)) * col("c"))
            .as("gw"))
          .as[(Int, Long)].collect()
        // Jacobi step on the driver — same inner-join key semantics as
        // the old g ⋈ h ⋈ w plan (g's buckets ≡ cnt's every round)
        wMap = g.iterator.flatMap { case (b, gw) =>
          hMap.get(b).flatMap { h =>
            val d = h * TrainDamp
            val step = if (gw >= 0) gw / d else -((-gw) / d)
            val prev =
              if (wMap == null) Some(0L)
              else wMap.get(b) // inner-join: drop if absent
            prev.map(p => b -> (p - step))
          }
        }.toMap
        val wDf = wMap.toSeq.sortBy(_._1).toDF("bucket", "w")
        val zNext = graft.plans.Checkpoints.materialize(
          cnt.join(broadcast(wDf), Seq("bucket"))
            .groupBy(col("doc_id")).agg(sum(col("c") * col("w")).as("z")))
        if (zOwned) graft.plans.Checkpoints.free(z)
        z = zNext; zOwned = true
        // one small job over the materialized z for the mistake count;
        // the L1 mass folds on the driver from the local model
        val m = lab.join(z, Seq("doc_id"))
          .filter(col("y") * col("z") <= 0)
          .agg(count(lit(1)).as("m")).first().getLong(0)
        val l1 = wMap.valuesIterator.map(math.abs).sum
        trace += ((t, m, l1))
      }
      if (zOwned) graft.plans.Checkpoints.free(z)
      trace.toSeq.toDF("round", "mistakes", "w_l1")
        .select(col("round").cast("int"), col("mistakes"), col("w_l1"))
    } finally Seq(cnt, lab).foreach(graft.plans.Checkpoints.free)
  }

  /** The trained model (bucket, w) after [[TrainRounds]] rounds — spec
    * support for the held-out AUC floor ([[graft.TextSpec]]). Same
    * loop, model returned instead of the trace. */
  private[graft] def trainedModel(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.df(s, dir, "documents")
    val train = docs.filter(col("doc_id") % TrainSplitMod =!= 0)
    val cnt = graft.plans.Checkpoints.materialize(trainFeatures(train))
    val lab = trainLabels(train).select(col("doc_id"), col("y"))
    val hd = cnt.groupBy(col("bucket")).agg(sum(col("c") * col("c")).as("h"))
    try {
      var w: org.apache.spark.sql.DataFrame =
        null
      for (_ <- 1 to TrainRounds) {
        val z =
          if (w == null)
            lab.select(col("doc_id"), lit(0L).as("z"))
          else cnt.join(broadcast(w), Seq("bucket"))
            .groupBy(col("doc_id")).agg(sum(col("c") * col("w")).as("z"))
        val g = cnt.join(z, Seq("doc_id")).join(lab, Seq("doc_id"))
          .groupBy(col("bucket"))
          .agg(sum((col("z") - col("y") * lit(TrainScale)) * col("c"))
            .as("gw"))
        val step = expr(s"case when gw >= 0 then gw div (h * $TrainDamp) " +
          s"else -((-gw) div (h * $TrainDamp)) end")
        val prevW = if (w == null) lit(0L) else col("w")
        val wNext = graft.plans.Checkpoints.materialize(
          (if (w == null) g.join(hd, Seq("bucket"))
           else g.join(hd, Seq("bucket")).join(w, Seq("bucket")))
            .select(col("bucket"), (prevW - step).as("w")))
        if (w != null) graft.plans.Checkpoints.free(w)
        w = wNext
      }
      w
    } finally graft.plans.Checkpoints.free(cnt)
  }

  /** Held-out labels + scores under the trained model — the
    * [[classifierAuc]] machinery's inputs for the floor spec. */
  private[graft] def trainedHeldOutScores(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    val docs = Tables.df(s, dir, "documents")
    val held = docs.filter(col("doc_id") % TrainSplitMod === 0)
    val w = trainedModel(s, dir)
    val scores = trainFeatures(held).join(broadcast(w), Seq("bucket"))
      .groupBy(col("doc_id")).agg(sum(col("c") * col("w")).as("z"))
    val out = trainLabels(held).join(scores, Seq("doc_id"))
    out
  }

  /** Oracle: the training loop unrolled round by round — features,
    * labels, curvature, then per round gradient → Jacobi step →
    * mistakes + L1 trace, every integer decision replayed. */
  private def trainOracle: String = {
    val S = TrainScale
    val D = TrainDamp
    def sdiv(x: String, h: String) =
      s"case when $x >= 0 then $x // ($h * $D) else -((-($x)) // ($h * $D)) end"
    val rounds = (1 to TrainRounds).map { t =>
      val prevW = if (t == 1) "cast(0 as bigint)" else s"w${t - 1}.w"
      val joinPrev = if (t == 1) "" else s" join w${t - 1} using (bucket)"
      s"""g$t as materialized (
         |  select cnt.bucket,
         |    sum((z$t.z - lab.y * $S) * cnt.c) as gw
         |  from cnt join z$t using (doc_id) join lab using (doc_id)
         |  group by cnt.bucket),
         |w$t as materialized (
         |  select g$t.bucket,
         |    cast($prevW - ${sdiv(s"g$t.gw", "hd.h")} as bigint) as w
         |  from g$t join hd using (bucket)$joinPrev),
         |z${t + 1} as materialized (
         |  select cnt.doc_id, cast(sum(cnt.c * w$t.w) as bigint) as z
         |  from cnt join w$t using (bucket) group by cnt.doc_id),
         |m$t as (
         |  select cast(count(*) as bigint) as mistakes
         |  from z${t + 1} join lab using (doc_id)
         |  where lab.y * z${t + 1}.z <= 0),
         |l$t as (select cast(sum(abs(w)) as bigint) as w_l1 from w$t)"""
        .stripMargin
    }.mkString(",\n")
    val out = (1 to TrainRounds)
      .map(t => s"select cast($t as int) as round, mistakes, w_l1 " +
        s"from m$t, l$t")
      .mkString("\nunion all\n")
    s"""with tok as (
       |  select doc_id, unnest(string_split(text, ' ')) as tok,
       |    generate_subscripts(string_split(text, ' '), 1) as pos
       |  from documents where doc_id % $TrainSplitMod <> 0),
       |feats as (
       |  select doc_id, tok as feat from tok
       |  union all
       |  select doc_id, feat from (
       |    select doc_id, tok || '_' || lead(tok) over
       |      (partition by doc_id order by pos) as feat from tok)
       |  where feat is not null),
       |cnt as materialized (
       |  select doc_id,
       |    cast(${Text.sqlFnv64("feat")} % 4294967296::hugeint
       |         % $ClassifierBuckets as bigint) as bucket,
       |    cast(count(*) as bigint) as c
       |  from feats group by 1, 2),
       |lab as materialized (
       |  select doc_id,
       |    case when len(list_filter(string_split(text, ' '),
       |           x -> x = 'fast'))
       |         > len(list_filter(string_split(text, ' '),
       |           x -> x = 'slow'))
       |      then 1 else -1 end as y
       |  from documents where doc_id % $TrainSplitMod <> 0),
       |hd as materialized (
       |  select bucket, cast(sum(c * c) as bigint) as h
       |  from cnt group by bucket),
       |z1 as (select doc_id, cast(0 as bigint) as z from lab),
       |$rounds
       |$out
       |order by round""".stripMargin
  }

  val classifierTrainLogreg: Q = Q.df(
    "classifier_train_logreg", trainOracle) { (s, dir) =>
    classifierTrain(s, dir).orderBy(col("round"))
  }

  /** PII-pattern flags — the filter a training-data pipeline runs before
    * anything else. Pure regexp column expressions (no lookbehind, so
    * the patterns behave identically under Java regex and RE2). */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhoneRe = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

  val textPiiFlags: Q = Q.df(
    "text_pii_flags",
    s"""select doc_id,
       |  cast(len(regexp_extract_all(text, '$EmailRe')) as bigint) as n_email,
       |  cast(len(regexp_extract_all(text, '$PhoneRe')) as bigint) as n_phone,
       |  cast(len(regexp_extract_all(text, '[0-9]')) as bigint) as n_digits,
       |  regexp_matches(text, '$EmailRe')
       |    or regexp_matches(text, '$PhoneRe') as has_pii
       |from documents order by doc_id""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "documents")
      .select(col("doc_id"),
        regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_email"),
        regexp_count(col("text"), lit(PhoneRe)).cast("long").as("n_phone"),
        regexp_count(col("text"), lit("[0-9]")).cast("long").as("n_digits"),
        (col("text").rlike(EmailRe) || col("text").rlike(PhoneRe)).as("has_pii"))
      .orderBy(col("doc_id"))
  }

  /** PII REDACTION — the rewrite the flags entry only detects: emails
    * then phone numbers replaced by typed placeholders, the standard
    * pre-training scrub (flag-only pipelines still ship the PII;
    * training corpora need the substitution). Replacement order is part
    * of the contract (phone runs on the email-redacted text) and the
    * oracle nests its global regexp_replace in the same order; both
    * engines' regex dialects agree on these character-class patterns
    * (proven since the flags entry). One codegen'd scan pass, zero
    * shuffle at any corpus size — redaction cost is O(bytes), which is
    * why it rides the same pass as quality scoring in a real pipeline. */
  // n_redacted counts phone matches on the EMAIL-REDACTED text, not the
  // raw text, so the count always equals the substitutions present in
  // red_text — a phone-shaped substring consumed by the email pass
  // (e.g. '555-123-4567@host.com') must not inflate the count.
  val textPiiRedact: Q = Q.df(
    "text_pii_redact",
    s"""with er as (select doc_id,
       |    regexp_replace(text, '$EmailRe', '[EMAIL]', 'g') as et,
       |    cast(len(regexp_extract_all(text, '$EmailRe')) as bigint)
       |      as n_email
       |  from documents)
       |select doc_id,
       |  n_email
       |    + cast(len(regexp_extract_all(et, '$PhoneRe')) as bigint)
       |    as n_redacted,
       |  regexp_replace(et, '$PhoneRe', '[PHONE]', 'g') as red_text
       |from er order by doc_id""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "documents")
      .withColumn("et", regexp_replace(col("text"), EmailRe, "[EMAIL]"))
      .select(col("doc_id"),
        (regexp_count(col("text"), lit(EmailRe)) +
          regexp_count(col("et"), lit(PhoneRe))).cast("long")
          .as("n_redacted"),
        regexp_replace(col("et"), PhoneRe, "[PHONE]").as("red_text"))
      .orderBy(col("doc_id"))
  }

  /** Longest candidate phrase RAKE keeps (the standard cap — unbounded
    * runs degenerate into whole-clause "phrases" whose degree swamps
    * the ranking) and the ranked keyphrase count served. */
  val RakeMaxLen = 4
  val RakeTopN = 100

  /** RAKE keyphrase extraction (Rose et al. 2010), corpus-level: split
    * token streams into candidate phrases at STOPWORD boundaries
    * (gaps-and-islands over the non-stopword positions), score each
    * word w by deg(w)/freq(w) over all phrase occurrences (degree =
    * summed length of phrases containing w, so words living in longer
    * collocations outrank bare frequency), and rank phrases by the sum
    * of their word scores — the phrase-level complement of
    * `text_tfidf_topterms`' unigram view, and the cheap keyphrase
    * miner pipelines run before embedding-based labelers.
    *
    * Scale shape: one tokenize pass, one per-doc window (islands), two
    * vocabulary-keyed aggregates (freq/deg — map-side combined), one
    * word-keyed equi-join back (VOCABULARY-sized — broadcastable at
    * fixture scale but not at web scale, so the plan leaves the
    * strategy to AQE), one phrase-keyed aggregate.
    * Determinism: deg/freq are exact ints; a word's score is ONE
    * division; a phrase's score folds its word scores in POSITION
    * order (sorted-struct fold both engines), so identical phrase text
    * scores identically everywhere. */
  val textRakeKeyphrases: Q = Q.df(
    "text_rake_keyphrases", {
      val stops = Text.stopwords("en").map(w => s"'$w'").mkString(", ")
      s"""with idx as (
         |  select doc_id, l, unnest(range(1, len(l) + 1)) as i
         |  from (select doc_id, string_split(text, ' ') as l
         |        from documents)),
         |toks as (select doc_id, i - 1 as p, l[i] as tok from idx),
         |ns as (select doc_id, p, tok,
         |    p - row_number() over (partition by doc_id order by p) as isl
         |  from toks where tok not in ($stops) and tok <> ''),
         |phr as (select doc_id, isl,
         |    list(tok order by p) as words,
         |    array_to_string(list(tok order by p), ' ') as phrase,
         |    cast(count(*) as bigint) as len
         |  from ns group by doc_id, isl
         |  having count(*) <= $RakeMaxLen),
         |wo as (select doc_id, isl, phrase, len, j, words[j] as word
         |  from phr, unnest(range(1, len(words) + 1)) t(j)),
         |ws as (select word, cast(count(*) as bigint) as freq,
         |    cast(sum(len) as bigint) as deg
         |  from wo group by word),
         |sc as (select wo.doc_id, wo.isl, wo.phrase, wo.len,
         |    list(cast(ws.deg as double) / cast(ws.freq as double)
         |      order by wo.j) as ss
         |  from wo join ws on ws.word = wo.word
         |  group by wo.doc_id, wo.isl, wo.phrase, wo.len),
         |ps as (select phrase, len,
         |    list_reduce(list_prepend(cast(0 as double), ss),
         |      (a, x) -> a + x) as score
         |  from sc)
         |select phrase, cast(max(len) as bigint) as n_words,
         |  cast(count(*) as bigint) as n_occ,
         |  round(min(score), 6) as score
         |from ps group by phrase
         |order by min(score) desc, phrase limit $RakeTopN""".stripMargin
    }) { (s, dir) =>
    val stops = Text.stopwords("en")
    val toks = Tables.df(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(split(col("text"), " ", -1)).as(Seq("p", "tok")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("p"))
    val ns = toks
      .filter(!col("tok").isin(stops.map(x => x: Any): _*) &&
        col("tok") =!= "")
      .withColumn("isl", col("p") - row_number().over(w))
    val phr = ns.groupBy(col("doc_id"), col("isl"))
      .agg(sort_array(collect_list(struct(col("p"), col("tok")))).as("ws"),
        count(lit(1)).as("len"))
      .filter(col("len") <= RakeMaxLen)
      .select(col("doc_id"), col("isl"), col("len"),
        expr("transform(ws, x -> x.tok)").as("words"),
        array_join(expr("transform(ws, x -> x.tok)"), " ").as("phrase"))
    val wo = phr.select(col("doc_id"), col("isl"), col("phrase"), col("len"),
      posexplode(col("words")).as(Seq("j", "word")))
    val wstat = wo.groupBy(col("word"))
      .agg(count(lit(1)).as("freq"), sum(col("len")).as("deg"))
    val sc = wo.join(wstat, Seq("word"))
      .withColumn("wscore",
        col("deg").cast("double") / col("freq").cast("double"))
      .groupBy(col("doc_id"), col("isl"), col("phrase"), col("len"))
      .agg(sort_array(collect_list(struct(col("j"), col("wscore"))))
        .as("ss"))
      .select(col("phrase"), col("len"),
        aggregate(col("ss"), lit(0.0d),
          (a, x) => a + x.getField("wscore")).as("score"))
    sc.groupBy(col("phrase"))
      .agg(max(col("len")).as("n_words"), count(lit(1)).as("n_occ"),
        min(col("score")).as("s"))
      .select(col("phrase"), col("n_words"), col("n_occ"),
        round(col("s"), 6).as("score"), col("s"))
      .orderBy(col("s").desc, col("phrase")).limit(RakeTopN)
      .drop("s")
  }

  /** Within-document repetition (Gopher-style quality rule): the
    * fraction of duplicate word trigrams inside each document. Heavily
    * templated/looping text scores high and is dropped before training.
    * One codegen'd scan pass — total grams from the overlapping-gram
    * regex, distinct grams from the same extraction deduplicated — zero
    * shuffle at any corpus size. */
  val RepetitionMax = 0.2

  val textRepetition: Q = Q.df(
    "text_repetition",
    // grams via list_transform, not the lookahead regex: DuckDB's RE2
    // rejects (?=...). Same tokenization contract as the Spark side.
    s"""with g as (
       |  select doc_id, ${Text.sqlTrigramList("t")} as gs
       |  from (select doc_id, string_split(text, ' ') as t from documents))
       |select doc_id,
       |  cast(len(gs) as bigint) as n_grams,
       |  cast(len(list_distinct(gs)) as bigint) as n_distinct,
       |  case when len(gs) = 0 then cast(0.0 as double)
       |       else cast(len(gs) - len(list_distinct(gs)) as double)
       |            / cast(len(gs) as double) end as rep_ratio,
       |  case when len(gs) = 0 then false
       |       else (cast(len(gs) - len(list_distinct(gs)) as double)
       |            / cast(len(gs) as double)) > $RepetitionMax
       |       end as is_repetitive
       |from g order by doc_id""".stripMargin) { (s, dir) =>
    val grams = regexp_extract_all(col("text"),
      lit("(?=([^ ]* [^ ]* [^ ]*))[^ ]* "), lit(1))
    val n = size(grams).cast("long")
    val nd = size(array_distinct(grams)).cast("long")
    val ratio = when(n === 0, lit(0.0))
      .otherwise((n - nd).cast("double") / n.cast("double"))
    Tables.df(s, dir, "documents")
      .select(col("doc_id"), n.as("n_grams"), nd.as("n_distinct"),
        ratio.as("rep_ratio"),
        when(n === 0, lit(false)).otherwise(ratio > RepetitionMax)
          .as("is_repetitive"))
      .orderBy(col("doc_id"))
  }

  /** Semi-structured JSON processing over the events.props column:
    * path extraction (string-typed and cast) plus schema-applied parsing
    * (from_json → typed struct field) — the ingest surface pipelines use
    * for event payloads. */
  val jsonExtractProps: Q = Q.df(
    "json_extract_props",
    """select event_id,
      |  json_extract_string(props, '$.k') as k_str,
      |  cast(json_extract(props, '$.k') as bigint) as k_val,
      |  cast(json_extract(props, '$.k') as int) as k_typed
      |from events order by event_id limit 2000""".stripMargin) { (s, dir) =>
    // ONE from_json per row; the three output shapes (string path
    // extraction, bigint, typed int) are derived from the parsed struct.
    // The earlier form parsed each document three times (2×
    // get_json_object + from_json) and cost 2.3× the runtime. The field
    // parses as STRING — the same value get_json_object's path
    // extraction yields for scalars (numbers keep their JSON text, so
    // a non-integral k still matches the oracle's
    // json_extract_string) — and the numeric outputs are casts of it.
    Tables.df(s, dir, "events")
      .withColumn("j", from_json(col("props"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.StringType)))))
      .select(col("event_id"),
        col("j.k").as("k_str"),
        col("j.k").cast("long").as("k_val"),
        col("j.k").cast("int").as("k_typed"))
      .orderBy(col("event_id")).limit(2000)
  }

  /** JSON construction — the inverse of [[jsonExtractProps]]: row
    * values → JSON text (Spark to_json over named_struct == DuckDB
    * to_json over a struct literal, byte-identical compact rendering
    * for int/plain-string members), object key enumeration
    * (json_object_keys == json_keys, scalarized through array_join),
    * and array-length introspection of a built JSON array. The raw
    * JSON string travels in the compared output, so the serialization
    * format itself is hash-pinned. */
  val jsonBuild: Q = Q.df(
    "expr_json_build",
    """select o_orderkey as k,
      |  cast(to_json({'k': o_orderkey, 's': o_orderstatus}) as varchar)
      |    as j,
      |  array_to_string(
      |    json_keys(to_json({'k': o_orderkey, 's': o_orderstatus})), ',')
      |    as ks,
      |  cast(json_array_length(
      |    to_json(range(1, cast(2 + o_orderkey % 4 as bigint)))) as bigint)
      |    as al
      |from orders order by k limit 400""".stripMargin) { (s, dir) =>
    val obj = to_json(struct(col("o_orderkey").as("k"),
      col("o_orderstatus").as("s")))
    Tables.df(s, dir, "orders")
      .select(col("o_orderkey").as("k"),
        obj.as("j"),
        array_join(json_object_keys(obj), ",").as("ks"),
        json_array_length(to_json(sequence(lit(1),
          (lit(1) + col("o_orderkey") % 4).cast("int")))).cast("long")
          .as("al"))
      .orderBy(col("k")).limit(400)
  }

  /** Spark 4's VARIANT type driven end-to-end: per-row JSON text is
    * parsed ONCE into a variant (the open semi-structured column format
    * an ingest pipeline stores telemetry/props in), then typed path
    * extraction pulls scalars, a nested-object member, an array
    * element, and a missing path (NULL through try_variant_get). The
    * oracle reconstructs the same JSON text and extracts through
    * DuckDB's JSON path kernels — extracted SCALARS are compared; the
    * variant binary and schema text never travel (engine-internal
    * encodings are not part of the cross-engine contract). One
    * codegen-friendly scan, zero shuffle at any scale. */
  val exprVariant: Q = Q.df(
    "expr_variant",
    """with j as (select doc_id,
      |  to_json({'id': doc_id, 'lang': lang, 'n': n_chars,
      |           'nested': {'flag': doc_id % 2 = 0},
      |           'arr': [doc_id, cast(n_chars as bigint)]}) as txt
      |from documents)
      |select doc_id,
      |  cast(json_extract(txt, '$.id') as bigint) as vid,
      |  json_extract_string(txt, '$.lang') as vlang,
      |  cast(json_extract(txt, '$.nested.flag') as boolean) as vflag,
      |  cast(json_extract(txt, '$.arr[1]') as bigint) as varr1,
      |  cast(json_extract(txt, '$.missing') as bigint) as vmissing
      |from j order by doc_id""".stripMargin) { (s, dir) =>
    // each engine builds the JSON with its OWN struct serializer (so
    // quotes/backslashes in string members escape correctly); only the
    // EXTRACTED scalars travel into the compare, never the raw text
    Tables.df(s, dir, "documents")
      .withColumn("txt", to_json(struct(
        col("doc_id").as("id"), col("lang").as("lang"),
        col("n_chars").as("n"),
        struct((col("doc_id") % 2 === 0).as("flag")).as("nested"),
        array(col("doc_id"), col("n_chars").cast("long")).as("arr"))))
      .withColumn("v", expr("parse_json(txt)"))
      .select(col("doc_id"),
        expr("variant_get(v, '$.id', 'bigint')").as("vid"),
        expr("variant_get(v, '$.lang', 'string')").as("vlang"),
        expr("variant_get(v, '$.nested.flag', 'boolean')").as("vflag"),
        expr("variant_get(v, '$.arr[1]', 'bigint')").as("varr1"),
        expr("try_variant_get(v, '$.missing', 'bigint')").as("vmissing"))
      .orderBy(col("doc_id"))
  }

  /** Winnowing gram size (tokens) and window (grams) — k=3, w=4 gives
    * the guarantee that any shared token run of length >= k+w-1 = 6
    * leaves at least one common fingerprint. */
  val WinnowK = 3
  val WinnowW = 4

  /** Robust winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * algorithm): hash every k-token gram, slide a w-gram window, keep
    * each window's minimum — a position-robust document signature whose
    * size adapts to document length (~2/(w+1) of grams) and which
    * GUARANTEES detection of shared runs >= k+w-1 tokens, unlike modulo
    * selection (0 mod p can miss arbitrarily long matches). Hashes are
    * [[Text.fnv64]] masked to 63 bits so min-selection order is
    * identical in signed Spark longs and the oracle's hugeint FNV
    * emulation. One primitive kernel pass per document, zero shuffle at
    * any corpus scale; the selected-set join (not built here) is the
    * same inverted-index shape as [[Dedup.substringSpanPairs]]. */
  def winnowFingerprints(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val toks = text.split(" ", -1)
        val n = toks.length - WinnowK + 1
        val hs = new Array[Long](math.max(n, 0))
        var i = 0
        while (i < n) {
          hs(i) = Text.fnv64(
            s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}") & Long.MaxValue
          i += 1
        }
        val sel = scala.collection.mutable.SortedSet.empty[Long]
        if (hs.nonEmpty) {
          val m = math.max(hs.length - WinnowW + 1, 1)
          var j = 0
          while (j < m) {
            var mn = hs(j)
            var t = j + 1
            while (t < math.min(j + WinnowW, hs.length)) {
              if (hs(t) < mn) mn = hs(t)
              t += 1
            }
            sel += mn
            j += 1
          }
        }
        (id, hs.length.toLong, sel.size.toLong, sel.toArray)
      }
      .toDF("doc_id", "n_grams", "n_selected", "fps")
  }

  /** The winnowing oracle recomputes the masked FNV gram hashes with the
    * [[rollingOracle]] hugeint emulation, then mirrors the window-min
    * selection with clamped list slices. */
  private[operators] def winnowOracle: String = {
    val fnvOfG =
      s"cast(${Text.sqlFnv64("g")} % 9223372036854775808::hugeint as bigint)"
    s"""with t as (select doc_id, string_split(text, ' ') as l from documents),
       |gr as (select doc_id,
       |  list_transform(range(1, greatest(len(l) - ${WinnowK - 2}, 1)),
       |    i -> array_to_string(l[i : i + ${WinnowK - 1}], ' ')) as grams
       |  from t),
       |h as (select doc_id,
       |  list_transform(grams, g -> $fnvOfG) as hs from gr),
       |m as (select doc_id, cast(len(hs) as bigint) as n_grams,
       |  case when len(hs) = 0 then []::bigint[]
       |       else list_transform(range(1, greatest(len(hs) - ${WinnowW - 1}, 1) + 1),
       |              i -> list_min(hs[i : i + ${WinnowW - 1}])) end as mins
       |  from h)
       |select doc_id, n_grams,
       |  cast(len(list_distinct(mins)) as bigint) as n_selected,
       |  list_sort(list_distinct(mins)) as fps
       |from m order by doc_id""".stripMargin
  }

  /** Fingerprint set serialized to a comma-joined string in the compared
    * SELECT on both sides — content still hash-checked per element, but
    * the driver's pandas sort (which cannot order ndarray cells) sees a
    * scalar. [[winnowOracle]] itself keeps the list shape because the
    * winnowed span-dedup oracle UNNESTs it; only this entry's outer
    * SELECT scalarizes. DuckDB's array_to_string is NULL on the empty
    * list where Spark's array_join is '' — hence the coalesce. The
    * Spark-side array is already sorted ascending (SortedSet), matching
    * the oracle's list_sort. */
  val textWinnow: Q = Q.df("text_fingerprint_winnow",
    s"""select doc_id, n_grams, n_selected,
       |  coalesce(array_to_string(fps, ','), '') as fps
       |from (${winnowOracle}) w order by doc_id""".stripMargin) {
    (s, dir) =>
      winnowFingerprints(Tables.df(s, dir, "documents"))
        .select(col("doc_id"), col("n_grams"), col("n_selected"),
          array_join(col("fps").cast("array<string>"), ",").as("fps"))
        .orderBy(col("doc_id"))
  }

  /** Word-unigram Shannon entropy + type-token ratio per document — the
    * standard lexical-diversity quality signals (boilerplate/spam pages
    * repeat tokens and score low; natural prose scores near log2 of its
    * vocabulary). Entropy is computed as log2(n) - Σ c·log2(c) / n over
    * the per-doc token counts; the Σ runs as a sequential fold over the
    * SORTED count list in BOTH engines, so the double summation order is
    * bit-identical to the oracle (same determinism trick as the cosine
    * kernels). Scale: two keyed aggregations with map-side combine
    * (doc_id,tok → doc_id); the folded array is bounded by per-document
    * vocabulary, never corpus vocabulary, so no task ever sees global
    * state. */
  val textEntropy: Q = Q.df(
    "text_entropy",
    """with cnt as (
      |  select doc_id, tok, cast(count(*) as bigint) as c
      |  from (select doc_id, unnest(string_split(text, ' ')) as tok
      |        from documents)
      |  group by doc_id, tok),
      |agg as (
      |  select doc_id,
      |    list_sort(list(cast(c as double))) as cs,
      |    cast(sum(c) as bigint) as n_tokens,
      |    cast(count(*) as bigint) as n_types
      |  from cnt group by doc_id)
      |select doc_id, n_tokens, n_types,
      |  round(log2(cast(n_tokens as double))
      |    - list_reduce(list_prepend(cast(0 as double), cs),
      |        (acc, x) -> acc + x * log2(x)) / cast(n_tokens as double),
      |    6) as entropy,
      |  round(cast(n_types as double) / cast(n_tokens as double), 6) as ttr
      |from agg order by doc_id""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sort_array(collect_list(col("c").cast("double"))).as("cs"),
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_types"),
        round(log2(col("n_tokens").cast("double"))
          - aggregate(col("cs"), lit(0.0d), (acc, x) => acc + x * log2(x))
            / col("n_tokens").cast("double"), 6).as("entropy"),
        round(col("n_types").cast("double") / col("n_tokens").cast("double"),
          6).as("ttr"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-trained unigram LM score per document — the perplexity-proxy
    * quality filter (CCNet-style: score each doc by the average log-prob
    * of its tokens under a model trained on the corpus itself; gibberish
    * and rare-token spam score far below prose). lm_score is
    * (1/n) Σ log2 p(tok_i) over every token OCCURRENCE, with
    * p = count(tok)/total derived as log2(c) - log2(t) so both engines
    * evaluate the same two libm calls per token; the per-doc Σ folds
    * over the sorted log-prob list (the [[textEntropy]] determinism
    * contract).
    *
    * Scale shape: the "model" is a unigram count table, never
    * collected — training is one map-side-combined groupBy, scoring is
    * an equi-join of the token stream against it. Hot tokens ("the")
    * skew that join's key distribution; AQE's skew-join split bounds the
    * straggler, and at 100 TB the standard refinement is broadcasting
    * the top-k hottest vocabulary rows and joining only the tail. */
  val textLmScore: Q = Q.df(
    "text_lm_score",
    """with tok as (select doc_id, unnest(string_split(text, ' ')) as tok
      |            from documents),
      |vocab as (select tok, cast(count(*) as bigint) as c
      |          from tok group by tok),
      |tot as (select cast(sum(c) as bigint) as t from vocab),
      |scored as (
      |  select doc_id,
      |    log2(cast(c as double)) - log2(cast(t as double)) as lp
      |  from tok join vocab using (tok) cross join tot),
      |agg as (select doc_id, list_sort(list(lp)) as lps,
      |          cast(count(*) as bigint) as n_tokens
      |        from scored group by doc_id)
      |select doc_id, n_tokens,
      |  round(list_reduce(list_prepend(cast(0 as double), lps),
      |          (acc, x) -> acc + x) / cast(n_tokens as double), 6) as lm_score
      |from agg order by doc_id""".stripMargin) { (s, dir) =>
    val toks = Tables.df(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum(col("c")).as("t"))
    toks
      .join(vocab, Seq("tok"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        (log2(col("c").cast("double")) - log2(col("t").cast("double")))
          .as("lp"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("lp"))).as("lps"),
        count(lit(1)).as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        round(aggregate(col("lps"), lit(0.0d), (acc, x) => acc + x)
          / col("n_tokens").cast("double"), 6).as("lm_score"))
      .orderBy(col("doc_id"))
  }

  /** Bigram LM score with stupid backoff — the stronger form of
    * [[textLmScore]]'s quality filter: each token is scored by its
    * bigram probability given the previous token, backing off to
    * 0.4 × unigram when the bigram is unseen (Brants et al.'s "stupid
    * backoff", the standard web-scale choice because it needs no
    * discounting pass). Both count tables are corpus-trained and
    * joined, never collected; per-token log-probs derive from integer
    * counts via the same left-to-right double expression in both
    * engines, and the per-doc Σ folds over the sorted list (the
    * [[textEntropy]] determinism contract).
    *
    * Scale shape: one lag window partitioned by doc (per-doc token
    * sequences, bounded state), two map-side-combined count tables, and
    * three equi-joins of the token stream against them — hot-token skew
    * handled by AQE exactly as in [[textLmScore]]. */
  val textLmBigram: Q = Q.df(
    "text_lm_bigram",
    """with idx as (
      |  select doc_id, l, unnest(range(1, len(l) + 1)) as i
      |  from (select doc_id, string_split(text, ' ') as l from documents)),
      |pos as (
      |  select doc_id, i, l[i] as tok,
      |    case when i > 1 then l[i - 1] else null end as prev
      |  from idx),
      |uni as (select tok, cast(count(*) as bigint) as c
      |        from pos group by tok),
      |tot as (select cast(sum(c) as bigint) as t from uni),
      |big as (select prev, tok, cast(count(*) as bigint) as cp
      |        from pos where prev is not null group by prev, tok),
      |scored as (
      |  select pos.doc_id,
      |    case
      |      when pos.prev is null then
      |        log2(cast(cu.c as double) / cast(tot.t as double))
      |      when big.cp is not null then
      |        log2(cast(big.cp as double) / cast(cv.c as double))
      |      else
      |        log2(0.4 * cast(cu.c as double) / cast(tot.t as double))
      |    end as lp
      |  from pos
      |  join uni cu on cu.tok = pos.tok
      |  left join uni cv on cv.tok = pos.prev
      |  left join big on big.prev = pos.prev and big.tok = pos.tok
      |  cross join tot),
      |agg as (select doc_id, list_sort(list(lp)) as lps,
      |          cast(count(*) as bigint) as n_tokens
      |        from scored group by doc_id)
      |select doc_id, n_tokens,
      |  round(list_reduce(list_prepend(cast(0 as double), lps),
      |          (acc, x) -> acc + x) / cast(n_tokens as double), 6)
      |    as lm2_score
      |from agg order by doc_id""".stripMargin) { (s, dir) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("i"))
    val pos = Tables.df(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(split(col("text"), " ", -1)).as(Seq("i", "tok")))
      .withColumn("prev", lag(col("tok"), 1).over(w))
    val uni = pos.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val tot = uni.agg(sum(col("c")).as("t"))
    val big = pos.filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("tok")).agg(count(lit(1)).as("cp"))
    pos
      .join(uni.select(col("tok"), col("c").as("cu")), Seq("tok"))
      .join(uni.select(col("tok").as("prev"), col("c").as("cv")),
        Seq("prev"), "left")
      .join(big, Seq("prev", "tok"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        when(col("prev").isNull,
          log2(col("cu").cast("double") / col("t").cast("double")))
          .when(col("cp").isNotNull,
            log2(col("cp").cast("double") / col("cv").cast("double")))
          .otherwise(log2(lit(0.4) * col("cu").cast("double")
            / col("t").cast("double"))).as("lp"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("lp"))).as("lps"),
        count(lit(1)).as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        round(aggregate(col("lps"), lit(0.0d), (acc, x) => acc + x)
          / col("n_tokens").cast("double"), 6).as("lm2_score"))
      .orderBy(col("doc_id"))
  }

  /** Per-document n-gram novelty: the fraction of a doc's distinct
    * trigrams first seen in THAT doc as the corpus is consumed in
    * doc_id order — the streaming-ingest quality signal that separates
    * fresh content (novelty → 1) from template/boilerplate echo
    * (novelty → 0), and the per-doc refinement of the corpus-level
    * Heaps curve (corpus_vocab_growth).
    *
    * Shape: one shuffle keyed by gram hash assigns each trigram its
    * first-appearance doc (min over doc_id — map-side combinable), one
    * count-up per doc follows. Counts are integers; the ratio is one
    * IEEE division per row. The oracle joins raw gram strings where the
    * engine joins 8-byte xxhash64 keys — equality coincides under the
    * usual ~2⁻⁴⁰ collision argument (sourceOverlap's contract). */
  val textNgramNovelty: Q = Q.df(
    "text_ngram_novelty",
    s"""with toks as (select doc_id, string_split(text, ' ') as t
       |              from documents),
       |g as (select distinct doc_id,
       |        unnest(${graft.functions.Text.sqlTrigramList("t")}) as g
       |      from toks),
       |first as (select g, min(doc_id) as fd from g group by g),
       |per as (select g.doc_id, cast(count(*) as bigint) as n_grams,
       |          cast(sum(case when f.fd = g.doc_id then 1 else 0 end)
       |            as bigint) as n_new
       |        from g join first f on f.g = g.g group by g.doc_id)
       |select doc_id, n_grams, n_new,
       |  round(cast(n_new as double) / cast(n_grams as double), 6)
       |    as novelty
       |from per order by doc_id""".stripMargin) { (s, dir) =>
    // shingles() is already distinct-per-doc, so (doc_id, gh) needs no
    // extra dedup shuffle (the oracle's SELECT DISTINCT dedups the
    // non-distinct SQL trigram list to the same set)
    val grams = Tables.df(s, dir, "documents")
      .select(col("doc_id"),
        explode(graft.functions.Text.shingles(col("text"), 3)).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("gh"))
    val first = grams.groupBy("gh").agg(min("doc_id").as("fd"))
    grams.join(first, "gh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("fd") === col("doc_id"), 1L).otherwise(0L)).as("n_new"))
      .select(col("doc_id"), col("n_grams"), col("n_new"),
        round(col("n_new").cast("double") / col("n_grams").cast("double"), 6)
          .as("novelty"))
      .orderBy(col("doc_id"))
  }

  /** Unicode normalization sweep — `graft_normalize`, the custom
    * codegen expression ([[graft.functions.UnicodeNormalize]]), driven
    * over a fixed battery of composed/decomposed Latin forms PLUS real
    * fixture rows. Normalization is the first step of every corpus
    * pipeline: dedup keys, fingerprints and token counts all change if
    * "é" is sometimes one codepoint and sometimes e+combining mark.
    * The synthetic battery exists because the fixture text is pure
    * ASCII (probed at all scales) — identity inputs alone would pin
    * nothing. Oracle parity: Spark graft_normalize(s,'NFC') vs DuckDB
    * nfc_normalize; accent stripping is NFD + drop-combining-marks on
    * the Spark side vs DuckDB's strip_accents — equal on the Latin
    * battery (Hangul deliberately excluded: the two libraries disagree
    * on jamo composition there). */
  val textNormalizeUnicode: Q = {
    // (id, string) battery: decomposed vs composed accents, uppercase
    // decomposed, non-decomposable ø, ligatures (NFC-stable)
    val battery: Seq[(Int, String)] = Seq(
      1 -> "éclair",
      2 -> "éclair",
      3 -> "Café du Monde",
      4 -> "naïve",
      5 -> "ÉTUDE",
      6 -> "øre",
      7 -> "Señor",
      8 -> "ça va",
      9 -> "ASCII only",
      10 -> "ümlaut Über",
      11 -> "ﬁsh ﬂow")
    val valuesSql = battery
      .map { case (i, s) => s"($i, '${s.replace("'", "''")}')" }
      .mkString(", ")
    Q.df(
      "text_normalize_unicode",
      s"""with v(id, s) as (values $valuesSql),
         |d as (select cast(100 + doc_id as int) as id,
         |        substr(text, 1, 40) as s
         |      from documents where doc_id < 5),
         |u as (select * from v union all select * from d)
         |select id, nfc_normalize(s) as nfc,
         |  lower(nfc_normalize(s)) as nfc_lower,
         |  strip_accents(nfc_normalize(s)) as accentless,
         |  cast(length(nfc_normalize(s)) as bigint) as n_cp
         |from u order by id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val v = battery.toDF("id", "s")
      val d = Tables.df(s, dir, "documents")
        .filter(col("doc_id") < 5)
        .select((col("doc_id") + 100).cast("int").as("id"),
          substring(col("text"), 1, 40).as("s"))
      v.union(d)
        .select(col("id"),
          expr(s"${graft.functions.UnicodeNormalize.fnName}(s, 'NFC')")
            .as("nfc"))
        .select(col("id"), col("nfc"),
          lower(col("nfc")).as("nfc_lower"),
          regexp_replace(
            expr(s"${graft.functions.UnicodeNormalize.fnName}(nfc, 'NFD')"),
            "\\p{Mn}", "").as("accentless"),
          length(col("nfc")).cast("long").as("n_cp"))
        .orderBy(col("id"))
    }
  }

  /** BM25 relevance scoring (Robertson/Spärck Jones; k1 = 1.2,
    * b = 0.75) of every document against a corpus-derived query — the
    * lexical half of a hybrid retrieval stack (the dense half is the
    * ANN family in [[Similarity]]). The query terms are the 3 highest-
    * document-frequency tokens (ties by token asc) so the entry is
    * robust to fixture-content regeneration — no hard-coded vocabulary.
    *
    * Scale shape: tf / dl / df are map-side-combined groupBys of the
    * token stream; the query set (LIMIT 3) and the corpus stats row
    * (N, total length) are broadcast, so scoring is one broadcast-join
    * pass over the per-(doc, term) tf rows — no shuffle keyed on the
    * corpus, no driver data state. Float determinism follows the
    * [[textEntropy]] contract: per-term scores are summed as a
    * sorted-list fold and rounded to 6 decimals; every double
    * subexpression is spelled in the same order in both engines. */
  // dlnorm = dl/avgdl spelled as dl*N/tot (one double divide, same
  // associativity both sides); 1-b folded to 0.25 by hand. The oracle
  // text and the frame builder are exposed to [[Similarity]]'s hybrid
  // fusion entry, which nests both verbatim.
  /** The BM25 pipeline's CTE chain up to the per-doc rounded score
    * (`scored(doc_id, n_terms, bm25)`); shared by the all-docs entry
    * below and [[LexIndex]]'s stored-index serve oracles (which swap
    * the tail for a relevance-ranked top-N). */
  private[operators] val bm25CoreCtes: String =
    bm25CoreCtesWithQ(
      "select tok, df from df order by df desc, tok asc limit 3")

  /** [[bm25CoreCtes]] with a caller-supplied query-term CTE body (the
    * stored-index pruned serve queries a rare+common term mix instead
    * of the hottest-3). */
  private[operators] def bm25CoreCtesWithQ(qSql: String): String =
    s"""toks as (select doc_id, unnest(string_split(text, ' ')) as tok
        |              from documents),
        |tf as (select doc_id, tok, cast(count(*) as bigint) as c
        |       from toks group by doc_id, tok),
        |dl as (select doc_id, cast(sum(c) as bigint) as dl
        |       from tf group by doc_id),
        |st as (select cast(count(*) as bigint) as n,
        |              cast(sum(dl) as bigint) as tot from dl),
        |df as (select tok, cast(count(*) as bigint) as df
        |       from tf group by tok),
        |q as ($qSql),
        |per as (select t.doc_id,
        |    ln((cast(st.n - q.df as double) + 0.5)
        |         / (cast(q.df as double) + 0.5) + 1.0)
        |      * (cast(t.c as double) * 2.2)
        |      / (cast(t.c as double)
        |         + 1.2 * (0.25 + 0.75 * (cast(d.dl as double)
        |             * cast(st.n as double) / cast(st.tot as double)))) as s
        |  from tf t join q on q.tok = t.tok
        |  join dl d on d.doc_id = t.doc_id
        |  cross join st),
        |agg as (select doc_id, cast(count(*) as bigint) as n_terms,
        |          list_sort(list(s)) as ss from per group by doc_id),
        |scored as (select doc_id, n_terms,
        |  round(list_reduce(list_prepend(cast(0 as double), ss),
        |    (acc, x) -> acc + x), 6) as bm25 from agg)""".stripMargin

  private[operators] val bm25OracleSql: String =
    s"""with $bm25CoreCtes
        |select doc_id, n_terms, bm25
        |from scored order by doc_id""".stripMargin

  /** The per-(doc, term) BM25 score as one Column over rows carrying
    * `c` (term freq), `df`, `dl`, `n`, `tot` — the double expression
    * spelled in exactly the oracle's left-to-right order, shared with
    * [[LexIndex]]'s stored-index serve so batch scoring and index
    * serving produce bit-identical doubles. */
  private[graft] def bm25ScoreExpr: org.apache.spark.sql.Column =
    log((col("n").minus(col("df")).cast("double") + lit(0.5d))
        / (col("df").cast("double") + lit(0.5d)) + lit(1.0d)) *
      (col("c").cast("double") * lit(2.2d)) /
      (col("c").cast("double") +
        lit(1.2d) * (lit(0.25d) + lit(0.75d) *
          (col("dl").cast("double") * col("n").cast("double")
            / col("tot").cast("double"))))

  private[graft] def bm25Frame(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
      val toks = Tables.df(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("tok"))
      val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      val dl = tf.groupBy("doc_id").agg(sum("c").as("dl"))
      val st = dl.agg(count(lit(1)).as("n"), sum("dl").as("tot"))
      val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val q = dfreq.orderBy(col("df").desc, col("tok").asc).limit(3)
      val score = bm25ScoreExpr
      tf.join(broadcast(q), "tok")
        .join(dl, "doc_id")
        .crossJoin(broadcast(st))
        .select(col("doc_id"), score.as("s"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms"),
          sort_array(collect_list(col("s"))).as("ss"))
        .select(col("doc_id"), col("n_terms"),
          round(aggregate(col("ss"), lit(0.0d), (acc, x) => acc + x), 6)
            .as("bm25"))
        .orderBy(col("doc_id"))
  }

  val textBm25: Q =
    Q.df("text_bm25_scores", bm25OracleSql)((s, dir) => bm25Frame(s, dir))

  /** BPE merge-candidate mining — the inner step of byte-pair-encoding
    * tokenizer training: count every within-word adjacent character
    * pair across the corpus and rank the top merge candidates. One
    * zero-shuffle kernel pass (split → per-word pair expansion, all
    * codegen'd array expressions) feeding a single map-side-combined
    * groupBy on a key space bounded by |alphabet|² — the groupBy input
    * is corpus-sized but the partial aggregation collapses it to the
    * pair vocabulary on the map side, so the shuffle is tiny at any
    * corpus scale. Counts are integers; ties rank by pair asc. */
  val textBpePairs: Q = Q.df(
    "text_bpe_pairs",
    """with w as (select unnest(string_split(text, ' ')) as w from documents),
      |p as (select unnest(list_transform(range(1, length(w)),
      |        i -> substring(w, i, 2))) as pair
      |      from w where length(w) >= 2)
      |select pair, cast(count(*) as bigint) as cnt
      |from p group by pair
      |order by cnt desc, pair asc limit 20""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "documents")
      .select(explode(split(col("text"), " ", -1)).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(20)
  }

  /** Bounded merge rounds for [[textBpeMergeLoop]]. */
  val BpeMergeRounds = 4

  /** Iterative BPE merge training — the ACTUAL tokenizer-training inner
    * loop, not just one round of candidate mining ([[textBpePairs]]):
    * k = [[BpeMergeRounds]] rounds of (count adjacent symbol pairs,
    * freq-weighted) → (pick the top pair: count desc, pair asc) →
    * (apply the merge leftmost-greedy, non-overlapping) over the
    * word-TYPE table. Output is the learned merge list in order — the
    * artifact a BPE tokenizer ships.
    *
    * Merge application is the positional "islands" form: candidate
    * positions (sym=a ∧ next=b) grouped into runs of consecutive
    * positions (pos − row_number), keeping odd ranks within each run —
    * exactly leftmost-greedy for BOTH the a≠b chain case ("ababab")
    * and the a=b run case ("aaaa" → two merges, not three). Everything
    * is integer counts, string compares, and window row_numbers —
    * bit-exact cross-engine; the oracle unrolls the same k rounds as
    * MATERIALIZED CTE chains.
    *
    * Scale shape: all per-round state is the word-type symbol table —
    * VOCABULARY-sized (Heaps-sublinear in the corpus), reached from the
    * corpus by one map-side-combined type count; pair counting is one
    * lead() window + one partial-agg groupBy on the (bounded) symbol-
    * pair space; the winner is a 1-row broadcast; rounds materialize
    * and free like the graph loops, so storage stays O(symbol table),
    * never O(table · rounds). Nothing driver-sized at any corpus
    * scale. */
  /** The shared WITH-clause prefix of both BPE oracles: word types,
    * initial char symbols, and the k unrolled merge rounds (pairs,
    * winner, chosen positions, next symbol table) — every CTE
    * MATERIALIZED (multi-reference chains re-evaluate exponentially
    * under DuckDB's default inlining). Ends after s[k]; callers append
    * their own tail CTEs / SELECT. */
  private def bpeOraclePrefix: String = {
      val rounds = (0 until BpeMergeRounds).map { r =>
        s"""p$r as materialized (
           |  select w, freq, pos, sym,
           |         lead(sym) over (partition by w order by pos) as nxt
           |  from s$r),
           |win$r as materialized (
           |  select sym as a, nxt as b, cast(sum(freq) as bigint) as cnt
           |  from p$r where nxt is not null
           |  group by sym, nxt
           |  order by cnt desc, a asc, b asc limit 1),
           |ch$r as materialized (
           |  select w, pos from (
           |    select w, pos,
           |           row_number() over (partition by w, isl order by pos) as rk
           |    from (
           |      select p.w, p.pos,
           |             p.pos - row_number() over (
           |               partition by p.w order by p.pos) as isl
           |      from p$r p join win$r x on p.sym = x.a and p.nxt = x.b) t1
           |  ) t2 where rk % 2 = 1),
           |s${r + 1} as materialized (
           |  select w, freq,
           |         cast(row_number() over (partition by w order by pos)
           |           as bigint) as pos,
           |         sym
           |  from (
           |    select p.w, p.freq, p.pos,
           |           case when c1.pos is not null then p.sym || p.nxt
           |                else p.sym end as sym
           |    from p$r p
           |    left join ch$r c1 on c1.w = p.w and c1.pos = p.pos
           |    left join ch$r c0 on c0.w = p.w and c0.pos = p.pos - 1
           |    where c0.pos is null) t)""".stripMargin
      }.mkString(",\n")
      s"""with wt as materialized (
         |  select w, cast(count(*) as bigint) as freq from (
         |    select unnest(string_split(text, ' ')) as w from documents) t
         |  where length(w) >= 2 group by w),
         |s0 as materialized (
         |  select w, freq, pos, substring(w, cast(pos as int), 1) as sym
         |  from (select w, freq,
         |          cast(unnest(range(1, length(w) + 1)) as bigint) as pos
         |        from wt) t),
         |$rounds""".stripMargin
  }

  /** Trained state for the BPE entries: the k winner frames
    * (a, b, cnt — 1 row each, materialized) and the FINAL symbol table
    * after all merges. Memoized per (session, fixture dir) like
    * [[graft.operators.Graph.sharedOrderEdges]]: the two entries (and
    * bench warm-ups) share one training run; the cache owns the
    * materialized frames, all vocabulary-sized. */
  private val bpeCache = new graft.plans.Memo[
    (org.apache.spark.sql.SparkSession, String), (Seq[DataFrame], DataFrame)]({
      case (frames, vocab) =>
        frames.foreach(graft.plans.Checkpoints.free)
        graft.plans.Checkpoints.free(vocab)
    })

  private[operators] def bpeTrained(s: org.apache.spark.sql.SparkSession,
      dir: String): (Seq[DataFrame], DataFrame) =
    bpeCache.once((s, dir)) {
      import graft.plans.Checkpoints
      val wWin = Window.partitionBy("w").orderBy("pos")
      val wt = Tables.df(s, dir, "documents")
        .select(explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) >= 2)
        .groupBy("w").agg(count(lit(1)).as("freq"))
      var syms = Checkpoints.materialize(
        wt.select(col("w"), col("freq"),
            posexplode(split(col("w"), "")).as(Seq("pos0", "sym")))
          .select(col("w"), col("freq"),
            (col("pos0") + 1).cast("long").as("pos"), col("sym")))
      var winners = Vector.empty[DataFrame]
      for (r <- 1 to BpeMergeRounds) {
        // p is consumed three times per round (winner, candidates,
        // rebuild) — one boundary instead of three window passes
        val p = Checkpoints.materialize(
          syms.withColumn("nxt", lead(col("sym"), 1).over(wWin)))
        val win = p.filter(col("nxt").isNotNull)
          .groupBy(col("sym").as("a"), col("nxt").as("b"))
          .agg(sum("freq").as("cnt"))
          .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
          .limit(1)
        val winM = Checkpoints.materialize(win)
        val cand = p.join(broadcast(winM),
            p("sym") === winM("a") && p("nxt") === winM("b"))
          .select(p("w"), p("pos"))
          .withColumn("isl", col("pos") - row_number().over(wWin))
        val chosen = Checkpoints.materialize(cand
          .withColumn("rk", row_number().over(
            Window.partitionBy("w", "isl").orderBy("pos")))
          .filter(col("rk") % 2 === 1)
          .select(col("w").as("cw"), col("pos").as("cpos")))
        val at = chosen.select(col("cw").as("w1"), col("cpos").as("p1"))
        val before = chosen.select(col("cw").as("w0"), col("cpos").as("p0"))
        // chosen is merge-OCCURRENCE-sized (top-pair hits, orders of
        // magnitude under the symbol table) — broadcast both probes so
        // the rebuild is one stored-block scan, not two char-table
        // shuffles per round
        val next = Checkpoints.materialize(p
          .join(broadcast(at),
            p("w") === col("w1") && p("pos") === col("p1"), "left")
          .join(broadcast(before),
            p("w") === col("w0") && p("pos") === col("p0") + 1, "left")
          .filter(col("p0").isNull)
          .select(p("w"), p("freq"), p("pos").as("oldpos"),
            when(col("p1").isNotNull, concat(p("sym"), p("nxt")))
              .otherwise(p("sym")).as("sym"))
          .select(col("w"), col("freq"),
            row_number().over(Window.partitionBy("w").orderBy("oldpos"))
              .cast("long").as("pos"),
            col("sym")))
        winners :+= winM
        Seq(p, chosen, syms).foreach(Checkpoints.free)
        syms = next
      }
      (winners, syms)
    }

  val textBpeMergeLoop: Q = Q.df(
    "text_bpe_merge_loop", {
      val winners = (0 until BpeMergeRounds).map { r =>
        s"""select cast(${r + 1} as bigint) as round, a as left_sym,
           |  b as right_sym, a || b as merged, cnt from win$r"""
          .stripMargin
      }.mkString("\nunion all\n")
      s"""$bpeOraclePrefix
         |select * from ($winners) u order by round""".stripMargin
    }) { (s, dir) =>
    val (winners, _) = bpeTrained(s, dir)
    winners.zipWithIndex.map { case (w, i) =>
      w.select(lit(i + 1).cast("long").as("round"),
        col("a").as("left_sym"), col("b").as("right_sym"),
        concat(col("a"), col("b")).as("merged"), col("cnt"))
    }.reduce(_ unionByName _).orderBy(col("round"))
  }

  /** BPE ENCODING applied at corpus scale — the consumer side of
    * [[textBpeMergeLoop]]'s training artifact: per document, the token
    * count after the k learned merges vs the raw character count
    * (tokens-per-doc is the number every token-budget / packing /
    * pricing computation starts from). The final symbol table is
    * vocabulary-sized, so encoding is one broadcast join onto the
    * corpus word stream + one map-side-combined per-doc aggregate — a
    * single scan at any corpus scale; the oracle re-derives the whole
    * training chain independently and encodes the same way. Words
    * under 2 chars carry no pairs and are excluded symmetrically. */
  val textBpeEncodeStats: Q = Q.df(
    "text_bpe_encode_stats",
    s"""$bpeOraclePrefix,
       |fin as materialized (
       |  select w, cast(count(*) as bigint) as units
       |  from s$BpeMergeRounds group by w),
       |dw as (select doc_id, unnest(string_split(text, ' ')) as w
       |       from documents)
       |select doc_id, cast(count(*) as bigint) as n_words,
       |  cast(sum(length(w)) as bigint) as n_chars,
       |  cast(sum(units) as bigint) as n_units
       |from dw join fin using (w)
       |group by doc_id order by doc_id""".stripMargin) { (s, dir) =>
    val (_, fin) = bpeTrained(s, dir)
    val units = fin.groupBy("w").agg(count(lit(1)).as("units"))
    Tables.df(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("w"))
      .join(broadcast(units), "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w"))).cast("long").as("n_chars"),
        sum(col("units")).as("n_units"))
      .orderBy(col("doc_id"))
  }

  // ---- Unigram-LM tokenizer (the PRUNE family: SentencePiece /
  // Kudo 2018) ------------------------------------------------------------

  /** Seed vocabulary size for [[unigramTrained]]. */
  val UniSeedSize = 200
  /** Prune rounds (each keeps the top ⌈3n/4⌉ pieces). */
  val UniRounds = 3
  /** Longest candidate piece (SentencePiece's
    * max_sentencepiece_length analogue). */
  val UniMaxLen = 4
  /** Longest eligible word type — training state stays bounded on
    * pathological tokens, the corpus-filtering step every
    * SentencePiece run performs. */
  val UniMaxWord = 30
  /** lcm(1..10): a position is covered by at most 10 candidate
    * occurrences (Σ_{l=1..4} l), so scaling each position's unit of
    * responsibility to 2520/cov keeps the EM-style scores EXACT
    * integers — no float folds anywhere in the loop. */
  val UniLcm = 2520L

  /** Shared oracle prefix: word types, candidate-piece occurrences,
    * the seeded vocabulary, and [[UniRounds]] unrolled score→prune
    * rounds (v1..vR), every CTE MATERIALIZED (the iterative-oracle
    * discipline). Scoring is the deterministic EM surrogate described
    * at [[unigramTrained]]. */
  private def uniOraclePrefix: String = {
    val rounds = (1 to UniRounds).map { r =>
      val prev = if (r == 1) "seed" else s"v${r - 1}"
      s"""wo$r as materialized (
         |  select o.w, o.freq, o.i, o.l, o.piece
         |  from occ o join $prev v on o.piece = v.piece),
         |cov$r as materialized (
         |  select w, j, cast(count(*) as bigint) as cov from (
         |    select o.w, o.i + d.d as j
         |    from wo$r o cross join (select unnest(range(0, $UniMaxLen)) as d) d
         |    where d.d < o.l) t
         |  group by w, j),
         |sc$r as materialized (
         |  select piece, cast(sum(freq * ($UniLcm // cov)) as bigint) as score
         |  from (
         |    select o.piece, o.freq, c.cov
         |    from wo$r o
         |    cross join (select unnest(range(0, $UniMaxLen)) as d) d
         |    join cov$r c on c.w = o.w and c.j = o.i + d.d
         |    where d.d < o.l) t
         |  group by piece),
         |v$r as materialized (
         |  select piece, score from (
         |    select piece, score,
         |      row_number() over (order by score desc, piece) as rk
         |    from sc$r) t
         |  where rk <= (3 * (select count(*) from sc$r) + 3) // 4)"""
        .stripMargin
    }.mkString(",\n")
    s"""with wt as materialized (
       |  select w, cast(count(*) as bigint) as freq from (
       |    select unnest(string_split(text, ' ')) as w from documents) t
       |  where length(w) between 2 and $UniMaxWord group by w),
       |occ as materialized (
       |  select t.w, t.freq, p.i, l.l, substring(t.w, p.i, l.l) as piece
       |  from wt t
       |  cross join (select unnest(range(1, ${UniMaxWord + 1})) as i) p
       |  cross join (select unnest(range(1, ${UniMaxLen + 1})) as l) l
       |  where p.i + l.l - 1 <= length(t.w)),
       |seed as materialized (
       |  select piece from (
       |    select piece, row_number() over (order by s desc, piece) as rk
       |    from (select piece, cast(sum(freq) as bigint) as s
       |          from occ group by piece) t) u
       |  where rk <= $UniSeedSize),
       |$rounds""".stripMargin
  }

  /** Trained unigram artifact, memoized per (session, fixture dir)
    * like [[bpeTrained]]: the candidate-occurrence relation (word-TYPE
    * sized — the trainer's working set, kept for the encode entry) and
    * the final scored vocabulary.
    *
    * This is the PRUNE tokenizer family (SentencePiece's unigram LM,
    * Kudo 2018) structurally: seed a large substring vocabulary, score
    * every piece by an EM-style responsibility over the corpus, prune
    * the bottom quarter, re-score against the shrunken vocabulary,
    * repeat. The scoring step is a deterministic EM surrogate: instead
    * of forward-backward segmentation posteriors, each character
    * position of each word splits one unit of responsibility UNIFORMLY
    * among the surviving candidate occurrences covering it (scaled by
    * lcm(1..10) so everything stays integer-exact), and a piece's
    * score is the frequency-weighted sum over its covered positions.
    * Pieces that explain many positions few rivals cover score high —
    * the same pressure EM applies — while the whole loop stays
    * bit-reproducible cross-engine, which real SentencePiece (float
    * log-likelihoods, annealed EM) is not.
    *
    * Scale shape: state is word-TYPE × position bounded (never
    * corpus-token sized); every round is two joins + two aggregations
    * against a ≤[[UniSeedSize]]-piece broadcast vocabulary; per-round
    * frames are materialized and freed ([[graft.plans.Checkpoints]]);
    * only the scalar vocabulary count ever reaches the driver. */
  private val uniCache = new graft.plans.Memo[
    (org.apache.spark.sql.SparkSession, String), (DataFrame, DataFrame)]({
      case (a, b) =>
        graft.plans.Checkpoints.free(a)
        graft.plans.Checkpoints.free(b)
    })

  private[operators] def unigramTrained(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : (DataFrame, DataFrame) =
    uniCache.once((s, dir)) {
      import graft.plans.Checkpoints
      val wt = Tables.df(s, dir, "documents")
        .select(explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")).between(2, UniMaxWord))
        .groupBy("w").agg(count(lit(1)).as("freq"))
      val occ = Checkpoints.materialize(wt
        .select(col("w"), col("freq"),
          explode(sequence(lit(1), length(col("w")))).as("i"))
        .select(col("w"), col("freq"), col("i"),
          explode(sequence(lit(1), lit(UniMaxLen))).as("l"))
        .filter(col("i") + col("l") - 1 <= length(col("w")))
        .withColumn("piece", expr("substring(w, i, l)")))
      // global top-UniSeedSize via orderBy+limit (TakeOrderedAndProject:
      // per-partition heaps, no single-partition WindowExec) — the piece
      // space grows with the corpus vocabulary, so an unpartitioned
      // rank window here would funnel it through one task at scale; the
      // deterministic total order (s0 desc, piece) makes limit ≡ the
      // old row_number filter row-for-row
      var vocab = Checkpoints.materialize(occ
        .groupBy("piece").agg(sum("freq").as("s0"))
        .orderBy(col("s0").desc, col("piece"))
        .limit(UniSeedSize)
        .select(col("piece")))
      var vocabScored: DataFrame = null
      for (_ <- 1 to UniRounds) {
        // occurrences of the CURRENT vocabulary — two consumers
        // (coverage + scoring), one boundary
        val wo = Checkpoints.materialize(
          occ.join(broadcast(vocab.select(col("piece"))), Seq("piece")))
        val cov = wo
          .select(col("w"),
            explode(sequence(col("i"), col("i") + col("l") - 1)).as("j"))
          .groupBy(col("w"), col("j")).agg(count(lit(1)).as("cov"))
        val scored = Checkpoints.materialize(wo
          .select(col("w"), col("freq"), col("piece"),
            explode(sequence(col("i"), col("i") + col("l") - 1)).as("j"))
          .join(cov, Seq("w", "j"))
          .groupBy(col("piece"))
          .agg(sum(col("freq") * expr(s"$UniLcm div cov")).as("score")))
        val n = scored.count() // vocabulary-sized scalar
        val keep = (3 * n + 3) / 4
        // distributed top-keep (TakeOrderedAndProject), same total order
        // as the old unpartitioned rank window — see the seed selection
        val next = Checkpoints.materialize(scored
          .orderBy(col("score").desc, col("piece"))
          .limit(keep.toInt)
          .select(col("piece"), col("score")))
        // vocab is the seed frame in round 1 and the previous round's
        // kept vocabulary after — exactly one live predecessor either
        // way, freed here (vocabScored is always that same frame, so
        // it needs no separate free)
        Seq(wo, scored, vocab).foreach(Checkpoints.free)
        vocab = next
        vocabScored = next
      }
      (occ, vocabScored)
    }

  /** The trained prune-loop's outcome: the final scored vocabulary,
    * rank included so every round's score→prune arithmetic is
    * hash-verified end to end. */
  val textUnigramPruneLoop: Q = Q.df(
    "text_unigram_prune_loop",
    s"""$uniOraclePrefix
       |select piece, score,
       |  cast(row_number() over (order by score desc, piece) as bigint)
       |    as rank
       |from v$UniRounds
       |order by rank""".stripMargin) { (s, dir) =>
    val (_, vocab) = unigramTrained(s, dir)
    // single-partition window is safe here: the input is the trained
    // vocabulary, bounded by UniSeedSize (constant) — never corpus-sized
    vocab
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("piece"))).cast("long"))
      .orderBy(col("rank"))
  }

  /** Encode-side statistics over the shared artifact: per document,
    * eligible word count, total final-vocab piece occurrences, and
    * covered character positions — the corpus pass is ONE broadcast
    * join of word-TYPE stats onto the word stream plus a map-side
    * aggregation (the [[textBpeEncodeStats]] shape). */
  val textUnigramEncodeStats: Q = Q.df(
    "text_unigram_encode_stats",
    s"""$uniOraclePrefix,
       |wocc as materialized (
       |  select o.w, o.i, o.l from occ o
       |  join v$UniRounds v on o.piece = v.piece),
       |wn as materialized (
       |  select w, cast(count(*) as bigint) as n_occ_w
       |  from wocc group by w),
       |wcov as materialized (
       |  select w, cast(count(*) as bigint) as n_cov_w from (
       |    select distinct w, i + d.d as j
       |    from wocc cross join (select unnest(range(0, $UniMaxLen)) as d) d
       |    where d.d < l) t
       |  group by w),
       |dw as (select doc_id, w from (
       |    select doc_id, unnest(string_split(text, ' ')) as w
       |    from documents) t
       |  where length(w) between 2 and $UniMaxWord)
       |select doc_id, cast(count(*) as bigint) as n_words,
       |  cast(coalesce(sum(coalesce(n_occ_w, 0)), 0) as bigint) as n_occ,
       |  cast(coalesce(sum(coalesce(n_cov_w, 0)), 0) as bigint) as n_cov
       |from dw left join wn using (w) left join wcov using (w)
       |group by doc_id order by doc_id""".stripMargin) { (s, dir) =>
    import graft.plans.Checkpoints
    val (occ, vocab) = unigramTrained(s, dir)
    val wo = Checkpoints.materialize(
      occ.join(broadcast(vocab.select(col("piece"))), Seq("piece")))
    val wn = wo.groupBy(col("w")).agg(count(lit(1)).as("n_occ_w"))
    val wcov = wo
      .select(col("w"),
        explode(sequence(col("i"), col("i") + col("l") - 1)).as("j"))
      .distinct()
      .groupBy(col("w")).agg(count(lit(1)).as("n_cov_w"))
    val wstats = Checkpoints.materialize(wn.join(wcov, Seq("w")))
    Checkpoints.free(wo)
    val out = Tables.df(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("w"))
      .filter(length(col("w")).between(2, UniMaxWord))
      .join(broadcast(wstats), Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        coalesce(sum(coalesce(col("n_occ_w"), lit(0L))), lit(0L))
          .as("n_occ"),
        coalesce(sum(coalesce(col("n_cov_w"), lit(0L))), lit(0L))
          .as("n_cov"))
      .orderBy(col("doc_id"))
    out
  }

  /** Per-language head/middle/tail split by LM score (the CCNet
    * bucketing: each language's documents ranked by how well a
    * corpus-trained LM predicts them, then cut into thirds — "head"
    * trains first, "tail" is candidate discard). Cuts are
    * percentile_disc so each threshold is an ACTUAL document's score
    * (no interpolation → cross-engine exact on the already-rounded
    * lm_score), and bucketing compares against the per-language cut
    * pair, which is |langs|×2 rows broadcast — no global sort, no
    * rank window, nothing driver-sized at any corpus scale. The LM
    * itself is [[textLmScore]]'s unigram count table: trained with one
    * map-side-combined groupBy, joined, never collected. */
  val qualityPerplexityBuckets: Q = Q.df(
    "quality_perplexity_buckets",
    """with tok as (select doc_id, lang,
      |               unnest(string_split(text, ' ')) as tok
      |             from documents),
      |vocab as (select tok, cast(count(*) as bigint) as c
      |          from tok group by tok),
      |tot as (select cast(sum(c) as bigint) as t from vocab),
      |scored as (
      |  select doc_id, lang,
      |    log2(cast(c as double)) - log2(cast(t as double)) as lp
      |  from tok join vocab using (tok) cross join tot),
      |agg as (select doc_id, lang, list_sort(list(lp)) as lps,
      |          cast(count(*) as bigint) as n_tokens
      |        from scored group by doc_id, lang),
      |lm as (select doc_id, lang, n_tokens,
      |  round(list_reduce(list_prepend(cast(0 as double), lps),
      |          (acc, x) -> acc + x) / cast(n_tokens as double), 6)
      |    as lm_score
      |from agg),
      |cuts as (select lang,
      |  percentile_disc(0.34) within group (order by lm_score) as p34,
      |  percentile_disc(0.67) within group (order by lm_score) as p67
      |from lm group by lang)
      |select doc_id, lang, n_tokens, lm_score,
      |  case when lm_score > p67 then 'head'
      |       when lm_score > p34 then 'middle'
      |       else 'tail' end as bucket
      |from lm join cuts using (lang)
      |order by doc_id""".stripMargin) { (s, dir) =>
    val toks = Tables.df(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ", -1)).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum(col("c")).as("t"))
    // materialize: the per-language cut table re-consumes lm — without
    // a boundary the whole LM scoring pipeline (and corpus scan) would
    // run once more for the percentile side
    val lm = graft.plans.Checkpoints.materialize(toks
      .join(vocab, Seq("tok"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("lang"),
        (log2(col("c").cast("double")) - log2(col("t").cast("double")))
          .as("lp"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sort_array(collect_list(col("lp"))).as("lps"),
        count(lit(1)).as("n_tokens"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        round(aggregate(col("lps"), lit(0.0d), (acc, x) => acc + x)
          / col("n_tokens").cast("double"), 6).as("lm_score")))
    val cuts = lm.groupBy(col("lang")).agg(
      expr("percentile_disc(0.34) within group (order by lm_score)")
        .as("p34"),
      expr("percentile_disc(0.67) within group (order by lm_score)")
        .as("p67"))
    val out = graft.plans.Checkpoints.materialize(
      lm.join(broadcast(cuts), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          col("lm_score"),
          when(col("lm_score") > col("p67"), "head")
            .when(col("lm_score") > col("p34"), "middle")
            .otherwise("tail").as("bucket")))
    graft.plans.Checkpoints.free(lm)
    out.orderBy(col("doc_id"))
  }

  /** The Gopher quality-rule screen (Rae et al. 2021 §A1.1 — the
    * published pretraining-corpus filter everybody names): per-document
    * NAMED rule flags plus the composite keep bit, distinct from
    * [[textQuality]]'s scalar score. Every ratio test is cross-
    * multiplied into INTEGER arithmetic (symbols/words ≤ 0.1 becomes
    * symbols·10 ≤ words), so there is not one float compare in the
    * entry and the oracle agrees bit-for-bit by construction. One
    * codegen'd scan pass, embarrassingly parallel at any corpus
    * size. */
  val gopherRules: Q = Q.df(
    "text_gopher_rules", {
      val stops = Text.sqlStopwordHits("text", "en")
      s"""with d as (select doc_id,
         |    cast(len(str_split(text, ' ')) as bigint) as w,
         |    cast(length(text) as bigint) as chars,
         |    cast(len(regexp_extract_all(text, '#|\\.\\.\\.')) as bigint)
         |      as sym,
         |    cast(len(list_filter(str_split(text, ' '),
         |      t -> regexp_matches(t, '[A-Za-z]'))) as bigint) as alphaw,
         |    $stops as stops,
         |    cast(len(str_split(text, chr(10))) as bigint) as nl,
         |    cast(len(list_filter(str_split(text, chr(10)),
         |      l -> regexp_matches(l, '^(-|\\*|•)'))) as bigint) as bl,
         |    cast(len(list_filter(str_split(text, chr(10)),
         |      l -> regexp_matches(l, '\\.\\.\\.$$'))) as bigint) as ee
         |  from documents)
         |select doc_id, w as n_words,
         |  (w >= 50 and w <= 100000) as r_word_count,
         |  (chars - (w - 1) >= w * 3 and chars - (w - 1) <= w * 10)
         |    as r_mean_word_len,
         |  (sym * 10 <= w) as r_symbol_ratio,
         |  (alphaw * 5 >= w * 4) as r_alpha_words,
         |  (stops >= 2) as r_stopwords,
         |  (bl * 10 <= nl * 9 and ee * 10 <= nl * 3) as r_line_shape,
         |  ((w >= 50 and w <= 100000)
         |   and (chars - (w - 1) >= w * 3 and chars - (w - 1) <= w * 10)
         |   and (sym * 10 <= w) and (alphaw * 5 >= w * 4)
         |   and (stops >= 2)
         |   and (bl * 10 <= nl * 9 and ee * 10 <= nl * 3)) as keep
         |from d order by doc_id""".stripMargin
    }) { (s, dir) =>
    val words = Text.tokenCount(col("text"))
    val chars = length(col("text")).cast("long")
    val wordChars = chars - (words - lit(1L))
    val symbols = regexp_count(col("text"), lit("#|\\.\\.\\.")).cast("long")
    val alphaWords = size(filter(split(col("text"), " "),
      t => t.rlike("[A-Za-z]"))).cast("long")
    val stops = Text.stopwordHits(col("text"), "en")
    val lines = split(col("text"), "\n")
    val nLines = size(lines).cast("long")
    val bullets = size(filter(lines, l => l.rlike("^(-|\\*|•)")))
      .cast("long")
    val ellEnds = size(filter(lines, l => l.rlike("\\.\\.\\.$")))
      .cast("long")
    val rWordCount = words >= 50L && words <= 100000L
    val rMeanLen = wordChars >= words * 3L && wordChars <= words * 10L
    val rSymbol = symbols * 10L <= words
    val rAlpha = alphaWords * 5L >= words * 4L
    val rStop = stops >= 2L
    val rLines = bullets * 10L <= nLines * 9L && ellEnds * 10L <= nLines * 3L
    Tables.df(s, dir, "documents")
      .select(col("doc_id"), words.as("n_words"),
        rWordCount.as("r_word_count"), rMeanLen.as("r_mean_word_len"),
        rSymbol.as("r_symbol_ratio"), rAlpha.as("r_alpha_words"),
        rStop.as("r_stopwords"), rLines.as("r_line_shape"),
        (rWordCount && rMeanLen && rSymbol && rAlpha && rStop && rLines)
          .as("keep"))
      .orderBy(col("doc_id"))
  }

  // ---- overlapping chunk windows (RAG / context-length preprocessing) ----

  /** Window width / stride in tokens (stride < width ⇒ 16-token
    * overlap between consecutive chunks — the standard RAG chunking). */
  val ChunkW = 64
  val ChunkStride = 48

  /** Split every document into overlapping token windows with stable
    * chunk ids — the preprocessing every retrieval/context pipeline
    * runs before embedding. Chunk starts are a per-document arithmetic
    * sequence, so the operator is one generator expression per row (no
    * shuffle at all until a consumer aggregates); output carries exact
    * token counts and an md5 content hash per chunk so the driver can
    * hash-compare the chunk CONTENT without shipping chunk text through
    * the compare. At 100 TB: embarrassingly parallel, output rows ≈
    * tokens/stride, and the hash column is what dedup-by-chunk joins
    * on downstream. */
  def chunkWindows(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ", -1).as("t"))
      .withColumn("start",
        explode(sequence(lit(0), size(col("t")) - 1, lit(ChunkStride))))
      .select(col("doc_id"),
        expr(s"start div $ChunkStride").cast("long").as("chunk_id"),
        slice(col("t"), col("start") + 1, lit(ChunkW)).as("piece"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("piece")).cast("long").as("n_tokens"),
        md5(array_join(col("piece"), " ")).as("chunk_hash"))

  val textChunkWindows: Q = Q.df(
    "text_chunk_windows",
    s"""with toks as (select doc_id, string_split(text, ' ') as t
       |              from documents),
       |starts as (select doc_id, t,
       |    unnest(range(0, len(t), $ChunkStride)) as start
       |  from toks)
       |select doc_id,
       |  cast(start // $ChunkStride as bigint) as chunk_id,
       |  cast(len(t[start + 1 : start + $ChunkW]) as bigint) as n_tokens,
       |  md5(array_to_string(t[start + 1 : start + $ChunkW], ' '))
       |    as chunk_hash
       |from starts
       |order by doc_id, chunk_id""".stripMargin) { (s, dir) =>
    chunkWindows(Tables.df(s, dir, "documents"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Collocations below this bigram count are noise (a single rare
    * co-occurrence maximizes PMI vacuously — the classic PMI failure
    * mode a count floor fixes). */
  val PmiMinCount = 5
  val PmiTopN = 50

  /** PMI COLLOCATION MINING (Church & Hanks 1990): rank adjacent word
    * pairs by pointwise mutual information
    * pmi(a,b) = ln( p(a,b) / (p(a)·p(b)) ), with bigram probability
    * over the bigram total and unigram probabilities over the token
    * total — the standard first pass for multiword-expression
    * discovery in corpus curation (feeding tokenizer merges and
    * phrase dictionaries). All counts are exact integers from two
    * map-side-combined aggregates (bigrams via the per-doc lead
    * window, unigrams from the token stream); the PMI is ONE ln of
    * one division with both products spelled in fixed double order,
    * so the ranking is bit-identical cross-engine. Vocabulary-sized
    * state throughout — the bigram table is |V|²-bounded, in practice
    * token-bounded. */
  val textPmiCollocations: Q = Q.df(
    "text_pmi_collocations",
    s"""with idx as (
       |  select doc_id, l, unnest(range(1, len(l) + 1)) as i
       |  from (select doc_id, string_split(text, ' ') as l
       |        from documents)),
       |toks as (select doc_id, i - 1 as p, l[i] as tok, l[i + 1] as nxt
       |         from idx),
       |uni as (select tok, cast(count(*) as bigint) as c
       |        from toks group by tok),
       |tt as (select cast(sum(c) as bigint) as t from uni),
       |bg as (select tok as t1, nxt as t2, cast(count(*) as bigint) as c_ab
       |       from toks where nxt is not null group by tok, nxt),
       |bt as (select cast(sum(c_ab) as bigint) as b from bg)
       |select bg.t1, bg.t2, bg.c_ab,
       |  round(ln((cast(bg.c_ab as double) * cast(tt.t as double)
       |      * cast(tt.t as double))
       |    / (cast(bt.b as double) * cast(ua.c as double)
       |      * cast(ub.c as double))), 6) as pmi
       |from bg join uni ua on ua.tok = bg.t1
       |        join uni ub on ub.tok = bg.t2
       |cross join tt cross join bt
       |where bg.c_ab >= $PmiMinCount
       |order by pmi desc, bg.t1, bg.t2 limit $PmiTopN""".stripMargin) {
    (s, dir) =>
      val toks = Tables.df(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(split(col("text"), " ", -1)).as(Seq("p", "tok")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("p"))
      val withNext = toks.withColumn("nxt", lead(col("tok"), 1).over(w))
      val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val tt = uni.agg(sum(col("c")).as("t"))
      val bg = withNext.filter(col("nxt").isNotNull)
        .groupBy(col("tok").as("t1"), col("nxt").as("t2"))
        .agg(count(lit(1)).as("c_ab"))
      val bt = bg.agg(sum(col("c_ab")).as("b"))
      bg.filter(col("c_ab") >= PmiMinCount)
        .join(uni.select(col("tok").as("t1"), col("c").as("ca")), "t1")
        .join(uni.select(col("tok").as("t2"), col("c").as("cb")), "t2")
        .crossJoin(broadcast(tt)).crossJoin(broadcast(bt))
        .select(col("t1"), col("t2"), col("c_ab"),
          round(log((col("c_ab").cast("double") * col("t").cast("double")
              * col("t").cast("double"))
            / (col("b").cast("double") * col("ca").cast("double")
              * col("cb").cast("double"))), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("t1"), col("t2"))
        .limit(PmiTopN)
  }

  val queries: Seq[Q] =
    Seq(textTokens, textLangId, textQuality, textFingerprint,
      textPmiCollocations,
      textRollingFingerprint, textPiiFlags, textPiiRedact,
      textRakeKeyphrases, textRepetition,
      jsonExtractProps, jsonBuild, exprVariant, textEntropy, textLmScore,
      textWinnow,
      textLmBigram, textFeatureHash, textClassifierScore, textClassifierAuc,
      textNgramNovelty,
      textNormalizeUnicode, textBm25, textBpePairs, textBpeMergeLoop,
      textBpeEncodeStats, textUnigramPruneLoop, textUnigramEncodeStats,
      qualityPerplexityBuckets, langConfusion, gopherRules,
      textChunkWindows, textClassifierPrf, textClassifierReliability,
      classifierTrainLogreg)
}
