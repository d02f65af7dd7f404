package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.Text

/** The composed ingest funnel a training-data pipeline actually runs —
  * language gate → quality gate → repetition gate → exact dedup — with
  * per-source survivor counts at every stage. The per-stage audit table
  * is what pipeline operators monitor: a stage that suddenly eats a
  * source shows up as one row's cliff.
  *
  * Execution shape: ONE codegen'd scan computes every per-document flag
  * (language id, quality score, repetition ratio, md5 fingerprint — all
  * reused from the individually-proven [[TextAnalysis]] operators);
  * stage counts are a single partial-aggregated groupBy on source, and
  * the dedup survivor count is one window over the fingerprint among
  * passing docs. Two shuffles total (source counts, fp window) — both
  * on well-distributed keys, no driver-side state, at any corpus size.
  */
object Pipeline {

  /** Minimum quality score to pass the quality gate. */
  val QualityMin = 0.5

  private def repRatio = {
    val grams = regexp_extract_all(col("text"),
      lit("(?=([^ ]* [^ ]* [^ ]*))[^ ]* "), lit(1))
    val n = size(grams).cast("long")
    val nd = size(array_distinct(grams)).cast("long")
    when(n === 0, lit(0.0))
      .otherwise((n - nd).cast("double") / n.cast("double"))
  }

  def qualityFunnel(docs: DataFrame): DataFrame = {
    // The flag scan (md5 + language id + quality + repetition over the
    // full text) feeds BOTH the stage-count aggregate and the dedup
    // window; checkpoint it once so the text kernels run one corpus
    // pass, not two. The materialized frame is ids + fingerprint +
    // three booleans per doc — a fraction of the corpus it came from.
    val flags = docs.select(
      col("doc_id"), col("source"),
      Text.md5Fingerprint(col("text")).as("fp"),
      (Text.langId(col("text")) === "en").as("is_en"),
      (Text.qualityScore(col("text")) >= QualityMin).as("is_q"),
      (repRatio <= TextAnalysis.RepetitionMax).as("is_clean"))
      .localCheckpoint()
    val pass = flags.filter(col("is_en") && col("is_q") && col("is_clean"))
    val unique = pass
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("rnk") === 1)
      .groupBy(col("source")).agg(count(lit(1)).as("n_unique"))
    flags.groupBy(col("source")).agg(
        count(lit(1)).as("n_total"),
        count(when(col("is_en"), lit(1))).as("n_en"),
        count(when(col("is_en") && col("is_q"), lit(1))).as("n_quality"),
        count(when(col("is_en") && col("is_q") && col("is_clean"), lit(1)))
          .as("n_clean"))
      .join(unique, Seq("source"), "left")
      .select(col("source"), col("n_total"), col("n_en"), col("n_quality"),
        col("n_clean"), coalesce(col("n_unique"), lit(0L)).as("n_unique"))
  }

  private def funnelOracle: String = {
    val en = Text.sqlStopwordHits("text", "en")
    val de = Text.sqlStopwordHits("text", "de")
    val fr = Text.sqlStopwordHits("text", "fr")
    val es = Text.sqlStopwordHits("text", "es")
    val isEn = s"($en > 0 or $de > 0 or $fr > 0 or $es > 0)" +
      s" and $en >= $de and $en >= $fr and $en >= $es"
    val nTok = "cast(len(str_split(text, ' ')) as bigint)"
    val avgLen =
      s"cast(length(text) - ($nTok - 1) as double) / cast($nTok as double)"
    val quality =
      s"""(case when $nTok between 20 and 1000 then cast(0.4 as double)
         |      else cast(0.0 as double) end)
         |+ (case when $avgLen between cast(3.0 as double) and cast(10.0 as double)
         |        then cast(0.3 as double) else cast(0.0 as double) end)
         |+ (cast($en as double) / cast($nTok as double)) * cast(0.3 as double)"""
        .stripMargin
    val gs = Text.sqlTrigramList("string_split(text, ' ')")
    val repOk =
      s"""case when len($gs) = 0 then true
         |     else (cast(len($gs) - len(list_distinct($gs)) as double)
         |           / cast(len($gs) as double))
         |          <= ${TextAnalysis.RepetitionMax} end""".stripMargin
    s"""with f as (
       |  select doc_id, source, md5(lower(text)) as fp,
       |    ($isEn) as is_en,
       |    ($quality) >= $QualityMin as is_q,
       |    ($repOk) as is_clean
       |  from documents),
       |p as (select * from f where is_en and is_q and is_clean),
       |u as (select source, count(*) as n_unique from (
       |    select source, row_number() over (
       |      partition by fp order by doc_id) as rnk from p) t
       |  where rnk = 1 group by source),
       |s as (select source, count(*) as n_total,
       |    count(case when is_en then 1 end) as n_en,
       |    count(case when is_en and is_q then 1 end) as n_quality,
       |    count(case when is_en and is_q and is_clean then 1 end) as n_clean
       |  from f group by source)
       |select s.source, n_total, n_en, n_quality, n_clean,
       |  coalesce(u.n_unique, 0::bigint) as n_unique
       |from s left join u using (source)
       |order by s.source""".stripMargin
  }

  val pipelineFunnel: Q = Q.df("pipeline_quality_funnel", funnelOracle) {
    (s, dir) =>
      qualityFunnel(Tables.df(s, dir, "documents")).orderBy(col("source"))
  }

  /** The full pretraining-mix build, composed end-to-end from the
    * individually-proven kernels: exact dedup (keep min doc_id per
    * fingerprint) → benchmark decontamination (drop docs sharing any
    * word trigram with the held-out source) → per-source token budget
    * (deterministic pseudo-random order) → shard assignment, reporting
    * per-shard document and token counts — the manifest a training run
    * consumes. Every stage reuses the exact arithmetic of its
    * standalone entry ([[Dedup.dedupExact]], [[Corpus.decontaminate]],
    * [[Corpus.tokenBudgetSample]], [[Corpus.corpusShardShuffle]]), so
    * the composition is integer-exact end-to-end.
    *
    * Scale shape: the stages chain as four bounded shuffles (fp window,
    * gram join with broadcast benchmark side, per-source budget window,
    * shard groupBy) with nothing driver-sized; each stage's scaling
    * story is documented at its standalone operator. */
  def pretrainingMix(docs: DataFrame): DataFrame = {
    import graft.operators.{Corpus => C}
    val pool = docs.filter(col("source") =!= C.BenchmarkSource)
    val dedup = pool
      .withColumn("fp", Text.md5Fingerprint(col("text")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("rnk") === 1)
      .select(col("doc_id"), col("source"), col("text"))
    val bench = docs.filter(col("source") === C.BenchmarkSource)
      .select(explode(Text.shingles(col("text"), 3)).as("g"))
      .select(xxhash64(col("g")).as("gh")).distinct()
    val dirty = dedup
      .select(col("doc_id"), explode(Text.shingles(col("text"), 3)).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("gh"))
      .join(broadcast(bench), Seq("gh"))
      .select(col("doc_id")).distinct()
    val clean = dedup.join(dirty, Seq("doc_id"), "left_anti")
    val w = Window.partitionBy(col("source"))
      .orderBy(expr(C.SplitExpr), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kept = clean
      .select(col("source"), col("doc_id"),
        Text.tokenCount(col("text")).as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .filter(col("cum") <= C.TokenBudget)
    kept
      .select(expr(C.ShardH).cast("long").as("shard"), col("n_tokens"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
  }

  private def mixOracle: String = {
    import graft.operators.{Corpus => C}
    val gs = graft.functions.Text.sqlTrigramList("string_split(text, ' ')")
    s"""with pool as (select * from documents
       |              where source <> '${C.BenchmarkSource}'),
       |d as (select doc_id, source, text from (
       |    select doc_id, source, text, row_number() over (
       |      partition by md5(lower(text)) order by doc_id) as rnk
       |    from pool) t where rnk = 1),
       |bench as (select distinct unnest($gs) as g from documents
       |          where source = '${C.BenchmarkSource}'),
       |dirty as (select distinct doc_id from (
       |    select doc_id, unnest($gs) as g from d) x
       |  join bench using (g)),
       |clean as (select * from d where not exists (
       |    select 1 from dirty where dirty.doc_id = d.doc_id)),
       |kept as (select source, doc_id,
       |    cast(len(string_split(text, ' ')) as bigint) as n_tokens
       |  from (
       |    select source, doc_id, text,
       |      cast(sum(cast(len(string_split(text, ' ')) as bigint)) over (
       |        partition by source order by ${C.SplitExpr}, doc_id
       |        rows unbounded preceding) as bigint) as cum
       |    from clean) t
       |  where cum <= ${C.TokenBudget})
       |select cast(${C.ShardH} as bigint) as shard,
       |  cast(count(*) as bigint) as n_docs,
       |  cast(sum(n_tokens) as bigint) as n_tokens
       |from kept group by shard order by shard""".stripMargin
  }

  val pipelineMix: Q = Q.df("pipeline_pretraining_mix", mixOracle) {
    (s, dir) =>
      pretrainingMix(Tables.df(s, dir, "documents")).orderBy(col("shard"))
  }

  /** Unified contamination report — the audit artifact a release
    * pipeline publishes: every training document flagged by EITHER
    * decontamination screen (exact trigram overlap, or embedding cosine
    * for paraphrased leakage), with per-screen hit counts and an
    * agreement column. The two screens are the existing kernels
    * ([[Corpus.decontaminate]], [[Similarity.embeddingDecontaminate]])
    * composed by one full-outer merge on doc_id — each keeps its own
    * scale shape (broadcast bench gram-hash set / broadcast bench unit
    * vectors, one corpus scan each). The union of flags is small by
    * construction (contaminated docs), so the merge join is
    * flag-sized, not corpus-sized. */
  def contaminationReport(docs: DataFrame, emb: DataFrame): DataFrame = {
    val ng = Corpus.decontaminate(docs, Corpus.BenchmarkSource)
      .select(col("doc_id"), col("n_contaminated").as("n_gram_hits"))
    val em = Similarity.embeddingDecontaminate(
      emb, docs, Corpus.BenchmarkSource)
      .select(col("doc_id"), col("n_bench_hits").as("n_emb_hits"))
    ng.join(em, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        col("n_gram_hits").isNotNull.as("flag_ngram"),
        coalesce(col("n_gram_hits"), lit(0L)).as("n_gram_hits"),
        col("n_emb_hits").isNotNull.as("flag_embedding"),
        coalesce(col("n_emb_hits"), lit(0L)).as("n_emb_hits"),
        (col("n_gram_hits").isNotNull && col("n_emb_hits").isNotNull)
          .as("both"))
  }

  private def contaminationOracle: String = {
    val b = Corpus.BenchmarkSource
    s"""with toks as (select doc_id, source, string_split(text, ' ') as t
       |              from documents),
       |sh as (select distinct doc_id, source,
       |         unnest(${Text.sqlTrigramList("t")}) as g
       |       from toks),
       |bench as (select distinct g from sh where source = '$b'),
       |ng as (select sh.doc_id, cast(count(*) as bigint) as n_gram_hits
       |       from sh join bench using (g)
       |       where sh.source <> '$b' group by sh.doc_id),
       |e as (${Similarity.sqlUnit}),
       |be as (select e.vec_id, e.u from e
       |       join documents d on d.doc_id = e.vec_id
       |       where d.source = '$b'),
       |ce as (select e.vec_id, e.u from e
       |       join documents d on d.doc_id = e.vec_id
       |       where d.source <> '$b'),
       |s as (select ce.vec_id as cid, ${Similarity.sqlDotU("ce", "be")} as cos
       |      from ce cross join be),
       |em as (select cid as doc_id, cast(count(*) as bigint) as n_emb_hits
       |       from s where cos >= ${Similarity.EmbedContamThreshold}
       |       group by cid)
       |select coalesce(ng.doc_id, em.doc_id) as doc_id,
       |  ng.doc_id is not null as flag_ngram,
       |  coalesce(ng.n_gram_hits, 0) as n_gram_hits,
       |  em.doc_id is not null as flag_embedding,
       |  coalesce(em.n_emb_hits, 0) as n_emb_hits,
       |  ng.doc_id is not null and em.doc_id is not null as both
       |from ng full outer join em on ng.doc_id = em.doc_id
       |order by doc_id""".stripMargin
  }

  val pipelineContamination: Q =
    Q.df("pipeline_contamination_report", contaminationOracle) { (s, dir) =>
      contaminationReport(Tables.df(s, dir, "documents"),
        Tables.df(s, dir, "embeddings"))
        .orderBy(col("doc_id"))
    }

  val queries: Seq[Q] = Seq(pipelineFunnel, pipelineMix,
    pipelineContamination)
}
