package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.Text

/** Corpus-preparation operators a training-data pipeline runs between
  * dedup and tokenization: chunking long documents into overlapping
  * context windows, deterministic train/val/test splitting, TF-IDF key
  * terms, and incremental dedup against an existing corpus. All are
  * oracle-checked (the split and score arithmetic is chosen to be
  * bit-identical cross-engine).
  */
object Corpus {

  // ---- chunking ----------------------------------------------------------

  /** Context-window size / stride in tokens. */
  val ChunkSize = 32
  val ChunkStride = 24

  /** Overlapping token-window chunks: one pass per document through a
    * primitive kernel (the per-doc loop is procedural; Spark HOF chains
    * evaluate interpreted), emitting (doc_id, chunk_start, n_tokens,
    * chunk_text). Tokenization follows the split-on-space contract
    * shared with [[graft.functions.Text.shingles]]. Chunking is
    * embarrassingly parallel — zero shuffle at any corpus size. */
  def chunk(docs: DataFrame, size: Int = ChunkSize,
      stride: Int = ChunkStride): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = text.split(" ", -1)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String)]
        var start = 0
        while (start < toks.length) {
          val end = math.min(start + size, toks.length)
          out += ((id, start.toLong, (end - start).toLong,
            toks.slice(start, end).mkString(" ")))
          start += stride
        }
        out
      }
      .toDF("doc_id", "chunk_start", "n_tokens", "chunk_text")
  }

  val textChunks: Q = Q.df(
    "text_chunks",
    s"""with toks as (select doc_id, string_split(text, ' ') as t from documents)
       |select doc_id, cast(s as bigint) as chunk_start,
       |  cast(least(s + $ChunkSize, len(t)) - s as bigint) as n_tokens,
       |  array_to_string(list_slice(t, s + 1, least(s + $ChunkSize, len(t))), ' ')
       |    as chunk_text
       |from toks, unnest(range(0, len(t), $ChunkStride)) u(s)
       |order by doc_id, chunk_start""".stripMargin) { (s, dir) =>
    chunk(Tables.df(s, dir, "documents"))
      .orderBy(col("doc_id"), col("chunk_start"))
  }

  // ---- deterministic train/val/test split --------------------------------

  /** Knuth-style multiplicative bucket in [0,100) from the doc id — pure
    * integer arithmetic, so Spark and DuckDB agree bit-for-bit (an
    * engine hash like xxhash64 would not be oracle-able). Deterministic
    * under retries and stable across runs: the property a 100 TB
    * pipeline needs so a document's split never flips between jobs. */
  private[operators] val SplitExpr = "(doc_id * 2654435761) % 4294967296 % 100"

  val TrainPct = 80
  val ValPct = 10 // test = remainder

  val sampleSplit: Q = Q.df(
    "sample_split_assign",
    s"""select doc_id, source, cast($SplitExpr as bigint) as bucket,
       |  case when $SplitExpr < $TrainPct then 'train'
       |       when $SplitExpr < ${TrainPct + ValPct} then 'val'
       |       else 'test' end as split
       |from documents order by doc_id""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        expr(SplitExpr).cast("long").as("bucket"),
        when(expr(SplitExpr) < TrainPct, lit("train"))
          .when(expr(SplitExpr) < TrainPct + ValPct, lit("val"))
          .otherwise(lit("test")).as("split"))
      .orderBy(col("doc_id"))
  }

  /** The same multiplicative bucket, keyed by the near-dup CLUSTER's
    * canonical id instead of the doc id. */
  private[operators] val ClusterSplitExpr =
    "(cluster_id * 2654435761) % 4294967296 % 100"

  /** LEAKAGE-SAFE train/val/test split: the defect [[sampleSplit]]'s
    * per-doc hash carries is that two NEAR-DUPLICATE documents can
    * land in different splits — the eval set then contains
    * paraphrases of training data and every benchmark number is
    * contaminated (the reason decontamination suites exist). The fix
    * is group-aware assignment: hash the near-dup CLUSTER's canonical
    * id (the [[Dedup.sharedDupClusters]] label — connected components
    * over the verified trigram-Jaccard pair graph), so a whole dup
    * family moves as one unit and train/eval leakage through near
    * duplication is impossible BY CONSTRUCTION, not by a post-hoc
    * decontamination scan. Cost over the plain split is exactly the
    * cluster map the dedup pass already produced (memoized here,
    * a stored two-column table in production); the assignment itself
    * stays one integer hash — deterministic under retries, stable
    * across jobs, oracle-able bit-for-bit. Singletons hash by their
    * own id, so on a dup-free corpus this DEGRADES to [[sampleSplit]]
    * exactly. */
  val sampleLeakageSafeSplit: Q = Q.df(
    "sample_leakage_safe_split",
    s"""with recursive
       |${graft.operators.Dedup.dupClusterCtes},
       |lab as (select id as doc_id, min(r) as cluster_id from reach
       |        group by id)
       |select doc_id, cluster_id,
       |  cast($ClusterSplitExpr as bigint) as bucket,
       |  case when $ClusterSplitExpr < $TrainPct then 'train'
       |       when $ClusterSplitExpr < ${TrainPct + ValPct} then 'val'
       |       else 'test' end as split
       |from lab order by doc_id""".stripMargin) { (s, dir) =>
    graft.operators.Dedup.sharedDupClusters(s, dir)
      .select(col("doc_id"), col("cluster_id"),
        expr(ClusterSplitExpr).cast("long").as("bucket"),
        when(expr(ClusterSplitExpr) < TrainPct, lit("train"))
          .when(expr(ClusterSplitExpr) < TrainPct + ValPct, lit("val"))
          .otherwise(lit("test")).as("split"))
      .orderBy(col("doc_id"))
  }

  // ---- TF-IDF key terms --------------------------------------------------

  val TopTerms = 3

  /** Per-document top-k terms by tf-idf. The idf is the RATIONAL variant
    * idf = N/df (not ln(N/df)): natural-log results differ across libm
    * implementations in the last ulp, while one IEEE division and one
    * multiply are bit-identical in any engine — and for a fixed document
    * the ranking only compares scores with the same monotone transform
    * applied. Shuffles on (doc, term) and term — both well-distributed
    * keys; no driver-side state. */
  def tfidfTopTerms(docs: DataFrame, k: Int = TopTerms): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf.join(df, Seq("term")).crossJoin(broadcast(n))
      .withColumn("score", col("tf").cast("double")
        * (col("n").cast("double") / col("df").cast("double")))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"),
        col("score"))
  }

  val tfidf: Q = Q.df(
    "text_tfidf_topterms",
    s"""with toks as (select doc_id, unnest(string_split(text, ' ')) as term
       |              from documents),
       |tf as (select doc_id, term, count(*) as tf from toks group by 1, 2),
       |df as (select term, count(*) as df from tf group by 1),
       |n as (select count(*) as n from documents),
       |scored as (
       |  select tf.doc_id, tf.term, tf.tf, df.df,
       |    cast(tf.tf as double) * (cast(n.n as double) / cast(df.df as double))
       |      as score
       |  from tf join df using (term) cross join n)
       |select doc_id, rnk, term, tf, df, score from (
       |  select *, cast(row_number() over (partition by doc_id
       |    order by score desc, term) as bigint) as rnk
       |  from scored) t
       |where rnk <= $TopTerms
       |order by doc_id, rnk""".stripMargin) { (s, dir) =>
    tfidfTopTerms(Tables.df(s, dir, "documents"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  // ---- incremental dedup against an existing corpus ----------------------

  /** New documents (source <> base) whose exact fingerprint does NOT
    * already exist in the base corpus — the nightly-increment shape of
    * exact dedup: an anti join on the 16-byte content hash, so the
    * shuffle carries fingerprints, never text. */
  def newVsCorpus(docs: DataFrame, baseSource: String): DataFrame = {
    val fp = graft.functions.Text.md5Fingerprint(col("text"))
    val base = docs.filter(col("source") === baseSource).select(fp.as("fp"))
    docs.filter(col("source") =!= baseSource)
      .select(col("doc_id"), col("source"), fp.as("fp"))
      .join(base, Seq("fp"), "left_anti")
      .select(col("doc_id"), col("source"), col("fp"))
  }

  val BaseSource = "src0"

  val dedupIncremental: Q = Q.df(
    "dedup_incremental",
    // NOT EXISTS, not NOT IN: a NULL fingerprint on the base side would
    // empty a NOT IN entirely, while the Spark side is an anti join
    // (NULL keys never match) — NOT EXISTS has the anti-join semantics.
    s"""select d.doc_id, d.source, md5(lower(d.text)) as fp
       |from documents d
       |where d.source <> '$BaseSource'
       |  and not exists (
       |    select 1 from documents b where b.source = '$BaseSource'
       |      and md5(lower(b.text)) = md5(lower(d.text)))
       |order by d.doc_id""".stripMargin) { (s, dir) =>
    newVsCorpus(Tables.df(s, dir, "documents"), BaseSource)
      .orderBy(col("doc_id"))
  }

  // ---- token-budget sampling (mixture weighting) -------------------------

  /** Per-source token budget: keep documents, in deterministic
    * pseudo-random order, until the source's running token count would
    * exceed the budget — the "data mixing" step that weights corpus
    * sources for a training run. One window per source partition
    * (parallel across sources; token counts are ints so the running sum
    * is exact in any engine). A single giant source would make its
    * window a straggler: the 100 TB form pre-shards such a source into
    * (source, shard) with a per-shard budget of budget/shards — same
    * arithmetic, one more key column. */
  val TokenBudget = 800L

  def tokenBudgetSample(docs: DataFrame, budget: Long): DataFrame = {
    val toks = graft.functions.Text.tokenCount(col("text"))
    val w = Window.partitionBy(col("source"))
      .orderBy(expr(SplitExpr), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("source"), col("doc_id"), toks.as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  val sampleBudget: Q = Q.df(
    "sample_token_budget",
    // The window sum is wrapped in cast(.. as bigint): DuckDB sum(BIGINT)
    // yields HUGEINT (int128), which the driver's pandas layer coerces to
    // float64 — diverging from Spark's int64 in the dtype-sensitive hash
    // even when every value matches.
    s"""select source, doc_id,
       |  cast(len(string_split(text, ' ')) as bigint) as n_tokens,
       |  cum_tokens
       |from (
       |  select source, doc_id, text,
       |    cast(sum(cast(len(string_split(text, ' ')) as bigint)) over (
       |      partition by source order by $SplitExpr, doc_id
       |      rows unbounded preceding) as bigint) as cum_tokens
       |  from documents) t
       |where cum_tokens <= $TokenBudget
       |order by source, doc_id""".stripMargin) { (s, dir) =>
    tokenBudgetSample(Tables.df(s, dir, "documents"), TokenBudget)
      .orderBy(col("source"), col("doc_id"))
  }

  /** Mixing budget (documents drawn) for [[sampleTemperature]]. */
  val MixBudget = 1000000L

  /** Temperature-based domain mixing — the data-mixture op behind
    * multi-source training corpora (sample source i with p_i ∝
    * size_i^α, α < 1 flattening the natural distribution toward small
    * sources). α = 1/2 keeps the entry bit-exact cross-engine: sqrt is
    * IEEE-correctly-rounded in both engines, the normalizing sum folds
    * a value-SORTED weight list (identical accumulation order; equal
    * values commute), and division/floor on identical bits agree
    * exactly. Distributed shape: one hash aggregate over source plus
    * one broadcast scalar — nothing beyond the group-by moves at any
    * corpus size. */
  val sampleTemperature: Q = Q.df(
    "sample_temperature_mix",
    s"""with s as (
       |  select source, count(*) as n_docs,
       |    cast(sum(n_chars) as bigint) as toks
       |  from documents group by source),
       |w as (select source, n_docs, toks,
       |    sqrt(cast(toks as double)) as wt from s),
       |t as (select list_reduce(list_prepend(cast(0 as double),
       |    list(wt order by wt)), (a, x) -> a + x) as tot from w)
       |select source, n_docs, toks,
       |  round(wt / tot, 6) as p_mix,
       |  cast(floor($MixBudget * wt / tot) as bigint) as expected_docs
       |from w, t order by source""".stripMargin) { (s, dir) =>
    val base = Tables.df(s, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("toks"))
      .withColumn("wt", sqrt(col("toks").cast("double")))
    val tot = base.agg(
      aggregate(sort_array(collect_list(col("wt"))), lit(0.0d),
        (a, x) => a + x).as("tot"))
    base.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("toks"),
        round(col("wt") / col("tot"), 6).as("p_mix"),
        floor(lit(MixBudget) * col("wt") / col("tot")).cast("long")
          .as("expected_docs"))
      .orderBy(col("source"))
  }

  // ---- sequence packing --------------------------------------------------

  /** Training-sequence capacity in tokens. */
  val SeqCapacity = 512L

  /** Concatenation packing (GPT-style): documents are laid head-to-tail
    * into a virtual token stream per source, and each doc is labeled
    * with the fixed-capacity sequence its FIRST token lands in plus its
    * offset there (docs longer than the remainder spill into the next
    * sequence, as in real packers that split at the boundary). Windows
    * are per-source so packing parallelizes across sources; all
    * arithmetic is integer-exact cross-engine. As with
    * [[tokenBudgetSample]], a pathologically large single source is
    * pre-sharded at 100 TB — packing is associative over shards since
    * sequence ids only need to be unique, not globally dense. */
  def packSequences(docs: DataFrame, capacity: Long): DataFrame = {
    val toks = graft.functions.Text.tokenCount(col("text"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("source"), col("doc_id"), toks.as("n_tokens"))
      .withColumn("start_tok", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_id", floor(col("start_tok").cast("double") / capacity)
        .cast("long"))
      .withColumn("seq_offset", col("start_tok") - col("seq_id") * capacity)
      .select(col("source"), col("doc_id"), col("n_tokens"), col("seq_id"),
        col("seq_offset"))
  }

  val packSeqs: Q = Q.df(
    "pack_sequences",
    // cast(sum(..) as bigint): DuckDB window sum over BIGINT is HUGEINT,
    // which pandas coerces to float64 and breaks the driver's dtype hash.
    s"""with t as (
       |  select source, doc_id,
       |    cast(len(string_split(text, ' ')) as bigint) as n_tokens,
       |    cast(sum(cast(len(string_split(text, ' ')) as bigint)) over (
       |      partition by source order by doc_id rows unbounded preceding)
       |      as bigint)
       |      - cast(len(string_split(text, ' ')) as bigint) as start_tok
       |  from documents)
       |select source, doc_id, n_tokens,
       |  cast(floor(cast(start_tok as double) / $SeqCapacity) as bigint) as seq_id,
       |  start_tok - cast(floor(cast(start_tok as double) / $SeqCapacity)
       |    as bigint) * $SeqCapacity as seq_offset
       |from t order by source, doc_id""".stripMargin) { (s, dir) =>
    packSequences(Tables.df(s, dir, "documents"), SeqCapacity)
      .orderBy(col("source"), col("doc_id"))
  }

  // ---- benchmark decontamination -----------------------------------------

  /** The held-out source standing in for an eval benchmark. */
  val BenchmarkSource = "src19"

  /** N-gram benchmark decontamination: flag (and count the hits of)
    * every training document sharing at least one word trigram with a
    * held-out benchmark set — the overlap check frontier training
    * pipelines run so eval data cannot leak into the training corpus.
    *
    * Spark shape for 100 TB: both sides explode to 8-byte trigram
    * HASHES (the [[graft.functions.Text.shingles]] contract feeding
    * xxhash64), the benchmark side is distinct-reduced and the join is a
    * hash equi-join on the hash — the shuffle carries hashes, never
    * text, and the benchmark side (tiny by construction) broadcasts.
    * Output = per-contaminated-doc hit counts; clean docs are the anti
    * join (not materialized here — the count row per dirty doc is the
    * audit artifact a pipeline keeps).
    *
    * The oracle joins the raw trigram STRINGS (DuckDB has no xxhash64):
    * equality of hashes and equality of grams coincide because the
    * count compares DISTINCT grams — a 64-bit collision inside one
    * document's gram set is the only divergence risk and the pigeonhole
    * odds at document scale (<10⁴ grams) are ~2⁻⁴⁰. */
  def decontaminate(docs: DataFrame, benchSource: String): DataFrame = {
    val grams = docs.select(col("doc_id"), col("source"),
      explode(graft.functions.Text.shingles(col("text"), 3)).as("g"))
      .select(col("doc_id"), col("source"), xxhash64(col("g")).as("gh"))
    val bench = grams.filter(col("source") === benchSource)
      .select(col("gh")).distinct()
    grams.filter(col("source") =!= benchSource)
      .join(broadcast(bench), Seq("gh"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_contaminated"))
  }

  val decontaminateNgram: Q = Q.df(
    "decontaminate_ngram",
    s"""with toks as (select doc_id, source, string_split(text, ' ') as t
       |              from documents),
       |sh as (select distinct doc_id, source,
       |         unnest(${graft.functions.Text.sqlTrigramList("t")}) as g
       |       from toks),
       |bench as (select distinct g from sh where source = '$BenchmarkSource')
       |select sh.doc_id, sh.source,
       |  cast(count(*) as bigint) as n_contaminated
       |from sh join bench using (g)
       |where sh.source <> '$BenchmarkSource'
       |group by sh.doc_id, sh.source
       |order by sh.doc_id""".stripMargin) { (s, dir) =>
    decontaminate(Tables.df(s, dir, "documents"), BenchmarkSource)
      .orderBy(col("doc_id"))
  }

  /** Bloom-filter decontamination — the 100 TB form of
    * [[decontaminate]]: instead of broadcasting the benchmark's distinct
    * gram-hash SET (gigabytes for a large held-out suite), build one
    * `bloom_filter_agg` sketch over it (fixed bits regardless of corpus
    * size) and probe every corpus gram with `might_contain`. The probe
    * never misses real contamination (Bloom filters have no false
    * negatives) and the rare false positive only costs a second-stage
    * exact check on the flagged sliver.
    *
    * Verification without sketch bits in the compare (the
    * approx_*_bounds pattern): the output carries the EXACT per-doc
    * contamination count — reproducible by the oracle — plus the
    * no-false-negative invariant (`every exact hit was bloom-flagged`)
    * as a boolean the oracle pins to TRUE. The sketch's bit pattern
    * itself never reaches the output. */
  def decontaminateBloom(docs: DataFrame, benchSource: String): DataFrame = {
    graft.functions.Bloom.ensureRegistered(docs.sparkSession)
    val grams = docs.select(col("doc_id"), col("source"),
      explode(graft.functions.Text.shingles(col("text"), 3)).as("g"))
      .select(col("doc_id"), col("source"), xxhash64(col("g")).as("gh"))
    // The distinct bench subtree feeds TWO consumers (the sketch build
    // and the exact-join side) and is deliberately NOT checkpointed
    // between them: the subtree is filter-pruned to the benchmark slice
    // at the scan, so recomputing it once costs less than a
    // materialize+free round trip of its distinct-hash set (an r9
    // lifecycle pass added exactly that pair here and regressed the
    // entry ~2.8× — a checkpoint write+read+blocking-free is several
    // scheduled jobs, while the slice re-scan is one pruned pass).
    val bench = grams.filter(col("source") === benchSource)
      .select(col("gh")).distinct()
    // The sketch is the MODEL here: one fixed-size binary (~100 KB for
    // 800k bits) collected to the driver and shipped back as a literal —
    // the same model-only collect as the trained k-means centroids, and
    // what `might_contain` requires (its filter side must be a constant
    // or scalar subquery, never a per-row column). The literal lands in
    // the stage's task binary ONCE per stage (Literal is a codegen
    // reference, and BloomFilterMightContain deserializes it lazily once
    // per task), so the 100 KB constant is a per-stage broadcast, not a
    // per-row cost.
    val bf: Array[Byte] = bench
      .agg(expr("graft_bloom_agg(gh, cast(100000 as bigint), " +
        "cast(800000 as bigint))").as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val corpus = grams.filter(col("source") =!= benchSource)
    corpus
      .join(broadcast(bench.withColumn("inb", lit(1))), Seq("gh"), "left")
      .withColumn("hit",
        call_function(graft.functions.Bloom.probeName, lit(bf), col("gh")))
      .groupBy(col("doc_id"), col("source"))
      .agg(
        sum(coalesce(col("inb"), lit(0))).as("n_contaminated"),
        min(col("hit") || col("inb").isNull).as("no_false_negative"))
  }

  val decontaminateBloomQ: Q = Q.df(
    "decontaminate_bloom",
    s"""with toks as (select doc_id, source, string_split(text, ' ') as t
       |              from documents),
       |sh as (select distinct doc_id, source,
       |         unnest(${graft.functions.Text.sqlTrigramList("t")}) as g
       |       from toks),
       |bench as (select distinct g from sh where source = '$BenchmarkSource')
       |select sh.doc_id, sh.source,
       |  cast(sum(case when bench.g is not null then 1 else 0 end) as bigint)
       |    as n_contaminated,
       |  true as no_false_negative
       |from sh left join bench using (g)
       |where sh.source <> '$BenchmarkSource'
       |group by sh.doc_id, sh.source
       |order by sh.doc_id""".stripMargin) { (s, dir) =>
    decontaminateBloom(Tables.df(s, dir, "documents"), BenchmarkSource)
      .orderBy(col("doc_id"))
  }

  // ---- corpus-wide heavy-hitter n-grams ----------------------------------

  /** Heavy hitters kept. */
  val TopGrams = 20

  /** Top-k word trigrams by DOCUMENT frequency — the corpus-statistics
    * pass that surfaces boilerplate (licenses, headers, nav bars) for
    * the dedup/filter rules to target. Grams are distinct per document
    * ([[graft.functions.Text.shingles]]), so the count is a df, not a
    * term frequency. Shape at 100 TB: map-side partial aggregation
    * collapses each partition to its distinct grams before the shuffle,
    * and the final top-k is TakeOrderedAndProject — k rows per
    * partition to the driver, never the full gram histogram. */
  def frequentNgrams(docs: DataFrame, k: Int = TopGrams): DataFrame =
    docs.select(explode(graft.functions.Text.shingles(col("text"), 3)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("g"))
      .limit(k)

  val freqNgrams: Q = Q.df(
    "freq_ngrams_topdf",
    s"""with toks as (select doc_id, string_split(text, ' ') as t from documents),
       |sh as (select distinct doc_id, unnest(${graft.functions.Text.sqlTrigramList("t")}) as g
       |       from toks)
       |select g, count(*) as df from sh
       |group by g order by df desc, g limit $TopGrams""".stripMargin) { (s, dir) =>
    frequentNgrams(Tables.df(s, dir, "documents"))
  }

  // ---- stratified mixture sampling ---------------------------------------

  /** Per-source sampling rates (percent) — the mixture-weights table a
    * training run joins against its corpus: sources are up/down-weighted
    * by spec, not uniformly. Deterministic from the source index so the
    * fixture dim is reproducible; in production this is a tiny config
    * table. */
  val SourceRates: Seq[(String, Long)] =
    (0 until 20).map(i => s"src$i" -> Seq(60L, 35L, 15L)(i % 3))

  /** Stratified downsampling: broadcast-join the rates dim, keep a doc
    * iff its deterministic hash bucket falls under its source's rate.
    * Exact per-stratum proportions under retries (same multiplicative
    * bucket as the split operator); the join is a broadcast of a
    * 20-row dim — no shuffle of the corpus at any scale. Sources
    * absent from the spec are dropped by the inner join, exactly how a
    * mixture spec scopes a run. */
  def stratifiedSample(docs: DataFrame, rates: Seq[(String, Long)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dim = rates.toDF("source", "rate")
    docs.select(col("doc_id"), col("source"),
        expr(SplitExpr).cast("long").as("bucket"))
      .join(broadcast(dim), Seq("source"))
      .filter(col("bucket") < col("rate"))
      .select(col("doc_id"), col("source"), col("bucket"), col("rate"))
  }

  val sampleStratified: Q = Q.df(
    "sample_stratified", {
      val dimRows = SourceRates.map { case (s, r) => s"('$s', ${r}::bigint)" }
        .mkString(",\n    ")
      s"""with rates(source, rate) as (values
         |    $dimRows)
         |select d.doc_id, d.source,
         |  cast($SplitExpr as bigint) as bucket, r.rate
         |from documents d join rates r using (source)
         |where cast($SplitExpr as bigint) < r.rate
         |order by d.doc_id""".stripMargin
    }) { (s, dir) =>
    stratifiedSample(Tables.df(s, dir, "documents"), SourceRates)
      .orderBy(col("doc_id"))
  }

  /** Total sample budget allocated by [[sampleNeyman]]. */
  val NeymanBudget = 10000L

  /** NEYMAN (optimal) stratified-sample allocation: under a fixed
    * budget n, the variance-minimizing per-stratum sample size is
    * n_h ∝ N_h·S_h (big AND internally-variable strata get more) — the
    * classical survey-sampling design step that turns the per-source
    * token statistics into the rates table [[stratifiedSample]]
    * consumes (proportional allocation over-samples homogeneous
    * boilerplate sources; Neyman provably minimizes the estimator
    * variance). Everything up to the single sqrt is exact int64
    * (count / sum / sum-of-squares per stratum; the cleared-denominator
    * sample variance (N·Σx² − (Σx)²)/(N(N−1))); the stratum-weight
    * total folds over the SORTED weight list so the one
    * summation-order-sensitive double is deterministic cross-engine,
    * and the final allocation is one floor per stratum. Strata count
    * is model-sized — one map-side-combined groupBy over the corpus,
    * nothing driver-sized. */
  def sampleNeyman(docs: DataFrame, budget: Long): DataFrame = {
    val g = docs.select(col("source"),
        graft.functions.Text.tokenCount(col("text")).as("x"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("nh"), sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("ssq"))
      .filter(col("nh") > 1)
      .withColumn("sd", sqrt(
        (col("nh") * col("ssq") - col("s") * col("s")).cast("double") /
          (col("nh") * (col("nh") - 1)).cast("double")))
      .withColumn("w", col("nh").cast("double") * col("sd"))
    val tot = g.agg(aggregate(sort_array(collect_list(col("w"))),
      lit(0.0d), (a, x) => a + x).as("tw"))
    // degenerate-corpus guard: if every surviving stratum has zero
    // within-stratum variance, tw = 0 and the ratio would be 0/0 —
    // emit alloc 0 (no variance signal → nothing to optimize) instead
    // of NaN; the oracle carries the same case expression
    g.crossJoin(broadcast(tot))
      .select(col("source"), col("nh").as("n_docs"),
        round(col("sd"), 6).as("sd"),
        when(col("tw") > 0d,
          floor(lit(budget.toDouble) * col("w") / col("tw")).cast("long"))
          .otherwise(lit(0L)).as("alloc"))
  }

  val sampleNeymanQ: Q = Q.df(
    "sample_neyman_alloc",
    s"""with t as (select source,
       |    cast(len(string_split(text, ' ')) as bigint) as x
       |  from documents),
       |g as (select source, cast(count(*) as bigint) as nh,
       |    cast(sum(x) as bigint) as s,
       |    cast(sum(x * x) as bigint) as ssq
       |  from t group by source),
       |sw as (select source, nh,
       |    sqrt(cast(nh * ssq - s * s as double)
       |      / cast(nh * (nh - 1) as double)) as sd
       |  from g where nh > 1),
       |w as (select source, nh, sd, cast(nh as double) * sd as w from sw),
       |tot as (select list_reduce(
       |    list_prepend(cast(0.0 as double), list_sort(list(w))),
       |    (a, x) -> a + x) as tw from w)
       |select source, nh as n_docs, round(sd, 6) as sd,
       |  case when tot.tw > 0
       |    then cast(floor(${NeymanBudget}.0 * w.w / tot.tw) as bigint)
       |    else 0 end as alloc
       |from w cross join tot
       |order by source""".stripMargin) { (s, dir) =>
    sampleNeyman(Tables.df(s, dir, "documents"), NeymanBudget)
      .orderBy(col("source"))
  }

  // ---- per-source token statistics ---------------------------------------

  /** Per-source document-length profile: count plus exact ORDER
    * statistics (min / median / p90 / max token counts) — the corpus
    * report that drives chunking and packing parameters. Order
    * statistics are exact integers (percentile_disc picks an actual
    * element, no interpolation), so the result is engine-exact where a
    * mean would be float-summation-order-dependent. One
    * partial-aggregated shuffle on source. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        graft.functions.Text.tokenCount(col("text")).as("n_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_tokens")).as("min_tokens"),
        // percentile_disc picks an element, so the value is an exact
        // integer; Spark still types it DOUBLE while DuckDB keeps the
        // input's BIGINT. Cast so the cross-engine dtype matches.
        expr("percentile_disc(0.5) within group (order by n_tokens)")
          .cast("long").as("median_tokens"),
        expr("percentile_disc(0.9) within group (order by n_tokens)")
          .cast("long").as("p90_tokens"),
        max(col("n_tokens")).as("max_tokens"))

  val corpusStats: Q = Q.df(
    "corpus_stats_tokens",
    """with t as (select source,
      |  cast(len(string_split(text, ' ')) as bigint) as n_tokens
      |  from documents)
      |select source, count(*) as n_docs,
      |  min(n_tokens) as min_tokens,
      |  percentile_disc(0.5) within group (order by n_tokens) as median_tokens,
      |  percentile_disc(0.9) within group (order by n_tokens) as p90_tokens,
      |  max(n_tokens) as max_tokens
      |from t group by source order by source""".stripMargin) { (s, dir) =>
    tokenStats(Tables.df(s, dir, "documents")).orderBy(col("source"))
  }

  // ---- cross-source overlap matrix ---------------------------------------

  /** Shared-trigram counts for every source pair — the contamination
    * matrix an ingest audit keeps: a pair with outsized overlap means
    * one source mirrors another (or both scrape the same site) and
    * dedup weights need adjusting. Same 100 TB shape as
    * [[decontaminate]]: both sides reduce to DISTINCT (source, 8-byte
    * gram hash) rows before a hash equi-join — the shuffle carries
    * hashes, never text, and the matrix is at most |sources|² rows.
    * The oracle joins raw gram strings; hash-vs-string equality
    * coincides under the same ~2⁻⁴⁰ collision argument. */
  def sourceOverlap(docs: DataFrame): DataFrame = {
    // Both self-join sides consume the same distinct (source, hash)
    // frame; checkpoint it once so the shingling regex + dedup shuffle
    // run once, not per side (the jaccardPairs lesson). The
    // materialized frame is 8-byte hashes + a short source key — far
    // smaller than the corpus it came from at any scale.
    val grams = docs.select(col("source"),
        explode(graft.functions.Text.shingles(col("text"), 3)).as("g"))
      .select(col("source"), xxhash64(col("g")).as("gh"))
      .distinct()
      .localCheckpoint()
    grams.select(col("source").as("s1"), col("gh"))
      .join(grams.select(col("source").as("s2"), col("gh")), Seq("gh"))
      .filter(col("s1") < col("s2"))
      .groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("n_shared"))
  }

  val sourceOverlapQ: Q = Q.df(
    "corpus_source_overlap",
    s"""with toks as (select doc_id, source, string_split(text, ' ') as t
       |              from documents),
       |sh as (select distinct source,
       |         unnest(${graft.functions.Text.sqlTrigramList("t")}) as g
       |       from toks)
       |select a.source as s1, b.source as s2, count(*) as n_shared
       |from sh a join sh b on a.g = b.g and a.source < b.source
       |group by 1, 2
       |order by s1, s2""".stripMargin) { (s, dir) =>
    sourceOverlap(Tables.df(s, dir, "documents"))
      .orderBy(col("s1"), col("s2"))
  }

  // ---- fixed-size uniform sample ------------------------------------------

  /** Reservoir sample size. */
  val ReservoirK = 100

  /** Fixed-size uniform sample without replacement — the distributed,
    * retry-stable equivalent of reservoir sampling: order by a
    * deterministic per-row hash and keep the first K. With a uniform
    * hash every K-subset is equally likely (same marginal as a true
    * reservoir), but reruns and stragglers reproduce the SAME sample —
    * the property a training pipeline needs for auditable mixes.
    * The global top-K plans as TakeOrderedAndProject (per-partition
    * heaps + driver merge of K rows), never a full sort; the rank
    * window runs on the K survivors only. */
  val sampleReservoir: Q = Q.df(
    "sample_reservoir",
    s"""select doc_id, source, rk from (
       |  select doc_id, source, cast(row_number() over
       |      (order by md5(cast(doc_id as varchar)), doc_id) as bigint) as rk
       |  from documents) t
       |where rk <= $ReservoirK order by rk""".stripMargin) { (s, dir) =>
    val topk = Tables.df(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        md5(col("doc_id").cast("string")).as("h"))
      .orderBy(col("h"), col("doc_id"))
      .limit(ReservoirK)
    topk
      .withColumn("rk", row_number().over(
        Window.orderBy(col("h"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("source"), col("rk"))
      .orderBy(col("rk"))
  }

  // ---- deterministic global shuffle + sharding ----------------------------

  /** Number of output shards for the training-shuffle entry. */
  val NShards = 8

  /** Knuth multiplicative hashes over the doc key — two independent odd
    * constants so the shard assignment and the within-shard order are
    * decorrelated (a doc's position inside its shard is not a function
    * of which shard it landed in). Both reduce mod 2³² before use, so
    * every intermediate fits a BIGINT in either engine. */
  private[operators] val ShardH = s"(doc_id * 2654435761) % 4294967296 % $NShards"
  private val OrderH = "(doc_id * 2246822519) % 4294967296"

  /** Deterministic global shuffle: the step between data curation and
    * training that turns a curated corpus into N shard files in a
    * pseudo-random but REPRODUCIBLE order (rerun, retry, and backfill
    * all produce byte-identical shards — the auditability property a
    * training run needs; `rand()` gives none of it). Shard = one hash
    * of the key, within-shard order = an independent second hash.
    *
    * Scale shape: the materialized per-shard ordinal below is for the
    * oracle compare; at 100 TB the pipeline never numbers rows — it
    * `repartitionByRange(shard, h2)` + `sortWithinPartitions` and
    * writes, consuming files in (shard, h2) order, so the global sort
    * is a range-partitioned parallel sort with no sequential step. The
    * row_number window here partitions by shard (NShards concurrent
    * sorts), never a single global window. */
  val corpusShardShuffle: Q = Q.df(
    "corpus_shard_shuffle",
    s"""select doc_id, cast($ShardH as bigint) as shard,
       |  cast(row_number() over (partition by $ShardH
       |       order by $OrderH, doc_id) as bigint) as pos
       |from documents
       |order by shard, pos""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "documents")
      .select(col("doc_id"),
        expr(ShardH).cast("long").as("shard"),
        expr(OrderH).cast("long").as("h2"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("h2"), col("doc_id")))
        .cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  // ---- corpus-level hot-token pruning -------------------------------------

  /** Hot-token document-frequency threshold, as a fraction: a token in
    * more than HotNum/HotDen of all documents is corpus boilerplate.
    * Integer-exact in both engines (df·Den > Num·N — no float ratio). */
  val HotNum = 39
  val HotDen = 50

  /** Corpus-frequency token pruning — the vocabulary-level analogue of
    * stopword removal where the stoplist is LEARNED from the corpus: a
    * token present in > 78% of documents carries no signal (boilerplate,
    * template chrome) and is dropped from every document, preserving the
    * order of what remains.
    *
    * Distributed shape: one explode→distinct→count pass builds the df
    * table (vocabulary-sized, shuffles on the well-distributed term
    * key); the hot list is vocabulary-bounded so the pruning join is a
    * BROADCAST left_anti — the corpus-sized side never shuffles for it.
    * The ordered reconstruction groups by doc_id (one shuffle of the
    * kept tokens) and sorts each doc's tokens inside the aggregate, so
    * per-task memory is one document, not one partition. */
  def pruneHotTokens(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
    val n = docs.agg(count(lit(1)).as("n"))
    val hot = tok.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .filter(col("df") * HotDen > lit(HotNum) * col("n"))
      .select(col("term"))
    val kept = tok.join(broadcast(hot), Seq("term"), "left_anti")
    val rebuilt = kept.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_kept"),
      array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("term")))),
        x => x.getField("term")), " ").as("pruned_text"))
    docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_orig"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_orig"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("pruned_text"), lit("")).as("pruned_text"))
  }

  val pruneHotTokensQ: Q = Q.df(
    "corpus_prune_hot_tokens",
    s"""with tok as (
       |  select doc_id, unnest(str_split(text, ' ')) as term,
       |         unnest(range(1, len(str_split(text, ' ')) + 1)) as pos
       |  from documents),
       |n as (select count(*) as n from documents),
       |hot as (
       |  select term from
       |    (select term, count(distinct doc_id) as df from tok group by term), n
       |  where df * $HotDen > $HotNum * n.n),
       |agg as (
       |  select doc_id, count(*) as n_kept,
       |         string_agg(term, ' ' order by pos) as pruned_text
       |  from tok where term not in (select term from hot)
       |  group by doc_id)
       |select d.doc_id,
       |  cast(len(str_split(d.text, ' ')) as bigint) as n_orig,
       |  cast(coalesce(a.n_kept, 0) as bigint) as n_kept,
       |  coalesce(a.pruned_text, '') as pruned_text
       |from documents d left join agg a using (doc_id)
       |order by doc_id""".stripMargin) { (s, dir) =>
    pruneHotTokens(Tables.df(s, dir, "documents")).orderBy(col("doc_id"))
  }

  // ---- snapshot diff ------------------------------------------------------

  /** Corpus snapshot diff — the audit a versioned data pipeline runs
    * between two corpus builds: which documents were added, deleted,
    * changed, or untouched, rolled up per source. The "next" snapshot
    * is synthesized deterministically inside the query (a modular
    * delete rule, a modular text edit, a shifted-id addition set) so
    * the entry is self-contained and byte-stable at every scale.
    *
    * Shape: ONE full-outer equi-join on the document key classifies
    * every row in a single pass — at 100 TB both snapshots shuffle once
    * on doc_id (co-partitioned if both live bucketed on it) and the text
    * equality becomes a fingerprint compare (xxhash64) so changed-ness
    * never moves full text through the join; the |sources|·4-row rollup
    * is map-side combined. Shared SQL text in both engines. */
  val snapshotDiff: Q = Q.shared(
    "corpus_snapshot_diff",
    """with v2 as (
      |  select doc_id, source,
      |    case when doc_id % 17 = 0 then upper(text) else text end as text
      |  from documents where doc_id % 23 <> 0
      |  union all
      |  select doc_id + 1000000 as doc_id, source, text
      |  from documents where doc_id % 31 = 0),
      |j as (
      |  select coalesce(a.source, b.source) as source,
      |    case when a.doc_id is null then 'added'
      |         when b.doc_id is null then 'deleted'
      |         when a.text <> b.text then 'changed'
      |         else 'unchanged' end as status
      |  from documents a full outer join v2 b on a.doc_id = b.doc_id)
      |select source, status, cast(count(*) as bigint) as n
      |from j group by source, status
      |order by source, status""".stripMargin)

  // ---- length histogram ---------------------------------------------------

  /** Histogram bucket width in characters; top bucket is open-ended. */
  val HistWidth = 64
  val HistBuckets = 8

  /** Per-source document-length histogram — the distribution report
    * behind every corpus-curation decision (truncation point, chunk
    * size, length-filter thresholds). Fixed-width buckets with a capped
    * open top bucket, so the output is |sources|·[[HistBuckets]] rows no
    * matter the corpus size, and one map-side-combined aggregation is
    * the whole plan. Bucket arithmetic is integer division — the same
    * defining arithmetic in both engines, no width_bucket dialect
    * dependence. */
  val lengthHistogram: Q = Q.shared(
    "corpus_length_histogram",
    s"""select source,
       |  cast(least(floor(n_chars / $HistWidth.0), ${HistBuckets - 1})
       |    as bigint) as bucket,
       |  cast(least(floor(n_chars / $HistWidth.0), ${HistBuckets - 1})
       |    * $HistWidth as bigint) as lo_chars,
       |  cast(count(*) as bigint) as n,
       |  cast(min(n_chars) as bigint) as shortest,
       |  cast(max(n_chars) as bigint) as longest
       |from documents
       |group by 1, 2, 3
       |order by source, bucket""".stripMargin)

  /** Milestone granularity for the vocabulary growth curve. */
  val VocabMilestone = 50

  /** Docs per prefix-sum bucket in the two-pass running total: the
    * single-partition pass-2 window then carries docs/VocabBucket rows.
    * Derived from doc_id (dense ids), not a sampled range partitioner,
    * so the bucketing is deterministic and partition-count-free. */
  val VocabBucket = 1000

  /** Vocabulary growth curve (Heaps' law): cumulative distinct-token
    * count as the corpus is consumed in doc_id order, sampled every
    * [[VocabMilestone]] docs. The sub-linear growth exponent is the
    * standard novelty diagnostic — a corpus whose curve flattens early
    * is duplicate-heavy or template-bound.
    *
    * Shape: each token contributes at its FIRST-appearance doc
    * (min(doc_id) per token — one shuffle keyed by token), then the
    * curve is a running sum over per-doc new-token counts — a window
    * over doc-sized data, never a milestone × vocabulary cross join.
    * Integer-exact everywhere.
    *
    * The running sum is a TWO-PASS range-bucketed prefix sum, not one
    * global-order window: pass 1 windows within explicit doc_id
    * buckets (`doc_id div VocabBucket` — deterministic, no sampled
    * range partitioner), pass 2 cumulates the per-bucket totals (a
    * docs/VocabBucket-sized relation, the only single-partition
    * window) and broadcast-joins the offsets back. A bare
    * Window.orderBy(doc_id) would funnel the whole documents relation
    * through one task — fine at test SF, a scale-killer at 100 TB. */
  val vocabGrowthQ: Q = Q.df(
    "corpus_vocab_growth",
    s"""with tok as (select doc_id, unnest(string_split(text, ' ')) as term
       |            from documents),
       |first as (select term, min(doc_id) as fd from tok group by term),
       |news as (select fd, count(*) as new_words from first group by fd),
       |curve as (
       |  select d.doc_id,
       |    sum(coalesce(n.new_words, 0)) over (order by d.doc_id) as vocab
       |  from documents d left join news n on n.fd = d.doc_id)
       |select doc_id, cast(vocab as bigint) as vocab
       |from curve where doc_id % $VocabMilestone = ${VocabMilestone - 1}
       |order by doc_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    import graft.plans.Checkpoints
    val docs = Tables.df(s, dir, "documents")
    val first = docs
      .select(col("doc_id"), explode(graft.functions.Text.tokens(col("text")))
        .as("term"))
      .groupBy("term").agg(min("doc_id").as("fd"))
    val news = first.groupBy("fd").agg(count(lit(1)).as("new_words"))
    // Every doc gets a row (nw = 0 when it introduces nothing), so each
    // milestone's prefix value IS its vocab — no as-of needed.
    // Materialized once: both prefix passes read it, and the expensive
    // tokenize+groupBy subtree must not run twice.
    val perDoc = Checkpoints.materialize(
      docs.select(col("doc_id"))
        .join(news, docs("doc_id") === news("fd"), "left")
        .select(col("doc_id"), coalesce(col("new_words"), lit(0L)).as("nw"),
          expr(s"doc_id div $VocabBucket").as("bkt")))
    // Pass 1: prefix sum within each bucket (parallel across buckets).
    val local = perDoc.withColumn("local",
      sum("nw").over(Window.partitionBy("bkt").orderBy("doc_id")))
    // Pass 2: per-bucket totals cumulated into exclusive offsets — this
    // single-partition window sees docs/VocabBucket rows, not docs.
    val offsets = perDoc.groupBy("bkt").agg(sum("nw").as("btot"))
      .withColumn("off", coalesce(
        sum("btot").over(Window.orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bkt"), col("off"))
    val resolved = Checkpoints.materialize(
      local.join(broadcast(offsets), "bkt")
        .filter(col("doc_id") % VocabMilestone === VocabMilestone - 1)
        .select(col("doc_id"),
          (col("local") + col("off")).cast("long").as("vocab"))
        .orderBy(col("doc_id")))
    Checkpoints.free(perDoc)
    resolved
  }

  // ---- probability-proportional-to-size sample ----------------------------

  /** PPS-WoR sample size. */
  val PpsK = 100

  /** Deterministic uniform in (0,1) from the doc key: Knuth
    * multiplicative hash mod 2³², then (h + 0.5)/2³² — every step exact
    * in both engines (the division is by a power of two). */
  private val PpsU =
    "(((doc_id * 2654435761) % 4294967296) + 0.5) / 4294967296"

  /** Probability-proportional-to-size sampling WITHOUT replacement
    * (Efraimidis–Spirakis exponential race): rank every document by
    * key = -ln(u)/w with weight w = n_chars and keep the K smallest —
    * each doc's inclusion probability is proportional to its size,
    * the sampling design a token-budget-aware curation pass wants when
    * long documents should be over-represented. u comes from a
    * deterministic per-row hash (not rand()), so reruns, retries and
    * stragglers reproduce the SAME sample — the reproducibility
    * contract of [[sampleReservoir]], generalized to weights.
    * The global smallest-K plans as TakeOrderedAndProject (per-partition
    * heaps + a K-row driver merge), never a full sort; the float key is
    * ranked but never emitted, keeping the gate integer-exact. */
  val samplePpswor: Q = Q.df(
    "sample_ppswor",
    s"""select doc_id, source, n_chars, rk from (
       |  select doc_id, source, n_chars, cast(row_number() over
       |      (order by -ln($PpsU) / cast(n_chars as double) asc,
       |                doc_id asc) as bigint) as rk
       |  from documents) t
       |where rk <= $PpsK order by rk""".stripMargin) { (s, dir) =>
    val key = (-log(
      ((col("doc_id") * lit(2654435761L)) % lit(4294967296L) + lit(0.5d))
        / lit(4294967296L))) / col("n_chars").cast("double")
    val topk = Tables.df(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"), key.as("k"))
      .orderBy(col("k").asc, col("doc_id").asc)
      .limit(PpsK)
    topk
      .withColumn("rk", row_number().over(
        Window.orderBy(col("k").asc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("source"), col("n_chars"), col("rk"))
      .orderBy(col("rk"))
  }

  // ---- DSIR importance weights -------------------------------------------

  /** Hashed-feature buckets for the DSIR importance model (the
    * feature-hashing dimensionality, shared with
    * [[TextAnalysis.HashBuckets]]'s hashing-trick contract). */
  val DsirBuckets = 64

  /** Corpus-quantile cut: documents whose importance weight reaches the
    * p75 of the weight distribution are marked selected. */
  val DsirSelectFrac = 0.75

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw-corpus
    * document by how much more likely its hashed-n-gram features are
    * under the TARGET domain ([[BaseSource]]) than under the raw pool —
    * log w(x) = Σ_tok [log p_target(b(tok)) − log p_raw(b(tok))] with
    * Laplace-smoothed bucket unigram models over [[DsirBuckets]]
    * fnv-hashed buckets. High-weight documents look like the target
    * domain and get picked for the mix.
    *
    * Scale shape: both "models" are ≤[[DsirBuckets]]-row count tables —
    * built by one map-side-combined groupBy each, broadcast into the
    * scoring scan; the selection threshold is ONE corpus-level
    * percentile_disc scalar (an element of the rounded weight
    * distribution, exact cross-engine), broadcast — no global sort, no
    * rank window, no driver data state. Per-doc Σ folds over the
    * sorted per-token list (the [[TextAnalysis.textEntropy]]
    * determinism contract). */
  def dsirWeights(docs: DataFrame, targetSource: String = BaseSource,
      buckets: Int = DsirBuckets): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // materialize: the token-bucket stream feeds the two count tables
    // AND the scoring scan — without a boundary Catalyst re-derives it
    // (and re-reads the corpus) once per consumer
    val feats = graft.plans.Checkpoints.materialize(
      docs.select(col("doc_id"), col("source"), col("text"))
        .as[(Long, String, String)]
        .flatMap { case (id, src, text) =>
          text.split(" ", -1).iterator.map { tok =>
            (id, src, ((Text.fnv64(tok) & 0xFFFFFFFFL) % buckets))
          }
        }
        .toDF("doc_id", "source", "b"))
    val target = feats.filter(col("source") === targetSource)
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val raw = feats.filter(col("source") =!= targetSource)
      .groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val totals = target.agg(sum(col("ct")).as("t_t"))
      .crossJoin(raw.agg(sum(col("cr")).as("t_r")))
    // materialize again before the threshold: the percentile side would
    // otherwise replay the whole scoring pipeline a second time
    val w = graft.plans.Checkpoints.materialize(
      feats.filter(col("source") =!= targetSource)
      .join(broadcast(target), Seq("b"), "left")
      .join(broadcast(raw), Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        ((log2(coalesce(col("ct"), lit(0L)).cast("double") + lit(1.0d))
          - log2(col("t_t").cast("double") + lit(buckets.toDouble)))
        - (log2(coalesce(col("cr"), lit(0L)).cast("double") + lit(1.0d))
          - log2(col("t_r").cast("double") + lit(buckets.toDouble))))
          .as("lr"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("lr"))).as("lrs"),
        count(lit(1)).as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        round(aggregate(col("lrs"), lit(0.0d), (acc, x) => acc + x), 6)
          .as("log_w")))
    // feats is fully consumed once w is materialized — free its
    // token-scale blocks now rather than at session end
    graft.plans.Checkpoints.free(feats)
    val thr = w.agg(
      expr(s"percentile_disc($DsirSelectFrac) within group (order by log_w)")
        .as("thr"))
    val out = graft.plans.Checkpoints.materialize(
      w.crossJoin(broadcast(thr))
        .select(col("doc_id"), col("n_tokens"), col("log_w"),
          (col("log_w") >= col("thr")).as("selected")))
    graft.plans.Checkpoints.free(w)
    out
  }

  private def dsirOracle: String = {
    val b = DsirBuckets
    s"""with tok as (select doc_id, source,
       |               unnest(string_split(text, ' ')) as tok
       |             from documents),
       |f as (select doc_id, source,
       |        cast(${Text.sqlFnv64("tok")} % 4294967296::hugeint
       |             % $b as bigint) as b
       |      from tok),
       |tc as (select b, cast(count(*) as bigint) as ct from f
       |       where source = '$BaseSource' group by b),
       |rc as (select b, cast(count(*) as bigint) as cr from f
       |       where source <> '$BaseSource' group by b),
       |tt as (select cast(sum(ct) as bigint) as t_t from tc),
       |rt as (select cast(sum(cr) as bigint) as t_r from rc),
       |scored as (
       |  select f.doc_id,
       |    (log2(cast(coalesce(tc.ct, 0) as double) + 1.0)
       |       - log2(cast(t_t as double) + $b.0))
       |  - (log2(cast(coalesce(rc.cr, 0) as double) + 1.0)
       |       - log2(cast(t_r as double) + $b.0)) as lr
       |  from f left join tc using (b) left join rc using (b)
       |  cross join tt cross join rt
       |  where f.source <> '$BaseSource'),
       |agg as (select doc_id, list_sort(list(lr)) as lrs,
       |          cast(count(*) as bigint) as n_tokens
       |        from scored group by doc_id),
       |w as (select doc_id, n_tokens,
       |        round(list_reduce(list_prepend(cast(0 as double), lrs),
       |                (acc, x) -> acc + x), 6) as log_w
       |      from agg),
       |thr as (select percentile_disc($DsirSelectFrac)
       |          within group (order by log_w) as thr from w)
       |select doc_id, n_tokens, log_w, log_w >= thr as selected
       |from w cross join thr order by doc_id""".stripMargin
  }

  val dsirWeightsQ: Q = Q.df("sample_dsir_weights", dsirOracle) { (s, dir) =>
    dsirWeights(Tables.df(s, dir, "documents")).orderBy(col("doc_id"))
  }

  // ---- water-filling per-source quotas ------------------------------------

  /** Numerator/denominator of the global budget as a fraction of corpus
    * tokens: B = 6·total ÷ 10 (integer, exact at every scale). */
  val WaterfillNum = 6L
  val WaterfillDen = 10L

  /** Water-filling quota allocation — the closed-form answer to "split
    * budget B across sources, never giving a source more than it has":
    * sources smaller than the water level keep everything; the rest are
    * capped AT the level, which is (remaining budget)/(remaining
    * sources) at the first source that would overflow. Found without
    * iteration: sort sources by size, prefix-sum, and the level is the
    * first candidate Lᵢ = (B − P₍ᵢ₋₁₎)/(n−i+1) with sizeᵢ > Lᵢ.
    *
    * Scale shape: the fact-scale work is ONE map-side-combined groupBy
    * (per-source token totals); everything after runs on the
    * |sources|-row aggregate — the unpartitioned windows there are
    * bounded by the source COUNT, a model-sized quantity (same contract
    * as the IVF centroid table), not by corpus size. */
  def waterfillQuota(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // materialize the |sources|-row aggregate: level AND output consume
    // it, and without a boundary each consumer re-runs the corpus scan
    val per = graft.plans.Checkpoints.materialize(docs
      .select(col("source"),
        graft.functions.Text.tokenCount(col("text")).as("nt"))
      .groupBy(col("source")).agg(sum(col("nt")).as("nt")))
    // |sources|-row frame: bounded window state (see scaladoc)
    val bySize = Window.orderBy(col("nt"), col("source"))
    val ord = per
      .withColumn("i", row_number().over(bySize).cast("long"))
      .withColumn("p", coalesce(
        sum(col("nt")).over(bySize.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(lit(1))).cast("long"))
      .withColumn("tot", sum(col("nt")).over(Window.partitionBy(lit(1))))
      // integral div, not double-divide+floor: at ~3e15 corpus tokens
      // (the 100 TB regime) 6·total exceeds 2^53 and a double quotient
      // could floor one off from the oracle's exact //
      .withColumn("b",
        expr(s"($WaterfillNum * tot) div $WaterfillDen").cast("long"))
      .withColumn("li", (col("b") - col("p")).cast("double")
        / (col("n") - col("i") + 1L).cast("double"))
    val level = ord.filter(col("nt").cast("double") > col("li"))
      .agg(min(struct(col("i"), col("li"))).as("m"))
      .select(coalesce(col("m.li"), lit(1e18d)).as("level"))
    val out = graft.plans.Checkpoints.materialize(
      ord.crossJoin(broadcast(level))
        .select(col("source"), col("nt").as("n_tokens"),
          least(col("nt"), floor(col("level")).cast("long"))
            .as("alloc_tokens"),
          (col("nt").cast("double") > col("level")).as("capped")))
    graft.plans.Checkpoints.free(per)
    out
  }

  private def waterfillOracle: String =
    s"""with per as (select source,
       |  cast(sum(len(string_split(text, ' '))) as bigint) as nt
       |  from documents group by source),
       |ord as (select source, nt,
       |  cast(row_number() over (order by nt, source) as bigint) as i,
       |  coalesce(sum(nt) over (order by nt, source
       |    rows between unbounded preceding and 1 preceding), 0) as p,
       |  cast(count(*) over () as bigint) as n,
       |  sum(nt) over () as tot
       |  from per),
       |lv as (select *,
       |  cast(($WaterfillNum * tot) // $WaterfillDen - p as double)
       |    / cast(n - i + 1 as double) as li
       |  from ord),
       |level as (select coalesce(min(li) filter (where cast(nt as double) > li
       |  and i = (select min(i) from lv where cast(nt as double) > li)),
       |  1e18) as l from lv)
       |select source, nt as n_tokens,
       |  least(nt, cast(floor(l) as bigint)) as alloc_tokens,
       |  cast(nt as double) > l as capped
       |from lv cross join level
       |order by source""".stripMargin

  val waterfillQ: Q = Q.df("sample_quota_waterfill", waterfillOracle) {
    (s, dir) =>
      waterfillQuota(Tables.df(s, dir, "documents")).orderBy(col("source"))
  }

  // ---- per-source KL drift over the heavy-hitter vocabulary ---------------

  /** Heavy-hitter vocabulary size for the KL computation. */
  val KlTopK = 128

  /** Per-source distribution drift: KL(source ‖ corpus) in bits over the
    * [[KlTopK]] globally-heaviest tokens plus one OTHER residual bucket —
    * the bounded form that keeps the sum deterministic AND corpus-scale
    * safe: restricting to a fixed vocabulary bounds each source's term
    * list at K+1 entries, so the per-source Σ p·log₂(p/q) folds over a
    * SORTED bounded list (the [[TextAnalysis.textEntropy]] contract)
    * instead of an unbounded, order-sensitive float reduction. Zero
    * source-side counts contribute zero (0·log 0 := 0), so the sum
    * skips them. High KL = the source's token mix diverges from the
    * corpus (template spam, other-language leak, boilerplate).
    *
    * Scale shape: one global count table → top-K via a K-row
    * TakeOrdered; per-source counts equi-join the BROADCAST hh list;
    * residuals come from per-source totals — all map-side combinable,
    * nothing driver-sized but the K-row vocabulary itself. */
  def klDrift(docs: DataFrame): DataFrame = {
    // three consumers (global counts, per-source totals, hh join) —
    // materialize so the corpus tokenization runs once, not three times
    val toks = graft.plans.Checkpoints.materialize(
      docs.select(col("source"),
        explode(split(col("text"), " ", -1)).as("tok")))
    val global = toks.groupBy(col("tok")).agg(count(lit(1)).as("cg"))
    val hh = global.orderBy(col("cg").desc, col("tok")).limit(KlTopK)
    val totals = toks.groupBy(col("source")).agg(count(lit(1)).as("ts"))
    val gtot = global.agg(sum(col("cg")).as("t"))
    val srcHh = toks.join(broadcast(hh), Seq("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("cs"), first(col("cg")).as("cg"))
    val hhSums = srcHh.groupBy(col("source"))
      .agg(sum(col("cs")).as("hh_cs"))
    val hhG = hh.agg(sum(col("cg")).as("hh_cg"))
    // residual OTHER bucket per source (may be zero)
    val other = totals.join(hhSums, Seq("source"), "left")
      .crossJoin(broadcast(hhG))
      .crossJoin(broadcast(gtot))
      .select(col("source"), lit(" OTHER").as("tok"),
        (col("ts") - coalesce(col("hh_cs"), lit(0L))).as("cs"),
        (col("t") - col("hh_cg")).as("cg"))
      .filter(col("cs") > 0)
    val terms = srcHh.select(col("source"), col("tok"), col("cs"), col("cg"))
      .unionByName(other)
      .join(totals, Seq("source"))
      .crossJoin(broadcast(gtot))
      .select(col("source"), col("tok"), col("ts"),
        ((col("cs").cast("double") / col("ts").cast("double"))
          * (log2(col("cs").cast("double") * col("t").cast("double"))
            - log2(col("cg").cast("double") * col("ts").cast("double"))))
          .as("term"))
    val out = graft.plans.Checkpoints.materialize(
      terms.groupBy(col("source"))
        .agg(first(col("ts")).as("n_tokens"),
          sort_array(collect_list(struct(col("tok"), col("term"))))
            .as("tl"))
        .select(col("source"), col("n_tokens"),
          round(aggregate(col("tl"), lit(0.0d),
            (acc, x) => acc + x.getField("term")), 6).as("kl_bits")))
    graft.plans.Checkpoints.free(toks)
    out
  }

  private def klOracle: String =
    s"""with tok as (select source, unnest(string_split(text, ' ')) as tok
       |             from documents),
       |global as (select tok, cast(count(*) as bigint) as cg
       |           from tok group by tok),
       |hh as (select tok, cg from global
       |       order by cg desc, tok limit $KlTopK),
       |totals as (select source, cast(count(*) as bigint) as ts
       |           from tok group by source),
       |gtot as (select cast(sum(cg) as bigint) as t from global),
       |srchh as (select source, tok.tok, cast(count(*) as bigint) as cs,
       |            first(hh.cg) as cg
       |          from tok join hh using (tok) group by source, tok.tok),
       |hhsums as (select source, cast(sum(cs) as bigint) as hh_cs
       |           from srchh group by source),
       |hhg as (select cast(sum(cg) as bigint) as hh_cg from hh),
       |other as (select t2.source, ' OTHER' as tok,
       |    t2.ts - coalesce(h.hh_cs, 0) as cs, g.t - hhg.hh_cg as cg
       |  from totals t2 left join hhsums h using (source)
       |  cross join gtot g cross join hhg
       |  where t2.ts - coalesce(h.hh_cs, 0) > 0),
       |terms as (
       |  select u.source, u.tok, t3.ts,
       |    (cast(u.cs as double) / cast(t3.ts as double))
       |      * (log2(cast(u.cs as double) * cast(g.t as double))
       |         - log2(cast(u.cg as double) * cast(t3.ts as double)))
       |      as term
       |  from (select source, tok, cs, cg from srchh
       |        union all by name select source, tok, cs, cg from other) u
       |  join totals t3 using (source) cross join gtot g),
       |agg as (select source, first(ts) as n_tokens,
       |          list_sort(list({'tok': tok, 'term': term})) as tl
       |        from terms group by source)
       |select source, n_tokens,
       |  round(list_reduce(list_prepend(0.0, list_transform(tl, x -> x.term)),
       |          (acc, x) -> acc + x), 6) as kl_bits
       |from agg order by source""".stripMargin

  val klDriftQ: Q = Q.df("corpus_kl_drift", klOracle) { (s, dir) =>
    klDrift(Tables.df(s, dir, "documents")).orderBy(col("source"))
  }

  val queries: Seq[Q] = Seq(vocabGrowthQ, textChunks, sampleSplit,
    sampleLeakageSafeSplit, tfidf, dedupIncremental,
    sampleBudget, packSeqs, decontaminateNgram, freqNgrams, sampleStratified,
    corpusStats, sourceOverlapQ, sampleReservoir, decontaminateBloomQ,
    sampleTemperature, corpusShardShuffle, pruneHotTokensQ, snapshotDiff,
    lengthHistogram, samplePpswor, dsirWeightsQ, waterfillQ, klDriftQ,
    sampleNeymanQ)
}
