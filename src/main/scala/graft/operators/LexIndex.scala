package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Stored INVERTED INDEX for lexical retrieval — the Lucene shape
  * re-expressed as parquet segments, completing the stored-artifact
  * story the ANN family opened: dense retrieval persists centroids +
  * codes ([[Similarity]] `ann_index_*`), lexical retrieval persists
  * postings + stats, and BOTH serve queries from frozen files without
  * touching the corpus again.
  *
  * A segment is four tables under one root:
  *   - `postings/` — (tok, doc_id, c), hash-PARTITIONED by token bucket
  *     so a query's terms prune to their buckets at planning time
  *     (the on-disk analogue of a term dictionary seek; at 100 TB a
  *     3-term query reads 3/[[IdxBuckets]] of the postings bytes, and
  *     the bucket count scales with vocabulary without re-sharding
  *     doc data);
  *   - `doclen/` — (doc_id, dl) for length normalization;
  *   - `df/` — (tok, df), the term dictionary with document
  *     frequencies (vocabulary-sized, not corpus-sized);
  *   - `stats/` — one row (n, tot): corpus size and total length.
  *
  * Unlike the ANN index, whose frozen-model incremental regime is
  * approximate by construction, lexical segments merge EXACTLY:
  * df/dl/stats are integer counts, so serving base ∪ delta with
  * summed statistics is bit-equal to a full rebuild — which is why
  * Lucene-family engines never retrain anything on segment merge.
  * [[textIndexIncrementalQ]] makes that exactness an oracle-gated
  * claim: its oracle is the SAME full-corpus SQL as the full index's.
  *
  * Reference: the stored-index-structure lifecycle (build once, serve
  * from frozen blocks, mutate via deltas) is the capability shape of
  * doradb-storage/src/index/block_index.rs; the postings layout and
  * the BM25 serve are standard IR (Robertson/Spärck Jones), expressed
  * Spark-first as partitioned parquet + broadcast joins.
  */
object LexIndex {

  /** Token-hash partition count for the postings table. Sized so a
    * fixture bucket holds a few thousand postings; at corpus scale the
    * knob grows with VOCABULARY (postings rows per bucket), never with
    * doc count — the layout survives a 100× corpus unchanged because
    * per-bucket files just grow and the 3-term query still reads 3
    * buckets. */
  val IdxBuckets = 16

  /** Query-term count (the 3 hottest-df terms — [[TextAnalysis]]'s
    * corpus-derived query, so the entries survive fixture
    * regeneration). */
  val QTerms = 3

  /** Relevance-ranked result depth served per query. */
  val ServeTopN = 50

  /** The incoming batch for the incremental entry: doc_id ≡ this
    * (mod 10) — a deterministic ~10% slice, the lexical analogue of
    * [[Similarity.AnnBatchMod]]. */
  val BatchMod = 7

  /** Docs per skip block for the block-max metadata (blk =
    * doc_id div this). At corpus scale this knob grows with DOC COUNT
    * so the block table stays bounded (the per-block row is the
    * skip-pointer granularity, exactly Lucene's block-max postings /
    * the reference's PSMA zone width — doradb-storage/src/col/sma.rs:
    * 9-44); at fixture scale 8 gives enough blocks for the skip gate
    * to bite at every shipped sf. */
  val DocBlock = 8

  /** Result depth of the PRUNED top-k serve — deliberately ≪ corpus so
    * the threshold prunes (a top-N that is most of the corpus cannot
    * skip anything, at any engine). */
  val PrunedTopN = 10

  /** Blocks scored exactly in pass 1 to establish the running-kth
    * threshold θ. Sized ≥ [[PrunedTopN]] so the seed can exhibit k
    * docs driven by the selective term (each top-UB block holds at
    * least one), giving θ the rare-term magnitude that makes
    * common-term-only blocks prunable. */
  val SeedBlocks = 12

  private def toks(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ", -1)).as("tok"))

  /** Write one segment (postings, doclen, df, stats) under
    * `root/seg/`. One tokenize pass materialized once, three map-side
    * combined aggregates off it, zero joins — the standard index-build
    * shape. The postings write partitions by the token-hash bucket, so
    * the files ARE the term-sharded layout the serve prunes against. */
  private[graft] def writeSegment(docs: DataFrame, root: String,
      seg: String): Unit = {
    val tf = graft.plans.Checkpoints.materialize(
      toks(docs).groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("c")))
    try {
      // postings carry the skip-block id and are SORTED by (tok, blk)
      // within each bucket file, so a blk predicate prunes at parquet
      // row-group granularity — the stored form of block-max skip data
      tf.withColumn("b",
          pmod(xxhash64(col("tok")), lit(IdxBuckets.toLong)).cast("int"))
        .withColumn("blk", expr(s"doc_id div $DocBlock"))
        .sortWithinPartitions(col("tok"), col("blk"))
        .write.mode("overwrite").partitionBy("b")
        .parquet(s"$root/$seg/postings")
      val dl = tf.groupBy(col("doc_id")).agg(sum(col("c")).as("dl"))
      dl.write.mode("overwrite").parquet(s"$root/$seg/doclen")
      // df carries BOTH dictionary statistics: document frequency (the
      // BM25 idf input) and collection frequency cf (the LM-Dirichlet
      // background model input) — integer counts, so both merge
      // exactly across segments
      val dfr = tf.groupBy(col("tok"))
        .agg(count(lit(1)).as("df"), sum(col("c")).as("cf"))
      dfr.write.mode("overwrite").parquet(s"$root/$seg/df")
      val st = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("tot"))
      st.write.mode("overwrite").parquet(s"$root/$seg/stats")
      // block-max metadata, two bound families per (term, block):
      //  - max_s: the EXACT max BM25 impact under THIS segment's
      //    df/dl/stats — the tightest bound, used by the
      //    single-segment pruned serve;
      //  - max_c / min_dl: the raw COMPONENTS, from which a valid
      //    bound is computable under ANY statistics (BM25 impact is
      //    increasing in c and decreasing in dl, so s(max_c, min_dl)
      //    dominates every posting) — what keeps block skipping alive
      //    across segment APPENDS, where df/stats sum and the stored
      //    per-segment max_s no longer bounds anything.
      tf.withColumn("blk", expr(s"doc_id div $DocBlock"))
        .join(dfr, "tok").join(dl, "doc_id").crossJoin(broadcast(st))
        .groupBy(col("tok"), col("blk"))
        .agg(max(TextAnalysis.bm25ScoreExpr).as("max_s"),
          max(col("c")).as("max_c"), min(col("dl")).as("min_dl"))
        .write.mode("overwrite").parquet(s"$root/$seg/blockmax")
    } finally graft.plans.Checkpoints.free(tf)
  }

  /** Tombstone modulus for [[textIndexDeleteQ]]: doc_id ≡ this (mod 7)
    * is deleted (the [[Similarity.AnnDeleteMod]] convention). */
  val DeleteMod = 3

  /** Serve the BM25 top-[[ServeTopN]] from stored segments: the merged
    * term dictionary picks the [[QTerms]] hottest terms (model-sized
    * collect — terms and their summed df, never postings), their
    * buckets prune the postings scan at PLANNING time, and scoring is
    * [[TextAnalysis.bm25ScoreExpr]] over the pruned posting rows joined
    * to broadcast stats — the corpus text is never read. Segment
    * statistics SUM exactly (disjoint doc sets, integer counts), so
    * multi-segment serve ≡ single-segment serve over the union. */
  private[graft] def serveBm25(s: SparkSession, root: String,
      segs: Seq[String],
      tombstones: Option[org.apache.spark.sql.Column] = None,
      blkSurvivors: Option[DataFrame] = None,
      topN: Int = ServeTopN,
      mixedTerms: Boolean = false): DataFrame = {
    def read(t: String): DataFrame =
      segs.map(g => s.read.parquet(s"$root/$g/$t")).reduce(_ unionByName _)
    val (terms, buckets) = termsAndBuckets(
      read("df").groupBy(col("tok")).agg(sum(col("df")).as("df")),
      mixedTerms)
    scoreTail(s, root, segs, terms, buckets, tombstones, blkSurvivors, topN)
  }

  /** One model-sized driver job resolving the query: the picked terms
    * with summed df AND their postings buckets in a single collect
    * (terms and their hash buckets, never postings). */
  private def termsAndBuckets(dfAgg: DataFrame,
      mixed: Boolean): (Seq[(String, Long)], Seq[Int]) = {
    val picked =
      if (mixed) mixedQueryTerms(dfAgg)
      else dfAgg.orderBy(col("df").desc, col("tok").asc).limit(QTerms)
    val rows = picked.select(col("tok"), col("df"),
        pmod(xxhash64(col("tok")), lit(IdxBuckets.toLong)).cast("int")
          .as("b"))
      .collect()
    (rows.map(r => (r.getString(0), r.getLong(1))).toSeq,
      rows.map(_.getInt(2)).distinct.toSeq)
  }

  /** The scoring tail over resolved query terms: prune the postings
    * scan to the terms' buckets (planning-time), apply tombstone
    * filters, restrict to surviving blocks via a semi-join against the
    * (model-per-term but df-proportional-in-aggregate) survivor block
    * relation — IN-PLAN, never a driver-materialized literal list —
    * score with [[TextAnalysis.bm25ScoreExpr]] against the summed
    * broadcast stats, fold per doc, rank. */
  private def scoreTail(s: SparkSession, root: String, segs: Seq[String],
      terms: Seq[(String, Long)], buckets: Seq[Int],
      tombstones: Option[org.apache.spark.sql.Column],
      blkSurvivors: Option[DataFrame],
      topN: Int): DataFrame = {
    import s.implicits._
    def read(t: String): DataFrame =
      segs.map(g => s.read.parquet(s"$root/$g/$t")).reduce(_ unionByName _)
    val st = read("stats").agg(sum(col("n")).as("n"), sum(col("tot")).as("tot"))
    // deletes serve as TOMBSTONES on the postings rows only: df and the
    // corpus stats keep counting deleted docs until a merge reclaims
    // them — Lucene's documented semantics (docFreq includes
    // deletions), which is what keeps delete O(1) at write time
    val tombed = tombstones.map(d => !d)
      .foldLeft(read("postings")
        .filter(col("b").isin(buckets: _*) &&
          col("tok").isin(terms.map(_._1): _*)))((p, f) => p.filter(f))
    // survivor restriction as LEFT SEMI on blk: the bound table stays
    // an executor-side relation (broadcast by AQE when small), so a
    // hot term's df/8 block rows never land on the driver
    val postings = blkSurvivors.foldLeft(tombed)((p, sv) =>
      p.join(sv.select(col("blk")).distinct(), Seq("blk"), "left_semi"))
    postings
      .join(broadcast(terms.toDF("tok", "df")), "tok")
      .join(read("doclen"), "doc_id")
      .crossJoin(broadcast(st))
      .select(col("doc_id"), TextAnalysis.bm25ScoreExpr.as("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sort_array(collect_list(col("s"))).as("ss"))
      .select(col("doc_id"), col("n_terms"),
        round(aggregate(col("ss"), lit(0.0d), (acc, x) => acc + x), 6)
          .as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topN)
  }

  /** One stored full-corpus index per (session, dir), and one
    * base+delta pair (base segment over doc_id % 10 ≠ [[BatchMod]],
    * delta appended as its OWN segment — base files never rewritten,
    * the Lucene append-a-segment discipline; [[graft.TextIndexSpec]]
    * md5-witnesses both claims). Roots are released on family drain. */
  private val fullCache =
    new graft.plans.Memo[(SparkSession, String), String](
      graft.plans.Scratch.deleteTree)
  private val incrCache =
    new graft.plans.Memo[(SparkSession, String), String](
      graft.plans.Scratch.deleteTree)

  /** Phrase results served per query. */
  val PhraseTopN = 50

  /** POSITIONAL extension of the full segment (Lucene's `.pos` file +
    * a shingle-field bigram dictionary): `positions/` is (tok, doc_id,
    * p) — token OCCURRENCES, the genuinely corpus-sized piece a
    * positional index pays for phrase support — hash-partitioned by
    * the same token buckets as the postings; `bigrams/` is the
    * adjacent-pair count table (vocabulary²-bounded, in practice
    * token-bounded) the serve derives its query from. One
    * posexplode pass; the bigram counts ride a per-doc lead window
    * (per-doc sequences — bounded window state). */
  private[graft] def writePositions(docs: DataFrame, root: String,
      seg: String): Unit = {
    val pos = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ", -1)).as(Seq("p", "tok")))
    pos.withColumn("b",
        pmod(xxhash64(col("tok")), lit(IdxBuckets.toLong)).cast("int"))
      .write.mode("overwrite").partitionBy("b")
      .parquet(s"$root/$seg/positions")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("p"))
    pos.withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("tok").as("t1"), col("nxt").as("t2"))
      .agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(s"$root/$seg/bigrams")
  }

  /** PHRASE query from the stored positional index — the capability
    * positions exist for: resolve the corpus's hottest bigram from the
    * stored dictionary (model-sized collect), prune the positions scan
    * to the two terms' buckets, and count exact adjacencies per doc by
    * the position join (t2 at p+1 of t1) — Lucene's phrase scorer as
    * one equi-join on (doc, position). */
  private[graft] def servePhrase(s: SparkSession, root: String,
      segs: Seq[String],
      tombstones: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    import s.implicits._
    def read(t: String): DataFrame =
      segs.map(g => s.read.parquet(s"$root/$g/$t")).reduce(_ unionByName _)
    // adjacency counts SUM exactly across segments (disjoint doc
    // sets, integer counts), so the merged dictionary's hottest bigram
    // is the full corpus's — the postings-lifecycle statistic-merge
    // discipline on the positional tables. The DICTIONARY keeps
    // counting tombstoned docs (Lucene's docFreq semantics — the
    // query's bigram pick is a statistic, reclaimed only at merge);
    // tombstones filter the POSITION rows, the phrase scorer's input.
    val (t1, t2) = read("bigrams")
      .groupBy(col("t1"), col("t2")).agg(sum(col("cnt")).as("cnt"))
      .orderBy(col("cnt").desc, col("t1"), col("t2")).limit(1)
      .select(col("t1"), col("t2")).as[(String, String)].collect().head
    val buckets = Seq(t1, t2).toDF("tok")
      .select(pmod(xxhash64(col("tok")), lit(IdxBuckets.toLong)).cast("int")
        .as("b"))
      .collect().map(_.getInt(0)).distinct.toSeq
    val posT = tombstones.map(d => !d)
      .foldLeft(read("positions").filter(col("b").isin(buckets: _*)))(
        (p, f) => p.filter(f))
    val p1 = posT.filter(col("tok") === t1).select(col("doc_id"), col("p"))
    val p2 = posT.filter(col("tok") === t2)
      .select(col("doc_id"), (col("p") - 1).as("p"))
    p1.join(p2, Seq("doc_id", "p"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_phrase"))
      .orderBy(col("n_phrase").desc, col("doc_id")).limit(PhraseTopN)
  }

  /** The phrase entries share one oracle family: the full-corpus
    * phrase ranking (base ∪ delta IS the corpus; exact positional
    * merge is the incremental entry's claim), with an optional
    * tombstone predicate on the HITS side only — the bigram pick stays
    * a full-corpus statistic, the docFreq semantics. */
  private def phraseOracleWhere(hitsWhere: String): String =
    s"""with idx as (
       |  select doc_id, l, unnest(range(1, len(l) + 1)) as i
       |  from (select doc_id, string_split(text, ' ') as l
       |        from documents)),
       |pos as (select doc_id, i - 1 as p, l[i] as tok, l[i + 1] as nxt
       |        from idx),
       |bg as (select tok as t1, nxt as t2, cast(count(*) as bigint) as cnt
       |       from pos where nxt is not null group by tok, nxt),
       |top as (select t1, t2 from bg order by cnt desc, t1, t2 limit 1),
       |hits as (select p.doc_id, cast(count(*) as bigint) as n_phrase
       |         from pos p join top t on p.tok = t.t1 and p.nxt = t.t2
       |         $hitsWhere
       |         group by p.doc_id)
       |select doc_id, n_phrase from hits
       |order by n_phrase desc, doc_id limit $PhraseTopN""".stripMargin

  private def phraseOracle: String = phraseOracleWhere("")

  val textIndexPhraseQ: Q = Q.df("text_index_phrase", phraseOracle) {
    (s, dir) => servePhrase(s, fullIndexRoot(s, dir), Seq("full"))
  }

  /** Positional segments under the APPEND regime: the delta docs'
    * positions and bigram dictionary are written as their OWN segment
    * (base files never rewritten — the Lucene `.pos`-per-segment
    * discipline the postings lifecycle already follows), and the
    * phrase serve runs over base ∪ delta with adjacency counts summed
    * at query time. Closes the one stored-index family that had no
    * incremental-append story. */
  private val posIncrCache =
    new graft.plans.Memo[(SparkSession, String), String](
      graft.plans.Scratch.deleteTree)

  private[graft] def posIncrRoot(s: SparkSession, dir: String): String =
    posIncrCache.once((s, dir)) {
      val root =
        java.nio.file.Files.createTempDirectory("graft-lexposincr").toString
      val docs = Tables.df(s, dir, "documents")
      writePositions(docs.filter(col("doc_id") % 10 =!= BatchMod),
        root, "base")
      writePositions(docs.filter(col("doc_id") % 10 === BatchMod),
        root, "delta")
      root
    }

  val textIndexPhraseIncrQ: Q = Q.df(
    "text_index_phrase_incr", phraseOracle) { (s, dir) =>
    servePhrase(s, posIncrRoot(s, dir), Seq("base", "delta"))
  }

  /** Positional tombstone DELETE: tombstoned docs' occurrences are
    * excluded from the phrase scorer's input while the bigram
    * dictionary keeps counting them until a merge — the
    * [[textIndexDeleteQ]] semantics on the positional tables, O(1) at
    * write time, artifact untouched (spec-witnessed). */
  val textIndexPhraseDeleteQ: Q = Q.df(
    "text_index_phrase_delete",
    phraseOracleWhere(s"where p.doc_id % 7 <> $DeleteMod")) { (s, dir) =>
    servePhrase(s, fullIndexRoot(s, dir), Seq("full"),
      tombstones = Some(col("doc_id") % 7 === DeleteMod))
  }

  /** Positional segment COMPACTION (the Lucene merge on the `.pos`
    * tables): base ∪ delta positions rewritten as one `merged` segment
    * beside its sources (same bucket partitioning), bigram counts
    * summed once at merge time — serve then reads one segment with no
    * query-time dictionary fold. Sources never mutate. */
  private val posCompactCache =
    new graft.plans.Memo[(SparkSession, String), String]

  private[graft] def posMergedRoot(s: SparkSession, dir: String): String =
    posCompactCache.once((s, dir)) {
      val root = posIncrRoot(s, dir)
      def read(t: String): DataFrame =
        Seq("base", "delta").map(g => s.read.parquet(s"$root/$g/$t"))
          .reduce(_ unionByName _)
      read("positions").write.mode("overwrite").partitionBy("b")
        .parquet(s"$root/merged/positions")
      read("bigrams").groupBy(col("t1"), col("t2"))
        .agg(sum(col("cnt")).as("cnt"))
        .write.mode("overwrite").parquet(s"$root/merged/bigrams")
      root
    }

  val textIndexPhraseCompactQ: Q = Q.df(
    "text_index_phrase_compact", phraseOracle) { (s, dir) =>
    servePhrase(s, posMergedRoot(s, dir), Seq("merged"))
  }

  private[graft] def fullIndexRoot(s: SparkSession, dir: String): String =
    fullCache.once((s, dir)) {
      val root =
        java.nio.file.Files.createTempDirectory("graft-lexindex").toString
      val docs = Tables.df(s, dir, "documents")
      writeSegment(docs, root, "full")
      writePositions(docs, root, "full")
      root
    }

  private[graft] def incrIndexRoot(s: SparkSession, dir: String): String =
    incrCache.once((s, dir)) {
      val root =
        java.nio.file.Files.createTempDirectory("graft-lexincr").toString
      val docs = Tables.df(s, dir, "documents")
      writeSegment(docs.filter(col("doc_id") % 10 =!= BatchMod),
        root, "base")
      writeSegment(docs.filter(col("doc_id") % 10 === BatchMod),
        root, "delta")
      root
    }

  /** Replay-guarded STREAMING segment append: one lexical segment per
    * micro-batch under `root/seg<bid>/`, guarded by the transactional
    * batch-id high-watermark idiom
    * ([[graft.streaming.EventsStream.applyMergeBatch]]'s discipline) —
    * a replayed batch id at or below the recorded watermark is
    * skipped, so per-batch work is SEGMENT-sized exactly once even
    * under restart-and-replay. (A segment write is overwrite-
    * idempotent by itself; the guard is what keeps a replay from
    * re-tokenizing the batch at all — the contract that matters when
    * the batch is a day of corpus.) */
  private[graft] def appendSegmentGuarded(s: SparkSession, root: String,
      batch: DataFrame, bid: Long): Boolean = {
    val wmPath = java.nio.file.Paths.get(s"$root/append_watermark")
    val wm =
      if (java.nio.file.Files.exists(wmPath))
        java.nio.file.Files.readString(wmPath).trim.toLong
      else -1L
    if (bid <= wm) false
    else {
      writeSegment(batch, root, s"seg$bid")
      java.nio.file.Files.writeString(wmPath, bid.toString)
      true
    }
  }

  /** Served segment names under a streaming-append root: `base` first,
    * then the streamed segments in batch order. */
  private[graft] def segmentsOf(root: String): Seq[String] =
    Option(new java.io.File(root).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory &&
        (f.getName == "base" || f.getName.startsWith("seg")))
      .map(_.getName)
      .sortBy(n => if (n == "base") -1L else n.stripPrefix("seg").toLong)

  /** Build + persist, then prove the artifact: the returned row is the
    * postings-table inventory read back from the STORED files (posting
    * count, vocabulary size, doc count, token total), which the oracle
    * recomputes from the raw corpus — any row lost or duplicated by
    * the partitioned write flips a count. */
  val textIndexPersistQ: Q = Q.df(
    "text_index_persist",
    """with toks as (select doc_id, unnest(string_split(text, ' ')) as tok
      |              from documents),
      |tf as (select doc_id, tok, cast(count(*) as bigint) as c
      |       from toks group by doc_id, tok)
      |select cast(count(*) as bigint) as n_postings,
      |  cast(count(distinct tok) as bigint) as n_terms,
      |  cast(count(distinct doc_id) as bigint) as n_docs,
      |  cast(sum(c) as bigint) as n_tokens
      |from tf""".stripMargin) { (s, dir) =>
    val root = fullIndexRoot(s, dir)
    s.read.parquet(s"$root/full/postings")
      .agg(count(lit(1)).as("n_postings"),
        count_distinct(col("tok")).as("n_terms"),
        count_distinct(col("doc_id")).as("n_docs"),
        sum(col("c")).as("n_tokens"))
  }

  /** The ranked tail shared by both serve oracles: the all-docs BM25
    * core ([[TextAnalysis.bm25CoreCtes]] — identical formula, identical
    * fold) re-ranked by relevance. Rank order uses the ROUNDED score
    * (both engines rank the same 6-decimal values; doc_id breaks
    * ties). */
  private[graft] def serveOracle: String = serveOracleN(ServeTopN)

  private def serveOracleN(n: Int): String =
    s"""with ${TextAnalysis.bm25CoreCtes}
       |select doc_id, n_terms, bm25
       |from scored order by bm25 desc, doc_id limit $n"""
      .stripMargin

  /** Serve the hottest-terms query from the stored full index: prune
    * to the query terms' buckets, score only pruned postings, return
    * the relevance top-[[ServeTopN]]. The corpus is never scanned —
    * the spec's frozen-file witness plus the pruning assertion make
    * "reads 3 buckets of stored postings" a checked property, not a
    * doc claim. */
  val textIndexServeQ: Q = Q.df(
    "text_index_serve", serveOracle) { (s, dir) =>
    serveBm25(s, fullIndexRoot(s, dir), Seq("full"))
  }

  /** The pruned entry's query: the 2 hottest terms plus the 1 RAREST
    * term (distinct union — ties by token asc) over the merged term
    * dictionary. This is the query shape WAND exists for: a selective
    * term sets a high threshold that makes the common terms' blocks
    * prunable; an all-stopword query (the hottest-3 serve) saturates
    * every block's upper bound and legitimately prunes nothing — true
    * of every block-max engine, not a fixture artifact. */
  private def mixedQueryTerms(dfAgg: DataFrame): DataFrame =
    dfAgg.orderBy(col("df").desc, col("tok").asc).limit(QTerms - 1)
      .unionByName(
        dfAgg.orderBy(col("df").asc, col("tok").asc).limit(1))
      .distinct()

  private def mixedQSql: String =
    s"""select * from (select tok, df from df
       |      order by df desc, tok asc limit ${QTerms - 1})
       |    union
       |    select * from (select tok, df from df
       |      order by df asc, tok asc limit 1)""".stripMargin

  /** Plan the block-max-pruned top-[[PrunedTopN]] serve over the full
    * segment (the WAND/MaxScore discipline on the stored layout):
    *
    *  1. per-block upper bound UB(blk) = Σ over query terms of the
    *     stored max impact (a term absent from a block contributes 0 —
    *     still an upper bound, since its postings there score 0);
    *  2. pass 1 scores the [[SeedBlocks]] highest-UB blocks EXACTLY and
    *     takes the kth best score as the threshold θ;
    *  3. survivors = seed blocks ∪ blocks with UB ≥ θ − ε (ε absorbs
    *     the 6-decimal rounding of served scores; ties kept, never cut).
    *
    * EXACTNESS: pass 1 exhibits k docs scoring ≥ θ, and any doc in a
    * skipped block scores ≤ UB(blk) < θ, so it cannot displace the true
    * top-k — pruned serve ≡ unpruned serve bit-for-bit, which is why
    * the entry's oracle is the plain full-ranking SQL. Returns
    * (terms, buckets, survivor blocks, candidate blocks) — candidates
    * are blocks holding ≥ 1 query-term posting, the set the UNPRUNED
    * serve reads; both are RELATIONS, never driver lists. The plan
    * costs TWO model-sized driver jobs (terms+buckets; the single
    * count+θ row) — the bound table itself stays distributed end to
    * end, since for a hot term its (blk, ub) rows are df/8, i.e.
    * corpus-proportional at 100 TB. */
  private[graft] def prunedPlan(s: SparkSession, root: String)
      : (Seq[(String, Long)], Seq[Int], DataFrame, DataFrame) = {
    val (terms, buckets) = termsAndBuckets(
      s.read.parquet(s"$root/full/df")
        .groupBy(col("tok")).agg(sum(col("df")).as("df")),
      mixed = true)
    val ub = s.read
      .parquet(s"$root/full/blockmax")
      .filter(col("tok").isin(terms.map(_._1): _*))
      .groupBy(col("blk")).agg(sum(col("max_s")).as("ub"))
    survivorBlocks(s, root, Seq("full"), terms, buckets, ub)
  }

  /** The DISTRIBUTED seed-θ-survivor tail shared by both pruned plans
    * (r16 gate fix: the bound table is df/8 rows per hot term —
    * corpus-proportional at 100 TB — so it must never be collected):
    *
    *  - seed = top-[[SeedBlocks]] bound rows via orderBy+limit
    *    (TakeOrderedAndProject — distributed for free);
    *  - θ = the kth-best exact seed score, read as ONE scalar row
    *    (count + min over a [[PrunedTopN]]-row frame — model-sized by
    *    construction, the only driver materialization in the plan);
    *  - survivors = bound table filtered by the broadcast-θ predicate
    *    ∪ seed, returned as a RELATION the serve semi-joins in-plan.
    *
    * Returns (terms, buckets, survivor blocks, candidate blocks); the
    * 4th element is lazy — entries that discard it never run its job. */
  private def survivorBlocks(s: SparkSession, root: String,
      segs: Seq[String], terms: Seq[(String, Long)], buckets: Seq[Int],
      ub: DataFrame)
      : (Seq[(String, Long)], Seq[Int], DataFrame, DataFrame) = {
    val seed = ub.orderBy(col("ub").desc, col("blk").asc)
      .limit(SeedBlocks).select(col("blk"))
    val ks = scoreTail(s, root, segs, terms, buckets,
        None, Some(seed), PrunedTopN)
      .agg(count(lit(1)).as("k"), min(col("bm25")).as("theta"))
      .head()
    val survivors =
      if (ks.getLong(0) < PrunedTopN)
        // pass 1 could not exhibit k docs: no sound threshold, no pruning
        ub.select(col("blk"))
      else
        ub.filter(col("ub") >= ks.getDouble(1) - 1e-6).select(col("blk"))
          .unionByName(seed).distinct()
    (terms, buckets, survivors, ub)
  }

  /** Dirichlet smoothing mass μ, sized to the fixture's mean doc
    * length (~60 tokens); the standard 2000 of TREC-scale corpora
    * would drown these short docs in the background model. */
  val LmMu = 100.0

  /** DIRICHLET-SMOOTHED QUERY LIKELIHOOD from the SAME stored index
    * (Zhai/Lafferty 2001) — the second classic relevance model, served
    * without touching the corpus: rank-equivalently decomposed as
    * Σ_{t ∈ q∩d} ln(1 + c·|C| / (μ·cf_t))  +  |q|·ln(μ / (dl + μ)),
    * so matched terms need only the PRUNED postings (term-bucket scan,
    * exactly the BM25 serve's shape) while the second term needs only
    * doclen — docs matching NO query term still rank by their length
    * prior, which is why the left join runs doclen-side (the full-QL
    * semantics, not a matched-docs-only approximation). cf comes from
    * the stored term dictionary; every input is an exactly-merged
    * integer, the per-term logs fold in sorted order, and one add
    * joins the two halves — bit-identical cross-engine. */
  private[graft] def serveLmDirichlet(s: SparkSession, root: String,
      segs: Seq[String]): DataFrame = {
    def read(t: String): DataFrame =
      segs.map(g => s.read.parquet(s"$root/$g/$t")).reduce(_ unionByName _)
    val rows = read("df").groupBy(col("tok"))
      .agg(sum(col("df")).as("df"), sum(col("cf")).as("cf"))
      .orderBy(col("df").desc, col("tok").asc).limit(QTerms)
      .select(col("tok"), col("cf"),
        pmod(xxhash64(col("tok")), lit(IdxBuckets.toLong)).cast("int")
          .as("b"))
      .collect()
    val terms = rows.map(r => (r.getString(0), r.getLong(1))).toSeq
    val buckets = rows.map(_.getInt(2)).distinct.toSeq
    val st = read("stats").agg(sum(col("tot")).as("tot"))
    import s.implicits._
    val matched = read("postings")
      .filter(col("b").isin(buckets: _*) &&
        col("tok").isin(terms.map(_._1): _*))
      .join(broadcast(terms.toDF("tok", "cf")), "tok")
      .crossJoin(broadcast(st))
      .select(col("doc_id"),
        log(lit(1.0d) + (col("c").cast("double") * col("tot").cast("double"))
          / (lit(LmMu) * col("cf").cast("double"))).as("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nt"),
        sort_array(collect_list(col("s"))).as("ss"))
      .select(col("doc_id"), col("nt"),
        aggregate(col("ss"), lit(0.0d), (a, x) => a + x).as("bonus"))
    read("doclen")
      .join(matched, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nt"), lit(0L)).as("n_terms"),
        round(lit(QTerms.toDouble) *
          log(lit(LmMu) / (col("dl").cast("double") + lit(LmMu))) +
          coalesce(col("bonus"), lit(0.0d)), 6).as("ql"))
      .orderBy(col("ql").desc, col("doc_id"))
      .limit(ServeTopN)
  }

  val textIndexLmdirQ: Q = Q.df(
    "text_index_lmdir",
    s"""with toks as (select doc_id, unnest(string_split(text, ' ')) as tok
       |              from documents),
       |tf as (select doc_id, tok, cast(count(*) as bigint) as c
       |       from toks group by doc_id, tok),
       |dl as (select doc_id, cast(sum(c) as bigint) as dl
       |       from tf group by doc_id),
       |st as (select cast(sum(dl) as bigint) as tot from dl),
       |dfq as (select tok, cast(count(*) as bigint) as df,
       |               cast(sum(c) as bigint) as cf
       |        from tf group by tok),
       |q as (select tok, cf from dfq order by df desc, tok asc
       |      limit $QTerms),
       |per as (select t.doc_id,
       |    ln(1.0 + (cast(t.c as double) * cast(st.tot as double))
       |        / ($LmMu * cast(q.cf as double))) as s
       |  from tf t join q on q.tok = t.tok cross join st),
       |agg as (select doc_id, cast(count(*) as bigint) as nt,
       |          list_sort(list(s)) as ss from per group by doc_id),
       |bon as (select doc_id, nt,
       |    list_reduce(list_prepend(cast(0.0 as double), ss),
       |      (a, x) -> a + x) as bonus from agg)
       |select d.doc_id,
       |  cast(coalesce(b.nt, 0) as bigint) as n_terms,
       |  round(${QTerms}.0 * ln($LmMu / (cast(d.dl as double) + $LmMu))
       |    + coalesce(b.bonus, cast(0.0 as double)), 6) as ql
       |from dl d left join bon b on b.doc_id = d.doc_id
       |order by ql desc, d.doc_id limit $ServeTopN""".stripMargin) {
    (s, dir) =>
      serveLmDirichlet(s, fullIndexRoot(s, dir), Seq("full"))
  }

  /** MULTI-SEGMENT pruned plan (the append regime): the stored
    * per-segment `max_s` is useless once statistics merge — summed df
    * changes every idf — so the bound is recomputed from the stored
    * COMPONENTS at serve time: per (term, block) take max_c across
    * segments and min_dl, evaluate the BM25 impact expression at
    * (max_c, min_dl) under the MERGED df/stats (monotone in both
    * arguments, hence a valid upper bound for every posting however
    * segments are combined), then run the same seed-θ-survivors flow.
    * This is what keeps WAND alive on an index that appends segments
    * forever without rebuilding — bounds stay sound under exact
    * statistic merging, only looser (components decouple), never
    * wrong. */
  private[graft] def prunedPlanMulti(s: SparkSession, root: String,
      segs: Seq[String])
      : (Seq[(String, Long)], Seq[Int], DataFrame, DataFrame) = {
    import s.implicits._
    def read(t: String): DataFrame =
      segs.map(g => s.read.parquet(s"$root/$g/$t")).reduce(_ unionByName _)
    val (terms, buckets) = termsAndBuckets(
      read("df").groupBy(col("tok")).agg(sum(col("df")).as("df")),
      mixed = true)
    val st = read("stats")
      .agg(sum(col("n")).as("n"), sum(col("tot")).as("tot"))
    val ub = read("blockmax")
      .filter(col("tok").isin(terms.map(_._1): _*))
      .groupBy(col("tok"), col("blk"))
      .agg(max(col("max_c")).as("c"), min(col("min_dl")).as("dl"))
      .join(broadcast(terms.toDF("tok", "df")), "tok")
      .crossJoin(broadcast(st))
      .select(col("blk"), TextAnalysis.bm25ScoreExpr.as("bound"))
      .groupBy(col("blk")).agg(sum(col("bound")).as("ub"))
    survivorBlocks(s, root, segs, terms, buckets, ub)
  }

  /** Pruned top-k over the APPENDED index (base ∪ delta with summed
    * statistics) — same oracle as the single-segment pruned entry
    * (base ∪ delta IS the full corpus; exactness is again the claim),
    * proving the component bound survives the segment-append regime.
    * [[graft.TextIndexSpec]] pins skipped > 0 and bit-equality with
    * the unpruned two-segment serve. */
  val textIndexTopkPrunedIncrQ: Q = Q.df(
    "text_index_topk_pruned_incr", {
      s"""with ${TextAnalysis.bm25CoreCtesWithQ(mixedQSql)}
         |select doc_id, n_terms, bm25
         |from scored order by bm25 desc, doc_id limit $PrunedTopN"""
        .stripMargin
    }) { (s, dir) =>
    val root = incrIndexRoot(s, dir)
    val segs = Seq("base", "delta")
    val (terms, buckets, survivors, _) = prunedPlanMulti(s, root, segs)
    scoreTail(s, root, segs, terms, buckets, None,
      Some(survivors), PrunedTopN)
  }

  /** Top-k serve with block-max pruning: score only surviving blocks'
    * postings; the blk predicate lands on the stored sorted column, so
    * parquet row-group stats skip the pruned blocks inside each bucket
    * file — the stored-index analogue of the reference's PSMA segment
    * elimination. Oracle = the UNPRUNED full ranking (exactness is the
    * entry's claim); [[graft.TextIndexSpec]] pins blocks-skipped > 0
    * and pruned ≡ unpruned bit-equality. */
  val textIndexTopkPrunedQ: Q = Q.df(
    "text_index_topk_pruned", {
      s"""with ${TextAnalysis.bm25CoreCtesWithQ(mixedQSql)}
         |select doc_id, n_terms, bm25
         |from scored order by bm25 desc, doc_id limit $PrunedTopN"""
        .stripMargin
    }) { (s, dir) =>
    val root = fullIndexRoot(s, dir)
    val (terms, buckets, survivors, _) = prunedPlan(s, root)
    scoreTail(s, root, Seq("full"), terms, buckets, None,
      Some(survivors), PrunedTopN)
  }

  /** Serve base ∪ delta with summed statistics — and the oracle is the
    * FULL-corpus ranking: exact segment merge is the entry's claim
    * (integer df/dl/stats sum exactly across disjoint segments), the
    * property that lets a 100 TB ingest append small segments forever
    * and compact lazily, never rebuilding. */
  val textIndexIncrementalQ: Q = Q.df(
    "text_index_incremental", serveOracle) { (s, dir) =>
    serveBm25(s, incrIndexRoot(s, dir), Seq("base", "delta"))
  }

  /** Scale-audit drive ([[graft.ScaleCurve]]): rebuild the DELTA
    * segment append EVERY timed sample — bypassing the memo, which
    * exists to amortize serving sessions — then serve base ∪ the fresh
    * delta. The measured quantity is the per-batch append contract
    * itself (tokenize the batch, four segment writes, serve), the
    * claim behind "a 100 TB ingest appends small segments forever":
    * the fixture's batch is a 10% corpus slice, so append work scales
    * 10× per decade exactly like the corpus term and a super-linear
    * append surfaces in the decade-ratio gate. The audit delta is
    * written BESIDE the entry's own segments (same memoized root, own
    * name, overwritten per sample, reclaimed with the root on drain);
    * base files are never rewritten. */
  private[graft] def auditIncrementalAppend(s: SparkSession,
      dir: String): Unit = {
    val root = incrIndexRoot(s, dir)
    writeSegment(Tables.df(s, dir, "documents")
      .filter(col("doc_id") % 10 === BatchMod), root, "delta_audit")
    serveBm25(s, root, Seq("base", "delta_audit"))
      .write.format("noop").mode("overwrite").save()
  }

  /** Segment COMPACTION (Lucene's merge): base ∪ delta rewritten as
    * one `merged` segment under the incremental root — postings rows
    * union directly (disjoint doc sets: no row can collide), df sums
    * per token, doclen unions, stats sum. The merged segment is added
    * BESIDE the inputs (a merge never mutates its sources; the old
    * segments remain servable until a retention pass drops them —
    * exactly the stored-index compaction discipline of
    * `ann_index_compact`). Built at most once per (session, dir). */
  private val mergedBuilt =
    new graft.plans.Memo[(SparkSession, String), String](_ => ())

  private[graft] def mergedSegmentRoot(s: SparkSession,
      dir: String): String =
    mergedBuilt.once((s, dir)) {
      val root = incrIndexRoot(s, dir)
      def read(t: String): DataFrame =
        Seq("base", "delta").map(g => s.read.parquet(s"$root/$g/$t"))
          .reduce(_ unionByName _)
      read("postings")
        .write.mode("overwrite").partitionBy("b")
        .parquet(s"$root/merged/postings")
      read("doclen").write.mode("overwrite").parquet(s"$root/merged/doclen")
      read("df").groupBy(col("tok"))
        .agg(sum(col("df")).as("df"), sum(col("cf")).as("cf"))
        .write.mode("overwrite").parquet(s"$root/merged/df")
      read("stats").agg(sum(col("n")).as("n"), sum(col("tot")).as("tot"))
        .write.mode("overwrite").parquet(s"$root/merged/stats")
      root
    }

  /** Serve from the COMPACTED single segment — same oracle as the full
    * index's (compaction must be invisible to queries); the spec pins
    * merged-serve ≡ two-segment serve bit-equality and the source
    * segments untouched. */
  val textIndexCompactQ: Q = Q.df(
    "text_index_compact", serveOracle) { (s, dir) =>
    serveBm25(s, mergedSegmentRoot(s, dir), Seq("merged"))
  }

  /** DELETE as tombstones on the stored index: the tombstoned docs'
    * posting rows are excluded BEFORE scoring (never ranked, never
    * returned), while df and the corpus stats keep counting them until
    * a merge — Lucene's exact semantics (`docFreq` includes deletions),
    * the design that keeps deletes O(1) at write time on a 100 TB
    * index. The oracle states precisely that: full-corpus statistics,
    * tombstoned docs excluded from the ranking. The stored artifact is
    * proven untouched by the spec's content-hash witness. */
  val textIndexDeleteQ: Q = Q.df(
    "text_index_delete", {
      s"""with ${TextAnalysis.bm25CoreCtes}
         |select doc_id, n_terms, bm25
         |from scored where doc_id % 7 <> $DeleteMod
         |order by bm25 desc, doc_id limit $ServeTopN""".stripMargin
    }) { (s, dir) =>
    serveBm25(s, fullIndexRoot(s, dir), Seq("full"),
      tombstones = Some(col("doc_id") % 7 === DeleteMod))
  }

  val queries: Seq[Q] =
    Seq(textIndexPersistQ, textIndexServeQ, textIndexIncrementalQ,
      textIndexCompactQ, textIndexDeleteQ, textIndexPhraseQ,
      textIndexPhraseIncrQ, textIndexPhraseDeleteQ, textIndexPhraseCompactQ,
      textIndexTopkPrunedQ, textIndexTopkPrunedIncrQ, textIndexLmdirQ)
}
