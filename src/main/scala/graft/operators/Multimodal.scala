package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Multimodal column plumbing: media as opaque binary columns with typed
  * metadata, processed partition-parallel through the typed Dataset API.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked DETERMINISTIC STUB (it derives "dimensions" from the
  * payload bytes). Everything around it — binary column schema, case
  * class encoders, per-partition batch processing shape, partition
  * parallelism — is real Spark plumbing a codec would drop into: swap
  * `decodeStub` for a JNI/javax.imageio call and nothing else changes.
  */
object Multimodal {

  /** A media object: opaque payload + kind tag (image/audio/video). */
  final case class Media(doc_id: Long, kind: String, payload: Array[Byte])

  /** Decoded metadata + fixed-dim feature vector. */
  final case class MediaMeta(
      doc_id: Long,
      kind: String,
      n_bytes: Long,
      width: Long,
      height: Long,
      features: Array[Float])

  /** Fixture adapter: fake a binary media table from documents (payload =
    * UTF-8 bytes). At 100 TB this would be a parquet/iceberg table with a
    * real binary column; the pipeline below is unchanged. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    Tables.df(spark, dir, "documents")
      .select(col("doc_id"), lit("image").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[Media]
  }

  /** ==== STUB ==== A real implementation would decode image headers
    * (e.g. PNG IHDR) here. This deterministic fake reads "dimensions"
    * from the first payload bytes so tests and oracles stay exact. */
  private def decodeStub(m: Media): MediaMeta = {
    val w = if (m.payload.nonEmpty) (m.payload(0) & 0xff).toLong else 0L
    val h = if (m.payload.length > 1) (m.payload(1) & 0xff).toLong else 0L
    MediaMeta(m.doc_id, m.kind, m.payload.length.toLong, w, h,
      featureStub(m.payload))
  }

  /** ==== STUB ==== stand-in for a feature extractor (CLIP et al.):
    * 8 deterministic floats from byte samples. */
  private def featureStub(payload: Array[Byte]): Array[Float] = {
    val n = payload.length
    Array.tabulate(8) { j =>
      if (n == 0) 0f else (payload(j % n) & 0xff) / 255.0f
    }
  }

  /** Decode runs per-partition over the iterator (the "batch"): no
    * driver-side work, parallelism = input partitions. */
  def decodeAll(media: Dataset[Media]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** DuckDB expression for 0-based byte `pos` of the UTF-8 encoding held
    * in hex string `hx` — BYTE indexing, matching the stub's
    * `payload(pos) & 0xff` exactly even for non-ASCII text (a char-based
    * `ascii(substring(text, ...))` oracle diverges there: positions
    * shift and ascii() returns a code point, not a byte). */
  private def sqlByteAt(hx: String, pos: String): String =
    s"""(16 * (strpos('0123456789ABCDEF', substring($hx, 2 * ($pos) + 1, 1)) - 1)
       |   + strpos('0123456789ABCDEF', substring($hx, 2 * ($pos) + 2, 1)) - 1)""".stripMargin

  /** Metadata extraction end-to-end through the binary pipeline. The
    * oracle recomputes the stub's outputs from the text column. */
  val multimodalMeta: Q = Q.df(
    "multimodal_meta",
    s"""with h as (select doc_id, hex(encode(text)) as hx,
       |  cast(octet_length(encode(text)) as bigint) as n from documents)
       |select doc_id, n as n_bytes,
       |  cast(case when n >= 1 then ${sqlByteAt("hx", "0")} else 0 end as bigint) as width,
       |  cast(case when n >= 2 then ${sqlByteAt("hx", "1")} else 0 end as bigint) as height
       |from h order by doc_id""".stripMargin) { (s, dir) =>
    decodeAll(mediaTable(s, dir))
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"))
      .orderBy(col("doc_id"))
  }

  /** Feature tensor extraction (binary → array<float>), exploded to
    * scalar rows `(doc_id, feature_idx, byte_value)` so the driver
    * harness can canonicalize the result (a raw array<float> column is
    * unsortable in its pandas compare — the round-1 red row).
    * `byte_value = round(f * 255)` recovers the exact source byte from
    * the stub feature `f = byte/255f`, making the check integer-exact;
    * the float array itself stays covered by the spec suite. The
    * oracle recomputes the stub from the text bytes, mirroring
    * [[multimodalMeta]]. */
  val multimodalFeatures: Q = Q.df(
    "multimodal_features",
    s"""with h as (select doc_id, hex(encode(text)) as hx,
       |  cast(octet_length(encode(text)) as bigint) as n from documents)
       |select doc_id, cast(j - 1 as bigint) as feature_idx,
       |  cast(case when n = 0 then 0
       |    else ${sqlByteAt("hx", "(j - 1) % n")} end as bigint) as byte_value
       |from h, range(1, 9) t(j)
       |order by doc_id, feature_idx""".stripMargin) { (s, dir) =>
    decodeAll(mediaTable(s, dir))
      .select(col("doc_id"), posexplode(col("features")))
      .select(col("doc_id"), col("pos").cast("long").as("feature_idx"),
        round(col("col").cast("double") * 255.0).cast("long").as("byte_value"))
      .orderBy(col("doc_id"), col("feature_idx"))
  }

  /** One sampled video frame: stride-sampled index + its first byte
    * (the stub "decode"). */
  final case class Frame(doc_id: Long, frame_idx: Long, frame_byte: Long)

  /** Bytes per fake "frame" and the sampling stride (every 4th frame) —
    * the standard decimation step before feature extraction, since
    * embedding every frame of every video is 30× wasted compute. */
  val FrameBytes = 16
  val FrameStride = 4

  /** Video frame sampling through the binary pipeline: treat the
    * payload as n_bytes/[[FrameBytes]] fixed-size frames, keep every
    * [[FrameStride]]-th, and "decode" each kept frame (STUB: its first
    * byte). flatMap over the typed Dataset: per-partition, 0..n output
    * rows per input — the exact shape a real codec drops into (replace
    * the byte read with a JNI frame-grab; schema, partitioning and
    * batch iteration are unchanged). No driver-side work at any scale;
    * output is ~1/stride of the frame count. */
  def sampleFrames(media: Dataset[Media]): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val nFrames = m.payload.length / FrameBytes
      (0 until nFrames by FrameStride).iterator.map { f =>
        Frame(m.doc_id, f.toLong, (m.payload(f * FrameBytes) & 0xff).toLong)
      }
    }
  }

  /** The oracle mirrors the stride walk with range() and re-reads each
    * sampled frame's first byte from the hex encoding. */
  val multimodalFrameSample: Q = Q.df(
    "multimodal_frame_sample",
    s"""with h as (select doc_id, hex(encode(text)) as hx,
       |  cast(octet_length(encode(text)) as bigint) as n from documents),
       |f as (select doc_id, hx,
       |        unnest(range(0, n // $FrameBytes, $FrameStride)) as fi
       |      from h)
       |select doc_id, cast(fi as bigint) as frame_idx,
       |  cast(${sqlByteAt("hx", s"fi * $FrameBytes")} as bigint) as frame_byte
       |from f order by doc_id, frame_idx""".stripMargin) { (s, dir) =>
    sampleFrames(mediaTable(s, dir))
      .toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Thumbnail cells and samples per cell for [[multimodalResize]]. */
  val ThumbCells = 4
  val ThumbSamples = 8

  /** One thumbnail cell: grid index + sampled-mean byte value. */
  final case class ThumbCell(doc_id: Long, cell: Long, mean_byte: Long)

  /** Resize/thumbnail through the binary pipeline: the payload's byte
    * range is split into [[ThumbCells]] blocks and each block's value
    * is the floor-mean of [[ThumbSamples]] stride-sampled bytes —
    * bounded work per object REGARDLESS of payload size, which is the
    * honest 100 TB shape (a real resize box-filters pixel blocks after
    * decode; the stub stands in for the pixel read while the sampling
    * arithmetic, schema, and per-partition batch iteration are the
    * production plumbing). All positions are floor divisions of
    * non-negative ints and the mean is an integer floor-div, so the
    * oracle replays every sampled byte exactly. */
  def resizeThumbnails(media: Dataset[Media]): Dataset[ThumbCell] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val n = m.payload.length
      (0 until ThumbCells).iterator.map { c =>
        val sum = (0 until ThumbSamples).map { j =>
          if (n == 0) 0L
          else {
            val pos = (c * n) / ThumbCells + (j * (n / ThumbCells)) / ThumbSamples
            (m.payload(pos) & 0xff).toLong
          }
        }.sum
        ThumbCell(m.doc_id, c.toLong, sum / ThumbSamples)
      }
    }
  }

  val multimodalResize: Q = Q.df(
    "multimodal_resize",
    s"""with h as (select doc_id, hex(encode(text)) as hx,
       |  cast(octet_length(encode(text)) as bigint) as n from documents),
       |c as (select doc_id, hx, n, unnest(range(0, $ThumbCells)) as cell
       |      from h),
       |s as (select doc_id, hx, n, cell, unnest(range(0, $ThumbSamples)) as j
       |      from c),
       |p as (select doc_id, cell,
       |        case when n = 0 then 0
       |          else ${sqlByteAt("hx",
              s"(cell * n) // $ThumbCells + (j * (n // $ThumbCells)) // $ThumbSamples")}
       |        end as b
       |      from s)
       |select doc_id, cast(cell as bigint) as cell,
       |  cast(sum(b) // $ThumbSamples as bigint) as mean_byte
       |from p group by doc_id, cell
       |order by doc_id, cell""".stripMargin) { (s, dir) =>
    resizeThumbnails(mediaTable(s, dir))
      .toDF()
      .orderBy(col("doc_id"), col("cell"))
  }

  /** dHash grid: [[HashRows]] rows × [[HashCols]] stride-sampled bytes;
    * each row contributes [[HashCols]]−1 gradient comparisons → 64 bits
    * packed as two 32-bit words (the [[Similarity]] binary-code trick:
    * signed-overflow-free in both engines). */
  val HashRows = 8
  val HashCols = 9
  val HashSamples: Int = HashRows * HashCols
  val HamThreshold = 3

  /** One perceptual fingerprint: 64 dHash bits as two int32 words. */
  final case class MediaHash(doc_id: Long, hi: Long, lo: Long)

  /** ==== decode is the stub; the HASH is the real dHash algorithm ====
    * difference hash (dHash): resize to a (rows)×(cols) grayscale grid,
    * bit = cell > right-neighbor — the gradient signature that survives
    * re-encoding, scaling, and mild edits, which is why it's the
    * standard first pass of image near-dup pipelines. The stub "resize"
    * is the same stride byte sampling [[resizeThumbnails]] uses (a real
    * build swaps in decoded pixels; the bit packing, banding, and pair
    * verification below are unchanged). All arithmetic is integer. */
  def dHashCodes(media: Dataset[Media]): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val n = m.payload.length
      // Long product: idx*n overflows Int past ~30 MB payloads (idx up
      // to 71), and the oracle's position arithmetic is int64
      def byteAt(idx: Int): Int =
        if (n == 0) 0
        else (m.payload(((idx.toLong * n) / HashSamples).toInt) & 0xff)
      var hi = 0L
      var lo = 0L
      var k = 0
      var r = 0
      while (r < HashRows) {
        var c = 0
        while (c < HashCols - 1) {
          val base = r * HashCols + c
          if (byteAt(base) > byteAt(base + 1)) {
            if (k < 32) hi |= 1L << (31 - k) else lo |= 1L << (63 - k)
          }
          k += 1
          c += 1
        }
        r += 1
      }
      MediaHash(m.doc_id, hi, lo)
    }
  }

  /** Variant id offset and perturbation slice for
    * [[mediaWithVariants]]. */
  val VariantIdOffset = 1000000L
  val VariantMod = 10

  /** The fixture corpus has no native near-duplicates (min cross-object
    * dHash Hamming is 12 at both test scales), so the near-dup entry
    * ships a DERIVED re-encode: every [[VariantMod]]-th object appears
    * a second time with ONE byte (position n/2) perturbed — the
    * smallest "same image, different encoder" stand-in. A single byte
    * is sampled by at most one grid cell (n > [[HashSamples]] here),
    * and one cell feeds at most two gradient comparisons, so a variant
    * sits at Hamming ≤ 2 from its source — inside the threshold, and a
    * VALUE-CHECKED claim: the entry's result must contain exactly the
    * source↔variant pairs. */
  def mediaWithVariants(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    val base = mediaTable(spark, dir)
    // payloads must be LONGER than the sampling grid for the Hamming≤2
    // guarantee: with n > HashSamples the perturbed byte is sampled by
    // at most one grid cell; a 1..72-byte payload would let one byte
    // feed several cells and break the pair contract silently
    val variants = base
      .filter(col("doc_id") % VariantMod === 0 &&
        length(col("payload")) > HashSamples)
      .map { m =>
        val p = m.payload.clone()
        val i = p.length / 2
        p(i) = (((p(i) & 0xff) + 128) % 256).toByte
        Media(m.doc_id + VariantIdOffset, m.kind, p)
      }
    base.union(variants)
  }

  /** Near-duplicate media pairs by perceptual-hash Hamming distance —
    * the image analogue of SimHash dedup, LSH-banded so it never goes
    * O(n²): the 64-bit fingerprint splits into 4 × 16-bit bands, pairs
    * sharing ANY band meet in a bucket equi-join (pigeonhole: ≤
    * [[HamThreshold]] = 3 differing bits cannot touch all 4 bands, so
    * banding is RECALL-LOSSLESS at the threshold), and only candidates
    * pay the exact popcount verify. Scale shape: one fingerprint pass
    * (bounded work per object, payload size irrelevant), one
    * band-keyed shuffle of 4 × 8-byte rows per object, exact verify on
    * the candidate set only. */
  def phashNearDups(media: Dataset[Media], maxHamming: Int): DataFrame = {
    // the fingerprint table feeds four plan branches (two band sides,
    // two verify sides); at fixture scale recomputing the cheap
    // one-pass hash beats pinning storage, and at 100 TB the right
    // move is to PERSIST it as a table (it is 24 bytes/object — the
    // artifact an image-dedup pipeline ships between stages), not to
    // checkpoint inside the query
    val codes = dHashCodes(media).toDF()
    val bands = codes.select(col("doc_id"), posexplode(array(
      expr("hi div 65536"), col("hi") % 65536,
      expr("lo div 65536"), col("lo") % 65536)))
      .toDF("doc_id", "bi", "v")
    val cand = bands.as("a").join(bands.as("b"),
        col("a.bi") === col("b.bi") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(codes.select(col("doc_id").as("doc_a"), col("hi").as("ha"),
        col("lo").as("la")), "doc_a")
      .join(codes.select(col("doc_id").as("doc_b"), col("hi").as("hb"),
        col("lo").as("lb")), "doc_b")
      .withColumn("hamming",
        (expr("bit_count(ha ^ hb)") + expr("bit_count(la ^ lb)"))
          .cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** The oracle replays the whole pipeline: byte sampling, gradient
    * bits, word packing (shifts on non-negative ints), banding
    * (floor-div/mod on non-negative words), candidate join, popcount
    * verify — bit-exact end to end. */
  val multimodalPhashDedup: Q = Q.df(
    "multimodal_phash_dedup", {
      val pos1 = s"((k // ${HashCols - 1}) * $HashCols + (k % ${HashCols - 1})) * n // $HashSamples"
      val pos2 = s"((k // ${HashCols - 1}) * $HashCols + (k % ${HashCols - 1}) + 1) * n // $HashSamples"
      s"""with base as (select doc_id, hex(encode(text)) as hx,
         |  cast(octet_length(encode(text)) as bigint) as n from documents),
         |var as (select doc_id + $VariantIdOffset as doc_id,
         |    substring(hx, 1, 2 * (n // 2))
         |      || printf('%02X', (${sqlByteAt("hx", "n // 2")} + 128) % 256)
         |      || substring(hx, 2 * (n // 2) + 3) as hx, n
         |  from base where doc_id % $VariantMod = 0 and n > $HashSamples),
         |h as (select * from base union all select * from var),
         |g as (select doc_id, hx, n, unnest(range(0, 64)) as k from h),
         |bits as (select doc_id, k,
         |    case when n = 0 then false
         |      else ${sqlByteAt("hx", pos1)} > ${sqlByteAt("hx", pos2)}
         |    end as b
         |  from g),
         |w as (select doc_id,
         |    cast(coalesce(sum(case when b and k < 32
         |      then (1::BIGINT << (31 - k)) end), 0) as bigint) as hi,
         |    cast(coalesce(sum(case when b and k >= 32
         |      then (1::BIGINT << (63 - k)) end), 0) as bigint) as lo
         |  from bits group by doc_id),
         |bands as (select doc_id, bi,
         |    case bi when 0 then hi // 65536 when 1 then hi % 65536
         |            when 2 then lo // 65536 else lo % 65536 end as v
         |  from w, range(0, 4) t(bi)),
         |cand as (select distinct a.doc_id as doc_a, b.doc_id as doc_b
         |  from bands a join bands b
         |    on a.bi = b.bi and a.v = b.v and a.doc_id < b.doc_id),
         |p as (select c.doc_a, c.doc_b,
         |    cast(bit_count(xor(x.hi, y.hi))
         |       + bit_count(xor(x.lo, y.lo)) as bigint) as hamming
         |  from cand c
         |  join w x on x.doc_id = c.doc_a
         |  join w y on y.doc_id = c.doc_b)
         |select doc_a, doc_b, hamming from p where hamming <= $HamThreshold
         |order by doc_a, doc_b""".stripMargin
    }) { (s, dir) =>
    phashNearDups(mediaWithVariants(s, dir), HamThreshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val queries: Seq[Q] =
    Seq(multimodalMeta, multimodalFeatures, multimodalFrameSample,
      multimodalResize, multimodalPhashDedup)
}
