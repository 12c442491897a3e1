package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for the training-data-pipeline surface:
  * image/audio/video carried as opaque `BINARY` columns with typed
  * metadata, processed by per-partition batch operators.
  *
  * The actual media codecs are NOT in this container (builder brief), so
  * the decode kernel is a clearly-marked deterministic stub — but every
  * Spark-side piece a real deployment needs is real and tested: the
  * schema contract, binary-friendly partition sizing, the batched
  * per-partition execution shape (decode libraries amortize per-batch
  * init), and metadata pushdown staying columnar so Catalyst can prune
  * scans to metadata-only queries without touching the bytes.
  */
object Multimodal {

  /** Canonical media-table schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType), // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Deterministic synthetic media table (documents stand in as payload
    * bytes) — exercises the exact schema/partitioning a real media lake
    * would have.
    */
  def syntheticMedia(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.select(
      col("doc_id").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        col("n_chars").as("n_bytes"),
        (pmod(col("doc_id") * 37, lit(1920)) + 1).cast("int").as("width"),
        (pmod(col("doc_id") * 53, lit(1080)) + 1).cast("int").as("height"),
        (pmod(col("doc_id") * 97, lit(600000)) + 1).as("duration_ms"))
        .as("meta"))
  }

  /** STUB decode kernel — stands in for an image/audio codec call.
    * Deterministic: "features" are byte-statistics of the payload
    * (length, mean, min, max byte value). A real deployment swaps only
    * this function body for the codec invocation; the batching/
    * partitioning contract around it is unchanged.
    */
  private def stubDecodeFeatures(payload: Array[Byte]): (Double, Double, Double, Double) = {
    if (payload == null || payload.isEmpty) (0.0, 0.0, 0.0, 0.0)
    else {
      val n = payload.length.toDouble
      var sum = 0L; var mn = 255; var mx = 0
      payload.foreach { b =>
        val v = b & 0xff
        sum += v; if (v < mn) mn = v; if (v > mx) mx = v
      }
      (n, sum / n, mn.toDouble, mx.toDouble)
    }
  }

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(
      media_id: Long, kind: String,
      // scalar feature columns (not one ARRAY column): downstream
      // filters/aggregates stay columnar and the frame remains sortable/
      // comparable by generic tools
      f_len: Double, f_mean: Double, f_min: Double, f_max: Double)

  /** Batched per-partition feature extraction: one kernel "session" per
    * partition (where a real codec would init once), rows streamed
    * through it. mapPartitions — not a per-row UDF — is the right
    * execution shape for codec-style kernels with heavy init.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("kind"), col("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // real impl: codec/library init happens HERE, once per partition
        rows.map { r =>
          val (l, m, mn, mx) = stubDecodeFeatures(r.payload)
          MediaFeatures(r.media_id, r.kind, l, m, mn, mx)
        }
      }
      .toDF()
  }

  final case class ResizeIn(
      media_id: Long, width: Int, height: Int, payload: Array[Byte])
  final case class ResizeOut(
      media_id: Long, in_w: Int, in_h: Int, out_w: Int, out_h: Int,
      thumb: Array[Byte])

  /** Aspect-preserving target dims, integer floor arithmetic (shared by
    * the kernel and, structurally, the SQL oracle — keep in sync with
    * the m4 oracle in SparkEntry).
    */
  private[operators] def fitDims(w: Int, h: Int, maxDim: Int): (Int, Int) =
    if (math.max(w, h) <= maxDim) (w, h)
    else if (w >= h) (maxDim, math.max(1, h * maxDim / w))
    else (math.max(1, w * maxDim / h), maxDim)

  /** Image resize/thumbnail plumbing: the batched per-partition kernel a
    * real pipeline runs (decode → scale → re-encode), with the codec
    * call STUBBED deterministically (no image libraries in this
    * container): target dims are real aspect-preserving integer
    * arithmetic; the "thumbnail" bytes are a deterministic prefix of the
    * payload sized to the target area. Everything around the stub —
    * image-only pruned scan, typed row contract, one kernel init per
    * partition, binary-in/binary-out schema — is the production shape.
    */
  def resizeImages(media: DataFrame, maxDim: Int = 256): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .filter(col("kind") === "image")
      .select(
        col("media_id"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        col("payload"))
      .as[ResizeIn]
      .mapPartitions { rows =>
        // real impl: scaler/codec init happens HERE, once per partition
        rows.map { r =>
          val (ow, oh) = fitDims(r.width, r.height, maxDim)
          val p = if (r.payload == null) Array.emptyByteArray else r.payload
          val thumbLen = math.min(p.length, ow * oh / 8 + 1)
          ResizeOut(r.media_id, r.width, r.height, ow, oh, p.take(thumbLen))
        }
      }
      .toDF()
  }

  final case class MediaSig(media_id: Long, sig: Int)

  /** STUB perceptual hash — the block-mean pHash structure computed on
    * payload BYTES instead of decoded pixels (no codecs in this
    * container; a real deployment decodes, downsamples, and runs the
    * same block-vs-global comparison on luma). 16 bits, bit i set iff
    * block i's mean byte value exceeds the global mean — compared by
    * INTEGER cross-multiplication (`bsum·n > total·len_i`), so the
    * signature is exactly recomputable by any engine from the bytes.
    * Empty/null payloads hash to 0.
    */
  private def stubPerceptualHash(p: Array[Byte]): Int = {
    if (p == null || p.isEmpty) 0
    else {
      val n = p.length
      var total = 0L
      var j = 0
      while (j < n) { total += (p(j) & 0xff); j += 1 }
      var sig = 0
      var i = 0
      while (i < 16) {
        val lo = i * n / 16
        val hi = (i + 1) * n / 16
        if (hi > lo) {
          var bsum = 0L
          var b = lo
          while (b < hi) { bsum += (p(b) & 0xff); b += 1 }
          if (bsum * n > total * (hi - lo)) sig |= (1 << i)
        }
        i += 1
      }
      sig
    }
  }

  /** Per-partition perceptual-signature kernel (the m2 batching shape:
    * codec init once per partition, rows streamed through). Output:
    * `media_id, sig INT`.
    */
  def perceptualSignatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real impl: decoder init happens HERE, once per partition
        rows.map { case (id, p) => MediaSig(id, stubPerceptualHash(p)) }
      }
      .toDF()
  }

  /** Perceptual NEAR-DUP pairs across the media lake — the multimodal
    * twin of d14's SimHash join: signatures from the per-partition
    * kernel, candidates by the banded pigeonhole (Hamming ≤ 1 on 16
    * bits ⇒ one of the two 8-bit bands is EQUAL — 100% recall by
    * construction, no |D|² stage), then the exact popcount verify on
    * candidates only. Output: `id_a, id_b, ham` (a < b).
    */
  def perceptualNearDupPairs(media: DataFrame): DataFrame = {
    val sigs = perceptualSignatures(media)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def banded(bandExpr: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
      val a = sigs.select(
        col("media_id").as("id_a"), col("sig").as("sig_a"),
        bandExpr(col("sig")).as("bk"))
      val b = sigs.select(
        col("media_id").as("id_b"), col("sig").as("sig_b"),
        bandExpr(col("sig")).as("bk"))
      a.join(b, Seq("bk")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
    }
    val cands = banded(s => s.bitwiseAND(lit(255)))
      .union(banded(s => shiftright(s, 8)))
      .distinct()
    val out = cands
      .withColumn(
        "ham", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("int"))
      .filter(col("ham") <= 1)
      .select(col("id_a"), col("id_b"), col("ham"))
    CacheScope.sealAfter(out, sigs)
  }

  /** Metadata-only projection — must compile to a scan that never reads
    * the payload bytes (ReadSchema excludes `payload`); this is the
    * pruning contract that makes metadata queries cheap on a 100 TB
    * media lake.
    */
  def metadataStats(media: DataFrame): DataFrame =
    media
      .groupBy(col("kind"))
      .agg(
        count("*").as("n_media"),
        sum(col("meta.n_bytes")).as("total_bytes"),
        max(col("meta.width")).as("max_width"))

  /** Deterministic frame-sampling plan for video rows: emits (media_id,
    * frame_no) for every `everyMs` tick of the clip duration — the
    * explode/flatMap shape of a real frame extractor, bounded per row.
    */
  def sampleFrames(media: DataFrame, everyMs: Long = 10000L): DataFrame =
    media
      .filter(col("kind") === "video")
      .select(
        col("media_id"),
        explode(
          sequence(
            lit(0L),
            floor(col("meta.duration_ms") / lit(everyMs)).cast("long"),
            lit(1L))).as("frame_no"))

  /** AUDIO SEGMENTATION (VAD-shaped silence removal — the step an
    * audio-training pipeline runs before transcription/packing): the
    * clip is framed at `frameMs`, each frame gets an energy from the
    * decode kernel (STUBBED deterministically as an 8-bit md5 digest
    * of (media_id, frame) — the same seam as [[extractFeatures]]; a
    * real deployment swaps only the energy expression for the codec's
    * RMS), frames at or above `threshold` are voice-active, and
    * maximal active runs become segments via gaps-and-islands
    * (`frame − row_number` per clip — ONE window per media id, clips
    * segment in parallel). The explode is bounded by
    * duration/frameMs per row; output is segment-sized, not
    * frame-sized. Output: `media_id, start_ms, end_ms (half-open),
    * n_frames`.
    */
  def audioSegments(
      media: DataFrame,
      frameMs: Long = 1000L,
      threshold: Int = 128): DataFrame = {
    require(frameMs >= 1, "frameMs must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val frames = media
      .filter(col("kind") === "audio")
      .select(
        col("media_id"),
        explode(sequence(
          lit(0L),
          floor((col("meta.duration_ms") - 1) / frameMs).cast("long")))
          .as("frame"))
    val energy = conv(
      substring(
        md5(concat_ws(":",
          col("media_id").cast("string"), col("frame").cast("string"),
          lit("m7"))),
        1, 2),
      16, 10).cast("int")
    val w = Window.partitionBy(col("media_id")).orderBy(col("frame"))
    frames
      .withColumn("energy", energy)
      .filter(col("energy") >= threshold)
      .withColumn("island", col("frame") - row_number().over(w))
      .groupBy(col("media_id"), col("island"))
      .agg(
        (min(col("frame")) * frameMs).as("start_ms"),
        (max(col("frame")) * frameMs + frameMs).as("end_ms"),
        count(lit(1)).as("n_frames"))
      .select(
        col("media_id"), col("start_ms"), col("end_ms"), col("n_frames"))
  }

  /** CLIP-LEVEL video near-dup by FRAME-FINGERPRINT matching (m8 —
    * the video twin of m5's whole-media perceptual hash, and the shape
    * real video dedup takes: a re-encoded/trimmed copy shares most
    * frame fingerprints with its original even when no whole-file hash
    * matches). Input is a `frames(media_id, frame_no, fp)` table — the
    * per-frame fingerprint column is the decode-kernel seam
    * ([[extractFeatures]]'s discipline: a real deployment computes fp
    * with a perceptual frame hash; the registered fixture derives it
    * deterministically).
    *
    * Candidates are BLOCKED on the fingerprint (clips sharing a frame
    * meet in its group — never an all-pairs stage), with a UBIQUITY
    * CAP first: fingerprints present in more than `maxDf` clips are
    * dropped before the join (the d17 boilerplate discipline — a
    * title-card/black frame shared by thousands of clips carries no
    * dedup signal and would make its block quadratic). Pairs keep
    * when they share ≥ `minShared` DISTINCT fingerprints. Scale
    * shape: one distinct, one df aggregate, one fp-keyed equi-join
    * whose block sizes are bounded by `maxDf`, one map-side-combined
    * pair count. Output: `id_a, id_b, n_shared` (a < b).
    */
  def clipNearDupPairs(
      frames: DataFrame, minShared: Int, maxDf: Int): DataFrame = {
    require(minShared >= 1, "minShared must be >= 1")
    require(maxDf >= 2, "maxDf must be >= 2 (a df-1 fingerprint cannot pair)")
    val d = frames.select(col("media_id"), col("fp")).distinct()
    val keep = d.groupBy(col("fp"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("fp"))
    val dk = d.join(keep, Seq("fp"))
    dk.select(col("fp"), col("media_id").as("id_a"))
      .join(dk.select(col("fp"), col("media_id").as("id_b")), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** INTERLEAVED multimodal SEQUENCE PACKING — the manifest step that
    * turns a cleaned image-text corpus into fixed-budget training
    * sequences when documents carry images as well as text (the
    * LLaVA/Flamingo data shape: every image placeholder consumes a
    * fixed patch-token budget in the sequence, text costs its token
    * count). A document's sequence cost is
    * `token_count(text) + imageTokens · n_images`; documents pack by
    * the d19/d20 fixed-stride rule — `seq_id = floor(cum_before /
    * budget)` over ONE window per `source` shard — so packing is a
    * pure window expression: shards pack in parallel, any engine
    * reproduces every cut, and there is no serial next-fit fold (a
    * document whose cost straddles a stride boundary spills its tail
    * into the next sequence, exactly like d19's token-split packing —
    * acceptable for pretraining loaders, which mask across the split).
    * Output is the per-sequence manifest a loader consumes: document
    * count, text/image token totals, and the realized fill.
    *
    * `imageCountCol` supplies each document's image count; callers
    * without a real media join synthesize one deterministically (the
    * d38 augmented-fixture discipline). 100 TB shape: one shuffle
    * (the per-source window) + one map-side-combined hash aggregate —
    * no global order, no driver state.
    */
  def interleavedPack(
      docs: DataFrame,
      imageCountCol: org.apache.spark.sql.Column,
      budget: Int,
      imageTokens: Int = 576,
      shardCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    require(imageTokens >= 0, "imageTokens must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(
        col(idCol), col(shardCol),
        TextOps.tokenCount(col("text")).as("text_tokens"),
        imageCountCol.cast("long").as("n_images"))
      .withColumn(
        "item_tokens",
        col("text_tokens") + lit(imageTokens.toLong) * col("n_images"))
      .withColumn(
        "start_offset",
        sum(col("item_tokens")).over(w) - col("item_tokens"))
      .withColumn("seq_id", (col("start_offset") / budget).cast("long"))
      .groupBy(col(shardCol), col("seq_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("text_tokens")).as("text_tokens"),
        sum(col("n_images")).as("n_images"),
        sum(col("item_tokens")).as("total_tokens"))
  }
}
