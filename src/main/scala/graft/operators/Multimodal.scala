package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / resize / frame-sample operators.
  *
  * Spark-side design (the part that must be right at 100 TB):
  *   - media rows are (id, kind, bytes, meta) with an explicit schema —
  *     no inference on binary payloads;
  *   - per-item work runs as `mapPartitions` over typed rows, the JVM
  *     analog of batched `mapInPandas`: one decoder instance per
  *     partition (decoders are expensive to construct), streaming
  *     iterator in/out (never materializes a partition), and partition
  *     sizing controlled by the caller via `repartition` on byte budget;
  *   - actual codec work is behind [[MediaDecoder]]. The container ships
  *     no image/audio libraries, so the default is a clearly-marked
  *     deterministic stub; swap in a real decoder without touching the
  *     Spark plumbing.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", MapType(StringType, StringType))))

  final case class Media(media_id: Long, kind: String, bytes: Array[Byte],
      meta: Map[String, String])
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, feature: Array[Float])
  final case class Frame(media_id: Long, frame_idx: Int, bytes: Array[Byte])

  /** Codec boundary. Implementations must be thread-compatible (one
    * instance per partition, invoked sequentially).
    */
  trait MediaDecoder extends Serializable {
    def decodeDims(m: Media): (Int, Int)
    def features(m: Media, dim: Int): Array[Float]
    def resize(m: Media, w: Int, h: Int): Array[Byte]
    def sampleFrames(m: Media, everyN: Int): Iterator[Frame]
  }

  /** STUB decoder — deterministic fake standing in for libjpeg/ffmpeg,
    * which are not in this container. Dims come from metadata (or a
    * hash-derived fake); "features" are a byte histogram (real
    * computation over the payload, so the plumbing moves real data);
    * resize/frame-sample slice the payload deterministically.
    */
  object StubDecoder extends MediaDecoder {
    def decodeDims(m: Media): (Int, Int) = {
      def metaInt(k: String) = m.meta.get(k).flatMap(_.toIntOption)
      (metaInt("width").getOrElse(1 + math.abs(m.media_id % 1024).toInt),
        metaInt("height").getOrElse(1 + math.abs(m.media_id % 768).toInt))
    }
    def features(m: Media, dim: Int): Array[Float] = {
      val hist = new Array[Float](dim)
      var i = 0
      val bytes = if (m.bytes == null) Array.empty[Byte] else m.bytes
      while (i < bytes.length) { hist((bytes(i) & 0xff) % dim) += 1f; i += 1 }
      val n = math.max(1, bytes.length)
      hist.map(_ / n)
    }
    def resize(m: Media, w: Int, h: Int): Array[Byte] =
      if (m.bytes == null) Array.empty
      else m.bytes.take(math.min(m.bytes.length, w * h))
    def sampleFrames(m: Media, everyN: Int): Iterator[Frame] = {
      val bytes = if (m.bytes == null) Array.empty[Byte] else m.bytes
      val frameSize = math.max(1, bytes.length / 16) // fake 16-frame container
      bytes.grouped(frameSize).zipWithIndex
        .filter { case (_, i) => i % everyN == 0 }
        .map { case (b, i) => Frame(m.media_id, i, b) }
    }
  }

  /** Decode + feature-extract, batched per partition. */
  def extractFeatures(
      media: Dataset[Media],
      dim: Int = 32,
      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val d = decoder // one decoder per partition
      it.map { m =>
        val (w, h) = d.decodeDims(m)
        val nb = if (m.bytes == null) 0L else m.bytes.length.toLong
        MediaFeatures(m.media_id, m.kind, nb, w, h, d.features(m, dim))
      }
    }
  }

  /** Frame sampling for video rows: one row in, ~16/everyN rows out —
    * a flatMap, so output partitioning follows input and no shuffle.
    */
  def sampleFrames(
      media: Dataset[Media],
      everyN: Int = 4,
      decoder: MediaDecoder = StubDecoder): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap(m => decoder.sampleFrames(m, everyN))
  }

  /** Resize every media row's payload, batched per partition (one
    * decoder per partition, streaming iterator — same shape as
    * [[extractFeatures]]). Metadata records the target dims.
    */
  def resizeAll(
      media: Dataset[Media],
      w: Int,
      h: Int,
      decoder: MediaDecoder = StubDecoder): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val d = decoder
      it.map(m => m.copy(
        bytes = d.resize(m, w, h),
        meta = m.meta + ("width" -> w.toString) + ("height" -> h.toString)))
    }
  }

  /** Pure-SQL byte statistics — no decoder needed, stays in codegen. */
  def byteStats(mediaDf: DataFrame): DataFrame =
    mediaDf.select(
      col("media_id"), col("kind"),
      length(col("bytes")).cast("long").as("n_bytes"),
      md5(col("bytes")).as("content_hash"))

  /** Wrap any table with a text column into media rows (text bytes as
    * payload) — used by tests and as the documented ingestion example.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String, kind: String): Dataset[Media] = {
    import df.sparkSession.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(textCol).cast("binary").as("bytes"),
      map(lit("origin"), lit("text")).as("meta"))
      .as[Media]
  }

  /** Brightness-adjusted copies of the media rows (each byte shifted by
    * `delta`, clamped to [0, 255]), re-keyed by `idOffset` — the
    * deterministic stand-in for a re-encoded/brightened variant of the
    * same asset. Runs through the per-partition codec path like every
    * byte transform. aHash is provably invariant under an unclamped
    * uniform shift (span mean and global mean move together), which is
    * the perceptual-robustness property [[ahashPairs]] exploits.
    */
  def brightnessVariant(
      media: Dataset[Media],
      delta: Int,
      idOffset: Long): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val shifted =
        if (m.bytes == null) null
        else m.bytes.map(b => math.min(255, math.max(0, (b & 0xff) + delta)).toByte)
      m.copy(media_id = m.media_id + idOffset, bytes = shifted)
    })
  }

  /** Silence/voice segmentation over an audio-style byte payload — the
    * gaps-and-islands operator of the modality: per-block PCM energy
    * (`Σ (byte − center)²`, exact integer, one codegen pass via
    * [[graft.plans.ByteBlockEnergy]]), blocks above `minEnergy` are
    * "voiced", and maximal voiced runs become segments
    * `(media_id, seg_idx, start_block, end_block, n_blocks,
    * sum_energy)`.
    *
    * The island id is the classic `block_idx − row_number()` trick:
    * consecutive voiced blocks share it, any silent gap shifts it.
    * Both windows partition by `media_id`, so state per key is one
    * asset's block list — the same per-key bound as sessionization;
    * the corpus shuffles once on the media key. With a real decoder
    * the input is the PCM plane; the stub's text bytes stand in, with
    * the same arithmetic end to end.
    */
  def silenceSegments(
      mediaDf: DataFrame,
      blockSize: Int = 16,
      center: Int = 97,
      minEnergy: Long = 5000L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("block_idx"))
    val voiced = mediaDf.select(col("media_id"),
      posexplode(graft.functions.byte_block_energy(col("bytes"), blockSize, center))
        .as(Seq("block_idx", "energy")))
      .where(col("energy") > minEnergy)
      .withColumn("__island", col("block_idx") - row_number().over(w))
    val segW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("start_block"))
    voiced.groupBy(col("media_id"), col("__island"))
      .agg(min(col("block_idx")).as("start_block"),
        max(col("block_idx")).as("end_block"),
        count(lit(1)).as("n_blocks"),
        sum(col("energy")).as("sum_energy"))
      .select(col("media_id"),
        row_number().over(segW).as("seg_idx"),
        col("start_block"), col("end_block"), col("n_blocks"), col("sum_energy"))
  }

  /** Perceptual fingerprints: `(media_id, ahash)` via the codegen'd
    * integer [[graft.plans.AHash64]] — one narrow projection, no
    * decoder round trip needed for payloads already in byte-plane
    * form.
    */
  def aHashes(mediaDf: DataFrame): DataFrame =
    mediaDf.select(col("media_id"),
      graft.functions.ahash64(col("bytes")).as("ahash"))

  /** Perceptual near-duplicate pairs: media whose aHashes differ in at
    * most `maxHamming` of 64 bits.
    *
    * Candidate generation is the SimHash chunk-pigeonhole argument
    * applied to the perceptual hash: the 64-bit hash splits into
    * `maxHamming + 1` chunks, and two hashes within the Hamming ball
    * must agree EXACTLY on at least one chunk — so candidates come
    * from `maxHamming + 1` equi-joins on (chunk_idx, chunk_bits),
    * never a cross join. Each candidate pair is then verified with the
    * exact popcount of the XOR, and duplicate discoveries from
    * multiple agreeing chunks collapse through one DISTINCT.
    *
    * At 100 TB: fingerprints are 8 bytes/row; the joins shuffle
    * (chunk, bits) keys with near-uniform distribution (aHash bits mix
    * content), and verification is integer ops on the joined row — the
    * same bucketed-not-all-pairs shape as the text near-dup family.
    */
  /** Scene-cut detection: consecutive sampled frames of each video are
    * aHashed and a cut is declared wherever the perceptual distance
    * jumps — `popcount(ahash_i XOR ahash_{i−1}) >= minHamming`. Output
    * `(media_id, frame_idx, hamming)` with `frame_idx` the first frame
    * of the new scene.
    *
    * Scale shape: the lag window partitions by `media_id`, so per-key
    * state is ONE asset's frame list (bounded by container length) —
    * the corpus shuffles once on the media key, same bound as
    * sessionization. Hashing is the codegen'd integer
    * [[graft.plans.AHash64]]; no decoder round trip beyond the frame
    * slicing itself.
    */
  def sceneCuts(
      media: Dataset[Media],
      everyN: Int = 1,
      minHamming: Int = 8,
      decoder: MediaDecoder = StubDecoder): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_idx"))
    sampleFrames(media, everyN, decoder).toDF()
      .select(col("media_id"), col("frame_idx"),
        graft.functions.ahash64(col("bytes")).as("ahash"))
      .withColumn("__prev", lag(col("ahash"), 1).over(w))
      .where(col("__prev").isNotNull)
      .select(col("media_id"), col("frame_idx"),
        bit_count(col("ahash").bitwiseXOR(col("__prev"))).as("hamming"))
      .where(col("hamming") >= minHamming)
  }

  def ahashPairs(mediaDf: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming must be in [0, 64)")
    val nChunks = maxHamming + 1
    val chunkBits = 64 / nChunks
    val hashes = aHashes(mediaDf)
    val chunked = hashes.select(col("media_id"), col("ahash"),
      explode(array((0 until nChunks).map { i =>
        // last chunk takes the remainder bits; mask via unsigned shift
        val width = if (i == nChunks - 1) 64 - i * chunkBits else chunkBits
        val mask = if (width == 64) -1L else (1L << width) - 1L
        struct(lit(i).as("chunk_idx"),
          (shiftright(col("ahash"), i * chunkBits).bitwiseAND(lit(mask)))
            .as("chunk"))
      }: _*)).as("c"))
      .select(col("media_id"), col("ahash"),
        col("c.chunk_idx").as("chunk_idx"), col("c.chunk").as("chunk"))
    val a = chunked.toDF("id_a", "hash_a", "chunk_idx", "chunk")
    val b = chunked.toDF("id_b", "hash_b", "chunk_idx", "chunk")
    a.join(b, Seq("chunk_idx", "chunk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("hash_a").bitwiseXOR(col("hash_b"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }
}
