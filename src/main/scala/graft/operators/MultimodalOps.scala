package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata.
  *
  * The corpus has no real image/audio files, so the MEDIA is synthesized —
  * a deterministic PNG per document (size and pixels derived from the
  * document's id and text bytes). The DECODE is real: `javax.imageio`
  * parses the PNG container and hands back the raster, so width, height,
  * channel count, and every pixel value in the results come from an
  * actual codec, not from arithmetic on the byte length. PNG is lossless,
  * which lets the suite assert that planted pixels round-trip exactly
  * (reference analog: R4's binary metadata parsing, tables.py:54).
  *
  * At 100 TB, payloads stay opaque bytes in the scan path; the codec runs
  * inside `mapPartitions` (one decoder context per partition, the Scala
  * analog of a mapInPandas batch UDF), and payloads co-partition with
  * their keys for any downstream join.
  */
object MultimodalOps {

  /** Deterministic image dimensions for a document: width from the text
    * length, height from the id — both bounded small so sf0.1 stays cheap.
    */
  def dims(docId: Long, nBytes: Int): (Int, Int) =
    (8 + nBytes % 24, 8 + (docId % 16).toInt)

  /** Planted pixel formula (the "sensor"): deterministic in (x, y) and the
    * text bytes. The suite recomputes this independently and asserts the
    * DECODED raster matches — proving the codec path is honest.
    */
  def plantedPixel(bytes: Array[Byte], x: Int, y: Int): Int =
    bytes((x * 31 + y * 17 + x * y) % bytes.length) & 0xff

  /** Encode a deterministic PNG for (docId, textBytes). */
  def encodePng(docId: Long, textBytes: Array[Byte]): Array[Byte] = {
    val bytes = if (textBytes.nonEmpty) textBytes else Array[Byte](0)
    val (w, h) = dims(docId, textBytes.length)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = plantedPixel(bytes, x, y)
        img.setRGB(x, y, (v << 16) | ((255 - v) << 8) | ((x ^ y) & 0xff))
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  // ---- image near-dup tier (perceptual hash over the real decode) ------

  /** Content-keyed 16x16 grayscale thumbnail: char-4-gram counts hashed
    * into 256 bins, normalized to pixel intensities. Near-duplicate texts
    * share most 4-grams, so their thumbnails differ in few pixels — the
    * property the perceptual hash rides. Fixed dims (unlike `encodePng`)
    * so content similarity, not length, decides pixel layout.
    */
  def thumbnailPng(textBytes: Array[Byte]): Array[Byte] = {
    val hist = new Array[Long](256)
    var i = 0
    while (i + 3 < textBytes.length) {
      var h = 0
      var j = 0
      while (j < 4) { h = h * 31 + (textBytes(i + j) & 0xff); j += 1 }
      hist(h & 255) += 1
      i += 1
    }
    val mx = math.max(1L, hist.max)
    val img = new BufferedImage(16, 16, BufferedImage.TYPE_3BYTE_BGR)
    var p = 0
    while (p < 256) {
      val v = (hist(p) * 255 / mx).toInt
      img.setRGB(p % 16, p / 16, (v << 16) | (v << 8) | v)
      p += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Row-major red-channel plane of a decoded image — the CODEC
    * BOUNDARY the q_dedup_phash oracle stages: everything downstream of
    * these grays (cell sums, mean threshold, bits, chunk join, hamming)
    * is integer-exact arithmetic DuckDB re-derives independently.
    */
  def graysOf(img: BufferedImage): Array[Int] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val g = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { g(y * w + x) = (img.getRGB(x, y) >> 16) & 0xff; x += 1 }
      y += 1
    }
    g
  }

  /** aHash over a row-major gray plane (see [[aHash]]): the cell sums
    * are integer-valued doubles and mean = sum/64 is an exact binary
    * division, so every comparison is exact — the whole hash is
    * deterministic integer arithmetic, which is what lets the oracle
    * replay it from the staged grays bit-for-bit.
    */
  def aHashOf(g: Array[Int], w: Int, h: Int): Long = {
    val cells = new Array[Double](64)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        cells((y * 8 / h) * 8 + (x * 8 / w)) += g(y * w + x)
        x += 1
      }
      y += 1
    }
    val mean = cells.sum / 64
    var bits = 0L
    var i = 0
    while (i < 64) { if (cells(i) > mean) bits |= (1L << i); i += 1 }
    bits
  }

  /** 64-bit average hash (aHash) of a decoded image: area-average down to
    * 8x8, threshold each cell at the global mean. Bit i set = cell i
    * brighter than average. Standard perceptual-hash construction.
    */
  def aHash(img: BufferedImage): Long =
    aHashOf(graysOf(img), img.getWidth, img.getHeight)

  /** Image near-dup pairs by perceptual hash: candidates from an 8x8-bit
    * chunk pigeonhole equi-join (hamming <= 7 is GUARANTEED to share one
    * of 8 chunks; random 64-bit hashes collide on a chunk with p ~ 8/256
    * per pair), verified by exact popcount hamming <= `maxHamming`. The
    * same shuffle shape as the SimHash text tier (DedupOps) — each doc
    * moves as 8 (chunk, value) rows, never pixels. The hashes come from
    * the shared [[decodedMedia]] cache (lazy persist — no job runs at
    * query construction, and a lost executor recomputes from lineage).
    */
  def phashPairs(spark: SparkSession, sfDir: String,
      maxHamming: Int = 3): DataFrame =
    phashPairsOver(
      decodedMedia(spark, sfDir).toDF()
        .select(col("doc_id"), col("phash")),
      maxHamming)

  /** The pairing plan over any (doc_id, phash) frame — also the
    * CorpusPipeline tier entry, where the hashes are derived from the
    * pipeline's own surviving docs rather than the corpus table.
    */
  private[graft] def phashPairsOver(hashes: DataFrame,
      maxHamming: Int): DataFrame = {
    val chunks = hashes.select(col("doc_id"), col("phash"),
      explode(expr("transform(sequence(0, 7), " +
        "c -> named_struct('c', c, 'v', shiftright(phash, cast(c * 8 as int)) & 255))")).as("k"))
      .select(col("doc_id"), col("phash"), col("k.c").as("c"), col("k.v").as("v"))
    chunks.alias("x").join(chunks.alias("y"), Seq("c", "v"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        bit_count(col("x.phash").bitwiseXOR(col("y.phash"))).as("hamming"))
      // verify BEFORE the pair-dedup shuffle: the hamming gate is
      // map-side and functional on the pair, so distinct() only ever
      // sees the surviving near-dups, not every chunk collision
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .orderBy(col("d1").asc_nulls_first, col("d2").asc_nulls_first)
  }

  /** Thumbnail-hash pass for an arbitrary (doc_id, text) frame — stable
    * VAL for plan-equality (see [[decodeAllFn]]).
    */
  private val phashFn: Iterator[(Long, String)] => Iterator[(Long, Long)] =
    it => it.map { case (id, text) =>
      val bytes = Option(text).getOrElse("").getBytes("UTF-8")
      (id, aHash(ImageIO.read(new ByteArrayInputStream(thumbnailPng(bytes)))))
    }

  /** Image near-dup pairs over any (doc_id, text) frame — the
    * CorpusPipeline tier entry (the pipeline hashes its own surviving
    * docs, not the corpus table). Same candidate/verify plan as
    * [[phashPairs]]. Deliberately NOT persisted: per-run pipeline
    * frames would pin one cache entry per invocation for the session's
    * lifetime (the hazard documented at `DedupOps.shingleRows`).
    * Callers hand in an already-materialized frame (CorpusPipeline's
    * exact-dedup stage is checkpointed), so the self-join's second read
    * re-runs only the cheap map-side thumbnail hash.
    */
  def phashPairsOf(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hashes = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(phashFn).toDF("doc_id", "phash")
    phashPairsOver(hashes, maxHamming)
  }

  // ---- audio modality (same honest-decode pattern, javax.sound) --------

  /** Deterministic audio parameters for a document: tone frequency from
    * the id, clip length from the text size. 8 kHz mono 16-bit PCM.
    */
  def audioParams(docId: Long, nBytes: Int): (Double, Int) =
    (200.0 + (docId % 200).toDouble, 256 + nBytes % 512)

  val sampleRate = 8000

  /** Planted waveform (StrictMath for cross-JVM bit-exactness): a pure
    * tone at the doc's frequency. PCM in WAV is lossless, so the suite
    * asserts the DECODED samples equal this formula exactly.
    */
  def plantedSample(freq: Double, i: Int): Short =
    (30000.0 * StrictMath.sin(2.0 * StrictMath.PI * freq * i / sampleRate)).toShort

  /** Encode a deterministic WAV clip for (docId, textBytes). */
  def encodeWav(docId: Long, nBytes: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val (freq, n) = audioParams(docId, nBytes)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = plantedSample(freq, i)
      pcm(2 * i) = (s & 0xff).toByte          // little-endian int16
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Typed records for the batched decode paths. */
  case class DecodedMedia(doc_id: Long, meta_lang: String, width: Int,
      height: Int, channels: Int, red: Array[Int], phash: Long,
      thumb: Array[Int])
  case class DecodedAudio(doc_id: Long, sample_rate: Int, channels: Int,
      n_samples: Int, rms: Double, est_freq_hz: Double)
  case class DecodedPcm(doc_id: Long, sample_rate: Int, channels: Int,
      n_samples: Int, samples: Array[Int])
  case class DecodedImage(doc_id: Long, width: Int, height: Int,
      channels: Int, n_px: Int, mean_red: Double, head_px_csv: String)
  case class DecodedFrame(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, feature: Double)

  /** The single codec pass: encode + ImageIO-decode each document's PNG
    * (and its content-keyed thumbnail for the perceptual hash) ONCE,
    * emitting the raster's true dims/bands, its red-channel plane, and
    * the aHash. A stable function VAL (not an inline lambda) so every
    * call builds a structurally-equal plan and Spark's CacheManager
    * dedupes the persist below into one cached relation per sfDir.
    */
  private val decodeAllFn:
      Iterator[(Long, String, String)] => Iterator[DecodedMedia] = it =>
    it.map { case (id, text, lang) =>
      val bytes = Option(text).getOrElse("").getBytes("UTF-8")
      val img = ImageIO.read(new ByteArrayInputStream(encodePng(id, bytes)))
      val (w, h, c) = (img.getWidth, img.getHeight, img.getRaster.getNumBands)
      val red = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { red(y * w + x) = (img.getRGB(x, y) >> 16) & 0xff; x += 1 }
        y += 1
      }
      val timg = ImageIO.read(new ByteArrayInputStream(thumbnailPng(bytes)))
      val tg = graysOf(timg)
      DecodedMedia(id, lang, w, h, c, red,
        aHashOf(tg, timg.getWidth, timg.getHeight), tg)
    }

  /** Shared decoded-media frame feeding q_multimodal_decode, _frames and
    * q_dedup_phash: the codec runs once per session per sfDir instead of
    * once per query. Persisted LAZILY (MEMORY_AND_DISK, recomputable from
    * lineage — never localCheckpoint, which runs a job at query
    * construction and loses blocks with their executor). The cache is
    * session-lifetime by design, like `AnalyticsOps.orderPartSets`: its
    * consumers are independent driver queries, so there is no single
    * "after the action" point to unpersist at, and the frame is small
    * (dims + one byte-plane + a long per doc, ~3 KB/doc).
    */
  private[graft] def decodedMedia(spark: SparkSession, sfDir: String) = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .mapPartitions(decodeAllFn)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Codec-true image features off the shared decode: the raster's
    * dimensions, band count, and pixel-derived features (mean red level,
    * first-row head pixels).
    */
  def decodeImages(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    decodedMedia(spark, sfDir).map { m =>
      val head = (0 until math.min(8, m.width)).map(m.red(_)).mkString(",")
      DecodedImage(m.doc_id, m.width, m.height, m.channels,
        m.width * m.height, m.red.map(_.toLong).sum.toDouble / m.red.length,
        head)
    }.toDF()
      .orderBy(col("doc_id").asc_nulls_first)
  }

  /** Frame sampling over the decoded raster: each 8-row strip of the image
    * is one "frame", with a mean-luminance feature — the one-to-many
    * explosion shape of video frame extraction, over a real decode.
    */
  def decodeFrames(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    decodedMedia(spark, sfDir).flatMap { m =>
      val (w, h) = (m.width, m.height)
      (0 until (h + 7) / 8).iterator.map { f =>
        val y0 = f * 8
        val y1 = math.min(y0 + 8, h)
        var sum = 0L
        var i = y0 * w
        while (i < y1 * w) { sum += m.red(i); i += 1 }
        DecodedFrame(m.doc_id, f, w, y1 - y0,
          sum.toDouble / (w * (y1 - y0)) / 255.0)
      }
    }.toDF()
      .orderBy(col("doc_id").asc_nulls_first, col("frame_idx").asc_nulls_first)
  }

  /** Real audio decode via mapPartitions: `javax.sound.sampled` parses
    * the WAV container (format, frame count, PCM frames) into the
    * decoded int16 samples — the CODEC BOUNDARY the q_multimodal_audio
    * oracle stages.
    */
  private[graft] def decodePcm(spark: SparkSession, sfDir: String) = {
    import spark.implicits._
    import javax.sound.sampled.AudioSystem
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), octet_length(col("text")).as("n_bytes"))
      .as[(Long, Int)]
      .mapPartitions { it =>
        it.map { case (id, nBytes) =>
          val wav = encodeWav(id, nBytes)
          val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav))
          val fmt = ais.getFormat
          val n = ais.getFrameLength.toInt
          val pcm = ais.readAllBytes()
          val samples = new Array[Int](n)
          var i = 0
          while (i < n) {
            samples(i) =
              ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toShort.toInt
            i += 1
          }
          DecodedPcm(id, fmt.getSampleRate.toInt, fmt.getChannels, n, samples)
        }
      }
  }

  /** RMS level + zero-crossing pitch estimate from decoded samples —
    * the arithmetic the oracle replays: the s² sum is integer-exact in
    * doubles (≤ 768 · 32767² < 2⁵³), the divisions run in the written
    * order on both engines.
    */
  private[graft] def audioFeatures(p: DecodedPcm): DecodedAudio = {
    var sumSq = 0.0
    var zc = 0
    var prev = 0
    var i = 0
    while (i < p.n_samples) {
      val s = p.samples(i)
      sumSq += s.toDouble * s
      if (i > 0 && ((s >= 0) != (prev >= 0))) zc += 1
      prev = s
      i += 1
    }
    val dur = p.n_samples.toDouble / p.sample_rate
    DecodedAudio(p.doc_id, p.sample_rate, p.channels, p.n_samples,
      math.sqrt(sumSq / p.n_samples) / 32768.0, zc / 2.0 / dur)
  }

  /** Decoded-audio features: the decode composed with [[audioFeatures]]
    * — the audio analog of `decodeImages`.
    */
  def decodeAudio(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    decodePcm(spark, sfDir).map(audioFeatures).toDF()
      .orderBy(col("doc_id").asc_nulls_first)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary payload + metadata extraction + content hash + byte window
    // ("thumbnail"/"frame" slice). Oracle compares the same derivations
    // computed from the text on the DuckDB side (DuckDB v1.0 lacks BLOB
    // substring/md5, so the oracle derives from VARCHAR — identical
    // bytes for this ASCII corpus).
    "q_multimodal_meta" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("payload", encode(col("text"), "utf-8"))
        .select(
          col("doc_id"),
          octet_length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("content_hash"),
          hex(encode(substring(col("text"), 1, 8), "utf-8")).as("head_hex"),
          col("lang").as("meta_lang"))
        .orderBy(col("doc_id").asc_nulls_first)
    }),

    // Real ImageIO decode of per-document synthetic PNGs: true raster
    // width/height/band-count + pixel features. HARD ORACLE since
    // round 12: the decoded red plane — the codec boundary — stages to
    // parquet and DuckDB re-derives n_px, the exact integer-sum
    // mean_red and the head-pixel CSV independently (MultimodalSuite
    // keeps the planted-pixel exactness pins on the decode itself).
    "q_multimodal_decode" -> ((s, d) => {
      stageMediaPlanes(s, d)
      decodeImages(s, d)
    }),

    // Frame sampling (one-to-many strip explosion) over the same real
    // decode. HARD ORACLE since round 12 over the same staged planes:
    // DuckDB replays the 8-row strip tiling and the integer-exact
    // luminance feature (sum / (w·rows) / 255 in the engine's division
    // order); frame counts/ids/features stay pinned in the suite.
    "q_multimodal_frames" -> ((s, d) => {
      stageMediaPlanes(s, d)
      decodeFrames(s, d)
    }),

    // Second modality, same honest-decode pattern: WAV clips parsed by
    // javax.sound (real container + PCM decode), with level + pitch
    // features from the decoded samples. HARD ORACLE since round 12:
    // the decoded PCM samples stage to parquet (written, then READ
    // BACK as the feature inputs — the staged bytes ARE what both
    // engines score), and DuckDB re-derives rms (the s² sum is
    // integer-exact in doubles: ≤ 768·32767² < 2⁵³, so fold order is
    // irrelevant) and the zero-crossing pitch estimate. The suite
    // keeps the planted-tone frequency, exact PCM round-trip and
    // format pins.
    "q_multimodal_audio" -> ((s, d) => {
      import s.implicits._
      decodePcm(s, d).toDF()
        .coalesce(1).write.mode("overwrite").parquet(audioSamplesPath)
      s.read.parquet(audioSamplesPath).as[DecodedPcm].map(audioFeatures)
        .toDF().orderBy(col("doc_id").asc_nulls_first)
    }),

    // Image near-dup dedup: perceptual hash (aHash) over the real PNG
    // decode, chunk-pigeonhole candidates, exact hamming verify.
    // HARD ORACLE since round 12: the decoded 16x16 thumbnail grays —
    // the codec boundary, the one step SQL cannot do — stage to
    // parquet, and DuckDB re-derives the aHash (integer cell sums,
    // exact /64 mean, threshold bits in two BIGINT halves — DuckDB
    // errors on the signed-64 overflow Spark wraps), the 8-bit chunk
    // pigeonhole join and the popcount hamming verify independently.
    // Recall vs the exact text near-dup tier stays asserted in
    // MultimodalSuite. The staging write is the ONE construction-time
    // job this family runs (see the laziness test's baseline).
    "q_dedup_phash" -> ((s, d) => {
      decodedMedia(s, d).toDF().select(col("doc_id"), col("thumb"))
        .coalesce(1).write.mode("overwrite").parquet(phashThumbsPath)
      phashPairs(s, d)
    })
  )

  /** Staged decoded-thumbnail path for the q_dedup_phash oracle —
    * process-scoped like every other oracle-read staging.
    */
  private def phashThumbsPath: String =
    s"${graft.StagePaths.root}/phash_thumbs"

  private def mediaPlanesPath: String =
    s"${graft.StagePaths.root}/media_planes"
  private def audioSamplesPath: String =
    s"${graft.StagePaths.root}/audio_samples"

  /** Stage the shared decoded red planes (the codec boundary) for the
    * q_multimodal_decode / q_multimodal_frames oracles. Idempotent
    * overwrite of the same rows whichever query runs first.
    */
  private def stageMediaPlanes(s: SparkSession, d: String): Unit = {
    decodedMedia(s, d).toDF()
      .select(col("doc_id"), col("width"), col("height"),
        col("channels"), col("red"))
      .coalesce(1).write.mode("overwrite").parquet(mediaPlanesPath)
    ()
  }

  /** DuckDB replay of q_dedup_phash from the staged grays: cell sums
    * over the 2x2 blocks (p -> cell by integer division), mean as the
    * exact sum/64, bit i = cell i above mean — accumulated as two
    * 32-bit halves in BIGINTs because bit 63 would overflow DuckDB's
    * checked signed arithmetic — then the engine's chunk pigeonhole
    * (chunk c = bits [8c, 8c+8)) and the two-half popcount hamming.
    */
  private def phashOracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, thumb
       |  FROM read_parquet('$phashThumbsPath/*.parquet')),
       |px AS (
       |  SELECT doc_id, r.p, thumb[r.p + 1] AS v
       |  FROM t CROSS JOIN range(0, 256) r(p)),
       |cells AS (
       |  SELECT doc_id,
       |    ((p // 16) // 2) * 8 + ((p % 16) // 2) AS cell,
       |    SUM(v) AS cv
       |  FROM px GROUP BY doc_id, cell),
       |m AS (
       |  SELECT doc_id, CAST(SUM(cv) AS DOUBLE) / 64 AS mean
       |  FROM cells GROUP BY doc_id),
       |h AS (
       |  SELECT c.doc_id,
       |    CAST(coalesce(SUM(CASE WHEN c.cell < 32
       |      AND CAST(c.cv AS DOUBLE) > m.mean
       |      THEN (CAST(1 AS BIGINT) << c.cell) END), 0) AS BIGINT) AS h0,
       |    CAST(coalesce(SUM(CASE WHEN c.cell >= 32
       |      AND CAST(c.cv AS DOUBLE) > m.mean
       |      THEN (CAST(1 AS BIGINT) << (c.cell - 32)) END), 0)
       |      AS BIGINT) AS h1
       |  FROM cells c JOIN m ON m.doc_id = c.doc_id
       |  GROUP BY c.doc_id),
       |ch AS (
       |  SELECT doc_id, h0, h1, r.c,
       |    ((CASE WHEN r.c < 4 THEN h0 ELSE h1 END) >> ((r.c % 4) * 8))
       |      & 255 AS v
       |  FROM h CROSS JOIN range(0, 8) r(c))
       |SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
       |  bit_count(xor(x.h0, y.h0)) + bit_count(xor(x.h1, y.h1)) AS hamming
       |FROM ch x JOIN ch y
       |  ON x.c = y.c AND x.v = y.v AND x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.h0, y.h0)) + bit_count(xor(x.h1, y.h1)) <= 3
       |ORDER BY d1 ASC NULLS FIRST, d2 ASC NULLS FIRST""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_dedup_phash" -> phashOracle,
    // derivations over the staged red planes: integer-sum mean (one
    // exact division), head-pixel CSV via an inclusive 1-based slice
    "q_multimodal_decode" ->
      s"""SELECT doc_id, width, height, channels,
         |  width * height AS n_px,
         |  CAST(list_sum(red) AS DOUBLE) / len(red) AS mean_red,
         |  array_to_string(list_slice(red, 1, least(8, width)), ',')
         |    AS head_px_csv
         |FROM read_parquet('$mediaPlanesPath/*.parquet')
         |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    // 8-row strip tiling over the same planes; the luminance feature
    // replays the engine's division order (sum / (w·rows) / 255)
    "q_multimodal_frames" ->
      s"""WITH p AS (
         |  SELECT doc_id, width, height, red
         |  FROM read_parquet('$mediaPlanesPath/*.parquet')),
         |f AS (
         |  SELECT doc_id, width, height, red, r.f
         |  FROM p CROSS JOIN range(0, 64) r(f)
         |  WHERE r.f < (height + 7) // 8)
         |SELECT doc_id, f AS frame_idx, width,
         |  least(f * 8 + 8, height) - f * 8 AS height,
         |  CAST(list_sum(list_slice(red, f * 8 * width + 1,
         |    least(f * 8 + 8, height) * width)) AS DOUBLE)
         |    / (width * (least(f * 8 + 8, height) - f * 8)) / 255.0
         |    AS feature
         |FROM f
         |ORDER BY doc_id ASC NULLS FIRST, frame_idx ASC NULLS FIRST""".stripMargin,
    // rms + zero-crossing pitch from the staged decoded PCM: the s²
    // sum is integer-exact in doubles, the divisions run in the
    // engine's order, and the crossing count compares adjacent
    // samples' sign bits
    "q_multimodal_audio" ->
      s"""WITH a AS (
         |  SELECT doc_id, sample_rate, channels, n_samples, samples
         |  FROM read_parquet('$audioSamplesPath/*.parquet')),
         |z AS (
         |  SELECT doc_id, sample_rate, channels, n_samples,
         |    list_sum(list_transform(samples,
         |      s -> CAST(s AS BIGINT) * s)) AS ss,
         |    list_sum(list_transform(range(2, n_samples + 1), i ->
         |      CASE WHEN (samples[i] >= 0) <> (samples[i - 1] >= 0)
         |        THEN 1 ELSE 0 END)) AS zc
         |  FROM a)
         |SELECT doc_id, sample_rate, channels, n_samples,
         |  sqrt(CAST(ss AS DOUBLE) / n_samples) / 32768.0 AS rms,
         |  CAST(zc AS DOUBLE) / 2.0
         |    / (CAST(n_samples AS DOUBLE) / sample_rate) AS est_freq_hz
         |FROM z ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  md5(text) AS content_hash,
        |  hex(substring(text, 1, 8)) AS head_hex,
        |  lang AS meta_lang
        |FROM documents ORDER BY doc_id ASC NULLS FIRST""".stripMargin
  )
}
