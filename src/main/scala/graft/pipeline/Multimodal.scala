package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with a typed metadata struct, processed per-partition.
 *
 * IMAGE decode and resize are REAL: JDK-builtin `javax.imageio` handles
 * PNG and JPEG (no native libraries, no new dependencies) behind the
 * per-partition-initialized `mapPartitions` shape ([[decodeImageBatched]],
 * [[resizeImage]]). VIDEO frame extraction is REAL for RIFF/AVI
 * containers with imageio-decodable frame codecs (PNG/MJPEG families):
 * [[aviFrames]] demuxes the chunk stream, [[sampleFramesDecoded]]
 * samples + decodes per-partition. Compressed inter-frame codecs
 * (H.264 …) stay out of scope — their frames demux but decode to NULL.
 * AUDIO is REAL for RIFF/WAVE PCM16 ([[decodeWav]], [[audioStatsBatched]]
 * — exact integer stream stats); feature extraction is REAL as a
 * mean-pooled RGB patch grid over the decoded pixels
 * ([[featurizePixels]] — deterministic, not a learned encoder, feeds
 * [[Similarity]] directly). The legacy fake-header kernels
 * ([[decodeImageStub]], [[sampleFrames]], [[featurizeStub]]) are kept
 * for the GRFT demo format and plumbing tests.
 *
 * At 100 TB: payloads should be read from a binary-file source or parquet
 * with `spark.sql.files.maxPartitionBytes` tuned down (payloads are MBs,
 * not KBs — target ≤ a few hundred rows per task), processed with
 * `mapPartitions`-style batching so the decoder is initialized once
 * per task, never per row.
 */
object Multimodal {

  /** media metadata struct carried next to every payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),         // image|audio|video
    StructField("format", StringType, nullable = true),        // jpeg|png|wav|mp4…
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", mediaMetaType, nullable = true)))

  // ------------------------------------------------------------------ STUBS
  // Fake header layout (deterministic, used by tests and the demo pipeline):
  //   bytes 0-3  magic "GRFT"
  //   bytes 4-7  width  (big-endian int)
  //   bytes 8-11 height (big-endian int)
  //   rest       payload noise

  /** Build a fake payload for tests/demos. */
  def fakeImagePayload(width: Int, height: Int, seed: Long): Array[Byte] = {
    val noise = 64
    val buf = java.nio.ByteBuffer.allocate(12 + noise)
    buf.put("GRFT".getBytes("US-ASCII")).putInt(width).putInt(height)
    var i = 0
    var x = seed
    while (i < noise) {
      x = TextUtil.splitmix64(x)
      buf.put((x & 0xff).toByte)
      i += 1
    }
    buf.array()
  }

  /**
   * STUB image decode: parses the fake header → (width, height, n_pixels).
   * A real implementation would decode JPEG/PNG here; the Spark contract
   * (binary in, struct out, null on corrupt payload) is the real part.
   */
  def decodeImageStub(payload: Column): Column =
    when(payload.isNull.or(length(payload) < 12), lit(null))
      .otherwise(struct(
        conv(hex(substring(payload, 5, 4)), 16, 10).cast("int").as("width"),
        conv(hex(substring(payload, 9, 4)), 16, 10).cast("int").as("height"),
        (conv(hex(substring(payload, 5, 4)), 16, 10).cast("long") *
          conv(hex(substring(payload, 9, 4)), 16, 10).cast("long")).as("n_pixels")))

  /**
   * STUB feature extraction: deterministic pseudo-embedding from payload
   * bytes — xxhash64-seeded values per dimension, L2-normalizable, dtype
   * float. Stands in for a vision encoder; output feeds [[Similarity]].
   */
  def featurizeStub(payload: Column, dims: Int = 16): Column =
    when(payload.isNull, lit(null))
      .otherwise(transform(sequence(lit(0), lit(dims - 1)), i =>
        (xxhash64(payload, i).cast("double") / lit(Long.MaxValue.toDouble)).cast("float")))

  /**
   * STUB resize: rewrite the fake header to the target dimensions and keep
   * the payload bytes. A real implementation would re-encode pixels; the
   * Spark contract — binary in, binary out, null-safe, new dimensions
   * visible to a subsequent [[decodeImageStub]] — is the real part.
   */
  def resizeStub(payload: Column, width: Int, height: Int): Column = {
    val dims = java.nio.ByteBuffer.allocate(8).putInt(width).putInt(height).array()
    when(payload.isNull.or(length(payload) < 12), lit(null))
      .otherwise(concat(
        substring(payload, 1, 4), lit(dims), substring(payload, 13, Int.MaxValue)))
  }

  /**
   * STUB frame sampling: treat the payload as `frameCount` logical frames,
   * emit every `everyN`-th frame index with a per-frame byte slice. Real
   * video decode would substitute here; the explode/partition shape is real.
   */
  def sampleFrames(df: DataFrame, payloadCol: String, frameCount: Int, everyN: Int): DataFrame =
    df.withColumn("frame_idx",
        explode(sequence(lit(0), lit(frameCount - 1), lit(everyN))))
      .withColumn("frame_bytes",
        substring(col(payloadCol), (col("frame_idx") * 4 + 13).cast("int"), lit(4)))

  /**
   * Per-partition batched decode — the execution shape for real codecs:
   * the (stub) decoder is constructed ONCE per partition (where a native
   * decoder would be initialized), then applied row-by-row over the
   * partition iterator. Output schema: media_id, width, height, n_pixels.
   */
  def decodeBatched(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_pixels", LongType, nullable = true)))
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    val rdd = df.queryExecution.toRdd.mapPartitions { rows =>
      // STUB decoder instance: one per task, like a native codec handle
      val decoder = new StubDecoder
      rows.map { internal =>
        val id = internal.getLong(idIdx)
        val payload = if (internal.isNullAt(payloadIdx)) null else internal.getBinary(payloadIdx)
        decoder.decode(payload) match {
          case Some((w, h)) =>
            org.apache.spark.sql.catalyst.InternalRow(id, w, h, w.toLong * h.toLong)
          case None =>
            org.apache.spark.sql.catalyst.InternalRow(id, null, null, null)
        }
      }
    }
    org.apache.spark.sql.GraftInternal.fromInternalRdd(spark, rdd, outSchema)
  }

  /** STUB decoder object — stands in for a per-task native codec handle. */
  final class StubDecoder {
    def decode(payload: Array[Byte]): Option[(Int, Int)] = {
      if (payload == null || payload.length < 12) return None
      if (!(payload(0) == 'G' && payload(1) == 'R' && payload(2) == 'F' && payload(3) == 'T')) return None
      val buf = java.nio.ByteBuffer.wrap(payload, 4, 8)
      Some((buf.getInt(), buf.getInt()))
    }
  }

  // --------------------------------------------------------- REAL IMAGE PATH
  // javax.imageio (JDK built-in) — PNG and JPEG decode/encode, no native
  // libraries. Deterministic synthetic PNGs let an external oracle certify
  // the decode: channel G is an x-gradient, so the pixel sums below can only
  // be produced by actually inflating the IDAT stream — parsing the IHDR
  // header alone cannot fake them.

  /** Deterministic PNG from an id: width `8 + id%9`, height `8 + id%7`,
    * R solid `(id*7)%256`, G gradient `(x*255)/(w-1)`, B solid `(id*31)%256`.
    * PNG is lossless, so decoded channel sums are exactly the closed forms
    * a SQL oracle can compute from `id` alone. */
  def pngPayload(id: Long): Array[Byte] = {
    val w = (8 + (id % 9)).toInt
    val h = (8 + (id % 7)).toInt
    val r = ((id * 7) % 256).toInt
    val b = ((id * 31) % 256).toInt
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = (x * 255) / (w - 1)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream(256)
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic checker-family PNG from an id: square side
    * s = 10 + id%5, all three channels equal
    * gray(x, y) = ((id ⌊/⌋ (x+1) + 3x + 5y) mod 2) · 255 — a pattern a
    * SQL oracle reproduces in integer arithmetic. `flipFirst` inverts
    * pixel (0, 0): the planted near-duplicate (aHash differs in exactly
    * one bit after the 8×8 reduction). */
  def checkerPngPayload(id: Long, flipFirst: Boolean): Array[Byte] = {
    val s = (10 + (id % 5)).toInt
    val img = new java.awt.image.BufferedImage(s, s,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < s) {
      var x = 0
      while (x < s) {
        var g = (((id / (x + 1)) + 3L * x + 5L * y) % 2L).toInt * 255
        if (flipFirst && x == 0 && y == 0) g = 255 - g
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream(256)
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Checker-PNG media table: `media_id = id + idOffset`, payload from
    * the BASE id (so an offset copy with `flipFirst` is a planted
    * near-duplicate of the original). */
  def syntheticCheckerPngMedia(df: DataFrame, idCol: String,
                               idOffset: Long = 0L,
                               flipFirst: Boolean = false): DataFrame = {
    val mk = udf((id: Long) => checkerPngPayload(id, flipFirst))
    df.select(col(idCol).cast("long").as("__id"))
      .select((col("__id") + idOffset).as("media_id"),
        mk(col("__id")).as("payload"))
  }

  /**
   * Perceptual average-hash (aHash) of image payloads: decode → 8×8
   * nearest-neighbor reduction → 64-bit mask, bit (8y + x) set iff the
   * cell's integer channel sum exceeds the image mean
   * (64 · (r+g+b) > Σ(r+g+b) — no division, exact). The standard
   * near-duplicate key for image corpora: one long per image, hamming
   * distance ≈ perceptual difference. Per-partition-initialized
   * mapPartitions over raw payload bytes (the [[decodeImageBatched]]
   * shape); undecodable/null payloads hash to null.
   */
  def aHash64Batched(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ahash", LongType, nullable = true)))
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    val rdd = df.queryExecution.toRdd.mapPartitions { rows =>
      rows.map { internal =>
        val id = internal.getLong(idIdx)
        val payload =
          if (internal.isNullAt(payloadIdx)) null else internal.getBinary(payloadIdx)
        val h = aHashOf(payload)
        org.apache.spark.sql.catalyst.InternalRow(id,
          h.map(java.lang.Long.valueOf).orNull)
      }
    }
    org.apache.spark.sql.GraftInternal.fromInternalRdd(spark, rdd, outSchema)
  }

  private[pipeline] def aHashOf(payload: Array[Byte]): Option[Long] = {
    if (payload == null) return None
    try {
      val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (src == null) return None
      val (sw, sh) = (src.getWidth, src.getHeight)
      val g = new Array[Long](64)
      var total = 0L
      var y = 0
      while (y < 8) {
        val sy = (y.toLong * sh / 8).toInt
        var x = 0
        while (x < 8) {
          val sx = (x.toLong * sw / 8).toInt
          val rgb = src.getRGB(sx, sy)
          val s = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          g(y * 8 + x) = s
          total += s
          x += 1
        }
        y += 1
      }
      var hash = 0L
      var i = 0
      while (i < 64) {
        if (64L * g(i) > total) hash |= (1L << i)
        i += 1
      }
      Some(hash)
    } catch { case _: Exception => None }
  }

  /**
   * Exact hamming-threshold near-duplicate pairs over a (id, ahash)
   * frame via 16-bit BAND BLOCKING: hamming ≤ 3 with 4 disjoint 16-bit
   * bands guarantees (pigeonhole) at least one band is untouched, so
   * candidates come from 4 equi-joins on (band, value) — recall 1, no
   * all-pairs join — and the bit_count(xor) verify is codegen. The LSH
   * discipline of [[Dedup.nearDuplicatePairs]] applied to perceptual
   * hashes; at web scale add the hot-band occupancy guard if a constant
   * hash floods one band value (the AutoBound move).
   */
  def aHashNearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x16-bit banding guarantees recall only to hamming 3, got $maxHamming")
    val bands = hashes.where(col("ahash").isNotNull)
      .select(col("media_id"), col("ahash"),
        explode(array((0 until 4).map(j =>
          struct(lit(j).as("j"),
            shiftrightunsigned(col("ahash"), 16 * j)
              .bitwiseAND(lit(0xFFFFL)).as("v"))): _*)).as("__b"))
      .select(col("media_id"), col("ahash"),
        col("__b.j").as("__j"), col("__b.v").as("__v"))
    val l = bands.select(col("media_id").as("id_a"), col("ahash").as("__ha"),
      col("__j"), col("__v"))
    val r = bands.select(col("media_id").as("id_b"), col("ahash").as("__hb"),
      col("__j"), col("__v"))
    l.join(r, Seq("__j", "__v"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Decoded-image record: dimensions + exact per-channel pixel sums. */
  final case class DecodedImage(width: Int, height: Int,
                                sumR: Long, sumG: Long, sumB: Long)

  /**
   * Per-task image decoder handle (construct ONCE per partition, like a
   * native codec). Decodes any `javax.imageio`-supported container (PNG,
   * JPEG, GIF, BMP); returns None on null/corrupt/unrecognized payloads so
   * bad rows degrade to NULL instead of failing the task.
   */
  final class ImageDecoder {
    def decode(payload: Array[Byte]): Option[DecodedImage] = {
      if (payload == null || payload.length < 8) return None
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        if (img == null) return None // unrecognized container
        val w = img.getWidth; val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        Some(DecodedImage(w, h, sr, sg, sb))
      } catch { case _: Exception => None }
    }
  }

  /**
   * REAL per-pixel feature extraction (same per-task decoder discipline
   * as [[decodeImageBatched]]): horizontal total-variation energy and
   * distinct-value count per channel — quality/complexity signals for
   * image-corpus filtering (flat fills score 0 energy and 1 distinct;
   * dithered noise scores high on both). Exact integer outputs, so the
   * oracle certifies by hash — and neither column can come from a
   * header parse or the q85 sums: both need the actual pixel grid.
   */
  def imageFeaturesBatched(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("tv_r", LongType, nullable = true),
      StructField("tv_g", LongType, nullable = true),
      StructField("tv_b", LongType, nullable = true),
      StructField("n_distinct_g", IntegerType, nullable = true)))
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    val rdd = df.queryExecution.toRdd.mapPartitions { rows =>
      rows.map { internal =>
        val id = internal.getLong(idIdx)
        val payload = if (internal.isNullAt(payloadIdx)) null else internal.getBinary(payloadIdx)
        val img = if (payload == null || payload.length < 8) null
          else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            catch { case _: Exception => null }
        if (img == null)
          org.apache.spark.sql.catalyst.InternalRow(id, null, null, null, null, null, null)
        else {
          val w = img.getWidth; val h = img.getHeight
          var tr = 0L; var tg = 0L; var tb = 0L
          val seenG = new java.util.BitSet(256)
          var y = 0
          while (y < h) {
            var x = 0; var pr = 0; var pg = 0; var pb = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
              if (x > 0) {
                tr += math.abs(r - pr); tg += math.abs(g - pg); tb += math.abs(b - pb)
              }
              seenG.set(g)
              pr = r; pg = g; pb = b
              x += 1
            }
            y += 1
          }
          org.apache.spark.sql.catalyst.InternalRow(id, w, h, tr, tg, tb,
            seenG.cardinality())
        }
      }
    }
    org.apache.spark.sql.GraftInternal.fromInternalRdd(spark, rdd, outSchema)
  }

  /**
   * REAL per-partition batched decode (PNG/JPEG via `javax.imageio`): the
   * decoder handle is constructed once per task, then applied row-by-row
   * over the partition iterator — the execution shape a native codec needs.
   * Output: media_id, width, height, n_pixels, sum_r, sum_g, sum_b
   * (sums are exact longs — oracle-hashable, no float tolerance).
   */
  def decodeImageBatched(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_pixels", LongType, nullable = true),
      StructField("sum_r", LongType, nullable = true),
      StructField("sum_g", LongType, nullable = true),
      StructField("sum_b", LongType, nullable = true)))
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    val rdd = df.queryExecution.toRdd.mapPartitions { rows =>
      val decoder = new ImageDecoder // once per task
      rows.map { internal =>
        val id = internal.getLong(idIdx)
        val payload = if (internal.isNullAt(payloadIdx)) null else internal.getBinary(payloadIdx)
        decoder.decode(payload) match {
          case Some(d) =>
            org.apache.spark.sql.catalyst.InternalRow(id, d.width, d.height,
              d.width.toLong * d.height.toLong, d.sumR, d.sumG, d.sumB)
          case None =>
            org.apache.spark.sql.catalyst.InternalRow(id, null, null, null, null, null, null)
        }
      }
    }
    org.apache.spark.sql.GraftInternal.fromInternalRdd(spark, rdd, outSchema)
  }

  /**
   * REAL resize: decode (any imageio container) → nearest-neighbor rescale
   * (explicit source-pixel mapping `srcX = x*srcW/dstW` — deterministic
   * across JVMs, unlike the interpolating Graphics2D paths, and immune to
   * AWT op/raster type-compatibility quirks) → re-encode PNG.
   * Null in / undecodable → null out, same contract as decode.
   */
  def resizeImagePayload(payload: Array[Byte], width: Int, height: Int): Array[Byte] = {
    if (payload == null) return null
    try {
      val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (src == null) return null
      val sw = src.getWidth; val sh = src.getHeight
      val dst = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        val srcY = (y.toLong * sh / height).toInt
        var x = 0
        while (x < width) {
          dst.setRGB(x, y, src.getRGB((x.toLong * sw / width).toInt, srcY))
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream(256)
      javax.imageio.ImageIO.write(dst, "png", out)
      out.toByteArray
    } catch { case _: Exception => null }
  }

  /** Column form of [[resizeImagePayload]] (JVM UDF — binary in/out). */
  def resizeImage(payload: Column, width: Int, height: Int): Column = {
    val f = udf((p: Array[Byte]) => resizeImagePayload(p, width, height))
    f(payload)
  }

  /** Synthetic REAL-PNG media table from any integral id column. */
  def syntheticPngMedia(df: DataFrame, idCol: String): DataFrame = {
    val mkPayload = udf((id: Long) => pngPayload(id))
    df.select(col(idCol).cast("long").as("media_id"))
      .withColumn("payload", mkPayload(col("media_id")))
      .withColumn("meta", struct(
        lit("image").as("kind"), lit("png").as("format"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"), lit(null).cast("int").as("sample_rate")))
  }

  // ---------------------------------------------------------- REAL VIDEO PATH
  // Minimal RIFF/AVI container demux (pure JVM — the RIFF chunk grammar is
  // public knowledge): video frames ride as '00dc'/'00db' chunks inside the
  // 'movi' LIST. Frames encoded as PNG (the MPNG fourcc family) decode
  // losslessly through the same ImageDecoder as still images, so frame
  // extraction is certifiable against an exact oracle. Compressed-codec
  // frames (H.264 etc.) remain out of scope — the demux returns their raw
  // bytes and the decoder returns None, degrading those rows to NULL.

  /** Build a minimal MJPEG/MPNG-style AVI from encoded frame payloads:
    * RIFF('AVI ' LIST('hdrl' avih) LIST('movi' '00dc'×frames)). Enough
    * structure for any RIFF walker; frames carried verbatim. */
  def aviFromFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    def chunk(fourcc: String, data: Array[Byte]): Array[Byte] = {
      val pad = data.length % 2
      val buf = java.nio.ByteBuffer.allocate(8 + data.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(fourcc.getBytes("US-ASCII")).putInt(data.length).put(data)
      buf.array()
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("US-ASCII") ++ body)
    val avih = {
      // 56-byte main header: frame interval, total frames, the rest zeroed
      val b = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(33333).putInt(0).putInt(0).putInt(0).putInt(frames.length)
      b.array()
    }
    val hdrl = list("hdrl", chunk("avih", avih))
    val movi = list("movi", frames.toArray.flatMap(f => chunk("00dc", f)))
    chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)
  }

  /** Demux: the encoded payload of every video frame chunk, in stream
    * order. Null/corrupt/non-AVI input → empty. Bounds-checked walk,
    * frame count capped (decompression-bomb guard). */
  def aviFrames(payload: Array[Byte], maxFrames: Int = 4096): Array[Array[Byte]] = {
    import scala.collection.mutable.ArrayBuffer
    if (payload == null || payload.length < 12) return Array.empty
    val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    try {
      if (fourcc() != "RIFF") return Array.empty
      buf.getInt() // riff size
      if (fourcc() != "AVI ") return Array.empty
      val out = ArrayBuffer.empty[Array[Byte]]
      def walk(end: Int): Unit = {
        while (buf.position() + 8 <= end && out.length < maxFrames) {
          val cc = fourcc()
          val size = buf.getInt()
          if (size < 0 || buf.position() + size > end) return
          val next = buf.position() + size + (size % 2)
          if (cc == "LIST" && size >= 4) {
            val lt = fourcc()
            if (lt == "movi" || lt == "hdrl" || lt == "strl")
              walk(buf.position() + size - 4)
          } else if ((cc.endsWith("dc") || cc.endsWith("db")) && size > 0) {
            val f = new Array[Byte](size)
            buf.get(f)
            out += f
          }
          if (next > end || next < 0) return
          buf.position(math.min(next, end))
        }
      }
      walk(payload.length)
      out.toArray
    } catch { case _: Exception => Array.empty }
  }

  /**
   * REAL frame sampling: demux the AVI container, keep every `everyN`-th
   * frame, decode each kept frame (PNG/JPEG via the per-task
   * [[ImageDecoder]]) — the execution shape of [[decodeImageBatched]]
   * extended with the frame explode. Output: media_id, frame_idx, width,
   * height, sum_r, sum_g, sum_b (one row per SAMPLED decodable frame;
   * undecodable frames and non-AVI payloads emit nothing).
   */
  def sampleFramesDecoded(df: DataFrame, everyN: Int): DataFrame = {
    require(everyN >= 1)
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sum_r", LongType, nullable = true),
      StructField("sum_g", LongType, nullable = true),
      StructField("sum_b", LongType, nullable = true)))
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    val rdd = df.queryExecution.toRdd.mapPartitions { rows =>
      val decoder = new ImageDecoder // once per task
      rows.flatMap { internal =>
        val id = internal.getLong(idIdx)
        val payload = if (internal.isNullAt(payloadIdx)) null else internal.getBinary(payloadIdx)
        aviFrames(payload).iterator.zipWithIndex
          .filter(_._2 % everyN == 0)
          .flatMap { case (frame, idx) =>
            decoder.decode(frame).map(d =>
              org.apache.spark.sql.catalyst.InternalRow(id, idx, d.width, d.height,
                d.sumR, d.sumG, d.sumB))
          }
      }
    }
    org.apache.spark.sql.GraftInternal.fromInternalRdd(spark, rdd, outSchema)
  }

  /** Synthetic REAL-AVI media table: `2 + id%3` PNG frames per id, frame f
    * encoded from [[pngPayload]]`(id*7 + f)` — every decoded dimension and
    * channel sum is a closed form of (id, f) an external oracle can mirror. */
  def syntheticAviMedia(df: DataFrame, idCol: String): DataFrame = {
    val mkAvi = udf((id: Long) =>
      aviFromFrames((0 until (2 + (id % 3)).toInt).map(f => pngPayload(id * 7 + f))))
    df.select(col(idCol).cast("long").as("media_id"))
      .withColumn("payload", mkAvi(col("media_id")))
  }

  /**
   * REAL feature extraction from decoded pixels: a `grid`×`grid`
   * mean-pooled RGB patch grid → `3·grid²` floats in [0,255], row-major
   * (cy, cx, r/g/b). Not a learned encoder — but an honest, deterministic
   * image embedding computed from the REAL decode (cell sums are exact
   * integers; the mean is one IEEE division), ready for [[Similarity]]'s
   * cosine/ANN machinery. Null/undecodable → null.
   */
  def featurizePixelsPayload(payload: Array[Byte], grid: Int): Array[Float] = {
    if (payload == null) return null
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) return null
      val w = img.getWidth; val h = img.getHeight
      if (w < grid || h < grid) return null
      val out = new Array[Float](3 * grid * grid)
      var cy = 0
      while (cy < grid) {
        val y0 = cy * h / grid; val y1 = (cy + 1) * h / grid
        var cx = 0
        while (cx < grid) {
          val x0 = cx * w / grid; val x1 = (cx + 1) * w / grid
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = ((y1 - y0) * (x1 - x0)).toFloat
          val base = (cy * grid + cx) * 3
          out(base) = sr / n; out(base + 1) = sg / n; out(base + 2) = sb / n
          cx += 1
        }
        cy += 1
      }
      out
    } catch { case _: Exception => null }
  }

  /** Column form of [[featurizePixelsPayload]] (JVM UDF). */
  def featurizePixels(payload: Column, grid: Int = 4): Column = {
    val f = udf((p: Array[Byte]) => featurizePixelsPayload(p, grid))
    f(payload)
  }

  // ---------------------------------------------------------- REAL AUDIO PATH
  // RIFF/WAVE PCM16 — the same chunk grammar as AVI: 'fmt ' carries the
  // sample layout, 'data' carries little-endian 16-bit samples. Pure JVM,
  // decode stats are exact integers → oracle-certifiable.

  /** Minimal mono PCM16 WAV from samples (RIFF('WAVE' 'fmt ' 'data')). */
  def wavFromSamples(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)                  // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
      .putShort(2).putShort(16)                  // block align, bits
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decoded-audio record: exact integer stats of the PCM stream. */
  final case class DecodedAudio(sampleRate: Int, nSamples: Long,
                                sumAbs: Long, peak: Int)

  /** Decode a mono PCM16 WAV payload; None on null/corrupt/non-WAV or
    * unsupported layouts (stereo, float, compressed). Bounds-checked. */
  def decodeWav(payload: Array[Byte]): Option[DecodedAudio] = {
    if (payload == null || payload.length < 44) return None
    val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    try {
      if (fourcc() != "RIFF") return None
      buf.getInt()
      if (fourcc() != "WAVE") return None
      var rate = -1
      var ok = false
      var stats: Option[DecodedAudio] = None
      while (buf.remaining() >= 8 && stats.isEmpty) {
        val cc = fourcc()
        val size = buf.getInt()
        if (size < 0 || size > buf.remaining()) return None
        if (cc == "fmt " && size >= 16) {
          val fmt = buf.getShort(); val ch = buf.getShort()
          rate = buf.getInt(); buf.getInt(); buf.getShort()
          val bits = buf.getShort()
          ok = fmt == 1 && ch == 1 && bits == 16
          buf.position(buf.position() + size - 16 + (size % 2))
        } else if (cc == "data" && ok && rate > 0) {
          val n = size / 2
          var sumAbs = 0L; var peak = 0
          var i = 0
          while (i < n) {
            val s = buf.getShort().toInt
            val a = math.abs(s)
            sumAbs += a
            if (a > peak) peak = a
            i += 1
          }
          stats = Some(DecodedAudio(rate, n.toLong, sumAbs, peak))
        } else {
          buf.position(buf.position() + size + (size % 2))
        }
      }
      stats
    } catch { case _: Exception => None }
  }

  /** Per-partition batched WAV stats: media_id, sample_rate, n_samples,
    * sum_abs, peak — exact longs, same execution shape as the image path. */
  def audioStatsBatched(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_samples", LongType, nullable = true),
      StructField("sum_abs", LongType, nullable = true),
      StructField("peak", IntegerType, nullable = true)))
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    val rdd = df.queryExecution.toRdd.mapPartitions { rows =>
      rows.map { internal =>
        val id = internal.getLong(idIdx)
        val payload = if (internal.isNullAt(payloadIdx)) null else internal.getBinary(payloadIdx)
        decodeWav(payload) match {
          case Some(a) =>
            org.apache.spark.sql.catalyst.InternalRow(id, a.sampleRate, a.nSamples,
              a.sumAbs, a.peak)
          case None =>
            org.apache.spark.sql.catalyst.InternalRow(id, null, null, null, null)
        }
      }
    }
    org.apache.spark.sql.GraftInternal.fromInternalRdd(spark, rdd, outSchema)
  }

  /** Synthetic REAL-WAV media: `64 + id%32` samples at `8000 + (id%4)·4000`
    * Hz, sample i = `((id·31 + i·17) mod 2003) − 1001` — every decoded stat
    * is a closed form of id an external oracle can mirror. */
  def syntheticWavMedia(df: DataFrame, idCol: String): DataFrame = {
    val mkWav = udf((id: Long) => wavFromSamples(
      (0 until (64 + id % 32).toInt).map(i =>
        (((id * 31 + i * 17) % 2003) - 1001).toShort).toArray,
      8000 + (id % 4).toInt * 4000))
    df.select(col(idCol).cast("long").as("media_id"))
      .withColumn("payload", mkWav(col("media_id")))
  }

  /** Demo media table derived from any id column — used by tests/bench. */
  def syntheticMedia(df: DataFrame, idCol: String): DataFrame = {
    val mkPayload = udf((id: Long) =>
      fakeImagePayload(64 + (id % 64).toInt, 64 + (id % 48).toInt, id))
    df.select(col(idCol).cast("long").as("media_id"))
      .withColumn("payload", mkPayload(col("media_id")))
      .withColumn("meta", struct(
        lit("image").as("kind"), lit("grft").as("format"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"), lit(null).cast("int").as("sample_rate")))
  }
}
