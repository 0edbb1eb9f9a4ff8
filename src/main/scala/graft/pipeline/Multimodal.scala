package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with a typed metadata struct, processed per-partition.
 *
 * The actual codec work (JPEG decode, resampling, frame extraction) needs
 * native libraries not present in this environment — those kernels are
 * deterministic STUBS (clearly marked below) that parse only our fake
 * header layout. Everything Spark-side is real and tested: schemas, batch
 * iteration, partition sizing, null handling, and the featurize → ANN
 * hand-off (stub features are valid `array<float>` embeddings that flow
 * straight into [[Similarity]]).
 *
 * At 100 TB: payloads should be read from a binary-file source or parquet
 * with `spark.sql.files.maxPartitionBytes` tuned down (payloads are MBs,
 * not KBs — target ≤ a few hundred rows per task), processed with
 * `mapPartitions`-style batching so any native decoder is initialized once
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
