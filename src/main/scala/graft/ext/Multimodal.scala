package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.unsafe.Platform

/**
 * Multimodal-column plumbing (SURVEY.md §0 north star): image/audio/video
 * payloads travel as opaque `binary` columns with typed metadata; decode /
 * feature-extraction runs as a batched `mapPartitions` over the typed
 * Dataset — the Scala analogue of arrow-batched `mapInPandas`: partition
 * iterator → fixed-size batches → decoded rows, so a real codec could
 * amortize per-batch setup (model load, pinned buffers) exactly where the
 * stub loops.
 *
 * THE DECODE IS A DETERMINISTIC STUB — this container has no image/audio
 * codecs. Dimensions derive from payload length and features from
 * xxHash64 of the bytes, so results are reproducible and testable. The
 * Spark-side plumbing (schema, batch shape, partitioning) is real.
 */
object Multimodal {

  /** One decoded media asset (the stub's output schema). */
  final case class Decoded(
      asset_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      features: Array[Float])

  val DecodeBatchSize = 64

  /** Normalize any (id, payload) table into the asset schema. */
  def asAssets(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      col(payloadCol).cast("binary").as("media"))

  /** STUB decode of one asset — a real implementation calls the codec
   *  here; everything around it stays unchanged. */
  def decodeStub(assetId: Long, media: Array[Byte]): Decoded = {
    val len = if (media == null) 0 else media.length
    val width = 1 + len % 512
    val height = 1 + (len * 7) % 512
    val features = Array.tabulate(8) { j =>
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(media, Platform.BYTE_ARRAY_OFFSET, len, j.toLong)
      (math.floorMod(h, 2000L) - 1000L) / 1000.0f
    }
    Decoded(assetId, width, height, 3, features)
  }

  /**
   * Batched decode over the asset table. Executor-side only: each
   * partition's iterator is consumed in [[DecodeBatchSize]] groups
   * (codec-amortization point), yielding the decoded schema
   * (asset_id, width, height, channels, features array<float>).
   */
  def decodeImages(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap { batch =>
          // per-batch setup for a real codec would go here
          batch.iterator.map { case (id, bytes) => decodeStub(id, bytes) }
        }
      }
      .toDF()
  }

  /** Fixed-stride frame sampling from a video payload: every `everyN`-th
   *  block of `frameBytes` bytes, as array<binary>. Pure expression —
   *  no decode, no shuffle. */
  def frameSample(video: Column, frameBytes: Int, everyN: Int): Column = {
    // frames = full frameBytes blocks in the payload; sampled = every
    // everyN-th of those, INCLUDING a trailing one (flooring the payload
    // by frameBytes*everyN would drop up to everyN-1 complete frames)
    val fullFrames = floor(length(video) / frameBytes).cast("int")
    val nFrames = when(fullFrames > 0,
      floor((fullFrames - 1) / everyN).cast("int") + 1).otherwise(lit(0))
    when(nFrames > 0,
      transform(sequence(lit(0), nFrames - 1),
        i => substring(video, (i * frameBytes * everyN + 1).cast("int"), lit(frameBytes))))
      .otherwise(array().cast("array<binary>"))
  }

  /** Resize plan (aspect-preserving bound to `maxDim`): pure arithmetic
   *  on metadata columns — the physical resample belongs in the decode
   *  batch, this computes the target geometry. */
  def resizeTarget(width: Column, height: Column, maxDim: Int): (Column, Column) = {
    // nullif: a 0x0 metadata row would DIVIDE_BY_ZERO under ANSI mode;
    // it resolves to a (0, 0) plan instead
    val scale = coalesce(
      lit(maxDim.toDouble) / nullif(greatest(width, height).cast("double"), lit(0.0)),
      lit(0.0))
    val clamped = least(scale, lit(1.0))
    (ceil(width * clamped).cast("int"), ceil(height * clamped).cast("int"))
  }
}
