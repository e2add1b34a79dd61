package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.unsafe.Platform

/**
 * Multimodal-column plumbing (SURVEY.md §0 north star): image/audio/video
 * payloads travel as opaque `binary` columns with typed metadata; decode /
 * feature-extraction runs as a batched `mapPartitions` over the typed
 * Dataset — the Scala analogue of arrow-batched `mapInPandas`: partition
 * iterator → fixed-size batches → decoded rows, so per-batch codec setup
 * (buffers, model load) amortizes exactly where the loop groups.
 *
 * IMAGE decode is REAL: [[decodeImage]] runs the JDK's own codecs
 * (`javax.imageio` ships PNG/JPEG/BMP/GIF readers — no external
 * dependency), extracting true dimensions, channel count, and an 8-bin
 * luminance histogram from the decoded pixels. Payloads no codec
 * recognizes (and audio/video, which the JDK cannot decode) fall back to
 * [[decodeStub]] — deterministic pseudo-features from payload length and
 * xxHash64, loudly documented as such — so the batch pipeline never
 * drops a row.
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

  // ImageIO's default scratch-file cache turns every decode into disk
  // IO; in-memory streams are strictly better for <1 MB assets
  javax.imageio.ImageIO.setUseCache(false)

  /** REAL image decode through the JDK codecs. Returns None when no
   *  installed reader recognizes the payload (corrupt bytes, or a format
   *  the JDK doesn't ship — callers fall back to [[decodeStub]]).
   *
   *  Features are an 8-bin normalized luminance histogram (integer
   *  BT.601 weights) computed from the DECODED pixels, row-wise through
   *  a reused buffer — bounded memory regardless of image size. */
  def decodeImage(assetId: Long, media: Array[Byte]): Option[Decoded] = {
    if (media == null || media.length == 0) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val channels = img.getColorModel.getNumComponents
        val hist = new Array[Long](8)
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val rgb = row(x)
            val lum = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
              114 * (rgb & 0xFF)) / 1000
            hist(lum >> 5) += 1L
            x += 1
          }
          y += 1
        }
        val total = (w.toLong * h).toFloat
        Some(Decoded(assetId, w, h, channels, hist.map(_ / total)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic PNG synthesis (pure JDK, encoder side of the same
   *  codec stack): a solid `gray`-level RGB image — fixture generator
   *  for planted-ground-truth decode tests, where width/height/argmax
   *  luminance bin are all replayable from the generating arithmetic. */
  def encodePng(width: Int, height: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g = gray & 0xFF
    val rgb = (g << 16) | (g << 8) | g
    val row = Array.fill(width)(rgb)
    var y = 0
    while (y < height) { img.setRGB(0, y, width, 1, row, 0, width); y += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic per-PIXEL PNG synthesis (the [[encodePng]] generator
   *  with a gray function instead of one level): fixture generator for
   *  structured-content decode tests (dHash near-dup planting), where
   *  every pixel's gray replays from the generating arithmetic. PNG is
   *  lossless and equal RGB channels make BT.601 luminance equal the
   *  gray level exactly ((299+587+114)·g/1000 = g), so hashes computed
   *  from DECODED pixels are replayable. */
  def encodePngPixels(width: Int, height: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val row = new Array[Int](width)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val g = gray(x, y) & 0xFF
        row(x) = (g << 16) | (g << 8) | g
        x += 1
      }
      img.setRGB(0, y, width, 1, row, 0, width)
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 64-bit difference hash (dHash — the standard perceptual-hash family
   *  member built on luminance GRADIENTS, robust to brightness shifts):
   *  decode through the JDK codecs, area-average the BT.601 luminance
   *  onto a 9×8 grid, then bit (x,y) = grid(x,y) < grid(x+1,y) at index
   *  y*8+x. A 9×8 source image maps each grid cell to exactly one pixel,
   *  so fixture hashes replay from the generating arithmetic (the q27
   *  planted-ground-truth technique). None when no codec recognizes the
   *  payload. */
  def dHash(media: Array[Byte]): Option[Long] = {
    if (media == null || media.length == 0) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media))
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      val gw = 9
      val gh = 8
      // area-averaged luminance grid: each cell averages its pixel block
      // (block bounds floor-divided; always >= 1 pixel even when the
      // image is smaller than the grid)
      val grid = Array.ofDim[Double](gh, gw)
      val rowBuf = new Array[Int](w)
      val sums = Array.ofDim[Long](gh, gw)
      val counts = Array.ofDim[Long](gh, gw)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, rowBuf, 0, w)
        val cy = math.min(gh - 1, y * gh / h)
        var x = 0
        while (x < w) {
          val rgb = rowBuf(x)
          val lum = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
            114 * (rgb & 0xFF)) / 1000
          val cx = math.min(gw - 1, x * gw / w)
          sums(cy)(cx) += lum
          counts(cy)(cx) += 1L
          x += 1
        }
        y += 1
      }
      var cy = 0
      while (cy < gh) {
        var cx = 0
        while (cx < gw) {
          // images smaller than the grid leave empty cells; inherit the
          // nearest filled neighbor to the left/above so comparisons
          // stay defined (equal cells hash to 0 bits)
          grid(cy)(cx) =
            if (counts(cy)(cx) > 0) sums(cy)(cx).toDouble / counts(cy)(cx)
            else if (cx > 0) grid(cy)(cx - 1)
            else if (cy > 0) grid(cy - 1)(cx)
            else 0.0
          cx += 1
        }
        cy += 1
      }
      var hash = 0L
      var by = 0
      while (by < 8) {
        var bx = 0
        while (bx < 8) {
          if (grid(by)(bx) < grid(by)(bx + 1)) hash |= 1L << (by * 8 + bx)
          bx += 1
        }
        by += 1
      }
      Some(hash)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** dHash over the asset table, emitting (asset_id, dhash) with NULL
   *  for payloads no codec recognizes (pair miners drop nulls; nothing
   *  is silently stubbed into a hash that could fake a duplicate).
   *  Per-item decode is self-contained, so no batch-level amortization
   *  applies — a plain per-row map, unlike [[decodeImages]]. */
  def imageDHashes(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, dHash(bytes)) })
      .toDF("asset_id", "dhash")
  }

  /** STUB decode of one asset — the fallback for payloads no JDK codec
   *  recognizes (and for audio/video). Deterministic: dimensions derive
   *  from payload length, features from xxHash64 of the bytes. */
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
   * Real [[decodeImage]] first; [[decodeStub]] for anything the JDK
   * codecs reject, so every asset row yields exactly one output row.
   */
  def decodeImages(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap { batch =>
          // per-batch setup for heavier codecs would go here
          batch.iterator.map { case (id, bytes) =>
            decodeImage(id, bytes).getOrElse(decodeStub(id, bytes))
          }
        }
      }
      .toDF()
  }

  /** One decoded audio asset: true container metadata plus signal
   *  features from the decoded PCM frames. `sample_rate == 0` marks the
   *  undecodable-payload fallback row ([[audioStub]]). */
  final case class DecodedAudio(
      asset_id: Long,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      rms: Double,
      zero_crossings: Long,
      peak: Int)

  /** REAL audio decode through the JDK's sampled-audio stack
   *  (`javax.sound.sampled` ships WAV/AIFF/AU readers — no external
   *  dependency). Extracts the container's true sample rate / channel
   *  count / frame length, then streams the PCM frames once through a
   *  reused chunk buffer — bounded memory regardless of clip length —
   *  accumulating RMS amplitude, zero-crossing count (channel 0 sign
   *  flips), and peak |sample|. PCM_SIGNED 16-bit only (what the JDK
   *  WAV writer emits); other encodings fall back like corrupt bytes.
   *
   *  Determinism: features accumulate sequentially in frame order
   *  within one asset, so results are independent of partitioning. */
  def decodeAudio(assetId: Long, media: Array[Byte]): Option[DecodedAudio] = {
    if (media == null || media.length == 0) None
    else try {
      val ais = audioInputStreamOf(new java.io.ByteArrayInputStream(media))
      try {
        val fmt = ais.getFormat
        val pcm16 = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16
        if (!pcm16) None
        else {
          val ch = fmt.getChannels
          val frameSize = fmt.getFrameSize // 2 * ch bytes
          val big = fmt.isBigEndian
          // whole frames per chunk so a channel-0 sample never splits
          val chunk = new Array[Byte](frameSize * 1024)
          var sumSq = 0.0
          var zc = 0L
          var peak = 0
          var frames = 0L
          var prevSign = 0 // sign of previous channel-0 sample; 0 = none yet
          var read = ais.read(chunk)
          while (read > 0) {
            var off = 0
            while (off + frameSize <= read) {
              var c = 0
              while (c < ch) {
                val i = off + 2 * c
                val s =
                  if (big) ((chunk(i) << 8) | (chunk(i + 1) & 0xFF)).toShort
                  else ((chunk(i + 1) << 8) | (chunk(i) & 0xFF)).toShort
                sumSq += s.toDouble * s.toDouble
                val as = math.abs(s.toInt)
                if (as > peak) peak = as
                if (c == 0) {
                  val sign = if (s < 0) -1 else 1
                  if (prevSign != 0 && sign != prevSign) zc += 1
                  prevSign = sign
                }
                c += 1
              }
              frames += 1
              off += frameSize
            }
            read = ais.read(chunk)
          }
          val n = frames * ch
          val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
          Some(DecodedAudio(assetId, fmt.getSampleRate.toInt, ch, frames,
            rms, zc, peak))
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Fallback row for payloads no JDK audio reader recognizes —
   *  all-zero features, `sample_rate = 0` as the marker, so the batch
   *  pipeline never drops a row (the [[decodeStub]] role). */
  def audioStub(assetId: Long): DecodedAudio =
    DecodedAudio(assetId, 0, 0, 0L, 0.0, 0L, 0)

  /** Deterministic WAV synthesis (pure JDK, encoder side of the same
   *  codec stack): PCM_SIGNED 16-bit little-endian mono through
   *  `AudioSystem.write` — fixture generator for planted-ground-truth
   *  decode tests, where rate/frames/RMS/crossings/peak all replay from
   *  the generating arithmetic. */
  // `AudioSystem.getAudioInputStream`/`write` run a FRESH ServiceLoader
  // provider lookup per call (class-loader synchronized + reflective) —
  // under 32 concurrent decode tasks that lock serialized the whole
  // batch and cost ~50× per row. Load the SPI providers ONCE per JVM
  // (the public javax.sound.sampled.spi surface, same first-provider-
  // wins semantics as AudioSystem) and call them directly.
  private lazy val audioFileReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    val rs = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).asScala.toVector
    // SoftMidiAudioFileReader's ACCEPT-PROBE itself re-enters the
    // MidiSystem per-call provider lookup (the very global lock this
    // cache exists to avoid) — measured ~60× per-row under 32 threads.
    // Demote it to last: container magics are disjoint (RIFF/FORM/.snd
    // vs MThd), so the reader that accepts a given payload is unchanged.
    val (midi, rest) = rs.partition(_.getClass.getSimpleName.contains("Midi"))
    rest ++ midi
  }
  private lazy val audioFileWriters: Seq[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .asScala.toVector
  }

  /** [[javax.sound.sampled.AudioSystem.getAudioInputStream]] semantics
   *  over the cached providers: first reader that accepts the stream
   *  wins; none → UnsupportedAudioFileException. */
  private[graft] def audioInputStreamOfPublic(
      in: java.io.InputStream): javax.sound.sampled.AudioInputStream =
    audioInputStreamOf(in)

  private def audioInputStreamOf(
      in: java.io.InputStream): javax.sound.sampled.AudioInputStream = {
    val it = audioFileReaders.iterator
    while (it.hasNext) {
      try return it.next().getAudioInputStream(in)
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "Stream of unsupported format")
  }

  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xFF).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
    audioFileWriters.find(_.isFileTypeSupported(wave, ais)) match {
      case Some(w) => w.write(ais, wave, bos)
      case None => // defensive: fall back to the provider-lookup path
        javax.sound.sampled.AudioSystem.write(ais, wave, bos)
    }
    bos.toByteArray
  }

  /** Batched audio decode over the asset table — the [[decodeImages]]
   *  pipeline for the audio modality: partition iterator →
   *  [[DecodeBatchSize]] groups → real [[decodeAudio]], [[audioStub]]
   *  for anything the JDK readers reject, one output row per asset. */
  def decodeAudios(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            decodeAudio(id, bytes).getOrElse(audioStub(id))
          }
        }
      }
      .toDF()
  }

  /** One decoded video asset: container metadata plus the dominant
   *  luminance bin of every SAMPLED frame (stride `everyN`).
   *  `n_frames == 0` with empty bins marks the undecodable-payload
   *  fallback row. */
  final case class DecodedVideo(
      asset_id: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      sampled_bins: Array[Int])

  /** REAL multi-frame video decode through the JDK codecs: animated GIF
   *  is the one frame-sequence container the JDK ships a reader for, so
   *  the video modality's decode → frame-sample → per-frame featurize
   *  path runs against true decoded pixels. Frames are read
   *  INDIVIDUALLY at the sampling stride — skipped frames are never
   *  pixel-decoded, which is the point of stride sampling at scale.
   *  Each sampled frame contributes its dominant 8-bin luminance
   *  (BT.601) bin. */
  def decodeVideo(assetId: Long, media: Array[Byte], everyN: Int): Option[DecodedVideo] = {
    // validated OUTSIDE the decode try: a bad stride must fail loudly,
    // not make every asset look like a corrupt payload via the catch
    require(everyN > 0, s"everyN must be positive, got $everyN")
    if (media == null || media.length == 0) None
    else try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(media))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, false, true)
            val n = reader.getNumImages(true)
            if (n <= 0) None
            else {
              // container dims from the header only — no pixel decode
              val cw = reader.getWidth(0)
              val ch = reader.getHeight(0)
              val bins = (0 until n by everyN).map { i =>
                val img = reader.read(i)
                val w = img.getWidth
                val h = img.getHeight
                val hist = new Array[Long](8)
                val row = new Array[Int](w)
                var y = 0
                while (y < h) {
                  img.getRGB(0, y, w, 1, row, 0, w)
                  var x = 0
                  while (x < w) {
                    val rgb = row(x)
                    val lum = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
                      114 * (rgb & 0xFF)) / 1000
                    hist(lum >> 5) += 1L
                    x += 1
                  }
                  y += 1
                }
                var best = 0
                var b = 1
                while (b < 8) { if (hist(b) > hist(best)) best = b; b += 1 }
                best
              }.toArray
              Some(DecodedVideo(assetId, cw, ch, n, bins))
            }
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Fallback row for payloads no JDK reader recognizes. */
  def videoStub(assetId: Long): DecodedVideo =
    DecodedVideo(assetId, 0, 0, 0, Array.empty)

  /** Deterministic animated-GIF synthesis (pure JDK, the encoder side of
   *  the same codec): one solid-gray frame per entry of `grays`. Solid
   *  frames survive GIF's 256-color palette quantization exactly, so
   *  every sampled frame's luminance bin replays from the generating
   *  arithmetic. */
  def encodeGif(width: Int, height: Int, grays: Seq[Int]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      grays.foreach { gray =>
        // one-entry indexed palette: the gray value round-trips exactly
        // (no quantizer involvement), each frame carrying its own table
        val g = (gray & 0xFF).toByte
        val cm = new java.awt.image.IndexColorModel(8, 1, Array(g), Array(g), Array(g))
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Batched video decode over the asset table — the [[decodeImages]]
   *  pipeline for the frame-sequence modality: real [[decodeVideo]] at
   *  stride `everyN`, [[videoStub]] for anything the JDK readers
   *  reject, one output row per asset. */
  def decodeVideos(assets: DataFrame, everyN: Int): DataFrame = {
    require(everyN > 0, s"everyN must be positive, got $everyN")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            decodeVideo(id, bytes, everyN).getOrElse(videoStub(id))
          }
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
