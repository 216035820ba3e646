package graft.pipeline

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL image/audio decode kernels for the multimodal pipeline — pure
  * JDK, no external media libraries: `javax.imageio` decodes
  * PNG/JPEG/BMP/GIF and `javax.sound.sampled` parses WAV/PCM. These
  * plug into the `mapPartitions` kernel slot that
  * [[Multimodal.decodePipeline]]'s contract reserves (video stays
  * stubbed — the JDK has no video codec).
  *
  * Scale shape: decoding is per-row imperative work that whole-stage
  * codegen cannot express — the ONE legitimate mapPartitions case.
  * Each task decodes its partition's blobs sequentially with zero
  * shuffle; partition count (set upstream, e.g.
  * `decodePipeline`'s repartition) is the memory knob. Downstream
  * similarity (aHash near-dup) is pure column algebra: band equi-join +
  * `bit_count(a ^ b)` — never all-pairs, same discipline as
  * MinHash-LSH in [[Dedup]].
  */
object MediaCodecs {

  // ---- decoded-feature schemas (struct columns, queryable) ----

  val imageFeatSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_luma", DoubleType),
    StructField("ahash", LongType)))

  val audioFeatSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("duration_ms", LongType),
    StructField("rms", DoubleType)))

  val videoFeatSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("fps", DoubleType),
    StructField("n_frames", IntegerType),
    StructField("mean_luma", DoubleType),
    StructField("ahash_bits", LongType)))

  /** Per-frame luma statistics shared by the image and video decoders:
    * overall mean luma plus the 64-bit average hash (8×8 block-averaged
    * luma, bit set where the cell exceeds the cell mean). */
  private def lumaStats(w: Int, h: Int, lumaAt: (Int, Int) => Double): (Double, Long) = {
    val cellSum = Array.ofDim[Double](64)
    val cellN = Array.ofDim[Long](64)
    var total = 0.0
    var y = 0
    while (y < h) {
      val cy = math.min(7, y * 8 / h)
      var x = 0
      while (x < w) {
        val luma = lumaAt(x, y)
        val c = cy * 8 + math.min(7, x * 8 / w)
        cellSum(c) += luma
        cellN(c) += 1
        total += luma
        x += 1
      }
      y += 1
    }
    val cells = Array.tabulate(64)(i => if (cellN(i) == 0) 0.0 else cellSum(i) / cellN(i))
    val nCells = cellN.count(_ > 0)
    val cellMean = cells.sum / math.max(1, nCells)
    var ahash = 0L
    var i = 0
    while (i < 64) {
      if (cellN(i) > 0 && cells(i) > cellMean) ahash |= (1L << i)
      i += 1
    }
    (total / (w.toLong * h), ahash)
  }

  // ---- decode kernels (real) ----

  /** Decode an image via javax.imageio: dimensions, mean luma
    * ((r+g+b)/3, exact for grayscale content), and the 64-bit average
    * hash (8×8 block-averaged luma, bit set where the cell exceeds the
    * cell mean) — the standard perceptual near-dup signature.
    * Undecodable/null bytes → None. */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Double, Long)] = {
    if (bytes == null) return None
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      if (w <= 0 || h <= 0) return None
      val (mean, ahash) = lumaStats(w, h, (x, y) => {
        val rgb = img.getRGB(x, y)
        (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
      })
      Some((w, h, mean, ahash))
    } catch { case _: Exception => None }
  }

  /** Decode a WAV container via javax.sound.sampled: format metadata
    * plus RMS amplitude over the 16-bit PCM samples. Non-PCM-16 or
    * undecodable bytes → None. */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Long, Double)] = {
    if (bytes == null) return None
    try {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16) return None
      val data = ais.readAllBytes()
      ais.close()
      val frameSize = fmt.getFrameSize
      val frames = if (frameSize > 0) data.length / frameSize else 0
      if (frames == 0) return None
      // AudioSystem.NOT_SPECIFIED is -1; a zero/negative/unspecified
      // frame rate has no duration — and fractional rates (11025.5)
      // must round, not truncate through a long cast
      val frameRate = fmt.getFrameRate
      if (frameRate <= 0) return None
      val durationMs = math.round(frames * 1000.0 / frameRate)
      val bigEndian = fmt.isBigEndian
      var sumSq = 0.0
      var i = 0
      val nS = data.length / 2
      while (i < nS) {
        val lo = data(2 * i + (if (bigEndian) 1 else 0)) & 0xff
        val hi = data(2 * i + (if (bigEndian) 0 else 1))
        val s = (hi << 8) | lo
        sumSq += s.toDouble * s
        i += 1
      }
      Some((fmt.getSampleRate.toInt, fmt.getChannels, durationMs,
        math.sqrt(sumSq / nS)))
    } catch { case _: Exception => None }
  }

  /** Decode an AVI (RIFF) container — pure byte arithmetic for the
    * container walk, frames through either the raw-DIB path
    * (biCompression = 0: bottom-up BGR24 rows, 4-byte stride) or the
    * MJPEG path (biCompression = 'MJPG': each frame is a JPEG decoded
    * by javax.imageio). Closes the last multimodal stub (r8 verdict
    * #5 — the JDK ships no video codec, but AVI+MJPEG/DIB needs none
    * beyond ImageIO). Returns (width, height, fps, n_frames,
    * mean_luma over all frames, Σ popcount(per-frame aHash));
    * undecodable/truncated/zero-frame input → None. */
  def decodeAvi(bytes: Array[Byte]): Option[(Int, Int, Double, Int, Double, Long)] = {
    if (bytes == null || bytes.length < 12) return None
    def fourcc(o: Int): String =
      new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def le32(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    try {
      if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
      var width = 0; var height = 0
      var scale = 0; var rate = 0
      var strfComp: Option[String] = None // Some("") = BI_RGB, else fourcc
      // stream selection: streams declare in order as strh chunks, and a
      // movi frame chunk's two-digit prefix ('00dc') is that declaration
      // index — only the SELECTED vids stream's frames count (a second
      // stream, audio or video, must not merge its chunks into
      // n_frames/mean_luma or fail the decode via the codec mismatch)
      var strhCount = 0
      var vidsIdx = -1 // declaration index of the selected vids stream
      var inVidsStrl = false // the strf that follows the selected strh
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      def walk(start: Int, end: Int): Unit = {
        var o = start
        while (o + 8 <= end) {
          val id = fourcc(o)
          val sz = le32(o + 4)
          val dataStart = o + 8
          if (sz < 0 || dataStart + sz > bytes.length) return
          if (id == "LIST" || id == "RIFF") walk(dataStart + 4, dataStart + sz)
          else if (id == "avih" && sz >= 40) {
            width = le32(dataStart + 32); height = le32(dataStart + 36)
          } else if (id == "strh" && sz >= 28) {
            if (fourcc(dataStart) == "vids" && vidsIdx < 0) {
              vidsIdx = strhCount
              inVidsStrl = true
              scale = le32(dataStart + 20); rate = le32(dataStart + 24)
            } else inVidsStrl = false
            strhCount += 1
          } else if (id == "strf" && sz >= 20 && inVidsStrl && strfComp.isEmpty) {
            val comp = le32(dataStart + 16)
            strfComp = Some(if (comp == 0) "" else fourcc(dataStart + 16))
          } else if (id.length == 4 && (id.endsWith("dc") || id.endsWith("db")) &&
            vidsIdx >= 0 && id.startsWith(f"$vidsIdx%02d")) {
            frames += ((dataStart, sz))
          }
          o = dataStart + sz + (sz & 1)
        }
      }
      walk(12, bytes.length)
      if (vidsIdx < 0 || width <= 0 || height <= 0 || frames.isEmpty ||
        strfComp.isEmpty) return None
      val compression = strfComp.get
      val fps = if (scale > 0 && rate > 0) rate.toDouble / scale else return None
      var lumaSum = 0.0
      var bits = 0L
      var n = 0
      for ((off, sz) <- frames) {
        val stats: Option[(Double, Long)] =
          if (compression == "") {
            // raw DIB: bottom-up BGR24, rows padded to 4 bytes
            val stride = ((width * 3 + 3) / 4) * 4
            if (sz < stride * height) None
            else Some(lumaStats(width, height, (x, y) => {
              val p = off + (height - 1 - y) * stride + x * 3
              ((bytes(p) & 0xff) + (bytes(p + 1) & 0xff) + (bytes(p + 2) & 0xff)) / 3.0
            }))
          } else if (compression == "MJPG") {
            val img = javax.imageio.ImageIO.read(
              new ByteArrayInputStream(bytes, off, sz))
            if (img == null) None
            else Some(lumaStats(img.getWidth, img.getHeight, (x, y) => {
              val rgb = img.getRGB(x, y)
              (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
            }))
          } else None
        stats match {
          case Some((m, ah)) => lumaSum += m; bits += java.lang.Long.bitCount(ah); n += 1
          case None => return None // a frame that fails the declared codec
        }
      }
      Some((width, height, fps, n, lumaSum / n, bits))
    } catch { case _: Exception => None }
  }

  // ---- DataFrame wrappers: the mapPartitions kernel slot ----

  private def withFeat(df: DataFrame, contentCol: String, outCol: String,
      featSchema: StructType,
      kernel: Array[Byte] => Option[Product]): DataFrame = {
    val outSchema = df.schema.add(outCol, featSchema)
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { it =>
      it.map { r =>
        val feat = kernel(r.getAs[Array[Byte]](idx))
          .map(p => Row.fromSeq(p.productIterator.toSeq)).orNull
        Row.fromSeq(r.toSeq :+ feat)
      }
    }(Encoders.row(outSchema))
  }

  /** Append `img` = (width, height, mean_luma, ahash) decoded from
    * `contentCol`; undecodable rows get a null struct. */
  def withImageFeatures(df: DataFrame, contentCol: String,
      outCol: String = "img"): DataFrame =
    withFeat(df, contentCol, outCol, imageFeatSchema, decodeImage)

  /** Append `aud` = (sample_rate, channels, duration_ms, rms). */
  def withAudioFeatures(df: DataFrame, contentCol: String,
      outCol: String = "aud"): DataFrame =
    withFeat(df, contentCol, outCol, audioFeatSchema, decodeWav)

  /** Append `vid` = (width, height, fps, n_frames, mean_luma,
    * ahash_bits) decoded from an AVI container in `contentCol`;
    * undecodable rows get a null struct. */
  def withVideoFeatures(df: DataFrame, contentCol: String,
      outCol: String = "vid"): DataFrame =
    withFeat(df, contentCol, outCol, videoFeatSchema, decodeAvi)

  /** Perceptual near-dup candidate pairs from 64-bit aHashes, with
    * EXACT recall: the hash splits into `bands` equal slices where
    * `bands` is the smallest divisor of 64 exceeding `maxHamming` — by
    * pigeonhole a pair within Hamming distance ≤ bands−1 must agree on
    * ≥ 1 whole band, so the band equi-join misses nothing; the exact
    * `bit_count(xor)` verify then filters. Fewer bands (larger slices)
    * at low maxHamming = fewer candidate collisions — maxHamming 0
    * joins on the full hash; 3 uses the classic four 16-bit bands.
    * Never all-pairs — which is exactly why maxHamming caps at 7: at 8+
    * the pigeonhole needs ≥ 16 bands of ≤ 4-bit values, band keys carry
    * ≤ 16 distinct values, and the candidate equi-join degenerates to
    * Σ_bands Σ_values cnt² ≈ n² or worse — a quadratic blow-up dressed
    * as an index. Radii that loose want a different algorithm
    * (multi-probe LSH or metric trees), not bigger bands. */
  def imageNearDups(df: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"maxHamming must be in [0, 7] (band width >= 8 bits keeps the " +
        s"band join sub-quadratic), got $maxHamming")
    val bands = Seq(1, 2, 4, 8, 16, 32, 64).find(_ > maxHamming).get
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val banded = df.select(col(idCol).as("__mid"), col(hashCol).as("__mh"))
      .select(col("__mid"), col("__mh"),
        explode(sequence(lit(0), lit(bands - 1))).as("__band"))
      .withColumn("__bv",
        expr(s"shiftright(__mh, __band * $width)").bitwiseAND(lit(mask)))
    val a = banded.select(col("__band"), col("__bv"),
      col("__mid").as("id_a"), col("__mh").as("ha"))
    val b = banded.select(col("__band"), col("__bv"),
      col("__mid").as("id_b"), col("__mh").as("hb"))
    a.join(b, Seq("__band", "__bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---- encode kernels (pure JDK; synthesize demo/test assets) ----

  /** Render a grayscale PNG: `gray(x, y)` in 0..255. */
  def pngBytes(w: Int, h: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = gray(x, y) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Encode mono 16-bit PCM WAV at `sampleRate`. */
  def wavBytes(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Encode an AVI container — RIFF assembly in plain bytes. Each
    * frame is a `gray(x, y)` function (0..255); `codec` is `"DIB "`
    * (uncompressed bottom-up BGR24 — byte-exact round trip) or
    * `"MJPG"` (per-frame JPEG via javax.imageio). */
  def aviBytes(w: Int, h: Int, fps: Int,
      frames: Seq[(Int, Int) => Int], codec: String = "DIB "): Array[Byte] = {
    require(codec == "DIB " || codec == "MJPG", s"unsupported codec $codec")
    require(fps > 0 && frames.nonEmpty)
    import java.nio.{ByteBuffer, ByteOrder}
    def buf(n: Int): ByteBuffer = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = data.length & 1
      val b = buf(8 + data.length + pad)
      b.put(id.getBytes("US-ASCII")).putInt(data.length).put(data)
      b.array()
    }
    def list(kind: String, children: Array[Byte]): Array[Byte] = {
      val b = buf(12 + children.length)
      b.put("LIST".getBytes("US-ASCII")).putInt(4 + children.length)
        .put(kind.getBytes("US-ASCII")).put(children)
      b.array()
    }
    val frameBytes: Seq[Array[Byte]] = frames.map { gray =>
      if (codec == "MJPG") {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w) {
          val g = gray(x, y) & 0xff
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
        }
        val bos = new ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      } else {
        val stride = ((w * 3 + 3) / 4) * 4
        val data = new Array[Byte](stride * h)
        for (y <- 0 until h; x <- 0 until w) {
          val g = (gray(x, y) & 0xff).toByte
          val p = (h - 1 - y) * stride + x * 3
          data(p) = g; data(p + 1) = g; data(p + 2) = g // B, G, R
        }
        data
      }
    }
    val avih = {
      val b = buf(56)
      b.putInt(1000000 / fps).putInt(0).putInt(0).putInt(0)
        .putInt(frames.length).putInt(0).putInt(1).putInt(0)
        .putInt(w).putInt(h) // + 16 reserved zero bytes
      b.array()
    }
    val strh = {
      val b = buf(56)
      b.put("vids".getBytes("US-ASCII")).put(codec.getBytes("US-ASCII"))
        .putInt(0).putShort(0).putShort(0).putInt(0)
        .putInt(1).putInt(fps) // dwScale, dwRate → fps = rate/scale
        .putInt(0).putInt(frames.length).putInt(0).putInt(-1).putInt(0)
        .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
      b.array()
    }
    val strf = {
      val b = buf(40)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      if (codec == "MJPG") b.put("MJPG".getBytes("US-ASCII")) else b.putInt(0)
      b.putInt(frameBytes.head.length).putInt(0).putInt(0).putInt(0).putInt(0)
      b.array()
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      frameBytes.map(fb =>
        chunk(if (codec == "MJPG") "00dc" else "00db", fb)).reduce(_ ++ _))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val out = buf(8 + body.length)
    out.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
    out.array()
  }

  /** Deterministic AVI asset table (distributed synthesis): raw-DIB
    * 16×16 @ 10 fps clips whose decoded features an oracle derives
    * analytically — even ids are solid gray g = 16+(7i)%224 (mean = g,
    * 0 aHash bits/frame); odd ids are vertical splits a | a+100 with
    * a = 50+10(i%5) (mean = a+50, 32 bits/frame); n_frames =
    * 2+(i%3). */
  def syntheticAvis(spark: SparkSession, n: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("content", BinaryType)))
    spark.range(n).mapPartitions { it =>
      it.map { id =>
        val i = id.toInt
        val nf = 2 + (i % 3)
        val frame: (Int, Int) => Int =
          if (i % 2 == 0) { val g = 16 + (7 * i) % 224; (_, _) => g }
          else { val a = 50 + 10 * (i % 5); (x, _) => if (x < 8) a else a + 100 }
        Row(id, "video", aviBytes(16, 16, 10, Seq.fill(nf)(frame)))
      }
    }(Encoders.row(schema))
  }

  /** Deterministic PNG asset table, synthesized DISTRIBUTED (each task
    * renders its ids): three closed-form 16×16 classes whose decoded
    * features an oracle derives analytically —
    * class 0 (solid g = 8+(5i)%240): mean = g, 0 ahash bits;
    * class 1 (vertical split a | a+100, a = 40+10(i%8)): mean = a+50,
    * 32 bits; class 2 (gradient 17x): mean = 127.5, 32 bits. */
  def syntheticPngs(spark: SparkSession, n: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("content", BinaryType)))
    spark.range(n).mapPartitions { it =>
      it.map { id =>
        val i = id.toInt
        val bytes = (i % 3) match {
          case 0 => val g = 8 + (5 * i) % 240; pngBytes(16, 16, (_, _) => g)
          case 1 =>
            val a = 40 + 10 * (i % 8)
            pngBytes(16, 16, (x, _) => if (x < 8) a else a + 100)
          case _ => pngBytes(16, 16, (x, _) => 17 * x)
        }
        Row(id, "image", bytes)
      }
    }(Encoders.row(schema))
  }

  /** Deterministic WAV asset table (distributed synthesis): mono 8 kHz
    * square waves — n_samples = 1600 + 800(i%3) (duration_ms =
    * 200 + 100(i%3) exactly), amplitude A = 1000 + 500(i%7) (RMS = A
    * exactly — every sample is ±A). */
  def syntheticWavs(spark: SparkSession, n: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("content", BinaryType)))
    spark.range(n).mapPartitions { it =>
      it.map { id =>
        val i = id.toInt
        val nSamples = 1600 + 800 * (i % 3)
        val amp = (1000 + 500 * (i % 7)).toShort
        val samples = Array.tabulate(nSamples) { t =>
          if ((t / 8) % 2 == 0) amp else (-amp).toShort
        }
        Row(id, "audio", wavBytes(8000, samples))
      }
    }(Encoders.row(schema))
  }
}
