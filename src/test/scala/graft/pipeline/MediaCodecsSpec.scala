package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MediaCodecsSpec extends SparkTestBase {
  import spark.implicits._

  test("decodeImage reads real PNG pixels: dims, mean luma, aHash") {
    // solid gray 100
    val solid = MediaCodecs.decodeImage(MediaCodecs.pngBytes(16, 16, (_, _) => 100)).get
    assert(solid === ((16, 16, 100.0, 0L))) // no cell exceeds the mean
    // vertical split 40 | 140: mean 90, right half above cell mean
    val (w, h, mean, ahash) = MediaCodecs.decodeImage(
      MediaCodecs.pngBytes(16, 16, (x, _) => if (x < 8) 40 else 140)).get
    assert((w, h, mean) === ((16, 16, 90.0)))
    assert(java.lang.Long.bitCount(ahash) === 32)
    // non-square: 32x8
    val rect = MediaCodecs.decodeImage(MediaCodecs.pngBytes(32, 8, (_, _) => 7)).get
    assert(rect._1 === 32 && rect._2 === 8 && rect._3 === 7.0)
    // garbage bytes and null decode to None
    assert(MediaCodecs.decodeImage(Array[Byte](1, 2, 3)).isEmpty)
    assert(MediaCodecs.decodeImage(null).isEmpty)
  }

  test("decodeWav reads real PCM: rate, channels, duration, RMS") {
    val samples = Array.tabulate(2000)(t => if ((t / 8) % 2 == 0) 3000 else -3000)
      .map(_.toShort)
    val (rate, ch, durMs, rms) =
      MediaCodecs.decodeWav(MediaCodecs.wavBytes(8000, samples)).get
    assert(rate === 8000 && ch === 1)
    assert(durMs === 250L) // 2000 samples at 8 kHz
    assert(math.abs(rms - 3000.0) < 1e-9) // square wave: RMS = amplitude
    assert(MediaCodecs.decodeWav(Array[Byte](9, 9, 9)).isEmpty)
  }

  test("withImageFeatures decodes distributed; undecodable rows null out") {
    val rows = Seq(
      (1L, MediaCodecs.pngBytes(16, 16, (_, _) => 50)),
      (2L, Array[Byte](0, 1, 2)), // not an image
      (3L, MediaCodecs.pngBytes(16, 16, (x, _) => 17 * x)))
      .toDF("asset_id", "content")
    val out = MediaCodecs.withImageFeatures(rows, "content")
      .select(col("asset_id"), col("img.width"), col("img.mean_luma"))
      .collect().sortBy(_.getLong(0))
    assert(out(0).getInt(1) === 16 && out(0).getDouble(2) === 50.0)
    assert(out(1).isNullAt(1)) // null struct
    assert(out(2).getDouble(2) === 127.5)
  }

  test("decodeAvi: raw-DIB round trip matches closed forms exactly") {
    val solid = MediaCodecs.aviBytes(16, 16, 10,
      Seq.fill(3)((_, _) => 77), codec = "DIB ")
    assert(MediaCodecs.decodeAvi(solid) === Some((16, 16, 10.0, 3, 77.0, 0L)))
    val split = MediaCodecs.aviBytes(16, 16, 25,
      Seq.fill(2)((x: Int, _: Int) => if (x < 8) 40 else 140), codec = "DIB ")
    // mean = 90, 32 right-half cells above the cell mean per frame
    assert(MediaCodecs.decodeAvi(split) === Some((16, 16, 25.0, 2, 90.0, 64L)))
    // stride padding: width 5 forces a non-multiple-of-4 row
    val odd = MediaCodecs.aviBytes(5, 3, 10, Seq((_, _) => 10), codec = "DIB ")
    assert(MediaCodecs.decodeAvi(odd) === Some((5, 3, 10.0, 1, 10.0, 0L)))
  }

  test("decodeAvi: MJPEG frames ride the same container walk") {
    // JPEG of a solid frame decodes solid (DC-only blocks), so the
    // aHash stays 0 even through the lossy codec; dims/fps/count exact
    val mjpg = MediaCodecs.aviBytes(32, 16, 15,
      Seq.fill(4)((_, _) => 128), codec = "MJPG")
    val got = MediaCodecs.decodeAvi(mjpg)
    assert(got.isDefined)
    val (w, h, fps, n, _, bits) = got.get
    assert((w, h, fps, n, bits) === ((32, 16, 15.0, 4, 0L)))
    // vertical split survives JPEG ringing: left cells stay below the
    // cell mean, right above → 32 bits per frame
    val splitJ = MediaCodecs.aviBytes(16, 16, 10,
      Seq((x: Int, _: Int) => if (x < 8) 40 else 140), codec = "MJPG")
    assert(MediaCodecs.decodeAvi(splitJ).get._6 === 32L)
  }

  test("decodeAvi: garbage, truncation and nulls return None") {
    assert(MediaCodecs.decodeAvi(null) === None)
    assert(MediaCodecs.decodeAvi(Array[Byte](1, 2, 3)) === None)
    assert(MediaCodecs.decodeAvi("RIFFxxxxWAVE".getBytes) === None)
    val ok = MediaCodecs.aviBytes(16, 16, 10, Seq((_, _) => 9))
    assert(MediaCodecs.decodeAvi(ok.take(ok.length / 2)) === None)
  }

  test("withVideoFeatures decodes distributed; undecodable rows null out") {
    val rows = Seq(
      (1L, MediaCodecs.aviBytes(16, 16, 10, Seq.fill(2)((_, _) => 33))),
      (2L, Array[Byte](9, 9, 9)))
      .toDF("asset_id", "content")
    val out = MediaCodecs.withVideoFeatures(rows, "content")
      .select(col("asset_id"), col("vid.n_frames"), col("vid.mean_luma"))
      .collect().sortBy(_.getLong(0))
    assert(out(0).getInt(1) === 2 && out(0).getDouble(2) === 33.0)
    assert(out(1).isNullAt(1))
  }

  test("decodeAvi: a second stream's chunks never merge into the selected " +
      "video stream's features") {
    // hand-assemble a TWO-stream AVI: stream 00 = the selected 4x4 DIB
    // vids (2 solid-100 frames), stream 01 = a second vids stream with
    // DIFFERENT dims and luma (3 solid-200 8x8 frames). Only stream 00's
    // chunks may count — merging '01db' frames would corrupt
    // n_frames/mean_luma or fail the decode on the stride check.
    import java.nio.{ByteBuffer, ByteOrder}
    def buf(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
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
    def dib(w: Int, h: Int, g: Int): Array[Byte] = {
      val stride = ((w * 3 + 3) / 4) * 4
      Array.fill(stride * h)(g.toByte)
    }
    def strh(fps: Int): Array[Byte] = {
      val b = buf(56)
      b.put("vids".getBytes("US-ASCII")).put("DIB ".getBytes("US-ASCII"))
        .putInt(0).putShort(0).putShort(0).putInt(0)
        .putInt(1).putInt(fps).putInt(0).putInt(2).putInt(0).putInt(-1)
      b.array()
    }
    def strf(w: Int, h: Int): Array[Byte] = {
      val b = buf(40)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24).putInt(0)
      b.array()
    }
    val avih = {
      val b = buf(56)
      b.putInt(100000).putInt(0).putInt(0).putInt(0).putInt(2).putInt(0)
        .putInt(2).putInt(0).putInt(4).putInt(4)
      b.array()
    }
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh(10)) ++ chunk("strf", strf(4, 4))) ++
      list("strl", chunk("strh", strh(30)) ++ chunk("strf", strf(8, 8))))
    val movi = list("movi",
      chunk("00db", dib(4, 4, 100)) ++ chunk("01db", dib(8, 8, 200)) ++
        chunk("00db", dib(4, 4, 100)) ++ chunk("01db", dib(8, 8, 200)) ++
        chunk("01db", dib(8, 8, 200)))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val out = buf(8 + body.length)
    out.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
    // stream 00 only: 4x4, fps 10, 2 frames, luma 100, flat aHash = 0
    assert(MediaCodecs.decodeAvi(out.array()) === Some((4, 4, 10.0, 2, 100.0, 0L)))
  }

  test("imageNearDups: the band-degenerate radii are rejected up front") {
    val df = Seq((1L, 0L)).toDF("id", "ahash")
    // 8+ needs 16 bands of <= 4-bit values — the candidate join would
    // be quadratic-or-worse; the operator refuses rather than degrade
    val e = intercept[IllegalArgumentException](
      MediaCodecs.imageNearDups(df, "id", "ahash", maxHamming = 8))
    assert(e.getMessage.contains("[0, 7]"))
    // the top of the allowed range still runs (8 bands of 8 bits)
    assert(MediaCodecs.imageNearDups(df, "id", "ahash", maxHamming = 7)
      .collect().isEmpty)
  }

  test("imageNearDups pairs perceptual twins via banded aHash, never all-pairs") {
    // two near-identical gradients (one cell flipped), one solid control
    val g1 = MediaCodecs.decodeImage(
      MediaCodecs.pngBytes(16, 16, (x, _) => 17 * x)).get._4
    val g2 = MediaCodecs.decodeImage(
      MediaCodecs.pngBytes(16, 16, (x, y) => if (x >= 14 && y < 2) 0 else 17 * x)).get._4
    val s1 = MediaCodecs.decodeImage(
      MediaCodecs.pngBytes(16, 16, (_, y) => if (y < 8) 200 else 20)).get._4
    val df = Seq((1L, g1), (2L, g2), (3L, s1)).toDF("id", "ahash")
    val pairs = MediaCodecs.imageNearDups(df, "id", "ahash", maxHamming = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }
}
