package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends TestSpark {
  import spark.implicits._

  test("withMeta extracts byte size and magic prefix") {
    val df = Seq((1L, Array[Byte](0x89.toByte, 'P', 'N', 'G', 0, 1)))
      .toDF("id", "payload")
    val m = Multimodal.withMeta(df, col("payload"))
      .select("n_bytes", "magic").as[(Long, String)].head()
    assert(m === ((6L, "89504e47")))
  }

  test("decodeStub is a normalized 16-bin histogram") {
    val f = Multimodal.decodeStub(Array[Byte](0, 0, 1, 17))
    assert(f.length === 16)
    assert(math.abs(f.sum - 1.0f) < 1e-6)
    assert(f(0) === 0.5f)   // two bytes ≡ 0 (mod 16)
    assert(f(1) === 0.5f)   // bytes 1 and 17
  }

  test("extractFeatures preserves ids and emits fixed-size vectors") {
    val docs = Tables(spark, sfDir, "documents").limit(20)
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val feats = Multimodal.extractFeatures(docs, col("doc_id"), col("payload"))
    val rows = feats.collect()
    assert(rows.length === 20)
    assert(rows.forall(_.features.length === 16))
    assert(rows.forall(r => r.n_bytes > 0))
    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(docs, col("doc_id"), col("payload")).collect()
    assert(rows.map(_.features.toSeq).toSeq === again.map(_.features.toSeq).toSeq)
  }

  test("decode really parses a 24-bit BMP (magic dispatch; stub for the rest)") {
    // hand-built 2x2 24bpp BMP, bottom-up, rows padded to 4 bytes:
    // bottom row pixels (B,G,R): (255,0,0), (0,255,0)
    // top row pixels:            (0,0,255), (255,255,255)
    val header = Array[Int](
      'B', 'M', 70, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0, // file header
      40, 0, 0, 0, 2, 0, 0, 0, 2, 0, 0, 0, 1, 0, 24, 0, // DIB: 2x2, 24bpp
      0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0)
    val pixels = Array[Int](
      255, 0, 0, 0, 255, 0, 0, 0, // bottom row + 2 pad bytes
      0, 0, 255, 255, 255, 255, 0, 0) // top row + 2 pad bytes
    val bmp = (header ++ pixels).map(_.toByte)
    val f = Multimodal.decode(bmp)
    assert(f.toSeq === Seq(2f, 2f,
      (255 + 0 + 0 + 255) / 4f, (0 + 255 + 0 + 255) / 4f, (0 + 0 + 255 + 255) / 4f))
    // non-BMP bytes fall back to the histogram stub
    assert(Multimodal.decode("plain text".getBytes("UTF-8")).length === 16)
  }

  test("decode really parses RIFF/WAV PCM-16 audio (rate, channels, rms, peak)") {
    // hand-built mono 8 kHz PCM-16 WAV: 100 samples of a ±1000 square
    // wave → rms = 1000, peak = 1000
    def le32(v: Int) = Array(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff,
      (v >> 24) & 0xff)
    def le16(v: Int) = Array(v & 0xff, (v >> 8) & 0xff)
    val samples = (0 until 100).flatMap(i => le16(if (i % 2 == 0) 1000 else -1000))
    val fmt = Array('f'.toInt, 'm', 't', ' ') ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
    val data = Array('d'.toInt, 'a', 't', 'a') ++ le32(samples.length) ++ samples
    val body = Array('W'.toInt, 'A', 'V', 'E') ++ fmt ++ data
    val wav = (Array('R'.toInt, 'I', 'F', 'F') ++ le32(body.length) ++ body)
      .map(_.toByte)
    val f = Multimodal.decode(wav)
    assert(f.toSeq === Seq(8000f, 1f, 100f, 1000f, 1000f))
    // a RIFF container that is not PCM-16 falls back to the stub
    val nonPcm = wav.clone()
    nonPcm(20) = 85 // fmt audioFormat -> not 1
    assert(Multimodal.decode(nonPcm).length === 16)
  }
}
