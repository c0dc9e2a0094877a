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

  /** Arbitrary 24bpp BMP builder: px(x, y) gives (b, g, r) for the
    * TOP-DOWN pixel grid; `topDown` picks the on-disk row order. */
  private def bmp24(w: Int, h: Int, topDown: Boolean)
                   (px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val out = new Array[Byte](54 + rowSize * h)
    def p32(o: Int, v: Int): Unit = (0 until 4).foreach(i =>
      out(o + i) = ((v >> (8 * i)) & 0xff).toByte)
    def p16(o: Int, v: Int): Unit = (0 until 2).foreach(i =>
      out(o + i) = ((v >> (8 * i)) & 0xff).toByte)
    out(0) = 'B'; out(1) = 'M'
    p32(2, out.length); p32(10, 54); p32(14, 40)
    p32(18, w); p32(22, if (topDown) -h else h)
    p16(26, 1); p16(28, 24); p32(30, 0); p32(34, rowSize * h)
    for (y <- 0 until h; x <- 0 until w) {
      val disk = if (topDown) y else h - 1 - y
      val o = 54 + disk * rowSize + x * 3
      val (bb, gg, rr) = px(x, y)
      out(o) = bb.toByte; out(o + 1) = gg.toByte; out(o + 2) = rr.toByte
    }
    out
  }

  test("imageDHash: real BMP grid — gradients, orientation, perturbation") {
    val grad = (x: Int, _: Int) => (x * 14, x * 14, x * 14)
    val up = bmp24(18, 16, topDown = false)(grad)
    // luma strictly increases left-to-right → every neighbour bit set
    assert(Multimodal.imageDHash(up) === -1L)
    // inverted gradient → no bit set
    val inv = bmp24(18, 16, topDown = false)(
      (x, _) => (255 - x * 14, 255 - x * 14, 255 - x * 14))
    assert(Multimodal.imageDHash(inv) === 0L)
    // bottom-up and top-down encodings of the SAME image hash equal
    val down = bmp24(18, 16, topDown = true)(grad)
    assert(Multimodal.imageDHash(up) === Multimodal.imageDHash(down))
    // a small local perturbation moves the hash by at most a few bits
    val noisy = bmp24(18, 16, topDown = false)((x, y) =>
      if (x == 5 && y == 3) (90, 90, 90) else grad(x, y))
    val d = java.lang.Long.bitCount(
      Multimodal.imageDHash(up) ^ Multimodal.imageDHash(noisy))
    assert(d <= 3, s"hamming $d")
  }

  test("imagePhashPairs finds near-dup images, not unrelated ones") {
    val grad = (x: Int, _: Int) => (x * 14, x * 14, x * 14)
    val imgs = Seq(
      1L -> bmp24(18, 16, topDown = false)(grad),
      2L -> bmp24(18, 16, topDown = false)((x, y) =>
        if (x == 5 && y == 3) (90, 90, 90) else grad(x, y)),
      3L -> bmp24(18, 16, topDown = false)(
        (x, _) => (255 - x * 14, 255 - x * 14, 255 - x * 14))
    ).toDF("id", "payload")
    val pairs = Multimodal.imagePhashPairs(imgs, col("id"), col("payload"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("phash clusters group visual near-dups under the min id (m06 shape)") {
    val grad = (x: Int, _: Int) => (x * 14, x * 14, x * 14)
    val inv = (x: Int, _: Int) => (255 - x * 14, 255 - x * 14, 255 - x * 14)
    val imgs = Seq(
      1L -> bmp24(18, 16, topDown = false)(grad),
      2L -> bmp24(18, 16, topDown = false)((x, y) =>
        if (x == 5 && y == 3) (90, 90, 90) else grad(x, y)),
      3L -> bmp24(18, 16, topDown = false)(inv),
      4L -> bmp24(18, 16, topDown = false)((x, y) =>
        if (x == 5 && y == 3) (160, 160, 160) else inv(x, y))
    ).toDF("id", "payload")
    val clusters = graft.operators.Dedup.connectedComponents(
        Multimodal.imagePhashPairs(imgs, col("id"), col("payload")))
      .select("id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(clusters === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
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

  /** Mono 8 kHz PCM-16 WAV with the given samples. */
  private def wav16(samples: Seq[Int]): Array[Byte] = {
    def le32(v: Int) = Array(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff,
      (v >> 24) & 0xff)
    def le16(v: Int) = Array(v & 0xff, (v >> 8) & 0xff)
    val pcm = samples.flatMap(le16)
    val fmt = Array('f'.toInt, 'm', 't', ' ') ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
    val data = Array('d'.toInt, 'a', 't', 'a') ++ le32(pcm.length) ++ pcm
    val body = Array('W'.toInt, 'A', 'V', 'E') ++ fmt ++ data
    (Array('R'.toInt, 'I', 'F', 'F') ++ le32(body.length) ++ body).map(_.toByte)
  }

  test("audioFingerprint: monotone envelopes hit the delta-bit extremes; " +
       "WAV decode feeds |samples|, not bytes") {
    // strictly rising |sample| envelope: every window mean above the
    // previous -> all 64 delta bits set
    val rising = wav16((0 until 650).map(i => i * 10))
    assert(Multimodal.audioFingerprint(rising) === -1L)
    // strictly falling -> no bits
    val falling = wav16((0 until 650).map(i => (650 - i) * 10))
    assert(Multimodal.audioFingerprint(falling) === 0L)
    // NEGATIVE rising magnitudes: |s| rises even though s falls — the
    // WAV path fingerprints magnitudes (a byte reading would see the
    // two's-complement sawtooth instead)
    val negRising = wav16((0 until 650).map(i => -i * 10))
    assert(Multimodal.audioFingerprint(negRising) === -1L)
  }

  test("audioNearDupPairs: jittered re-encode pairs with its original; " +
       "a different envelope does not (real WAVs)") {
    import spark.implicits._
    def env(i: Int) = 500 + 400 * math.sin(i / 20.0)
    val a = wav16((0 until 1300).map(i => env(i).toInt))
    // the same audio, slightly jittered per sample (re-encode noise)
    val b = wav16((0 until 1300).map(i => env(i).toInt + (i % 3) - 1))
    // same amplitude range, different envelope shape
    val c = wav16((0 until 1300).map(i => (500 + 400 * math.sin(i / 7.0)).toInt))
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "payload")
    val pairs = Multimodal.audioNearDupPairs(df, col("id"), col("payload"),
        maxDist = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"jittered pair missed: $pairs")
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L),
      s"unrelated envelope paired: $pairs")
  }

  test("audioStats matches a hand-computed byte-path envelope") {
    import spark.implicits._
    // 130-byte payload, 2 bytes per window, byte i holds unsigned
    // value i: window f mean = (2f + 2f+1)/2 = 2f — strictly rising
    val rising = (0 until 130).map(_.toByte).toArray
    val df = Seq((7L, rising)).toDF("doc_id", "payload")
    val r = Multimodal.audioStats(df, col("doc_id"), col("payload"))
      .as[(Long, Long, Long, Long)].head()
    assert(r._1 === 7L)
    assert(r._2 === -1L) // all 64 delta bits
    assert(r._3 === (128 + 129) / 2) // peak = last window mean
    val means = (0 until 65).map(f => (2 * f + 2 * f + 1) / 2L)
    assert(r._4 === means.sum / 65)
  }

  test("sceneCuts: energy jumps between frames are cuts; flat payloads " +
       "and sub-frame payloads are not") {
    import spark.implicits._
    // frames of 64 bytes: [10]*64, [100]*64, [100]*64, [12]*64 →
    // cuts at frames 1 and 3; first_cut = 1
    val jumpy = (Array.fill(64)(10) ++ Array.fill(64)(100) ++
      Array.fill(64)(100) ++ Array.fill(64)(12)).map(_.toByte)
    // flat: one energy everywhere → 0 cuts
    val flat = Array.fill(200)(42.toByte)
    // sub-frame: single partial frame, no previous frame to cut from
    val tiny = Array.fill(10)(99.toByte)
    val empty = Array.empty[Byte]
    val df = Seq((1L, jumpy), (2L, flat), (3L, tiny), (4L, empty))
      .toDF("doc_id", "payload")
    val out = Multimodal.sceneCuts(df, col("doc_id"), col("payload"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(out(1L) === ((4L, 2L, Some(1L))))
    assert(out(2L) === ((4L, 0L, None)))   // 200/64 → 4 frames, all 42
    assert(out(3L) === ((1L, 0L, None)))
    assert(out(4L) === ((1L, 0L, None)))   // empty payload = 1 zero frame
  }

  test("keyframes: one max-energy frame per scene, ties to the lowest " +
       "index, scene boundaries exactly at sceneCuts' cuts") {
    import spark.implicits._
    def frames(es: Int*): Array[Byte] =
      es.flatMap(e => Array.fill(64)(e.toByte)).toArray
    // energies 10,100,100,12: cuts at frames 1 and 3 → scenes
    // {0}, {1,2} (tie at 100 → frame 1), {3}
    val jumpy = frames(10, 100, 100, 12)
    val flat = frames(42, 42)   // one scene, tie → frame 0
    val df = Seq((1L, jumpy), (2L, flat)).toDF("doc_id", "payload")
    val out = Multimodal.keyframes(df, col("doc_id"), col("payload"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq === Seq(
      (1L, 0L, 0L, 0L, 10L),
      (1L, 1L, 1L, 1L, 100L),   // tie between frames 1 and 2 → 1
      (1L, 2L, 3L, 3L, 12L),
      (2L, 0L, 0L, 0L, 42L)))
    // structural law vs m08: scenes per doc == n_cuts + 1
    val cuts = Multimodal.sceneCuts(df, col("doc_id"), col("payload"))
      .select("doc_id", "n_cuts").as[(Long, Long)].collect().toMap
    val scenes = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(scenes === cuts.map { case (k, c) => k -> (c + 1).toInt })
  }

  test("videoNearDupPairs: same cut rhythm pairs across a leading-frame " +
       "offset; different rhythm and cut-poor payloads never pair") {
    import spark.implicits._
    def frames(es: Int*): Array[Byte] =
      es.flatMap(e => Array.fill(64)(e.toByte)).toArray
    // A: cuts at frames 1,3,4 → deltas [2,1]
    val a = frames(10, 100, 100, 10, 100)
    // B: A shifted by two leading same-energy frames → cuts at 3,5,6,
    // SAME deltas [2,1] → pairs with A (the offset-cancel contract)
    val b = frames(10, 10, 10, 100, 100, 10, 100)
    // C: cuts at 1,2,3 → deltas [1,1] ≠ [2,1]
    val c = frames(10, 100, 10, 100)
    // D: one cut only → no interval sequence, sig NULL
    val d = frames(10, 100)
    val df = Seq((1L, a), (2L, b), (3L, c), (4L, d))
      .toDF("doc_id", "payload")
    val pairs = Multimodal.videoNearDupPairs(df, col("doc_id"),
        col("payload"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
    // signature fold matches the t04/list_reduce convention:
    // deltas [2,1] → seed 2, then (2*131 + 1) % 2147483647 = 263
    val sig = Multimodal.sceneSignature(df, col("doc_id"), col("payload"))
      .filter(col("doc_id") === 1L).select("sig").as[Long].collect()(0)
    assert(sig === 263L)

    // the d11-style quadratic guard is behavior, not documentation: a
    // signature bucket above the cap emits NO pairs (a hot rhythm is
    // format-twin noise, k²/2 pairs of it), smaller buckets unaffected
    val many = (10L to 14L).map(i => (i, a)) :+ (1L -> a) :+ (2L -> b)
    val mdf = many.toDF("doc_id", "payload")
    val capped = Multimodal.videoNearDupPairs(mdf, col("doc_id"),
        col("payload"), maxBucket = Some(3L))
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(capped.isEmpty)  // the one bucket holds 7 > 3 docs
    val uncapped = Multimodal.videoNearDupPairs(mdf, col("doc_id"),
        col("payload"))
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(uncapped.length === 7 * 6 / 2)
  }

  test("m10: synthWav round-trips through the REAL WAV decode to the " +
      "staircase levels") {
    // envelope window means land exactly on synthLevel's steps, so the
    // decoded fingerprint equals the one computed from the levels alone
    val id = 7L
    var want = 0L
    for (f <- 0 until 64)
      if (Multimodal.synthLevel(id, f + 1) > Multimodal.synthLevel(id, f))
        want |= 1L << f
    assert(Multimodal.audioFingerprint(Multimodal.synthWav(id, 1)) === want)
  }

  test("m10: envelope fingerprint is invariant under volume scaling") {
    for (id <- 0L until 50L)
      assert(Multimodal.audioFingerprint(Multimodal.synthWav(id, 1)) ===
        Multimodal.audioFingerprint(Multimodal.synthWav(id, 2)))
  }

  test("m10: the near-dup join finds exactly the re-encoded pairs") {
    val ids = (0L until 40L).toDF("doc_id")
    val corpus = Multimodal.synthWavCorpus(ids, col("doc_id"),
      offset = 1000L)
    val pairs = Multimodal.audioNearDupPairs(corpus, col("doc_id"),
        col("payload"), maxDist = 3)
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(pairs.length === 40)
    assert(pairs.forall { case (a, b, hm) => b == a + 1000L && hm == 0 })
  }
}
