package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata alongside. The Spark
  * side — schema, partitioning, batch iteration — is real; the actual
  * media decode is STUBBED with a deterministic fake (no image/audio
  * libraries in this environment). Swap [[decodeStub]] for a real
  * decoder (e.g. JNI/javacv) without touching the pipeline shape.
  */
object Multimodal {

  /** Typed metadata extracted from a binary payload: row-local, codegen
    * built-ins only. `magic` = first 4 bytes hex — enough to dispatch a
    * real decoder per format. */
  def withMeta(df: DataFrame, bin: Column): DataFrame = df
    .withColumn("n_bytes", length(bin).cast("long"))
    .withColumn("magic", lower(hex(substring(bin, 1, 4))))

  /** Deterministic stand-in decode: 16-bin byte-value histogram as the
    * "feature vector". Shapewise identical to a real per-item feature
    * extractor (binary → fixed-size Array[Float]). */
  final case class Feature(doc_id: Long, n_bytes: Int, features: Array[Float])

  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) % 16) += 1f; i += 1 }
    if (bytes.length > 0) {
      var j = 0
      while (j < 16) { hist(j) /= bytes.length; j += 1 }
    }
    hist
  }

  /** Format-dispatched decode: UNCOMPRESSED formats are decodable with
    * zero codec libraries, so they get REAL decoders — 24-bit BMP →
    * `[width, height, meanBlue, meanGreen, meanRed]`, RIFF/WAV PCM-16
    * audio → `[sampleRate, channels, framesPerChannel, rms, peak]` —
    * and everything else falls back to [[decodeStub]]. The magic-byte
    * dispatch is exactly where jpeg/png/h264 decoders slot in on a
    * cluster that ships codec libs. */
  def decode(bytes: Array[Byte]): Array[Float] =
    if (bytes.length > 54 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
      decodeBmp24(bytes).getOrElse(decodeStub(bytes))
    else if (bytes.length > 44 &&
        bytes(0) == 'R'.toByte && bytes(1) == 'I'.toByte &&
        bytes(2) == 'F'.toByte && bytes(3) == 'F'.toByte &&
        bytes(8) == 'W'.toByte && bytes(9) == 'A'.toByte &&
        bytes(10) == 'V'.toByte && bytes(11) == 'E'.toByte)
      decodeWavPcm16(bytes).getOrElse(decodeStub(bytes))
    else decodeStub(bytes)

  /** Hand-rolled uncompressed 24bpp bottom-up/top-down BMP parse. */
  private def decodeBmp24(b: Array[Byte]): Option[Array[Float]] = {
    def i32(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def i16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    val dataOff = i32(10); val w = i32(18); val h = i32(22)
    if (i16(28) != 24 || i32(30) != 0 || w <= 0 || h == 0 ||
        h == Int.MinValue) return None
    val height = math.abs(h)
    // Long arithmetic: a corrupt width must fail the bounds check, not
    // overflow rowSize negative and walk past the array
    val rowSize = ((w.toLong * 3 + 3) / 4) * 4 // rows pad to 4 bytes
    if (dataOff < 0 || dataOff.toLong + rowSize * height > b.length)
      return None
    var sb = 0L; var sg = 0L; var sr = 0L
    var r = 0
    while (r < height) {
      val base = dataOff + r * rowSize.toInt
      var c = 0
      while (c < w) {
        val p = base + c * 3
        sb += b(p) & 0xff; sg += b(p + 1) & 0xff; sr += b(p + 2) & 0xff
        c += 1
      }
      r += 1
    }
    val n = w.toLong * height
    Some(Array(w.toFloat, height.toFloat,
      (sb.toDouble / n).toFloat, (sg.toDouble / n).toFloat,
      (sr.toDouble / n).toFloat))
  }

  /** Hand-rolled RIFF/WAV PCM 16-bit parse: walks the chunk list (even
    * alignment honored), requires an uncompressed PCM `fmt ` chunk, and
    * computes RMS + peak over the little-endian samples. Bounds-checked
    * like the BMP path: a corrupt chunk size fails the parse instead of
    * walking past the array. */
  private def decodeWavPcm16(b: Array[Byte]): Option[Array[Float]] = {
    def i32(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def i16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    var off = 12
    var rate = 0; var ch = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= b.length && (dataOff < 0 || rate == 0)) {
      val sz = i32(off + 4)
      if (sz < 0 || off.toLong + 8 + sz > b.length) return None
      if (b(off) == 'f'.toByte && b(off + 1) == 'm'.toByte &&
          b(off + 2) == 't'.toByte && b(off + 3) == ' '.toByte) {
        if (sz < 16 || i16(off + 8) != 1) return None // PCM only
        ch = i16(off + 10); rate = i32(off + 12); bits = i16(off + 22)
      } else if (b(off) == 'd'.toByte && b(off + 1) == 'a'.toByte &&
          b(off + 2) == 't'.toByte && b(off + 3) == 'a'.toByte) {
        dataOff = off + 8; dataLen = sz
      }
      off += 8 + sz + (sz & 1) // chunks pad to even offsets
    }
    if (rate <= 0 || ch <= 0 || bits != 16 || dataOff < 0) return None
    val n = dataLen / 2
    if (n <= 0) return None
    var ss = 0.0; var peak = 0
    var i = 0
    while (i < n) {
      val o = dataOff + i * 2
      val s = (((b(o) & 0xff) | (b(o + 1) << 8)).toShort).toInt
      ss += s.toDouble * s
      val a = math.abs(s); if (a > peak) peak = a
      i += 1
    }
    Some(Array(rate.toFloat, ch.toFloat, (n / ch).toFloat,
      math.sqrt(ss / n).toFloat, peak.toFloat))
  }

  /** 64-bit perceptual difference hash (dHash) of a binary payload —
    * the standard near-duplicate-IMAGE fingerprint: downsample to a
    * 9×8 grid, emit one bit per horizontal neighbour comparison
    * (bit r·8+c = 1 iff cell[r][c+1] > cell[r][c]). Real decode for
    * uncompressed 24-bit BMP (integer-luma box average, bottom-up and
    * top-down rows normalized to the same orientation); any other
    * payload falls back to a deterministic stride-sampled BYTE grid —
    * the documented stub path (same shape a jpeg decoder slots into),
    * which for ASCII payloads is DuckDB-expressible, so the gate
    * oracle covers the full pair pipeline. Integer comparisons only:
    * bit-identical everywhere. */
  def imageDHash(bytes: Array[Byte]): Long = {
    val grid = grayGrid9x8(bytes).getOrElse(byteGrid9x8(bytes))
    var fp = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (grid(r * 9 + c + 1) > grid(r * 9 + c)) fp |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    fp
  }

  /** 24bpp BMP → 8 rows × 9 cols integer-luma box averages (top-down
    * orientation whatever the row order on disk). None for non-BMP /
    * too-small / corrupt payloads — bounds-checked like decodeBmp24. */
  private def grayGrid9x8(b: Array[Byte]): Option[Array[Int]] = {
    if (b.length <= 54 || b(0) != 'B'.toByte || b(1) != 'M'.toByte) return None
    def i32(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def i16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    val dataOff = i32(10); val w = i32(18); val h = i32(22)
    if (i16(28) != 24 || i32(30) != 0 || w < 9 || h == 0 ||
        h == Int.MinValue) return None
    val height = math.abs(h)
    if (height < 8) return None
    val bottomUp = h > 0
    val rowSize = ((w.toLong * 3 + 3) / 4) * 4
    if (dataOff < 0 || dataOff.toLong + rowSize * height > b.length)
      return None
    val grid = new Array[Int](72)
    var gr = 0
    while (gr < 8) {
      val r0 = gr * height / 8; val r1 = (gr + 1) * height / 8
      var gc = 0
      while (gc < 9) {
        val c0 = gc * w / 9; val c1 = (gc + 1) * w / 9
        var luma = 0L
        var r = r0
        while (r < r1) {
          // top-down pixel row r lives at disk row (height-1-r) when
          // the file is bottom-up — same hash for both encodings
          val disk = if (bottomUp) height - 1 - r else r
          val base = dataOff + disk * rowSize.toInt
          var c = c0
          while (c < c1) {
            val p = base + c * 3
            luma += 114L * (b(p) & 0xff) + 587L * (b(p + 1) & 0xff) +
              299L * (b(p + 2) & 0xff)
            c += 1
          }
          r += 1
        }
        grid(gr * 9 + gc) = (luma / ((r1 - r0).toLong * (c1 - c0))).toInt
        gc += 1
      }
      gr += 1
    }
    Some(grid)
  }

  /** Stub grid for undecodable payloads: 72 bytes sampled at a fixed
    * stride (`max(len/72, 1)`, clamped) — deterministic, and for ASCII
    * payloads reproducible in SQL (byte i == code point i). */
  private def byteGrid9x8(b: Array[Byte]): Array[Int] = {
    val grid = new Array[Int](72)
    if (b.length == 0) return grid
    val stride = math.max(b.length / 72, 1)
    var i = 0
    while (i < 72) {
      grid(i) = b(math.min(i * stride, b.length - 1)) & 0xff
      i += 1
    }
    grid
  }

  /** RIFF/WAV PCM-16 |sample| extractor — the same bounds-checked
    * chunk walk as [[decodeWavPcm16]], returning the magnitude stream
    * instead of summary stats (the fingerprint needs the envelope's
    * SHAPE, not its moments). */
  private def wavAbsSamples(b: Array[Byte]): Option[Array[Int]] = {
    if (b.length < 12 || b(0) != 'R'.toByte || b(1) != 'I'.toByte ||
        b(2) != 'F'.toByte || b(3) != 'F'.toByte) return None
    def i32(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def i16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    var off = 12
    var rate = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= b.length && (dataOff < 0 || rate == 0)) {
      val sz = i32(off + 4)
      if (sz < 0 || off.toLong + 8 + sz > b.length) return None
      if (b(off) == 'f'.toByte && b(off + 1) == 'm'.toByte &&
          b(off + 2) == 't'.toByte && b(off + 3) == ' '.toByte) {
        if (sz < 16 || i16(off + 8) != 1) return None // PCM only
        rate = i32(off + 12); bits = i16(off + 22)
      } else if (b(off) == 'd'.toByte && b(off + 1) == 'a'.toByte &&
          b(off + 2) == 't'.toByte && b(off + 3) == 'a'.toByte) {
        dataOff = off + 8; dataLen = sz
      }
      off += 8 + sz + (sz & 1)
    }
    if (rate <= 0 || bits != 16 || dataOff < 0) return None
    val n = dataLen / 2
    if (n <= 0) return None
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val o = dataOff + i * 2
      out(i) = math.abs((((b(o) & 0xff) | (b(o + 1) << 8)).toShort).toInt)
      i += 1
    }
    Some(out)
  }

  /** 64-bit audio energy-delta fingerprint — the audio face of
    * [[imageDHash]]'s recipe: split the |sample| stream into 65 equal
    * windows (exact integer boundaries `floor(f·n/65)`), take the
    * integer MEAN energy per window, emit bit f = E(f+1) > E(f). The
    * envelope's up/down shape survives volume scaling poorly but
    * trims, padding, and re-encodes well — the cheap audio near-dup
    * signal. Real decode for RIFF/WAV PCM-16 ([[wavAbsSamples]]); any
    * other payload falls back to its unsigned bytes as the sample
    * stream — the documented stub path (same convention as
    * imageDHash's byte grid), ASCII-expressible so the gate oracle
    * covers the full pair pipeline. Integer arithmetic only. */
  private def envelope(bytes: Array[Byte]): Array[Long] = {
    val s: Array[Int] = wavAbsSamples(bytes).getOrElse {
      val a = new Array[Int](bytes.length)
      var i = 0
      while (i < bytes.length) { a(i) = bytes(i) & 0xff; i += 1 }
      a
    }
    val n = s.length
    val e = new Array[Long](65)
    var f = 0
    while (f < 65) {
      val i0 = (f.toLong * n / 65).toInt
      val i1 = ((f + 1).toLong * n / 65).toInt
      var sum = 0L
      var i = i0
      while (i < i1) { sum += s(i); i += 1 }
      e(f) = if (i1 > i0) sum / (i1 - i0) else 0L
      f += 1
    }
    e
  }

  private def fpOf(e: Array[Long]): Long = {
    var fp = 0L
    var f = 0
    while (f < 64) { if (e(f + 1) > e(f)) fp |= 1L << f; f += 1 }
    fp
  }

  def audioFingerprint(bytes: Array[Byte]): Long = fpOf(envelope(bytes))

  /** Gated face of the audio fingerprint: per payload, the 64-bit
    * envelope fingerprint plus integer window stats (peak and mean of
    * the 65 window means) — all computable bit-exactly over the ASCII
    * stub path, so the full decode→window→delta pipeline oracles. The
    * near-dup JOIN face is spec-verified on REAL WAVs instead: on
    * non-audio byte payloads envelope hamming distances are noise
    * (measured ≥11 on the benchmark corpus), so a pair gate there
    * would assert an empty set. */
  def audioStats(df: DataFrame, id: Column, bin: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("doc_id"), bin.as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (i, bytes) =>
          val e = envelope(bytes)
          (i, fpOf(e), e.max, e.sum / 65)
        }
      }
      .toDF("doc_id", "fp", "e_peak", "e_mean")
  }

  /** Near-duplicate audio: energy-delta fingerprint per payload, then
    * the shared pigeonhole hamming join — m05's pipeline with the
    * audio fingerprint slotted in. Never all-pairs. */
  def audioNearDupPairs(df: DataFrame, id: Column, bin: Column,
                        maxDist: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val withFp = df.select(id.cast("long").as("id"), bin.as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (i, bytes) => (i, audioFingerprint(bytes)) } }
      .toDF("id", "fp")
    Dedup.hamming64Pairs(withFp, maxDist)
  }

  /** Per-window level of the synthetic WAV corpus (m10): the q43 hash
    * chain (x⁵ mod 2³¹-1, a bijection since gcd(5, P-1) = 1) over
    * key = docId·2¹⁶ + window, reduced to one of 7 amplitude steps —
    * measured 5000/5000 distinct fingerprints, min cross-doc hamming
    * 10. Anything with less mixing leaves modular structure: a single
    * square of a SMALL affine key never wraps P (pure mod-7 classes,
    * period 7 in docId), and even a wide affine leaves the
    * floor(s²/P) Beatty pattern correlated across ids — both measured
    * as mass fingerprint collisions. Integer-only, so a SQL engine
    * replays it exactly. */
  def synthLevel(docId: Long, f: Int): Long = {
    val P = 2147483647L
    val h0 = ((docId * 65536L + f) * 131071L + 524287L) % P
    val h2 = (h0 * h0) % P
    val h = (((h2 * h2) % P) * h0) % P
    800L + 100L * (h % 7L)
  }

  /** Minimal RIFF/WAV PCM-16 payload carrying [[synthLevel]]'s 65-step
    * staircase (20 samples per step, so [[envelope]]'s exact window
    * boundaries land on the steps and each window mean IS the level),
    * amplitude-scaled by `scale`. Exercises the REAL [[wavAbsSamples]]
    * decode path — header walk, PCM-16 LE, |sample| — not the byte
    * stub. */
  def synthWav(docId: Long, scale: Int): Array[Byte] = {
    val windows = 65; val perWin = 20
    val n = windows * perWin
    val dataLen = n * 2
    val riffLen = 4 + (8 + 16) + (8 + dataLen)
    val bb = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(riffLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(8000); bb.putInt(16000); bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    var f = 0
    while (f < windows) {
      val lvl = (synthLevel(docId, f) * scale).toShort
      var i = 0
      while (i < perWin) { bb.putShort(lvl); i += 1 }
      f += 1
    }
    bb.array()
  }

  /** The m10 gate corpus: for every id, a real WAV payload plus a
    * volume-doubled RE-ENCODE of the same signal under id + offset —
    * the container/loudness-change duplicate an audio dedup pass must
    * catch. The envelope fingerprint compares window means pairwise,
    * so any monotone amplitude scaling preserves every bit — the
    * invariance this corpus gates. Row-local mapPartitions codec
    * dispatch (m02's convention). The default offset is 2⁴⁰ — the
    * first cut used 10⁷, which the sf10 CORRECTNESS gate caught
    * colliding with real replica doc_ids (sf10 ids reach 9.9·10⁷):
    * variant ids aliased onto other documents' ids, two entries per
    * aliased id with different payloads. Scale-proofing ID spaces
    * means offsets above any REACHABLE id, not any convenient one. */
  def synthWavCorpus(ids: DataFrame, id: Column,
                     offset: Long = 1L << 40): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(id.cast("long").as("id")).as[Long]
      .mapPartitions { it =>
        it.flatMap { i =>
          Iterator((i, synthWav(i, 1)), (i + offset, synthWav(i, 2)))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Shot-boundary (scene-cut) detection over a binary payload (m08):
    * m03's fixed-size frame windows, integer mean energy per frame, a
    * CUT wherever consecutive frame energies jump by more than `tau` —
    * the video scene-detect row shape, with a real per-frame decoder
    * slotting into the same energy position. Entirely row-local
    * (mapPartitions codec dispatch, m02's convention); integer
    * arithmetic only, so the gate oracle reproduces it bit-exactly
    * over the ASCII stub path. */
  def sceneCuts(df: DataFrame, id: Column, bin: Column,
                frameBytes: Int = 64, tau: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("doc_id"), bin.as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (docId, bytes) =>
          val n = bytes.length
          val nf = math.max((n + frameBytes - 1) / frameBytes, 1)
          var prev = 0L
          var cuts = 0L
          var first: Option[Long] = None
          var f = 0
          while (f < nf) {
            val i0 = f * frameBytes
            val i1 = math.min((f + 1) * frameBytes, n)
            var sum = 0L
            var i = i0
            while (i < i1) { sum += bytes(i) & 0xff; i += 1 }
            val e = if (i1 > i0) sum / (i1 - i0) else 0L
            if (f > 0 && math.abs(e - prev) > tau) {
              cuts += 1
              if (first.isEmpty) first = Some(f.toLong)
            }
            prev = e
            f += 1
          }
          (docId, nf.toLong, cuts, first)
        }
      }
      .toDF("doc_id", "n_frames", "n_cuts", "first_cut")
  }

  /** Scene SIGNATURE (m09): the video near-dup key built on
    * [[sceneCuts]]'s boundaries — a rolling hash over the sequence of
    * CUT-TO-CUT frame intervals (deltas, not absolute positions, so
    * two copies of the same edit offset by leading frames still
    * collide as long as their frame grids align — the same
    * alignment contract as m08/d16; content-defined resync is d17's
    * job). Fold matches t04's convention exactly — DuckDB
    * `list_reduce` semantics: the first delta seeds the accumulator,
    * then h = (h*131 + d) mod 2147483647 per remaining delta.
    * Row-local; docs with fewer than 2 cuts have no interval
    * sequence and emit sig = NULL (they never pair). */
  def sceneSignature(df: DataFrame, id: Column, bin: Column,
                     frameBytes: Int = 64, tau: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("doc_id"), bin.as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (docId, bytes) =>
          val n = bytes.length
          val nf = math.max((n + frameBytes - 1) / frameBytes, 1)
          var prev = 0L
          var lastCut = -1L
          var nCuts = 0L
          var sig = 0L
          var seeded = false
          var f = 0
          while (f < nf) {
            val i0 = f * frameBytes
            val i1 = math.min((f + 1) * frameBytes, n)
            var sum = 0L
            var i = i0
            while (i < i1) { sum += bytes(i) & 0xff; i += 1 }
            val e = if (i1 > i0) sum / (i1 - i0) else 0L
            if (f > 0 && math.abs(e - prev) > tau) {
              if (lastCut >= 0) {
                val d = f - lastCut
                if (!seeded) { sig = d; seeded = true }
                else sig = (sig * 131 + d) % 2147483647L
              }
              lastCut = f
              nCuts += 1
            }
            prev = e
            f += 1
          }
          (docId, nCuts, if (seeded) Some(sig) else None)
        }
      }
      .toDF("doc_id", "n_cuts", "sig")
  }

  /** KEYFRAME selection per scene (m11): split each video at
    * [[sceneCuts]]'s boundaries and pick, per scene, the frame with
    * the MAXIMUM mean energy (ties → lowest frame index) — the
    * representative-frame extraction a vision-training pipeline runs
    * so that downstream embedding/captioning sees one frame per shot
    * instead of every frame (a 100× decode-cost cut at typical shot
    * lengths). A cut at frame f starts a new scene at f, matching
    * m08's boundary definition exactly.
    *
    * One row per (doc, scene): scene start, its frame count, the
    * chosen keyframe index and its energy. Entirely row-local
    * (mapPartitions codec dispatch, m02's convention) — scene state
    * never crosses a row, the 100 TB shape is a pure scan. Integer
    * arithmetic only, so an oracle replays it from the frame-energy
    * CTE bit-exactly. */
  def keyframes(df: DataFrame, id: Column, bin: Column,
                frameBytes: Int = 64, tau: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("doc_id"), bin.as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (docId, bytes) =>
          val n = bytes.length
          val nf = math.max((n + frameBytes - 1) / frameBytes, 1)
          val out = List.newBuilder[(Long, Long, Long, Long, Long)]
          var sceneId = 0L
          var sceneStart = 0L
          var bestF = 0L
          var bestE = Long.MinValue
          var prev = 0L
          var f = 0
          while (f < nf) {
            val i0 = f * frameBytes
            val i1 = math.min((f + 1) * frameBytes, n)
            var sum = 0L
            var i = i0
            while (i < i1) { sum += bytes(i) & 0xff; i += 1 }
            val e = if (i1 > i0) sum / (i1 - i0) else 0L
            if (f > 0 && math.abs(e - prev) > tau) {
              out += ((docId, sceneId, sceneStart, bestF, bestE))
              sceneId += 1; sceneStart = f; bestF = f; bestE = Long.MinValue
            }
            if (e > bestE) { bestE = e; bestF = f }
            prev = e
            f += 1
          }
          out += ((docId, sceneId, sceneStart, bestF, bestE))
          out.result()
        }
      }
      .toDF("doc_id", "scene_id", "start_frame", "key_frame", "key_energy")
  }

  /** Near-duplicate videos (m09): equal scene signature + equal cut
    * count, id_a < id_b. The join key is the 3-long (doc_id, n_cuts,
    * sig) row — payloads never shuffle; at 100 TB the signature table
    * is ~16 bytes/video.
    *
    * `maxBucket` is the d11 quadratic guard, and it is NOT optional
    * at scale: a signature shared by k videos emits k²/2 pairs, and a
    * degenerate rhythm (metronomic cuts, boilerplate intros) goes hot
    * exactly like an LSH boilerplate bucket — measured on this
    * benchmark corpus, the uncapped join emits 2.79M pairs at sf1
    * (50k docs) where cap=64 keeps the mining sub-quadratic. A hot
    * signature is a WEAK near-dup signal anyway (thousands of videos
    * sharing one rhythm are format twins, not copies), the d11
    * recall argument verbatim. */
  def videoNearDupPairs(df: DataFrame, id: Column, bin: Column,
                        frameBytes: Int = 64, tau: Int = 4,
                        minCuts: Long = 2L,
                        maxBucket: Option[Long] = None): DataFrame = {
    val sigs0 = sceneSignature(df, id, bin, frameBytes, tau)
      .filter(col("n_cuts") >= minCuts && col("sig").isNotNull)
    val sigs = maxBucket.fold(sigs0) { cap =>
      val hot = sigs0.groupBy("sig", "n_cuts")
        .agg(count(lit(1)).as("__n")).filter(col("__n") > cap)
        .select("sig", "n_cuts")
      sigs0.join(hot, Seq("sig", "n_cuts"), "left_anti")
    }
    sigs.as("a").join(sigs.as("b"),
        col("a.sig") === col("b.sig") &&
        col("a.n_cuts") === col("b.n_cuts") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.n_cuts").as("n_cuts"))
  }

  /** Near-duplicate images: dHash per payload (mapPartitions — a real
    * codec would init once per partition), then the shared pigeonhole
    * hamming join ([[Dedup.hamming64Pairs]]). Never all-pairs. */
  def imagePhashPairs(df: DataFrame, id: Column, bin: Column,
                      maxDist: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val withFp = df.select(id.cast("long").as("id"), bin.as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (i, bytes) => (i, imageDHash(bytes)) } }
      .toDF("id", "fp")
    Dedup.hamming64Pairs(withFp, maxDist)
  }

  /** Fixed-size frame/chunk sampling of a binary payload: one output
    * row per `chunkBytes` window (think video frame extraction or audio
    * windowing — here over the opaque bytes; a real decoder would slot
    * into the same (id, frame_idx, frame) row shape). Row-local explode;
    * at scale the explode fans out BEFORE any shuffle so frames
    * distribute across the cluster. */
  def frameSample(df: DataFrame, id: Column, bin: Column,
                  chunkBytes: Int = 256): DataFrame = {
    val nChunks = greatest(
      floor((length(bin) + (chunkBytes - 1)) / chunkBytes).cast("int"), lit(1))
    df.select(id.as("id"), bin.as("b"), nChunks.as("nch"))
      .select(col("id"),
        posexplode(transform(sequence(lit(0), col("nch") - 1),
          i => substring(col("b"), i * chunkBytes + 1, lit(chunkBytes)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame")
  }

  /** Stride "resize": keep every `stride`-th byte of the payload — the
    * byte-level stand-in for image downscaling; a real resampler slots
    * into the same binary→binary batch shape (mapPartitions, one codec
    * init per partition). */
  final case class Resized(doc_id: Long, n_in: Int, payload: Array[Byte])

  def resizeStride(df: DataFrame, id: Column, bin: Column,
                   stride: Int): Dataset[Resized] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("id"), bin.as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (docId, bytes) =>
          val out = new Array[Byte]((bytes.length + stride - 1) / stride)
          var i = 0
          while (i < out.length) { out(i) = bytes(i * stride); i += 1 }
          Resized(docId, bytes.length, out)
        }
      }
  }

  /** Batch feature extraction over (id, payload) rows. mapPartitions so
    * a real decoder could amortize per-batch model/codec init exactly
    * like mapInPandas would — one init per partition, streamed rows. */
  def extractFeatures(df: DataFrame, id: Column, bin: Column): Dataset[Feature] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("id"), bin.as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init would go here (codec/model handle)
        it.map { case (docId, bytes) =>
          Feature(docId, bytes.length, decode(bytes))
        }
      }
  }
}
