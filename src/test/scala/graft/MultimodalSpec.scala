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
}
