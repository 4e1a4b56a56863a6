package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkTest {

  private def media = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "hello world payload", "image"),
      (2L, "another payload with more bytes inside it", "video"),
      (3L, "audio-ish payload", "audio")
    ).toDF("doc_id", "text", "kind")
  }

  test("fromText builds typed media rows; byteStats stays exact") {
    val s = spark; import s.implicits._
    val img = Multimodal.fromText(media.filter($"kind" === "image"), "doc_id", "text", "image")
    val stats = Multimodal.byteStats(img.toDF()).head()
    assert(stats.getAs[Long]("n_bytes") == "hello world payload".getBytes.length.toLong)
  }

  test("extractFeatures: histogram normalized, dims from stub, batched per partition") {
    val s = spark; import s.implicits._
    val ds = Multimodal.fromText(media, "doc_id", "text", "image")
    val feats = Multimodal.extractFeatures(ds, dim = 8).collect()
    assert(feats.length == 3)
    feats.foreach { f =>
      assert(f.feature.length == 8)
      assert(math.abs(f.feature.sum - 1.0f) < 1e-5) // normalized histogram
      assert(f.width > 0 && f.height > 0)
    }
    // deterministic: same input -> same features
    val again = Multimodal.extractFeatures(ds, dim = 8).collect()
    assert(feats.map(_.feature.toSeq).toSet == again.map(_.feature.toSeq).toSet)
  }

  test("sampleFrames: only video rows fan out, frames keep byte content") {
    val s = spark; import s.implicits._
    val all = media.withColumn("kind2", $"kind").drop("kind").withColumnRenamed("kind2", "kind")
    val ds = all.select(
      $"doc_id".as("media_id"), $"kind",
      $"text".cast("binary").as("bytes"),
      map(lit("k"), lit("v")).as("meta")).as[Multimodal.Media]
    val frames = Multimodal.sampleFrames(ds, everyN = 4).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.media_id == 2L)) // only the video row
    assert(frames.map(_.frame_idx).forall(_ % 4 == 0))
    val reassembled = frames.sortBy(_.frame_idx)
    assert(reassembled.head.bytes.nonEmpty)
  }

  test("resizeAll bounds payloads and records target dims in metadata") {
    val ds = Multimodal.fromText(media, "doc_id", "text", "image")
    val resized = Multimodal.resizeAll(ds, 4, 3).collect()
    assert(resized.length == 3)
    resized.foreach { m =>
      assert(m.bytes.length <= 4 * 3)
      assert(m.meta("width") == "4" && m.meta("height") == "3")
    }
  }
}
