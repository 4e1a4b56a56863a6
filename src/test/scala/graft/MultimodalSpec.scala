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

  test("AHash64 matches a direct reimplementation and handles the empty payload") {
    def ref(bytes: Array[Byte]): Long = {
      val n = bytes.length.toLong
      if (n == 0) return 0L
      val total = bytes.map(b => (b & 0xff).toLong).sum
      (0 until 64).foldLeft(0L) { (h, b) =>
        val lo = (b * n / 64).toInt; val hi = ((b + 1) * n / 64).toInt
        val s = bytes.slice(lo, hi).map(x => (x & 0xff).toLong).sum
        if (hi > lo && s * n >= total * (hi - lo)) h | (1L << b) else h
      }
    }
    val payloads = Seq("", "x", "hello world payload with enough bytes to fill many spans",
      ("ab" * 200))
    payloads.foreach { p =>
      assert(graft.plans.AHash64.hash(p.getBytes("UTF-8")) == ref(p.getBytes("UTF-8")))
    }
    // via the Column API (codegen path)
    val s = spark; import s.implicits._
    val got = payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("media_id", "text")
      .select($"media_id", graft.functions.ahash64($"text".cast("binary")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    payloads.zipWithIndex.foreach { case (p, i) =>
      assert(got(i.toLong) == ref(p.getBytes("UTF-8")))
    }
  }

  test("aHash is invariant under an unclamped brightness shift") {
    val ds = Multimodal.fromText(media, "doc_id", "text", "image")
    val orig = Multimodal.aHashes(ds.toDF()).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val shifted = Multimodal.aHashes(
      Multimodal.brightnessVariant(ds, delta = 8, idOffset = 100L).toDF())
      .collect().map(r => r.getLong(0) - 100L -> r.getLong(1)).toMap
    assert(orig == shifted)
  }

  test("silenceSegments: hand-traced islands, ragged tail, all-silent asset") {
    val s = spark; import s.implicits._
    // blockSize 4, center 100 ('d'): "dddd" is dead silence (energy 0),
    // "!!!!" is loud (4·67² = 17956), "zzzz" is quiet-but-voiced (4·22²
    // = 1936); the 2-byte ragged tail "!!" is loud (2·67² = 8978)
    val m = Seq(
      (1L, "dddd!!!!ddddzzzz!!"),
      (2L, "dddddddd") // all silent -> no segments
    ).toDF("doc_id", "text")
    val media = Multimodal.fromText(m, "doc_id", "text", "audio").toDF()
    val segs = Multimodal.silenceSegments(media,
      blockSize = 4, center = 100, minEnergy = 1000L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(segs == Set(
      (1L, 1, 1, 1, 1L, 17956L), // "!!!!"
      (1L, 2, 3, 4, 2L, 1936L + 8978L))) // "zzzz" + ragged "!!" merge into one run
    // direct expression check incl. the ragged block
    val e = graft.plans.ByteBlockEnergy.energies(
      "dddd!!!!ddddzzzz!!".getBytes("UTF-8"), 4, 100)
    assert(e.toLongArray().toSeq == Seq(0L, 17956L, 0L, 1936L, 8978L))
  }


  test("sceneCuts: uniform video has no cuts; an abrupt change cuts exactly once") {
    val s = spark; import s.implicits._
    // 64 bytes -> stub fs = 4, 16 frames. Doc 1 is uniform (every frame
    // identical -> Hamming 0 everywhere). Doc 2 flips halfway from 'a's
    // to 'z!' alternation: within each half frames repeat, so the only
    // perceptual jump is at the half boundary.
    val uniform = "ab" * 32
    val shift = ("aaaa" * 8) + ("z!z!" * 8)
    val m = Seq((1L, uniform, "video"), (2L, shift, "video"))
      .toDF("doc_id", "text", "kind")
    val cuts = Multimodal.sceneCuts(
        Multimodal.fromText(m, "doc_id", "text", "video"),
        everyN = 1, minHamming = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toList
    assert(!cuts.exists(_._1 == 1L), "uniform video must have zero cuts")
    assert(cuts.filter(_._1 == 2L).map(_._2) == List(8),
      "the only cut is the first frame of the changed half")
  }

  test("ahashPairs finds planted brightness variants and agrees with brute force") {
    val ds = Multimodal.fromText(media, "doc_id", "text", "image")
    val all = ds.unionByName(Multimodal.brightnessVariant(ds, 8, 100L))
    val pairs = Multimodal.ahashPairs(all.toDF(), maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // every (asset, variant) pair surfaces at Hamming 0
    Seq(1L, 2L, 3L).foreach(id => assert(pairs.contains((id, id + 100L, 0))))
    // banded candidates lose nothing vs the brute-force Hamming ball
    val hs = Multimodal.aHashes(all.toDF()).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(pairs == brute)
  }
}
