package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite {

  test("decode stub is deterministic and md5-derived") {
    val payload = "hello world".getBytes("UTF-8")
    val (w1, h1) = Multimodal.MediaDecoder.decodeStub(payload)
    val (w2, h2) = Multimodal.MediaDecoder.decodeStub(payload)
    assert((w1, h1) == (w2, h2))
    assert(w1 >= 64 && w1 < 576 && h1 >= 64 && h1 < 576)
  }

  test("binary payload plumbing: one metadata row per document, sane sizes") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val meta = Multimodal.mediaMeta(spark, TestSpark.sfDir)
    assert(meta.count() == docs.count())
    val joined = meta.join(docs, "doc_id")
      .select($"n_bytes", org.apache.spark.sql.functions.length($"text").cast("long").as("len"))
      .collect()
    joined.foreach(r => assert(r.getLong(0) == r.getLong(1))) // ASCII text: bytes == chars
    assert(meta.select($"media_type").distinct().count() == 3)
  }
}
