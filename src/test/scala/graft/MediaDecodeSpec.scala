package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{MediaDecode, MediaRecord}

/** The typed mapPartitions decode path (m02's engine) must agree with
  * direct application of the decoder, and the stub decoder itself must be
  * deterministic on known bytes. */
class MediaDecodeSpec extends SparkSuite {

  test("decodeBatch on known payloads") {
    val r = MediaRecord(7L, "video", Array[Byte](10, 20, 30, 40, 50))
    val Seq(f) = MediaDecode.decodeBatch(Seq(r))
    f.media_id shouldBe 7L
    f.n_bytes shouldBe 5L
    f.width shouldBe 11 // 1 + (10 & 0x7f)
    f.height shouldBe 21 // 1 + (20 & 0x7f)
    f.avg_byte shouldBe 30.0 // floor((10+20+30+40+50)/5)
    f.n_frames shouldBe 1 // 5 bytes / 100 + 1
  }

  test("empty payload yields the documented degenerate features") {
    val Seq(f) = MediaDecode.decodeBatch(Seq(MediaRecord(1L, "image", Array.empty)))
    (f.width, f.height, f.avg_byte, f.n_frames) shouldBe ((1, 1, 0.0, 1))
  }

  test("distributed features() equals direct decodeBatch application") {
    import spark.implicits._
    val records = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        expr("CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END").as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
    val viaSpark = MediaDecode.features(records).collect()
      .map(f => f.media_id -> f).toMap
    val direct = MediaDecode.decodeBatch(records.collect().toSeq)
      .map(f => f.media_id -> f).toMap
    viaSpark.keySet shouldBe direct.keySet
    viaSpark.foreach { case (id, f) => f shouldBe direct(id) }
  }
}
