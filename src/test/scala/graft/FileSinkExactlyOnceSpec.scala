package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streaming parquet file sink's exactly-once contract (q62's shape):
  * readers see only files recorded in the sink's commit manifest, and a
  * restart from the same checkpoint replays no committed batch — rows
  * land exactly once across stop/start. */
class FileSinkExactlyOnceSpec extends SparkSuite {

  test("file sink + checkpoint restart lands every row exactly once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = Files.createTempDirectory("graft-eos-out").toString
    val ckpt = Files.createTempDirectory("graft-eos-ckpt").toString

    val source = MemoryStream[Long]
    def start() = source.toDF().toDF("id")
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()

    // run 1: two batches committed through the manifest
    val q1 = start()
    source.addData(1L to 100L: _*)
    q1.processAllAvailable()
    source.addData(101L to 150L: _*)
    q1.processAllAvailable()
    q1.stop()
    spark.read.parquet(out).count() shouldBe 150L

    // run 2: SAME checkpoint — the committed batches must not replay,
    // new data must land once
    val q2 = start()
    source.addData(151L to 200L: _*)
    q2.processAllAvailable()
    q2.stop()

    val ids = spark.read.parquet(out).select(col("id")).as[Long].collect().sorted
    ids shouldBe (1L to 200L).toArray
  }
}
