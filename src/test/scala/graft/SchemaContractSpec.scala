package graft

import org.apache.spark.sql.types._
import graft.analytics.Tables

/** Contract between the driver-generated testdata and the loaders.
  *
  * Round 10 regression: the driver regenerated `/root/testdata` and flipped
  * `events.ts` from parquet TIMESTAMP(NANOS) to plain timestamp[us]; every
  * events consumer hard-coded the nanos decode and 46 queries silently
  * vanished from the correctness report. This spec turns the next silent
  * regeneration into ONE named test failure: it reads each sf0.001 table
  * and asserts the loader-normalized shape the whole catalog assumes.
  */
class SchemaContractSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("every testdata table is present and readable with rows") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      withClue(s"$t: ") {
        assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/$t.parquet")))
        assert(Tables.rd(spark, dir, t).limit(1).count() == 1L)
      }
    }
  }

  test("events loader normalizes ts to TimestampType under any encoding") {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    // the rest of the shape the 46 events consumers assume
    val want = Map(
      "event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)
    want.foreach { case (c, dt) => assert(ev.schema(c).dataType == dt, c) }
    // values, not just types: the normalized instant must equal the stored
    // epoch micros (what the DuckDB oracle's epoch_us(ts) compares against),
    // so the timestamps land in the generator's 2024 window rather than
    // being shifted by a timezone or unit mistake
    import org.apache.spark.sql.functions._
    val Array(row) = ev.agg(
      min(unix_micros(col("ts"))).as("lo"), max(unix_micros(col("ts"))).as("hi")).collect()
    val (lo, hi) = (row.getLong(0), row.getLong(1))
    val us2020 = 1577836800000000L // 2020-01-01
    val us2030 = 1893456000000000L // 2030-01-01
    assert(lo >= us2020 && hi <= us2030, s"ts out of plausible window: [$lo, $hi]")
  }

  test("normalizeTs decodes the legacy nanos-as-long encoding") {
    import spark.implicits._
    val raw = Seq((1L, 1711929600000000000L)).toDF("event_id", "ts")
    val out = Tables.normalizeTs(raw)
    assert(out.schema("ts").dataType == TimestampType)
    import org.apache.spark.sql.functions._
    assert(out.select(unix_micros(col("ts"))).head().getLong(0) == 1711929600000000L)
  }

  test("normalizeTs: nanos and NTZ encodings of one instant normalize identically") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // edge-ish instants: epoch, a sub-ms value, a 2024 timestamp, far future
    val micros = Seq(0L, 999L, 1711929600123456L, 4102444800000000L)
    val asNanos = micros.map(us => Tuple1(us * 1000L)).toDF("ts")
    val asNtz = micros.map(Tuple1(_)).toDF("us")
      .select(expr("CAST(timestamp_micros(us) AS TIMESTAMP_NTZ)").as("ts"))
    val a = Tables.normalizeTs(asNanos).select(unix_micros(col("ts"))).as[Long].collect().toSeq
    val b = Tables.normalizeTs(asNtz).select(unix_micros(col("ts"))).as[Long].collect().toSeq
    a shouldBe micros
    b shouldBe micros
  }

  test("normalizeTs rejects an unknown encoding loudly") {
    import spark.implicits._
    val raw = Seq(("x", "2024-01-01")).toDF("event_id", "ts")
    assertThrows[IllegalStateException](Tables.normalizeTs(raw))
  }

  test("every testdata table carries exactly the dtypes the catalog assumes") {
    // full raw-parquet dtype pin, one entry per table: a regeneration that
    // renames, drops, retypes, or widens ANY column fails here by table
    // name instead of surfacing as N broken catalog queries. events.ts is
    // excluded from the exact-match rule — its physical encoding is
    // allowed to drift (that is what Tables.normalizeTs absorbs; the
    // normalized shape and values are pinned by the tests above).
    val want: Map[String, Map[String, DataType]] = Map(
      "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
      "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
        "n_regionkey" -> IntegerType),
      "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
        "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
        "c_mktsegment" -> StringType),
      "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
        "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
      "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
        "p_brand" -> StringType, "p_type" -> StringType,
        "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
      "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
        // parquet timestamp[us] without a tz marker reads as TIMESTAMP_NTZ;
        // the catalog consumes it wall-clock (all sessions run UTC)
        "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
      "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
        "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
        "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
        "l_discount" -> DoubleType, "l_tax" -> DoubleType,
        "l_returnflag" -> StringType, "l_linestatus" -> StringType,
        "l_shipdate" -> TimestampNTZType),
      "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
      "embeddings" -> Map("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType, containsNull = true),
        "label" -> IntegerType),
      "events" -> Map("event_id" -> LongType, "user_id" -> LongType,
        "event_type" -> StringType, "value" -> DoubleType,
        "props" -> StringType))
    want.foreach { case (t, cols) =>
      val got = Tables.rd(spark, dir, t).schema
        .map(f => f.name -> f.dataType).toMap
      withClue(s"$t: ") {
        val expectedNames =
          if (t == "events") cols.keySet + "ts" else cols.keySet
        got.keySet shouldBe expectedNames
        cols.foreach { case (c, dt) =>
          assert(got(c) == dt, s"$t.$c: expected $dt, got ${got(c)}")
        }
      }
    }
  }

  test("documents and embeddings carry the columns the catalog assumes") {
    val docs = Tables.docs(spark, dir)
    Seq("doc_id", "text", "lang", "source", "n_chars").foreach(c =>
      assert(docs.columns.contains(c), s"documents.$c"))
    assert(docs.schema("text").dataType == StringType)
    val embs = Tables.embs(spark, dir)
    Seq("vec_id", "embedding", "label").foreach(c =>
      assert(embs.columns.contains(c), s"embeddings.$c"))
    assert(embs.schema("embedding").dataType == ArrayType(FloatType, containsNull = true))
  }
}
