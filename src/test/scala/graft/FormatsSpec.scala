package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** The format round-trips (q41–q43) run on clean synthetic tables; this
  * spec round-trips the values that actually break row formats — nulls,
  * embedded delimiters/quotes/newlines, unicode, empty strings — and
  * requires byte-identical survival through each sink+source. */
class FormatsSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("s", StringType),
    StructField("d", DoubleType)))

  private def nasty: DataFrame = {
    val rows = Seq(
      Row(1L, "plain", 1.5),
      Row(2L, "comma, inside", -0.25),
      Row(3L, "quote \" inside", 0.0),
      Row(4L, "newline\ninside", 12.75),
      Row(5L, null, null),
      Row(6L, "", 6.5),
      Row(7L, "unicode é中文", 7.0),
      Row(8L, "tab\tand\\backslash", -8.125))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
  }

  private def roundTrip(write: (DataFrame, String) => Unit,
      read: String => DataFrame): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-fmt").resolve("t").toString
    val in = nasty
    write(in, dir)
    val back = read(dir)
    back.count() shouldBe in.count()
    back.exceptAll(in).count() shouldBe 0L
    in.exceptAll(back).count() shouldBe 0L
  }

  test("csv round-trips quotes, delimiters, newlines, nulls") {
    roundTrip(
      (df, dir) => df.write
        .option("header", "true")
        // multiline fields need explicit quoting + escape discipline;
        // emptyValue/nullValue disambiguate "" from NULL (CSV's classic
        // lossy corner — defaults collapse them)
        .option("escape", "\"")
        .option("nullValue", "\\N")
        .option("emptyValue", "\"\"")
        .csv(dir),
      dir => spark.read
        .schema(schema)
        .option("header", "true")
        .option("multiLine", "true")
        .option("escape", "\"")
        .option("nullValue", "\\N")
        .option("emptyValue", "")
        .csv(dir))
  }

  test("json round-trips unicode and nulls") {
    roundTrip(
      (df, dir) => df.write.json(dir),
      dir => spark.read.schema(schema).json(dir))
  }

  test("orc round-trips everything") {
    roundTrip(
      (df, dir) => df.write.orc(dir),
      dir => spark.read.orc(dir))
  }

  test("parquet schema evolution: mergeSchema unions columns, old rows get NULL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-evo").resolve("t").toString
    // v1 writes (id, a); a later producer adds column b
    Seq((1L, "x"), (2L, "y")).toDF("id", "a")
      .write.parquet(dir)
    Seq((3L, "z", 30.5)).toDF("id", "a", "b")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    merged.columns.sorted shouldBe Array("a", "b", "id")
    merged.count() shouldBe 3
    merged.filter(col("b").isNull).select(col("id"))
      .collect().map(_.getLong(0)).sorted shouldBe Array(1L, 2L)
    merged.filter(col("id") === 3L).select(col("b")).first().getDouble(0) shouldBe 30.5
    // without mergeSchema Spark picks one footer's schema — pin the
    // gotcha that motivates the option
    spark.read.parquet(dir).columns.length should be <= 3
  }
}
