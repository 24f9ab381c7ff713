package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.SparkSpec
import graft.ops.ValidateOps

class CsvSourceSpec extends SparkSpec {

  private def writeFeed(): String = {
    val dir = Files.createTempDirectory("graft-csv-").toString
    Files.write(java.nio.file.Paths.get(s"$dir/feed.csv"),
      Seq(
        "stockSymbol,lastPrice,volume",
        "ABC,12.50,1000",
        "XYZ,,250",
        "\"Q,Q\",3.25,0")
        .mkString("\n").getBytes("UTF-8"))
    dir
  }

  test("read: header, all-string schema, snake_cased names, quoting") {
    val df = CsvSource.read(spark, writeFeed())
    df.columns.toSeq shouldBe Seq("stock_symbol", "last_price", "volume")
    df.schema.fields.forall(_.dataType == StringType) shouldBe true
    val rows = df.orderBy("stock_symbol").collect()
    rows.length shouldBe 3
    // quoted delimiter survives; empty field reads as null
    rows.map(_.getString(0)) shouldBe Array("ABC", "Q,Q", "XYZ")
    rows(2).isNullAt(1) shouldBe true
  }

  test("readValidated appends rule errors like the JSONL path") {
    val df = CsvSource.readValidated(spark, writeFeed(),
      Seq(ValidateOps.FieldRule.requiredField("last_price")))
    import spark.implicits._
    df.filter(expr(s"size(${ValidateOps.ErrorsColumn}) > 0"))
      .select("stock_symbol").as[String].collect() shouldBe Array("XYZ")
  }

  test("gzip round-trip through the landing writer") {
    val df = CsvSource.read(spark, writeFeed())
    val out = Files.createTempDirectory("graft-csv-out-").toString + "/landed"
    CsvSource.writeGzipCsv(df, out)
    // the codec landed (.gz part files) and reads back identically
    new java.io.File(out).listFiles()
      .exists(_.getName.endsWith(".csv.gz")) shouldBe true
    val back = CsvSource.read(spark, out)
    back.orderBy("stock_symbol").collect() shouldBe
      df.orderBy("stock_symbol").collect()
  }
}
