package graft.lake

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.JsonlSource
import graft.ops.ValidateOps._
import graft.pipeline.TableLoad

/** E2E lake pipeline: landed JSONL → raw → clean → enrich with partitioned
  * writes, catalog registration, partition discovery, and incremental
  * re-run idempotence — the reference's core loop
  * (datalake_sub_dag_builder.py:96-137).
  */
class LakePipelineSpec extends SparkSpec {

  private lazy val root = Files.createTempDirectory("graft-lake-").toString
  private lazy val metastore = Metastore(s"file:$root")

  private def writeFeed(): String = {
    val feed = s"$root/feed.jsonl"
    val lines = Seq(
      """{"User Id": 1, "EventType": "click", "Value": 10.5, "EventDate": "2024-03-01"}""",
      """{"User Id": 2, "EventType": "view",  "Value": 3.25, "EventDate": "2024-03-01"}""",
      """{"User Id": 3, "EventType": "click", "Value": 7.0,  "EventDate": "2024-03-02"}""",
      """{"User Id": 4, "EventType": "purchase", "Value": 99.0, "EventDate": "2024-03-02"}""")
    Files.write(java.nio.file.Paths.get(feed),
      lines.mkString("\n").getBytes("UTF-8"))
    feed
  }

  test("S8/P9/P2 ingestion: JSONL read casts all to string and snake_cases") {
    val df = JsonlSource.read(spark, writeFeed())
    assert(df.columns.toSeq.sorted ===
      Seq("_event_date", "_event_type", "_user__id", "_value").sorted)
    assert(df.schema.fields.forall(_.dataType.typeName === "string"))
    assert(df.count() === 4)
  }

  test("S9 gzip JSONL round-trips") {
    val df = JsonlSource.read(spark, writeFeed())
    val out = s"$root/landed"
    JsonlSource.writeGzipJsonl(df, out)
    val files = new java.io.File(out).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".json.gz")))
    assert(spark.read.json(out).count() === 4)
  }

  test("V1 validation on the landed feed") {
    val rules = Seq(
      FieldRule.requiredField("_user__id"),
      FieldRule.matching("_event_date", "^\\d{4}-\\d{2}-\\d{2}$"))
    val v = JsonlSource.readValidated(spark, writeFeed(), rules)
    assert(v.validRows.count() === 4)
  }

  test("raw->clean->enrich pipeline with partitioned writes and catalog") {
    val feed = writeFeed()
    // land raw (JSON layer format)
    val raw = JsonlSource.read(spark, feed)
    TableWriter.write(raw, TableWriter.Spec(
      layer = Layer.Raw,
      path = metastore.tablePath(Layer.Raw, "events_src", "events")))
    spark.read.json(metastore.tablePath(Layer.Raw, "events_src", "events"))
      .createOrReplaceTempView("raw_events")

    // clean: typed columns + date partitions, partitioned parquet write
    val cleanSpec = TableLoad.Spec(
      source = "events_src",
      table = "events",
      query = """SELECT CAST(_user__id AS BIGINT) AS user_id,
                |  _event_type AS event_type,
                |  CAST(_value AS DOUBLE) AS value,
                |  CAST(_event_date AS DATE) AS event_date,
                |  year(CAST(_event_date AS DATE)) AS year,
                |  month(CAST(_event_date AS DATE)) AS month,
                |  day(CAST(_event_date AS DATE)) AS day
                |FROM raw_events""".stripMargin,
      targetLayer = Layer.Clean,
      partitions = Seq("year", "month", "day"))
    TableLoad.run(spark, metastore, cleanSpec)

    // partition dirs exist hive-style
    val cleanPath = metastore.tablePath(Layer.Clean, "events_src", "events")
    val dirs = new java.io.File(cleanPath.stripPrefix("file:")).listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.toSeq === Seq("year=2024"))

    // S7 partition discovery
    val parts = PartitionDiscovery.discoverPartitionValues(spark, cleanPath)
    assert(parts === Seq(PartitionDiscovery.PartitionValue("year", "2024")))

    // S6 catalog registration happened inside TableLoad.run
    val db = metastore.datalakeDatabase("events_src", Layer.Clean)
    val cat = spark.sql(s"SELECT * FROM `$db`.`events`")
    assert(cat.count() === 4)
    assert(PartitionDiscovery.showPartitions(spark, s"`$db`.`events`")
      .exists(_.contains("year=2024")))

    // enrich: aggregate on top of the registered clean table
    val enrichSpec = TableLoad.Spec(
      source = "events_src",
      table = "daily_value",
      query = s"""SELECT event_type, year, month, day,
                 |  sum(value) AS total_value, count(*) AS n
                 |FROM `$db`.`events`
                 |GROUP BY event_type, year, month, day""".stripMargin,
      targetLayer = Layer.Enrich,
      partitions = Seq("year", "month", "day"))
    TableLoad.run(spark, metastore, enrichSpec)
    val enrichDb = metastore.datalakeDatabase("events_src", Layer.Enrich)
    val enriched = spark.sql(s"SELECT * FROM `$enrichDb`.`daily_value`")
    assert(enriched.count() > 0)
    assert(enriched.agg(sum("n")).head().getLong(0) === 4L)
  }

  test("incremental re-run replaces only the run date's partitions") {
    import spark.implicits._
    val src = "inc_src"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").createOrReplaceTempView("inc_day1")

    def spec(view: String, d: LocalDate) = TableLoad.Spec(
      source = src, table = "t", query = s"SELECT * FROM $view",
      targetLayer = Layer.Clean,
      partitions = Seq("year", "month", "day"),
      runDate = Some(d), incremental = true,
      registerTable = false)

    TableLoad.run(spark, metastore, spec("inc_day1", LocalDate.of(2024, 3, 1)))
    Seq((3L, "c")).toDF("id", "v").createOrReplaceTempView("inc_day2")
    TableLoad.run(spark, metastore, spec("inc_day2", LocalDate.of(2024, 3, 2)))

    val path = metastore.tablePath(Layer.Clean, src, "t")
    val all = spark.read.parquet(path)
    // dynamic overwrite: day1 rows survive the day2 write
    assert(all.count() === 3)

    // re-run day2 with different rows: only day2 replaced, still 2+1 rows
    Seq((9L, "z")).toDF("id", "v").createOrReplaceTempView("inc_day2b")
    TableLoad.run(spark, metastore, spec("inc_day2b", LocalDate.of(2024, 3, 2)))
    val after = spark.read.parquet(path)
    assert(after.count() === 3)
    assert(after.filter($"day" === 2).select("id").as[Long].collect().toSeq === Seq(9L))
    assert(after.filter($"day" === 1).count() === 2)
  }

  test("S10 dw_staging -> dw load path") {
    import spark.implicits._
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v").createOrReplaceTempView("fact_src")
    val staging = TableLoad.Spec(
      source = "sales", table = "fact", query = "SELECT * FROM fact_src",
      targetLayer = Layer.DwStaging)
    TableLoad.run(spark, metastore, staging)
    val stagingDb = metastore.datalakeDatabase("sales", Layer.DwStaging)

    // dw load reads the registered staging table (the reference's
    // dw_sub_dag_builder.py:93-108 copy semantics, in-catalog)
    val dw = TableLoad.Spec(
      source = "sales", table = "fact",
      query = s"SELECT * FROM `$stagingDb`.`fact`",
      targetLayer = Layer.Dw)
    TableLoad.run(spark, metastore, dw)
    val dwDb = metastore.datalakeDatabase("sales", Layer.Dw)
    assert(spark.sql(s"SELECT sum(v) FROM `$dwDb`.`fact`").head().getDouble(0) === 30.0)
  }

  test("S5 single-object JSON put/get round-trips") {
    val path = s"file:$root/manifests/run.json"
    ObjectStore.putJsonObject(spark, path,
      Map("run_date" -> "2024-03-01", "status" -> "ok\n\"quoted\""))
    val back = ObjectStore.getObject(spark, path)
    assert(back === """{"run_date": "2024-03-01", "status": "ok\n\"quoted\""}""")
    // overwrite is allowed
    ObjectStore.putJsonObject(spark, path, """{"status": "rerun"}""")
    assert(ObjectStore.getObject(spark, path) === """{"status": "rerun"}""")
  }

  test("S10 DwLoad sub-DAG: stage, validate, final load, catalog copy") {
    import spark.implicits._
    import graft.ops.ValidateOps.FieldRule
    Seq((1L, "a@x.io", 10.0), (2L, "b@x.io", 20.0))
      .toDF("id", "email", "amount").createOrReplaceTempView("dw_src")

    val out = graft.pipeline.DwLoad.run(spark, metastore,
      graft.pipeline.DwLoad.Spec(
        schema = "finance", table = "payments",
        stagingQuery = "SELECT * FROM dw_src",
        rules = Seq(
          FieldRule.requiredField("email"),
          FieldRule.nonNegative("amount")),
        minCount = 2))
    assert(out.count() === 2)
    // both schemas registered and queryable
    assert(spark.sql("SELECT sum(amount) FROM `dw_finance_staging`.`payments`")
      .head().getDouble(0) === 30.0)
    assert(spark.sql("SELECT sum(amount) FROM `dw_finance`.`payments`")
      .head().getDouble(0) === 30.0)

    // a failing monitor aborts before the final schema is touched
    Seq((3L, null.asInstanceOf[String], -5.0))
      .toDF("id", "email", "amount").createOrReplaceTempView("dw_bad")
    intercept[IllegalArgumentException] {
      graft.pipeline.DwLoad.run(spark, metastore,
        graft.pipeline.DwLoad.Spec(
          schema = "finance", table = "payments_bad",
          stagingQuery = "SELECT * FROM dw_bad",
          rules = Seq(FieldRule.requiredField("email"))))
    }
    // the bad table never reached the final schema
    assert(!spark.catalog.tableExists("`dw_finance`.`payments_bad`"))
  }

  test("S10 step-4 JDBC copy round-trips through an in-process warehouse") {
    import spark.implicits._
    // Derby embedded (on the Spark classpath) stands in for the
    // reference's Redshift: a real JDBC database, zero network. The same
    // toJdbc call against a cluster url is the production path.
    val url = "jdbc:derby:memory:graftdw;create=true"
    Seq((10L, "us", 1.5), (20L, "eu", 2.5), (30L, "us", 4.0))
      .toDF("order_id", "market", "amount").createOrReplaceTempView("jdbc_src")

    val out = graft.pipeline.DwLoad.run(spark, metastore,
      graft.pipeline.DwLoad.Spec(
        schema = "sales", table = "orders_jdbc",
        stagingQuery = "SELECT * FROM jdbc_src",
        jdbcUrl = Some(url)))
    assert(out.count() === 3)

    val back = graft.pipeline.DwLoad.fromJdbc(spark, url, "sales_orders_jdbc")
    assert(back.schema.fieldNames.toSeq.sorted
      === Seq("amount", "market", "order_id"))
    assert(back.count() === 3)
    assert(back.agg(sum("amount")).head().getDouble(0) === 8.0)

    // overwrite mode keeps the copy idempotent: re-running the same load
    // must not duplicate warehouse rows
    graft.pipeline.DwLoad.toJdbc(out, url, "sales_orders_jdbc")
    assert(graft.pipeline.DwLoad.fromJdbc(spark, url, "sales_orders_jdbc")
      .count() === 3)
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    val facts = (1L to 1000L).map(i => (i % 100, i, i * 1.5)).toDF("k", "id", "v")
    val dims = (0L until 100L).map(i => (i, s"dim_$i")).toDF("k", "name")
    TableWriter.writeBucketed(spark, facts, "bkt", "facts",
      s"$root/bkt/facts", numBuckets = 8, bucketCols = Seq("k"), sortCols = Seq("k"))
    TableWriter.writeBucketed(spark, dims, "bkt", "dims",
      s"$root/bkt/dims", numBuckets = 8, bucketCols = Seq("k"), sortCols = Seq("k"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("`bkt`.`facts`")
        .join(spark.table("`bkt`.`dims`"), "k")
        .groupBy("name").agg(sum("v").as("total"))
      assert(joined.count() === 100)
      val plan = joined.queryExecution.executedPlan.toString
      // co-located layout: the join itself requires no exchange; the only
      // shuffle left is the final aggregation by name
      val joinSection = plan.split("SortMergeJoin")(1)
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("L3 maxRecordsPerFile bounds rows per written file") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("id").coalesce(1)
    val path = s"$root/maxrec"
    TableWriter.write(df, TableWriter.Spec(
      layer = Layer.Clean, path = path, maxRecordsPerFile = 100L))
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 10) // 1000 rows / 100 per file
    files.foreach { f =>
      assert(spark.read.parquet(f.getPath).count() <= 100L)
    }
    assert(spark.read.parquet(path).count() === 1000L)
  }
}
