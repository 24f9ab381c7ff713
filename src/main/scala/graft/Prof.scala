package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (round 3). Not part of the contract. */
object Prof {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("order")) {
      SparkEntry.queries.keys.zipWithIndex.foreach { case (k, i) => println(f"$i%2d $k") }
      return
    }
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OBJAGG_FALLBACK", "128"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s -> $r")
    }
    def settle(): Unit = { spark.catalog.clearCache(); System.gc(); Thread.sleep(300) }
    def run(n: String): Long = SparkEntry.queries(n)(spark, dir).count()

    if (args.headOption.contains("explain")) {
      args.drop(1).foreach { n =>
        println(s"===== $n =====")
        SparkEntry.queries(n)(spark, dir).explain("formatted")
      }
      spark.stop()
      return
    }
    if (args.headOption.contains("y6parts")) {
      import org.apache.spark.sql.functions._
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val snapshot = emb.filter(pmod(col("vec_id"), lit(10)) < 9)
      val batch = emb.filter(pmod(col("vec_id"), lit(10)) === 9)
      val coarse = ext.Clustering.kmeans(snapshot, "vec_id", "embedding",
        k = 16, iterations = 1, roundDigits = 6).centroids
      val pq = ext.Similarity.trainPqDeterministic(snapshot, "vec_id",
        "embedding", m = 16, ksub = 256, iterations = 1, roundDigits = 6,
        dims = 64)
      (1 to 2).foreach { i =>
        time(s"build+count #$i") {
          ext.Similarity.buildIvfPqIndex(snapshot, "vec_id", "embedding",
            coarse, pq).count()
        }
        val index = ext.Similarity.buildIvfPqIndex(snapshot, "vec_id",
          "embedding", coarse, pq)
        val coded = index.select(col("id").as("neighbor_id"), col("cell"),
          col("codes"), col("cn"))
        val probes = batch.select(
          col("vec_id").as("query_id"),
          explode(graft.functions.CellFunctions.nearest_cells(
            col("embedding"), coarse.map(_.toSeq), 12)).as("cell"),
          col("embedding").as("qv"),
          graft.functions.VectorFunctions.vector_norm(col("embedding")).as("qn"))
        time(s"probes #$i")(probes.count())
        val joined = probes.join(coded, Seq("cell"))
          .filter(col("query_id") =!= col("neighbor_id"))
        time(s"joined #$i")(joined.count())
        val scored = joined.select(col("query_id"), col("neighbor_id"),
          try_divide(graft.functions.PqFunctions.pq_adc_dot(
            col("qv"), col("codes"), pq), col("qn") * col("cn")).as("cosine"))
        time(s"scored #$i")(scored.count())
        val top = scored.groupBy("query_id")
          .agg(graft.functions.TopKFunctions.top_k_pairs(
            struct(col("cosine"), col("neighbor_id")), 80, dedupIds = true)
            .as("_top"))
        time(s"topk80 #$i")(top.count())
        val cand = top.select(col("query_id"), posexplode(col("_top")))
          .select(col("query_id"), col("col.id").as("neighbor_id"))
        time(s"cand #$i")(cand.count())
        val qv2 = batch.select(col("vec_id").as("query_id"),
          col("embedding").as("qv"),
          graft.functions.VectorFunctions.vector_norm(col("embedding")).as("qn"))
        val cv2 = snapshot.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("cv"),
          graft.functions.VectorFunctions.vector_norm(col("embedding")).as("cn"))
        val rescored = cand.join(qv2, Seq("query_id"))
          .join(cv2, Seq("neighbor_id"))
          .select(col("query_id"), col("neighbor_id"),
            (graft.functions.VectorFunctions.vector_dot(col("qv"), col("cv"))
              / (col("qn") * col("cn"))).as("cosine"))
        time(s"rescored #$i")(rescored.count())
        time(s"cosine-sum #$i")(scored.agg(sum("cosine")).collect()(0))
        val adcOnly = joined.select(
          graft.functions.PqFunctions.pq_adc_dot(
            col("qv"), col("codes"), pq).as("adc"))
        time(s"adc-sum #$i")(adcOnly.agg(sum("adc")).collect()(0))
        val divOnly = joined.select(
          (graft.functions.PqFunctions.pq_adc_dot(
            col("qv"), col("codes"), pq) / (col("qn") * col("cn"))).as("c2"))
        time(s"plaindiv-sum #$i")(divOnly.agg(sum("c2")).collect()(0))
        if (i == 1) scored.agg(sum("cosine")).explain("formatted")
        val aggOnly = joined.select(col("query_id"),
            struct(rand().as("score"), col("neighbor_id").as("id")).as("p"))
          .groupBy("query_id")
          .agg(graft.functions.TopKFunctions.top_k_pairs(col("p"), 80,
            dedupIds = true).as("_top"))
          .select(col("query_id"), posexplode(col("_top")))
        time(s"agg-only #$i")(aggOnly.count())
        val fin = rescored.groupBy("query_id")
          .agg(graft.functions.TopKFunctions.top_k_pairs(
            struct(col("cosine"), col("neighbor_id")), 5, dedupIds = true)
            .as("_top"))
          .select(col("query_id"), posexplode(col("_top")))
        time(s"final #$i")(fin.count())
        time(s"search #$i") {
          ext.Similarity.searchIvfPqIndex(batch, index,
            snapshot, "vec_id", "embedding", k = 5, coarse = coarse,
            pq = pq, nprobe = 12, rescoreFactor = 16).count()
        }
        settle()
      }
      spark.stop()
      return
    }
    if (args.headOption.contains("entry")) {
      time("entry rows")(SparkEntry.entry(spark).count())
      spark.stop()
      return
    }
    val names = if (args.nonEmpty) args.toSeq else Seq("x2_dedup_minhash")
    names.foreach { n =>
      time(s"$n warm")(run(n)); settle()
      time(s"$n t1")(run(n)); settle()
      time(s"$n t2")(run(n)); settle()
      time(s"$n t3")(run(n)); settle()
    }
    spark.stop()
  }
}
