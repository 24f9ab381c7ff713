package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity}

/** Scratch profiling main (round 3). Not part of the contract. */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s -> $r")
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")

    def recallOf(exact: org.apache.spark.sql.DataFrame,
                 approx: org.apache.spark.sql.DataFrame,
                 keys: Seq[String]): Double = {
      val a = approx.select(keys.map(col): _*).withColumn("_hit", lit(1L))
      exact.select(keys.map(col): _*)
        .join(a, keys, "left")
        .agg((sum(coalesce(col("_hit"), lit(0L))).cast("double") / count(lit(1))))
        .head().getDouble(0)
    }

    val queries = emb.filter(col("vec_id") < 100)
    val exactTop = Similarity.topKBruteForce(queries, emb, "vec_id", "embedding", 5)
    time("y2r recall (banded 18x4)")(recallOf(
      exactTop,
      Similarity.topKLsh(emb, "vec_id", "embedding", 5).filter(col("query_id") < 100),
      Seq("query_id", "neighbor_id")))
    time("y3r recall (ivf nprobe=10)")(recallOf(
      exactTop,
      Similarity.topKIvf(emb, "vec_id", "embedding", 5, nprobe = 10)
        .filter(col("query_id") < 100),
      Seq("query_id", "neighbor_id")))
    val exactPairs = Dedup.nearDuplicatesEmbeddingExact(emb, "vec_id", "embedding", 0.45)
    time("x6r recall (banded 12x3)")(recallOf(
      exactPairs,
      Dedup.nearDuplicatesEmbedding(emb, "vec_id", "embedding", 0.45,
        bands = 12, planesPerBand = 3),
      Seq("id_a", "id_b")))
    spark.stop()
  }
}
