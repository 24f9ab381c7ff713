package graft.pipeline

import java.nio.file.Files

import scala.concurrent.duration._

import graft.SparkSpec
import graft.lake.{Layer, Metastore}

/** §3.2 fault tolerance: the reference runs every task with retries=3 /
  * 3-min delay / 2-h execution timeout (base_dag.py:9-14). The harness is
  * driven with an injected recording `sleep`, so no test waits.
  */
class TableLoadRetrySpec extends SparkSpec {

  private def policy(retries: Int = 3, timeout: FiniteDuration = 2.hours) =
    TableLoad.RetryPolicy(retries = retries, delay = 3.minutes,
      timeout = timeout)

  test("retry: transient failures are retried with the configured delay") {
    var calls = 0
    val slept = scala.collection.mutable.ArrayBuffer.empty[FiniteDuration]
    val out = TableLoad.retry(policy(), slept.append(_)) {
      calls += 1
      if (calls < 3) sys.error(s"transient #$calls")
      "ok"
    }
    assert(out === "ok")
    assert(calls === 3) // failed twice, succeeded on the third attempt
    assert(slept.toSeq === Seq(3.minutes, 3.minutes)) // one delay per retry
  }

  test("retry: exhausted retries rethrow with the attempt count") {
    var calls = 0
    val e = intercept[RuntimeException] {
      TableLoad.retry(policy(retries = 3), _ => ()) {
        calls += 1; sys.error("always down")
      }
    }
    assert(calls === 4) // initial attempt + 3 retries, like the reference
    assert(e.getMessage.contains("after 4 attempts"))
    assert(e.getCause.getMessage === "always down")
  }

  test("retry: no retry starts past the execution deadline") {
    var calls = 0
    val e = intercept[RuntimeException] {
      TableLoad.retry(policy(timeout = Duration.Zero), _ => ()) {
        calls += 1; sys.error("down")
      }
    }
    assert(calls === 1) // the deadline gate fired before any retry
    assert(e.getMessage.contains("deadline"))
  }

  test("retry: fatal errors propagate immediately, no retry") {
    var calls = 0
    intercept[InterruptedException] {
      TableLoad.retry(policy(), _ => ()) {
        calls += 1; throw new InterruptedException("shutdown")
      }
    }
    assert(calls === 1)
  }

  test("runWithRetry recovers a real load from a transient failure") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-retry-").toString
    val metastore = Metastore(s"file:$root")
    // First attempt fails for real (view missing = AnalysisException, the
    // transient-catalog shape); the injected sleep "waits out" the outage
    // by creating the view, and the retry lands the load.
    val spec = TableLoad.Spec(
      source = "retry_src",
      table = "numbers",
      query = "SELECT id, id * 2 AS doubled FROM retry_feed",
      targetLayer = Layer.Clean,
      registerTable = false)
    var slept = 0
    val out = TableLoad.runWithRetry(spark, metastore, spec, policy(),
      sleep = { _ =>
        slept += 1
        (1L to 5L).toDF("id").createOrReplaceTempView("retry_feed")
      })
    assert(slept === 1) // exactly one retry was needed
    assert(out.count() === 5)
    val landed = spark.read.parquet(
      metastore.tablePath(Layer.Clean, "retry_src", "numbers"))
    assert(landed.select("doubled").as[Long].collect().sorted
      === Array(2L, 4L, 6L, 8L, 10L))
    spark.catalog.dropTempView("retry_feed")
  }
}
