package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema evolution across parquet generations — a long-lived table is
  * written by many pipeline versions, and readers must not break when a
  * column was added mid-history.
  *
  * [[readMerged]] unions the generations' schemas at scan time
  * (`mergeSchema` — a footer-only pass, no data read; rows from files
  * that predate a column read null there). [[conform]] reconciles ANY
  * frame to a target contract schema: missing columns appear as typed
  * nulls, extra columns are dropped (or rejected — at 100 TB a silently
  * dropped column is usually a bug upstream, so `strict = true` fails
  * loudly instead), and matching columns are cast. Together they make
  * "old reader, new data" and "new reader, old data" both total.
  */
object SchemaEvolution {

  /** Read a parquet table whose files span schema generations: the scan
    * schema is the union of all footers (one metadata pass), files
    * missing a column yield nulls for it.
    */
  def readMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Reconcile `df` to `target`: project every target column in order —
    * casting where present, typed null where absent. `strict = true`
    * additionally rejects columns in `df` that the target doesn't know
    * (schema drift surfaced as an error instead of silent data loss).
    */
  def conform(df: DataFrame, target: StructType,
      strict: Boolean = false): DataFrame = {
    if (strict) {
      val unknown = df.columns.filterNot(c => target.fieldNames.contains(c))
      require(unknown.isEmpty,
        s"conform(strict): source has columns the target schema does not: " +
          unknown.mkString(", "))
    }
    val have = df.columns.toSet
    df.select(target.fields.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }
}
