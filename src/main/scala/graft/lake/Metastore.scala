package graft.lake

/** Database/path naming policy for the layered lake (SURVEY.md §1.1).
  *
  * Parity: `etl_projects/base/db/services/datalake_metastore_service.py:
  * 10-52` (`datalake_{source}_{layer}` databases under
  * `{root}/{layer}/{source}/`) and `dw_metastore_service.py:5-37`
  * (`dw_{schema}` / `dw_{schema}_staging`). The reference roots at an S3
  * bucket; here the root is any Hadoop-compatible URI (local `file:/` in the
  * sandbox, `s3a://bucket` in production — the path algebra is identical).
  */
final case class Metastore(root: String) {

  private def trimmed: String = root.stripSuffix("/")

  def layerPath(layer: Layer, source: String): String =
    s"$trimmed/${layer.name}/$source"

  def tablePath(layer: Layer, source: String, table: String): String =
    s"${layerPath(layer, source)}/$table"

  def datalakeDatabase(source: String, layer: Layer): String =
    s"datalake_${source}_${layer.name}"

  def dwDatabase(schema: String, staging: Boolean = false): String =
    if (staging) s"dw_${schema}_staging" else s"dw_$schema"

  def qualifiedTable(database: String, table: String): String =
    s"$database.$table"
}
