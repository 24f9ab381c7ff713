package graft.lake

/** Layered-lake model (SURVEY.md §1.1).
  *
  * Parity: `etl_projects/base/pipeline/layer_enum.py:4-13` — layers
  * raw → clean → enrich → clean_staging → dw_staging → dw, with raw landing
  * as JSON lines (schema-on-read) and every other layer as Snappy Parquet
  * (`etl_projects/base/processors/spark/spark_table_storage_format.py:2-9`).
  */
sealed abstract class Layer(val name: String)

object Layer {
  case object Raw extends Layer("raw")
  case object Clean extends Layer("clean")
  case object Enrich extends Layer("enrich")
  case object CleanStaging extends Layer("clean_staging")
  case object DwStaging extends Layer("dw_staging")
  case object Dw extends Layer("dw")

  val all: Seq[Layer] = Seq(Raw, Clean, Enrich, CleanStaging, DwStaging, Dw)

  def fromName(name: String): Layer =
    all.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"unknown layer: $name"))
}

/** Per-layer storage policy (SURVEY.md §2.1 S1/S2/S6).
  *
  * Raw is JSON (cheap append of scraped/ingested records, schema-on-read);
  * all downstream layers are Parquet + Snappy — columnar scans, predicate
  * pushdown and column pruning are what make the 100 TB read path viable.
  */
object StorageFormat {
  final case class Format(format: String, options: Map[String, String])

  private val json = Format("json", Map.empty)
  private val parquetSnappy = Format("parquet", Map("compression" -> "snappy"))

  /** Interchange formats for export to / import from external warehouse
    * stacks whose native layout is not Parquet. Not part of any layer's
    * policy — callers opt in per write via
    * [[TableWriter.Spec.formatOverride]]. ORC is the Hive/Presto-lineage
    * columnar twin (predicate pushdown and column pruning work the same
    * way, so the 100 TB read-path properties survive the export); CSV is
    * the lowest-common-denominator handoff, header-on, explicitly NOT a
    * scale format (no pushdown, no types — scaladoc'd as edge-interchange
    * only).
    */
  val orcZstd: Format = Format("orc", Map("compression" -> "zstd"))
  val csvHeader: Format = Format("csv", Map("header" -> "true"))

  def forLayer(layer: Layer): Format = layer match {
    case Layer.Raw => json
    case _         => parquetSnappy
  }
}
