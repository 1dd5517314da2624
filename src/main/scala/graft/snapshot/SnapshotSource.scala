package graft.snapshot

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 read connector over a [[SnapshotLog]] — the "switch
  * to this library" API surface: any Spark user (SQL, Python, R) can
  * read a snapshot table with the plain reader API, time travel
  * included, and gets the full native parquet scan underneath
  * (predicate pushdown, column pruning, vectorized reader — the scan
  * IS Spark's parquet scan over the manifest's file list):
  *
  * {{{
  *   spark.read.format("graft-snapshot")
  *     .option("root", "/path/to/snapshots")
  *     .option("table", "seen")
  *     .option("asOf", "3")          // optional: snapshot id time travel
  *     .load()
  * }}}
  *
  * Reference analog: stage 2 discovering stage 1's newest timestamped
  * CSV (report_info_collection.py:363-391) — here the manifest, not a
  * filename convention, names the exact file set.
  *
  * Resolution happens at PLAN time on the driver (read the manifest,
  * list the table's delta dirs); the data path is untouched parquet.
  */
final class SnapshotSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  override def supportsExternalMetadata(): Boolean = true

  private def resolved(options: CaseInsensitiveStringMap): ParquetTable = {
    val root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException("graft-snapshot: missing option 'root'"))
    val table = Option(options.get("table")).getOrElse(
      throw new IllegalArgumentException("graft-snapshot: missing option 'table'"))
    val log = new SnapshotLog(root)
    val snap = Option(options.get("asOf")) match {
      case Some(id) => log.read(id.toLong)
      case None => log.latest().getOrElse(
        throw new IllegalArgumentException(s"graft-snapshot: no snapshot under $root"))
    }
    val dirs = snap.tables.getOrElse(table, Seq.empty)
    if (dirs.isEmpty)
      throw new IllegalArgumentException(
        s"graft-snapshot: table '$table' absent from snapshot ${snap.id} " +
          s"(has: ${snap.tables.keys.toSeq.sorted.mkString(", ")})")
    ParquetTable(s"graft_snapshot_${table}_s${snap.id}", SparkSession.active,
      options, dirs, None, classOf[ParquetFileFormat])
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    resolved(options).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    resolved(new CaseInsensitiveStringMap(properties))
}
