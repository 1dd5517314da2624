package graft.snapshot

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The snapshot-table seam (SURVEY.md §4.2): everything the engine
  * needs from a snapshot-committed table store — atomic multi-table
  * commits, latest-snapshot resolution, time travel by snapshot id —
  * expressed as an interface so the sandbox's manifest-log
  * implementation ([[SnapshotLog]]) can be swapped for real Iceberg
  * (DataSourceV2 catalog + `spark.read.table(...).option("snapshot-id",
  * ...)`) without touching [[graft.crawl.CrawlJob]].
  */
trait SnapshotTable {

  /** Newest committed snapshot, if any. */
  def latest(): Option[SnapshotLog.Snapshot]

  /** Time travel: the snapshot with the given id. */
  def read(id: Long): SnapshotLog.Snapshot

  /** A table's contents as of a snapshot (None = never committed). */
  def readTable(spark: SparkSession, snap: SnapshotLog.Snapshot,
                name: String): Option[DataFrame]

  /** Atomic commit: delta-appending tables + fully-replaced tables +
    * scalar round properties become visible together or not at all.
    */
  def commit(deltas: Map[String, DataFrame], replaced: Map[String, DataFrame],
             props: Map[String, String]): SnapshotLog.Snapshot

  /** Register every table of `snap` as a temp view named
    * `<prefix><table>`, so the snapshot is queryable with plain
    * `spark.sql` (and a specific snapshot id gives time-travel SQL).
    */
  def registerViews(spark: SparkSession, snap: SnapshotLog.Snapshot,
                    prefix: String = "snap_"): Seq[String] =
    snap.tables.keys.toSeq.sorted.flatMap { name =>
      readTable(spark, snap, name).map { df =>
        val view = prefix + name
        df.createOrReplaceTempView(view)
        view
      }
    }
}
