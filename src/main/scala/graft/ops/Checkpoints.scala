package graft.ops

import org.apache.spark.sql.DataFrame

/** Materialization helper shared by operators that must return a
  * lineage-truncated result (so internal caches can be released before
  * returning — the r4/r5 cache-lifecycle contract).
  *
  * Mode mirrors [[DedupOps.connectedComponents]]'s pattern (ADVICE
  * r5): when the SparkContext has a checkpoint dir configured, use a
  * RELIABLE checkpoint — localCheckpoint stores unreplicated blocks on
  * executors and truncates lineage, so under executor loss or dynamic
  * allocation the returned DataFrame is unrecoverable mid-query; fine
  * in local[n] bench runs, fragile at the cluster design point. With
  * no checkpoint dir (local mode, tests) localCheckpoint keeps the
  * zero-I/O path.
  */
private[graft] object Checkpoints {
  def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
