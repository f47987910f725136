package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.checkpoint.SnapshotTable

/** Catalog seam (SURVEY.md §7): everything the validation engine needs
  * from a table catalog, so a real Iceberg (or Hive) catalog drops in
  * without touching Runner/Checkpoint. The reference talks to HiveServer2
  * through a 3-driver fallback cascade (reference config/hive_config.py:
  * 48-87); the engine's contract is narrower and snapshot-centric:
  *
  *  - `load` resolves a table reference to a DataFrame (current snapshot);
  *  - `pin` freezes the table's CURRENT snapshot into a manifest so a
  *    resumed run sees exactly the rows the first attempt saw;
  *  - `readPinned` reads that frozen snapshot.
  *
  * An Iceberg implementation maps load → `spark.table`, pin → record the
  * current snapshot-id, readPinned → `VERSION AS OF snapshotId` — the
  * engine never needs to know which one it's talking to.
  */
trait TableProvider {

  /** Resolve `table` (a path or catalog name) to its current snapshot. */
  def load(spark: SparkSession, table: String): DataFrame

  /** Pin `table`'s current snapshot into `manifestPath`; returns an opaque
    * snapshot descriptor (file count / snapshot id) for logging.
    */
  def pin(spark: SparkSession, table: String, manifestPath: String): String

  /** Read exactly the snapshot pinned at `manifestPath` — late-arriving
    * data must be invisible.
    */
  def readPinned(spark: SparkSession, manifestPath: String): DataFrame
}

/** Parquet-directory implementation (the sandbox default): a table
  * reference is a parquet dir; a snapshot is its pinned file list
  * ([[graft.checkpoint.SnapshotTable]] manifest).
  */
object ParquetDirProvider extends TableProvider {
  override def load(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(table)

  override def pin(spark: SparkSession, table: String,
      manifestPath: String): String = {
    val files = SnapshotTable.pin(spark, table, manifestPath)
    s"${files.size} files"
  }

  override def readPinned(spark: SparkSession, manifestPath: String): DataFrame =
    SnapshotTable.read(spark, manifestPath)
}
