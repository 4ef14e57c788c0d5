package graft.ingest

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Idempotent PK-keyed writer — the Spark analog of the reference's
  * `INSERT … ON CONFLICT (pk) DO NOTHING` fan-out
  * (chainweb-data exec/Chainweb/Worker.hs:50-126 `writes`/`batchWrites`).
  *
  * On a lakehouse table format this is exactly
  * `MERGE WHEN NOT MATCHED THEN INSERT`; on plain parquet (this repo's
  * substrate) we reproduce the semantics with an anti-join of the incoming
  * batch against existing keys, then append. Existing rows are never
  * rewritten (DO NOTHING, not DO UPDATE), so replays and orphan
  * re-introductions are no-ops — the property that makes the whole ingest
  * effectively-once (SURVEY §2.9 T4).
  *
  * Scale: the anti-join shuffles only on PK columns; at 100 TB the target
  * would be partitioned by (chainid, height-bucket) so the join prunes to
  * the touched partitions — noted here because plain-parquet reads the full
  * key set. Batches are also self-deduped (a chain fork can repeat a key
  * within one batch, Transaction.hs:74-78).
  */
object Upsert {

  /** Merge `batch` into the parquet table at `path` keyed by `pk`.
    * Returns the number of newly inserted rows. */
  def merge(spark: SparkSession, path: String, batch: DataFrame,
            pk: Seq[String]): Long = {
    val deduped = batch.dropDuplicates(pk)
    val fresh =
      if (Files.exists(Paths.get(path))) {
        val existing = spark.read.parquet(path).select(pk.map(col): _*)
        deduped.join(existing, pk, "left_anti")
      } else deduped
    // Two-phase because the source of the append is the target itself:
    // stage the new rows, then append the staged copy.
    val staged = fresh.persist()
    val n = staged.count()
    if (n > 0) {
      staged.write.mode("append").parquet(path)
      // Version the new state: paged readers pin the pre-merge manifest and
      // stay consistent while this append lands (Server.hs:600's REPEATABLE
      // READ, re-expressed as copy-on-write snapshots — Snapshots scaladoc).
      graft.sources.Snapshots.commit(spark, path): Unit
    }
    staged.unpersist()
    n
  }

  /** Write a whole flattened batch (all six tables) idempotently. */
  def mergeAll(spark: SparkSession, baseDir: String,
               tables: Map[String, (DataFrame, Seq[String])]): Map[String, Long] =
    tables.map { case (name, (df, pk)) =>
      name -> merge(spark, s"$baseDir/$name", df, pk)
    }
}
