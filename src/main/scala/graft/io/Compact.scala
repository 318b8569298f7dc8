package graft.io

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance chore every long-lived
  * 100-TB dataset needs: streaming ingest and per-batch upserts leave
  * thousands of KB-sized parquet files whose per-file open/footer cost
  * eventually dwarfs the scan itself.
  *
  * Strategy: size the output file count from the actual on-disk bytes
  * (not row counts — row width varies wildly), then rewrite through
  * [[Writers.upsertPath]]-style staging so readers never observe a
  * half-compacted directory. When a sort column is given the rewrite
  * lays files out by its range, keeping min/max stats selective (and
  * composing with [[graft.ops.ZOrder.writeZOrdered]] for 2-D layouts).
  */
object Compact {

  /** Bytes under `path` (parquet data files only). */
  def dataBytes(spark: SparkSession, path: String): Long = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(hPath, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) total += f.getLen
    }
    total
  }

  def dataFileCount(spark: SparkSession, path: String): Int = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(hPath, true)
    var n = 0
    while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    n
  }

  /** Rewrite `path` into ~`targetFileBytes` files (default 128 MiB, the
    * usual HDFS-block-aligned choice). Returns (filesBefore, filesAfter).
    * The rewrite stages then lands via [[Writers.swapInto]] — one shared
    * crash-safety protocol: [[Writers.recoverAndClean]] first restores
    * any backup a crashed previous run (of compaction OR upsert) left
    * behind, so the dataset is never lost and never half-written.
    */
  def compactPath(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      sortBy: Option[String] = None): (Int, Int) = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Writers.recoverAndClean(fs, hPath)
    val before = dataFileCount(spark, path)
    val nOut = math.max(1, math.ceil(dataBytes(spark, path).toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(path)
    val laidOut = sortBy match {
      case Some(c) => df.repartitionByRange(nOut, col(c)).sortWithinPartitions(c)
      case None => df.repartition(nOut)
    }
    laidOut.write.mode(SaveMode.Overwrite).parquet(path + Writers.StagingSuffix)
    Writers.swapInto(fs, hPath)
    (before, dataFileCount(spark, path))
  }
}
