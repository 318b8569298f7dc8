package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  // stable val (import spark.implicits._ needs one); the object-level
  // accessor below still rebuilds if the shared context was stopped
  // before this suite first touches it
  lazy val spark: SparkSession = SparkSpec.session
  def sf(name: String, dir: String = "/root/testdata/sf0.001") =
    spark.read.parquet(s"$dir/$name.parquet")
}

object SparkSpec {
  // def + stopped-check, not lazy val: if anything stops the shared
  // context mid-run (e.g. a main under test), later suites rebuild
  // instead of failing on a cached dead session
  private var cached: SparkSession = _
  def session: SparkSession = synchronized {
    if (cached == null || cached.sparkContext.isStopped) {
      cached = SparkSession.builder()
        .master("local[4]")
        .appName("graft-test")
        .config("spark.sql.shuffle.partitions", 4)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      cached.sparkContext.setLogLevel("WARN")
    }
    cached
  }
}
