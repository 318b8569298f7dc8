package graft

import org.apache.spark.sql.SparkSession

/** Engine entry point: a SparkSession wired with the graft extensions
  * (spatial expressions + optimizer rule, vector ops) and the confs the
  * engine is tuned for. Users of the reference switch by building their
  * session here and calling the `graft.api` pipelines / `graft.queries`
  * operators.
  */
object GraftSession {

  /** Pre-configured builder; caller may override any conf before
    * getOrCreate.
    */
  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft-engine")
      .withExtensions(new geo.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  /** Build the session and finish runtime registrations that the
    * extensions path can't cover (rule install on pre-existing sessions,
    * vec_dot).
    */
  def create(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = builder(master, shufflePartitions).getOrCreate()
    geo.GeoClip.register(spark)
    geo.ContainsPoint.register(spark)
    ml.VecOps.register(spark)
    sql.SqlTableFunctions.register(spark)
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
