package graft.api

import graft.SparkSpec
import java.nio.file.Files

class BronzeSpec extends SparkSpec {
  import spark.implicits._

  test("bronze ingest partitions, prunes, and derives the meta table") {
    val dir = Files.createTempDirectory("bronze").toString + "/hc"
    val batch1 = Seq(("2023", "1", "POSITIVE"), ("2023", "2", "neg"))
      .toDF("Year", "Month", "Slide Status")
    val batch2 = Seq(("2024", "1", "no malaria")).toDF("Year", "Month", "Slide Status")
    Bronze.ingest(batch1, dir, "healthcenter-data", "Gasabo", "Remera", 2023)
    Bronze.ingest(batch2, dir, "healthcenter-data", "Nyarugenge", "Kimisagara", 2024)

    // slice read returns only the matching partition
    val slice = Bronze.read(spark, dir, district = Some("gasabo"), years = Seq(2023))
    assert(slice.count() == 2)

    // partition pruning is visible in the physical plan
    val plan = slice.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("_district"),
      s"expected partition filters in:\n$plan")
    // and no row-group data filter needed for the partition columns
    val pruned = Bronze.read(spark, dir, district = Some("nowhere"))
    assert(pruned.count() == 0)

    // metadata sibling: counts + column inventory per partition
    val meta = Bronze.metaTable(spark, dir).collect()
    assert(meta.length == 2)
    val g = meta.find(_.getAs[String]("_district") == "gasabo").get
    assert(g.getAs[Long]("records_count") == 2)
    assert(g.getAs[scala.collection.Seq[String]]("columns").toSet
      .contains("Slide Status"))
    // lineage columns are stamped
    assert(slice.columns.count(_.startsWith("_")) >= 5)
  }
}
