package graft.geo

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed two-level CCL vs an in-test single-threaded BFS over the
  * same grid — an algorithm-independent check (the q102 oracle adds a
  * third, recursive-SQL implementation on top).
  */
class RasterPolygonizeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference labeling: plain BFS, component id = min cell id. */
  private def bfsLabel(cells: Seq[(Long, Int, Int, Int)]): Map[Long, Long] = {
    val byPos = cells.map(x => (x._2, x._3) -> x).toMap
    val seen = scala.collection.mutable.Map[Long, Long]()
    for (cell <- cells.sortBy(_._1) if !seen.contains(cell._1)) {
      val queue = scala.collection.mutable.Queue(cell)
      seen(cell._1) = cell._1
      while (queue.nonEmpty) {
        val (_, r, c, v) = queue.dequeue()
        for (nb <- Seq((r - 1, c), (r + 1, c), (r, c - 1), (r, c + 1));
             y <- byPos.get(nb) if y._4 == v && !seen.contains(y._1)) {
          seen(y._1) = cell._1
          queue += y
        }
      }
    }
    seen.toMap
  }

  private def grid(w: Int, h: Int)(cls: (Int, Int) => Int): Seq[(Long, Int, Int, Int)] =
    for (r <- 0 until h; c <- 0 until w)
      yield ((r.toLong * w + c), r, c, cls(r, c))

  private def check(cells: Seq[(Long, Int, Int, Int)], tile: Int): Unit = {
    val got = RasterPolygonize
      .label(spark, cells.toDF("id", "r", "c", "v"), tile)
      .select("id", "component")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == bfsLabel(cells))
  }

  test("checkerboard: every cell its own component (tile smaller than grid)") {
    check(grid(9, 9)((r, c) => (r + c) % 2), tile = 4)
  }

  test("spiral-ish stripes crossing tile borders") {
    check(grid(20, 20)((r, c) => ((r / 3) + (c / 5)) % 3), tile = 7)
  }

  test("single class: one component spanning all tiles") {
    val cells = grid(15, 10)((_, _) => 7)
    check(cells, tile = 4)
    val regions = RasterPolygonize
      .regions(spark, cells.toDF("id", "r", "c", "v"), tile = 4).collect()
    assert(regions.length == 1)
    assert(regions.head.getLong(2) == 150L) // n_cells
  }

  test("sparse cells (holes in the raster) never bridge across gaps") {
    val cells = grid(8, 8)((r, c) => 1).filter { case (_, r, c, _) => (r + c) % 3 != 0 }
    check(cells, tile = 3)
  }

  test("negative coordinates: tile math must not split regions at the origin") {
    // truncating / and % fold tiles -1 and 0 together and miss cross-tile
    // edges below zero; floorDiv/pmod keep the grid uniform
    val cells = grid(12, 12)((r, c) => ((r / 4) + (c / 4)) % 2)
      .map { case (id, r, c, v) => (id, r - 6, c - 6, v) }
    val got = RasterPolygonize
      .label(spark, cells.toDF("id", "r", "c", "v"), tile = 5)
      .select("id", "component")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == bfsLabel(cells))
  }

  test("ids need not be dense or grid-ordered") {
    val cells = grid(6, 6)((r, c) => c / 3).map { case (id, r, c, v) => (id * 7 + 13, r, c, v) }
    check(cells, tile = 2)
  }
}
