package graft.geo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S5 runtime half: raster polygonization — group 4-connected same-class
  * cells into regions, the engine-side equivalent of the reference's
  * per-class raster→polygon extraction during slope uploads
  * (SlopeGeoJsonUploadView.py:195-321, which shells out to a single-node
  * shapes() call).
  *
  * Two-level connected-component labeling, the shape that survives 100 TB:
  *
  *  1. cells shuffle ONCE into square tiles; each tile is labeled by an
  *     in-memory union-find (bounded: tile² cells per task, constant);
  *  2. only tile-BOUNDARY adjacencies — a perimeter-sized fraction of the
  *     raster — become an equivalence edge list between tile-local roots;
  *  3. that contracted graph is resolved distributedly by
  *     [[graft.ops.ConnectedComponents]] (large-star/small-star), so no
  *     stage ever holds more than a tile or an edge partition in memory —
  *     there is no driver-side union-find to outgrow.
  *
  * Component ids are the smallest cell id in the region — deterministic
  * and engine-independent, which is what lets a recursive-CTE oracle
  * (q102) hash-match the distributed run exactly.
  */
object RasterPolygonize {

  final case class RCell(id: Long, r: Int, c: Int, v: Int)
  // public like RCell: Janino-generated encoder code lives outside this
  // package, so a private case class forces ERROR-logged codegen fallback
  // to interpreted serializers on every q102 run
  final case class LCell(id: Long, r: Int, c: Int, v: Int, lroot: Long)

  /** Tile-local exact labeling: union-find over one tile's cells, roots
    * are min cell ids. Runs inside flatMapGroups — memory is O(tile²).
    */
  private def localLabel(cells: Iterator[RCell]): Iterator[LCell] = {
    val arr = cells.toArray
    val byPos = new scala.collection.mutable.HashMap[(Int, Int), RCell]()
    arr.foreach(x => byPos((x.r, x.c)) = x)
    val parent = new scala.collection.mutable.HashMap[Long, Long]()
    arr.foreach(x => parent(x.id) = x.id)
    def find(x: Long): Long = {
      var root = x
      while (parent(root) != root) root = parent(root)
      var cur = x // path compression
      while (parent(cur) != root) { val nxt = parent(cur); parent(cur) = root; cur = nxt }
      root
    }
    def union(a: Long, b: Long): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    for (x <- arr; nb <- Seq((x.r - 1, x.c), (x.r, x.c - 1)))
      byPos.get(nb).foreach(y => if (y.v == x.v) union(x.id, y.id))
    arr.iterator.map(x => LCell(x.id, x.r, x.c, x.v, find(x.id)))
  }

  /** cells(id: long, r: int, c: int, v: int) → the same cells with a
    * `component` column (smallest cell id in the 4-connected same-v
    * region). `tile` is the square tile side for the local pass.
    */
  def label(spark: SparkSession, cells: DataFrame, tile: Int): DataFrame = {
    import spark.implicits._
    val labeled = cells
      .select(col("id").cast("long"), col("r").cast("int"),
        col("c").cast("int"), col("v").cast("int"))
      .as[RCell]
      // floorDiv, not /: truncating division folds tiles -1 and 0
      // together at negative coordinates (projected grids go negative)
      .groupByKey(x => (Math.floorDiv(x.r, tile), Math.floorDiv(x.c, tile)))
      .flatMapGroups((_, it) => localLabel(it))
      .toDF()
      // referenced by both boundary-edge derivations AND the final join;
      // without materialization each reference re-runs the tile shuffle
      .localCheckpoint()

    // boundary adjacencies only: right edge of a tile against the left
    // edge of its east neighbor, bottom edge against the top of its south
    // neighbor — O(perimeter), not O(cells). pmod, not %: Scala/SQL %
    // returns negative remainders below zero, which would silently drop
    // every cross-tile edge in the negative quadrants
    val slim = labeled.select("r", "c", "v", "lroot")
    def border(edgeA: DataFrame, edgeB: DataFrame): DataFrame =
      edgeA.join(edgeB, Seq("jr", "jc", "jv"))
        .select(col("la").as("src"), col("lb").as("dst"))
    val hEdges = border(
      slim.filter(pmod(col("c"), lit(tile)) === tile - 1)
        .select(col("r").as("jr"), (col("c") + 1).as("jc"), col("v").as("jv"), col("lroot").as("la")),
      slim.filter(pmod(col("c"), lit(tile)) === 0)
        .select(col("r").as("jr"), col("c").as("jc"), col("v").as("jv"), col("lroot").as("lb")))
    val vEdges = border(
      slim.filter(pmod(col("r"), lit(tile)) === tile - 1)
        .select((col("r") + 1).as("jr"), col("c").as("jc"), col("v").as("jv"), col("lroot").as("la")),
      slim.filter(pmod(col("r"), lit(tile)) === 0)
        .select(col("r").as("jr"), col("c").as("jc"), col("v").as("jv"), col("lroot").as("lb")))

    val roots = graft.ops.ConnectedComponents.run(hEdges.unionAll(vEdges))
    labeled.join(roots, labeled("lroot") === roots("node"), "left_outer")
      .select(col("id"), col("r"), col("c"), col("v"),
        coalesce(col("root"), col("lroot")).as("component"))
  }

  /** Region summaries — the polygon inventory the reference serves per
    * class: component id, class, cell count, bounding box.
    */
  def regions(spark: SparkSession, cells: DataFrame, tile: Int): DataFrame =
    label(spark, cells, tile)
      .groupBy(col("component").as("component_id"), col("v").as("klass"))
      .agg(count(lit(1)).as("n_cells"),
        min("r").as("min_r"), max("r").as("max_r"),
        min("c").as("min_c"), max("c").as("max_c"))
}
