package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout — the
  * standard open technique (used by Delta/Iceberg OPTIMIZE ZORDER) for
  * making parquet min/max row-group statistics selective on SEVERAL
  * columns at once: sort by the interleaved key and every row group maps
  * to a small hyper-rectangle of the key space, so a conjunctive range
  * filter prunes most groups at scan time instead of reading and
  * discarding.
  *
  * The bit-spread is the classic magic-number closed form — plain Column
  * shift/mask arithmetic, fully inside whole-stage codegen (no UDF, no
  * custom expression needed), and exactly mirrorable in any SQL engine
  * with shifts (the q107 oracle).
  */
object ZOrder {

  /** Spread the low 16 bits of `c` so bit i lands at position 2i. */
  def spread16(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 2-D Morton code of two 16-bit values: x in even bits, y in odd. */
  def zvalue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Write `df` laid out along the z-curve of `(x, y)`: range-partitioned
    * AND sorted within partitions by the z-value, so both file-level and
    * row-group-level min/max statistics are tight boxes. The z column
    * itself is dropped — it's a layout device, not data.
    */
  def writeZOrdered(df: DataFrame, path: String, x: Column, y: Column,
      partitions: Int): Unit =
    df.withColumn("_z", zvalue(x, y))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
