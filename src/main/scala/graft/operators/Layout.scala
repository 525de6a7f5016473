package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — multi-dimensional clustering for parquet
  * lakes. At 100 TB the scan cost of a two-predicate query is decided by
  * FILE layout, not the plan: sorting by `(a, b)` clusters only `a`, while
  * interleaving the bits of both keys gives every file a tight min/max on
  * BOTH columns, so either predicate prunes row groups. This is the same
  * layout OPTIMIZE ZORDER performs in lakehouse table formats, expressed
  * as plain Spark: compute the z-value, range-partition on it, sort within
  * partitions. (No reference counterpart — the reference's hive-style
  * yyyy/mm/dd/hh layout, `s3_writer.py:216-230`, clusters time only;
  * extension per the 100 TB mandate.)
  */
object Layout {

  /** Morton interleave of two dimensions in [0, 65535]: x occupies even
    * bits, y odd bits. Pure integer codegen expressions — zero shuffle; the
    * z-value is a scan-time column. Out-of-range inputs FAIL the job: a
    * silent low-16-bit mask would alias distant values (5 and 65541) onto
    * one z-cell, making every file's (x, y) rectangle claim false and
    * quietly destroying the pruning the layout exists for — quantize wider
    * domains into 16 bits (scale/shift/bucket) before calling.
    */
  def zValue16(x: Column, y: Column): Column = {
    def checked(c: Column, name: String): Column = {
      val l = c.cast("long")
      when(l < 0L || l > 65535L,
        raise_error(concat(
          lit(s"zValue16: $name outside [0, 65535] (quantize first): "),
          l.cast("string"))).cast("long"))
        .otherwise(l)
    }
    val xm = checked(x, "x")
    val ym = checked(y, "y")
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }
  }

  /** The identical interleave as DuckDB SQL (for cross-engine oracles). */
  def zValue16Sql(x: String, y: String): String =
    (0 until 16)
      .map(i =>
        s"((((($x) >> $i) & 1) << ${2 * i}) + (((($y) >> $i) & 1) << ${2 * i + 1}))")
      .mkString(" + ")

  /** Z-order-clustered write: range-partition on the z-value (sampled range
    * boundaries keep files equal-sized under skew), sort within partitions,
    * one parquet file per range. Each output file then has a tight z-range —
    * equivalently a small rectangle in (x, y) space — so min/max row-group
    * stats prune on either dimension.
    */
  def clusteredWrite(
      df: DataFrame,
      x: Column,
      y: Column,
      path: String,
      numFiles: Int): Unit = {
    val z = zValue16(x, y)
    df.repartitionByRange(numFiles, z)
      .sortWithinPartitions(z)
      .write
      .mode("overwrite")
      .parquet(path)
  }
}
