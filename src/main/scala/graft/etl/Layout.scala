package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for write-time clustering — the
  * 100 TB lever the reference never pulls: its sinks append in
  * arrival order, so a predicate on any column but the implicit load
  * date reads EVERY file. Sorting by one column fixes one predicate
  * dimension and destroys the others; interleaving the dimensions'
  * bits onto a Z-order (Morton) curve gives every indexed dimension
  * partial locality, so parquet footer min/max stats prune files and
  * row groups for range predicates on ANY prefix-free combination of
  * the indexed columns.
  *
  * All pure Column expressions (shift/and/or — whole-stage codegen,
  * no UDF). The write path is `repartitionByRange` on the z-value
  * (range exchange = contiguous curve segments per file) + an
  * in-partition sort, which is exactly the sort a columnar writer
  * wants for run-length/dictionary efficiency anyway.
  */
object Layout {

  /** Interleave the low `bits` bits of each (non-negative, integral)
    * column onto the Morton curve: result bit `b*n + i` is bit `b` of
    * `cols(i)`. Total `bits * cols.size` must fit a signed long.
    * Callers scale each dimension into `[0, 2^bits)` first — see
    * [[scaleToBits]]. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "at least one column")
    require(bits > 0 && bits * cols.size <= 63,
      s"bits*dims must be in (0,63], got ${bits * cols.size}")
    val n = cols.size
    val terms = for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Affine-scale a numeric column from `[lo, hi]` into `[0, 2^bits)`,
    * clamping outliers — the per-dimension normalization zValue
    * expects. `lo`/`hi` come from domain knowledge or a stats pass;
    * a stale range only degrades clustering, never correctness. */
  def scaleToBits(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val buckets = (1L << bits) - 1
    val scaled = (c.cast("double") - lit(lo)) / lit(hi - lo) * lit(buckets.toDouble)
    least(greatest(floor(scaled).cast("long"), lit(0L)), lit(buckets))
  }

  /** Cluster `df` along the Z-curve of `dims` (each pre-scaled to
    * `[0, 2^bits)`): a range exchange on the z-value cuts the curve
    * into `numFiles` contiguous segments — each output file then covers
    * a small hyper-rectangle of the dimension space, which is what
    * makes its footer min/max stats selective. */
  def zOrder(df: DataFrame, dims: Seq[Column], bits: Int,
      numFiles: Int): DataFrame = {
    val z = zValue(dims, bits).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
