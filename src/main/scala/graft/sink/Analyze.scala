package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** ANALYZE TABLE for a [[ParquetTarget]] — the optimizer-statistics
  * readout every warehouse engine maintains (row counts, null counts,
  * NDV, min/max per column) so planners can size joins, pick broadcast
  * sides and prune scans. One row per column:
  * (column, n_rows, n_null, ndv, min_num, max_num, min_str, max_str) —
  * numeric extremes in the `_num` pair, string extremes in the `_str`
  * pair (native-type ordering, never string-cast numerics, so "9" vs
  * "10" cannot invert).
  *
  * Cost: ONE aggregate pass over the snapshot for every count/extreme
  * plus the per-column exact distinct counts (Spark expands multiple
  * COUNT(DISTINCT) into one expand-operator plan — still a single
  * scan). Exact NDV is the deliberate choice here: the stats table has
  * a bounded number of columns, and the board's mergeable-HLL family
  * (`sketch_hll_*`) is the documented approximate twin for corpus-
  * cardinality columns where exact distinct would dominate at 100 TB.
  *
  * Columns of unsupported types (arrays, structs, binary) get counts
  * but NULL extremes and NULL ndv — surfaced, never silently dropped. */
object Analyze {

  def tableStats(target: ParquetTarget): Option[DataFrame] =
    target.read().map(columnStats)

  /** The per-column stats plan over any frame (the target-independent
    * core, also useful on arbitrary query results). */
  def columnStats(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val fields = df.schema.fields.toSeq
    def statsFor(f: org.apache.spark.sql.types.StructField): Seq[Column] = {
      val c = col(f.name)
      val base = Seq(
        count(lit(1)).as(s"__n_${f.name}"),
        count(when(c.isNull, 1)).as(s"__nn_${f.name}"))
      val typed = f.dataType match {
        case _: NumericType => Seq(
          countDistinct(c).as(s"__nd_${f.name}"),
          min(c).cast("double").as(s"__mn_${f.name}"),
          max(c).cast("double").as(s"__mx_${f.name}"),
          lit(null).cast("string").as(s"__ms_${f.name}"),
          lit(null).cast("string").as(s"__xs_${f.name}"))
        case StringType => Seq(
          countDistinct(c).as(s"__nd_${f.name}"),
          lit(null).cast("double").as(s"__mn_${f.name}"),
          lit(null).cast("double").as(s"__mx_${f.name}"),
          min(c).as(s"__ms_${f.name}"),
          max(c).as(s"__xs_${f.name}"))
        case _ => Seq(
          lit(null).cast("long").as(s"__nd_${f.name}"),
          lit(null).cast("double").as(s"__mn_${f.name}"),
          lit(null).cast("double").as(s"__mx_${f.name}"),
          lit(null).cast("string").as(s"__ms_${f.name}"),
          lit(null).cast("string").as(s"__xs_${f.name}"))
      }
      base ++ typed
    }
    val aggs = fields.flatMap(statsFor)
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perCol = fields.map { f =>
      struct(
        lit(f.name).as("column"),
        col(s"__n_${f.name}").cast("long").as("n_rows"),
        col(s"__nn_${f.name}").cast("long").as("n_null"),
        col(s"__nd_${f.name}").cast("long").as("ndv"),
        col(s"__mn_${f.name}").as("min_num"),
        col(s"__mx_${f.name}").as("max_num"),
        col(s"__ms_${f.name}").as("min_str"),
        col(s"__xs_${f.name}").as("max_str"))
    }
    one.select(explode(array(perCol: _*)).as("__s")).select(col("__s.*"))
  }
}
