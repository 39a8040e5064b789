package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed dataset diff — the regression checker of a data pipeline: given
  * two snapshots of a keyed table (yesterday's export vs today's, engine
  * A's output vs engine B's), emit exactly what changed: inserts,
  * deletes, and updates with the changed column names. This is the
  * generic-DataFrame sibling of `ParquetTarget.readChanges` (which diffs
  * the target's own retained versions manifest-pruned); use this one when
  * the two sides are arbitrary frames.
  *
  * Semantics: null-safe column equality (NULL == NULL, the `<=>`
  * operator), so a NULL→value transition reads as a change and NULL↔NULL
  * does not. Unchanged rows are absent from the output. Key columns must
  * be non-null and unique per side (the usual primary-key contract; with
  * duplicate keys the join multiplies rows and the diff is meaningless).
  *
  * Scale shape: ONE full-outer shuffle join keyed by the key columns —
  * the minimum possible for an unordered diff — with every comparison a
  * row-local expression after it. No window, no collect, no second pass;
  * AQE handles skewed keys. Output is O(changed rows).
  */
object Diff {

  /** @return one row per differing key: keyCols (coalesced), then
    *         `change_type` ('insert' | 'delete' | 'update') and
    *         `changed_cols` (sorted names of differing payload columns;
    *         empty for insert/delete). Payload columns = the common
    *         non-key columns of both sides; columns present on only one
    *         side are ignored (schema drift is a different check). */
  def keyedDiff(
      left: DataFrame, right: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyedDiff requires at least one key column")
    val payload = left.columns.filterNot(keyCols.contains)
      .filter(right.columns.contains).toSeq
    require(payload.nonEmpty,
      "keyedDiff requires at least one common non-key column")
    val l = left.select(
      keyCols.map(col) ++ payload.map(c => col(c).as(s"__l_$c")) :+
        lit(1).as("__lp"): _*)
    val r = right.select(
      keyCols.map(col) ++ payload.map(c => col(c).as(s"__r_$c")) :+
        lit(1).as("__rp"): _*)
    val joined = l.join(r, keyCols, "full_outer")
    val changed = sort_array(filter(
      array(payload.map(c =>
        when(!(col(s"__l_$c") <=> col(s"__r_$c")), lit(c))): _*),
      v => v.isNotNull))
    joined
      .withColumn("change_type",
        when(col("__rp").isNull, lit("delete"))
          .when(col("__lp").isNull, lit("insert"))
          .when(size(changed) > 0, lit("update")))
      .filter(col("change_type").isNotNull)
      .withColumn("changed_cols",
        when(col("change_type") === "update", changed)
          .otherwise(array().cast("array<string>")))
      .select(keyCols.map(col) :+ col("change_type") :+
        col("changed_cols"): _*)
  }

  /** Schema drift between two frames — the companion check to
    * [[keyedDiff]] (which deliberately ignores columns present on one
    * side only): one row per drifted column, `change_type` in
    * ('added' | 'removed' | 'type_changed') with both sides' Spark
    * `simpleString` types (NULL where the column is absent). 'added'
    * means present in `right` only — read left→right as old→new.
    *
    * Pure metadata: computed from the analyzed schemas on the driver
    * (O(columns), no job runs) and emitted as a local frame, which is
    * the right altitude — schema drift must be detectable BEFORE paying
    * for any scan of either side. */
  def schemaDiff(left: DataFrame, right: DataFrame): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val lt = left.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val rt = right.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val names = (left.schema.fieldNames ++ right.schema.fieldNames).distinct.toSeq
    names.flatMap { n =>
      (lt.get(n), rt.get(n)) match {
        case (Some(a), None) => Some((n, "removed", Option(a), Option.empty[String]))
        case (None, Some(b)) => Some((n, "added", Option.empty[String], Option(b)))
        case (Some(a), Some(b)) if a != b => Some((n, "type_changed", Option(a), Option(b)))
        case _ => None
      }
    }.toDF("column_name", "change_type", "left_type", "right_type")
  }
}
