package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 maintenance — the warehouse-side
  * sibling of the engine's latest-wins merge: instead of overwriting a
  * key's row, each change CLOSES the current version (stamps `valid_to_us`)
  * and opens a new one, so point-in-time joins ("what segment was this
  * customer in when the order shipped?") stay answerable forever.
  *
  * Contract:
  *  - `dim` rows: keyCol, attrCols…, `valid_from_us` BIGINT,
  *    `valid_to_us` BIGINT (NULL = current version). At most one current
  *    row per key.
  *  - `changes` rows: keyCol, attrCols…, tsCol BIGINT — at most ONE row
  *    per key (pre-collapse a batch with `Dedup.latestWins`; duplicate
  *    keys here would fan the join out and corrupt versioning — same
  *    unique-key precondition as `Packing`/kmeans, documented not
  *    detected).
  *  - A change equal to the current attributes (null-safe, all of
  *    attrCols) is a no-op; a change with `ts <= valid_from_us` of the
  *    current version is OUT OF ORDER and ignored (late data cannot
  *    rewrite closed history — feed changes in event order, the same
  *    discipline the merge sink's version column enforces).
  *
  * Scale shape: history rows pass through untouched (no shuffle beyond
  * the union), and the current slice joins `changes` in ONE key-keyed
  * full-outer join; each branch is a row-local projection, with the
  * close+open branch emitted by exploding a 2-element struct array — no
  * window, no second pass, output O(dim + changes).
  */
object Scd2 {

  def applyChanges(
      dim: DataFrame, changes: DataFrame, keyCol: String, tsCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "SCD2 needs at least one tracked attribute")
    val hist = dim.filter(col("valid_to_us").isNotNull)
    val cur = dim.filter(col("valid_to_us").isNull)
      .select(col(keyCol) +: col("valid_from_us").as("__vf") +:
        attrCols.map(c => col(c).as(s"__c_$c")): _*)
      .withColumn("__cp", lit(1))
    val chg = changes
      .select(col(keyCol) +: col(tsCol).cast("long").as("__ts") +:
        attrCols.map(c => col(c).as(s"__n_$c")): _*)
      .withColumn("__np", lit(1))
    val same = attrCols
      .map(c => col(s"__c_$c") <=> col(s"__n_$c")).reduce(_ && _)
    def ver(attrs: String => Column, vf: Column, vt: Column) =
      struct(attrCols.map(c => attrs(c).as(c)) :+ vf.as("valid_from_us") :+
        vt.as("valid_to_us"): _*)
    val curVer = ver(c => col(s"__c_$c"), col("__vf"),
      lit(null).cast("long"))
    val newVer = ver(c => col(s"__n_$c"), col("__ts"),
      lit(null).cast("long"))
    val closedVer = ver(c => col(s"__c_$c"), col("__vf"), col("__ts"))
    val emitted = cur.join(chg, Seq(keyCol), "full_outer")
      .withColumn("__out",
        when(col("__np").isNull, array(curVer))               // no change
          .when(col("__cp").isNull, array(newVer))            // new key
          .when(same || col("__ts") <= col("__vf"),
            array(curVer))                                    // no-op / late
          .otherwise(array(closedVer, newVer)))               // close + open
      .select(col(keyCol), explode(col("__out")).as("__v"))
      .select(col(keyCol) +:
        attrCols.map(c => col(s"__v.$c").as(c)) :+
        col("__v.valid_from_us").as("valid_from_us") :+
        col("__v.valid_to_us").as("valid_to_us"): _*)
    hist
      .select(col(keyCol) +: attrCols.map(col) :+ col("valid_from_us") :+
        col("valid_to_us"): _*)
      .unionByName(emitted)
  }
}
