package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Invariant: every gate in `SparkEntry.queries` emits only scalar
  * (atomic) top-level columns. The driver's correctness harness loads
  * gate output into pandas and sorts all columns; a top-level
  * array/map/struct cell is unhashable there and crashes the compare
  * before any values are checked (this bit `q_diff` in round 6).
  *
  * Schema inspection is lazy — building the DataFrame does not run the
  * query — so this walks all gates cheaply. Gates whose construction
  * itself requires actions (iterative ops) run at sf0.001.
  */
class GateSchemaSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("all gate outputs carry only atomic top-level columns") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema = fn(spark, sfDir).schema
        schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"non-scalar top-level gate columns:\n${offenders.mkString("\n")}")
  }

  test("every gate with an oracle has matching inventory") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle without gate: ${(o -- q).mkString(",")}")
  }
}
