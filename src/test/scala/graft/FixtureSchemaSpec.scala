package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._

/** Fixture contract: the ENGINE-FACING schema of every driver-generated
  * table, asserted after `SparkEntry.t()` normalization, across all SFs
  * present on disk.
  *
  * Round-7 lesson: the driver silently regenerated `events.parquet` with
  * `ts` as TIMESTAMP(µs) instead of TIMESTAMP(NANOS)-as-int64, and 51
  * gates went red at the driver with no local signal. `t()` now absorbs
  * either physical type into the engine contract (`ts`: epoch-nanos
  * BIGINT); this spec pins that contract so the NEXT drift fails one
  * named spec here instead of half the gate board.
  */
class FixtureSchemaSpec extends SparkSpec {

  private val sfDirs =
    Seq("sf0.001", "sf0.01", "sf0.1").map(s => s"/root/testdata/$s")
      .filter(d => Files.exists(Paths.get(d)))

  private val expected: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderpriority" -> StringType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType),
    // THE round-7 breaker: engine contract is epoch-nanos BIGINT whatever
    // the parquet physical type (TIMESTAMP(NANOS) int64 or TIMESTAMP µs).
    "events" -> Map("event_id" -> LongType, "ts" -> LongType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  for (dir <- sfDirs; (table, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"$dir/$table engine-facing schema after t()") {
      val schema = SparkEntry.t(spark, dir, table).schema
      val actual = schema.fields.map(f =>
        f.name -> (f.dataType match {
          case ArrayType(et, _) => ArrayType(et)
          case dt => dt
        })).toMap
      cols.foreach { case (name, dt) =>
        assert(actual.get(name).contains(dt),
          s"$table.$name: expected $dt, got ${actual.get(name)} " +
            s"(full schema: ${schema.simpleString})")
      }
    }
  }

  test("events.ts values are whole microseconds in nanos (sf0.001)") {
    import org.apache.spark.sql.functions._
    val bad = SparkEntry.t(spark, sfDirs.head, "events")
      .filter(col("ts") % 1000 =!= 0).count()
    assert(bad == 0L, s"$bad events.ts values are not whole-µs nanos")
  }
}
