package graft

import graft.engine.QuickStreamBuilder
import graft.model.TargetTable

/** Builder validation mirroring the reference's panic-on-missing-config
  * tests (quick_stream `src/builder.rs:231-551`): every missing required
  * field fails with a message naming it; the happy path constructs all
  * four processors — including multi-table delete, which the reference's
  * builder cannot build (gap at `src/builder.rs:161-222`). */
class BuilderSpec extends SparkSpec {

  private def target = TargetTable("t", "/tmp/graft-builder-spec/t")
  private def builder = new QuickStreamBuilder(spark)
    .withMaxConCount(4)
    .withMaxRecordsPerCycleBatch(1000L)

  test("missing max_con_count fails with its name") {
    val e = intercept[IllegalArgumentException] {
      new QuickStreamBuilder(spark)
        .withMaxRecordsPerCycleBatch(10L).withTarget(target).buildUpsert()
    }
    assert(e.getMessage.contains("max_con_count"))
  }

  test("missing max_records_per_cycle_batch fails with its name") {
    val e = intercept[IllegalArgumentException] {
      new QuickStreamBuilder(spark)
        .withMaxConCount(4).withTarget(target).buildUpsert()
    }
    assert(e.getMessage.contains("max_records_per_cycle_batch"))
  }

  test("missing target table fails") {
    val e = intercept[IllegalArgumentException] { builder.buildUpsert() }
    assert(e.getMessage.contains("target"))
  }

  test("empty catalog fails for multi-table processors") {
    val e = intercept[IllegalArgumentException] { builder.buildMultiTableUpsert() }
    assert(e.getMessage.contains("catalog"))
  }

  test("happy path constructs all four processors") {
    val cat = Map("a" -> target)
    builder.withTarget(target).buildUpsert()
    builder.withTarget(target).buildDelete()
    builder.withCatalog(cat).buildMultiTableUpsert()
    builder.withCatalog(cat).buildMultiTableDelete() // absent in the reference
    succeed
  }

  test("inert reference knobs are accepted for API familiarity") {
    builder
      .withConnectionCreationThreshold(25.0)
      .withSenderPools(1, 2, 1)
      .withBufferSize(10L)
      .withIntroducedLagCycles(2)
      .withIntroducedLagInMillies(100L)
      .withTarget(target)
      .buildUpsert()
    succeed
  }
}
