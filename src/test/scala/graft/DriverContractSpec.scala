package graft

import org.apache.spark.sql.types.{IntegerType, LongType}

/** Driver-gate contract lints.
  *
  * 1. Money columns: every gated aggregate money column (suffix `_e4`,
  *    `_cents`, `_micros`, `_bps`) must be BIGINT (LongType) — the one
  *    output family with a perfect driver-hash record (COVERAGE.md
  *    "driver-hash decimal contract"). A DecimalType regression here is a
  *    gate failure even when local values match, because DuckDB widens
  *    DECIMAL sums and the driver hashes the rendered values strictly.
  *    Schema-only: `.schema` analyzes the plan without executing it, so
  *    this covers every batch query at zero data cost.
  *
  * 2. Query/oracle key parity: every `queries` entry the driver gates has
  *    an `oracleSql` mirror or is knowingly rows-only; every oracle key
  *    refers to a real query.
  */
class DriverContractSpec extends SparkSpec {

  private val moneySuffixes = Seq("_e4", "_cents", "_micros", "_bps")

  // Streaming-backed queries execute eagerly on construction (the memory-
  // sink pattern awaits termination inside the builder) — their money
  // columns are asserted by StreamingSemanticsSpec instead.
  private val eager = Set(
    "st_hourly", "st_debounce", "st_dedup", "st_sessions", "st_sliding",
    "st_monitor", "st_curation", "st_sync")

  test("gated money columns are BIGINT, never Decimal") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(eager)
      .flatMap { name =>
        val schema = SparkEntry.queries(name)(spark, sfDir).schema
        schema.fields.collect {
          case f if moneySuffixes.exists(f.name.endsWith) &&
              f.dataType != LongType && f.dataType != IntegerType =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
      }
    assert(offenders.isEmpty, s"non-integer money columns: ${offenders.mkString(", ")}")
  }

  test("every oracleSql key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys without a query: $orphans")
  }

  // The round-7 lesson, made a lint: the driver sorts columns BY NAME
  // before hashing, so an engine column the oracle doesn't name (e.g.
  // `revenue_e4` vs a stale `revenue`) hash-fails even with identical
  // values. Requiring every output column name to appear as a word in
  // the oracle SQL catches that drift at test time instead of gate time.
  test("every gated output column is named in its oracle SQL") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => eager(name) }
      .flatMap { case (name, sql) =>
        SparkEntry.queries(name)(spark, sfDir).schema.fieldNames
          .filterNot { c =>
            ("(?i)(?<![A-Za-z0-9_])" +
              java.util.regex.Pattern.quote(c) + "(?![A-Za-z0-9_])").r
              .findFirstIn(sql).isDefined
          }
          .map(c => s"$name.$c")
      }
    assert(offenders.isEmpty,
      s"output columns the oracle never names: ${offenders.mkString(", ")}")
  }
}
