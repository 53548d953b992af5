package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}
import org.apache.spark.sql.util.QueryExecutionListener

/** Driver-gate contract lints.
  *
  * 1. Money columns: every gated aggregate money column (suffix `_e4`,
  *    `_cents`, `_micros`, `_bps`) must be BIGINT (LongType) — the one
  *    output family with a perfect driver-hash record (COVERAGE.md
  *    "driver-hash decimal contract"). A DecimalType regression here is a
  *    gate failure even when local values match, because DuckDB widens
  *    DECIMAL sums and the driver hashes the rendered values strictly.
  *
  * 2. Query/oracle key parity: every `queries` entry the driver gates has
  *    an `oracleSql` mirror or is knowingly rows-only; every oracle key
  *    refers to a real query.
  *
  * Cost honesty (the round-8 verdict finding): `.schema` is NOT free for
  * every query — iterative constructions (BPE vocab rounds, label
  * propagation) legitimately run small driver-bounded jobs, and every
  * `spark.read` costs a footer/listing job. What must NEVER happen inside
  * the lint is a hidden WRITE (the three layout queries used to rewrite
  * whole tables under a test that claimed to be schema-only). The lint now
  * runs under a write-detector: any `save`/`saveAsTable`/`insertInto`
  * during the non-eager pass fails the test, and the layout-query test
  * asserts the detector actually fires for them (non-vacuous).
  */
class DriverContractSpec extends SparkSpec {

  private val moneySuffixes = Seq("_e4", "_cents", "_micros", "_bps")

  // Streaming-backed queries execute eagerly on construction (the memory-
  // sink pattern awaits termination inside the builder) — their money
  // columns are asserted by StreamingSemanticsSpec instead.
  private val streamingEager = Set(
    "st_hourly", "st_debounce", "st_dedup", "st_sessions", "st_sliding",
    "st_monitor", "st_curation", "st_sync")

  // Layout-writing queries intentionally execute their layout write at
  // construction time (the write IS what the query gates) — they get
  // their own lint test below instead of hiding full table rewrites
  // inside the batch pass.
  private val layoutEager =
    Set("j12_bucketed_join", "j13_zorder_scan", "j14_zorder_quantiled",
      "sim_ann_store", "sim_annpq_store", "dd_index_query",
      "dd_index_classify", "ia_priority_rollup", "ia_priority_hist",
      "ia_rewrite", "ia_rewrite_avg", "cp_compact_scan", "lx_search",
      "lx_hybrid", "lx_search_inc", "lx_search_del", "lx_search_upd",
      "lx_search_cdc", "sim_annpq_rerank", "lx_hybrid_ann",
      // build + commit the persisted semantic-dedup index at
      // construction — the persisted-artifact write IS the gate
      "sim_semdedup_store", "sim_semdedup_search",
      // fits + commits a DSIR model snapshot at construction — the
      // persisted-artifact write IS what ta_dsir_store gates
      "ta_dsir_store")

  private val eager = streamingEager ++ layoutEager

  // Spark 4 reports every DataFrameWriter action as funcName "command";
  // the analyzed plan class names the write (probed empirically:
  // InsertIntoHadoopFsRelationCommand for .parquet(path),
  // CreateDataSourceTableAsSelectCommand / SaveAsV1TableCommand for
  // .saveAsTable).
  private val writeCommandPattern =
    "(Insert|SaveAs|SaveInto|CreateDataSourceTableAsSelect|WriteTo|Overwrite|AppendData|ReplaceData)".r

  /** Runs `body` under a write-detector; returns (result, writes seen).
    * The listener bus is async, so a sentinel query with a marker column
    * is used to flush it (FIFO: once the sentinel is delivered, every
    * earlier event has been too). */
  private def withWriteDetector[A](body: => A): (A, Seq[String]) = {
    val writes = new ConcurrentLinkedQueue[String]()
    val sentinelSeen = new AtomicBoolean(false)
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = {
        val cls = qe.analyzed.getClass.getSimpleName
        if (funcName == "command" && writeCommandPattern.findFirstIn(cls).isDefined)
          writes.add(s"$funcName: $cls")
        if (qe.analyzed.schema.fieldNames.contains("__lint_sentinel__"))
          sentinelSeen.set(true)
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val result = body
      spark.range(1).select(org.apache.spark.sql.functions.col("id")
        .as("__lint_sentinel__")).collect()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!sentinelSeen.get() && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(sentinelSeen.get(), "listener bus never delivered the sentinel")
      (result, writes.toArray(Array.empty[String]).toSeq)
    } finally spark.listenerManager.unregister(listener)
  }

  // Round-12 (the a5 lesson, made a lint): the rounds-2–4 driver-hash
  // decimal contract says the driver's hasher rejects small-row DECIMAL
  // aggregate outputs regardless of value identity — a5_rate_anomaly
  // violated it in r11 (ss widened BIGINT→DECIMAL(38,0) by an otherwise
  // correct overflow fix) and hash-failed the gate while passing the
  // strict local mirror. NO gated query may emit a DecimalType column —
  // probed this round: even the join-fed money family (q3/q5/q8) already
  // emits BIGINT fixed-point, so the greenlist is empty. A query that
  // genuinely needs a decimal output must re-prove the driver hash first.
  private val decimalGreenlist = Set.empty[String]

  private def decimalOffenders(schemas: Map[String, StructType]): Seq[String] =
    schemas.toSeq.sortBy(_._1).flatMap { case (name, schema) =>
      schema.fields.collect {
        case f if f.dataType.isInstanceOf[
              org.apache.spark.sql.types.DecimalType] &&
            !decimalGreenlist(name) =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }

  private def moneyOffenders(schemas: Map[String, StructType]): Seq[String] =
    schemas.toSeq.sortBy(_._1).flatMap { case (name, schema) =>
      schema.fields.collect {
        case f if moneySuffixes.exists(f.name.endsWith) &&
            f.dataType != (LongType: DataType) &&
            f.dataType != (IntegerType: DataType) =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }

  // The round-7 lesson, made a lint: the driver sorts columns BY NAME
  // before hashing, so an engine column the oracle doesn't name (e.g.
  // `revenue_e4` vs a stale `revenue`) hash-fails even with identical
  // values. Requiring every output column name to appear as a word in
  // the oracle SQL catches that drift at test time instead of gate time.
  private def oracleNameOffenders(schemas: Map[String, StructType]): Seq[String] =
    schemas.toSeq.sortBy(_._1).flatMap { case (name, schema) =>
      SparkEntry.oracleSql.get(name).toSeq.flatMap { sql =>
        schema.fieldNames
          .filterNot { c =>
            ("(?i)(?<![A-Za-z0-9_])" +
              java.util.regex.Pattern.quote(c) + "(?![A-Za-z0-9_])").r
              .findFirstIn(sql).isDefined
          }
          .map(c => s"$name.$c")
      }
    }

  test("money + oracle-name lints over every batch query — and the pass performs no writes") {
    val (schemas, writes) = withWriteDetector {
      SparkEntry.queries.keys.toSeq.sorted
        .filterNot(eager)
        .map(name => name -> SparkEntry.queries(name)(spark, sfDir).schema)
        .toMap
    }
    val money = moneyOffenders(schemas)
    assert(money.isEmpty, s"non-integer money columns: ${money.mkString(", ")}")
    val decs = decimalOffenders(schemas)
    assert(decs.isEmpty,
      s"DECIMAL-typed gated outputs (driver-hash decimal contract): ${decs.mkString(", ")}")
    // non-vacuous: the detector flags a planted DecimalType schema (the
    // exact shape of r11's a5 regression — DECIMAL(38,0) aggregate out)
    val planted = Map("__planted__" -> new StructType()
      .add("ss", org.apache.spark.sql.types.DecimalType(38, 0)))
    assert(decimalOffenders(planted) == Seq("__planted__.ss: decimal(38,0)"),
      "decimal lint failed to flag a planted DECIMAL(38,0) column")
    val names = oracleNameOffenders(schemas)
    assert(names.isEmpty,
      s"output columns the oracle never names: ${names.mkString(", ")}")
    assert(writes.isEmpty,
      s"schema lint triggered hidden writes — move the offender to the eager set: ${writes.mkString(", ")}")
  }

  test("layout queries pass the same lints (their construction IS a layout write — detector must fire)") {
    val (schemas, writes) = withWriteDetector {
      layoutEager.toSeq.sorted
        .map(name => name -> SparkEntry.queries(name)(spark, sfDir).schema)
        .toMap
    }
    val money = moneyOffenders(schemas)
    assert(money.isEmpty, s"non-integer money columns: ${money.mkString(", ")}")
    val decs = decimalOffenders(schemas)
    assert(decs.isEmpty,
      s"DECIMAL-typed gated outputs (driver-hash decimal contract): ${decs.mkString(", ")}")
    val names = oracleNameOffenders(schemas)
    assert(names.isEmpty,
      s"output columns the oracle never names: ${names.mkString(", ")}")
    assert(writes.nonEmpty,
      "write detector saw nothing during layout-query construction — the detector is broken (vacuous batch lint)")
  }

  test("every oracleSql key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys without a query: $orphans")
  }

  test("streaming queries' oracle mirrors name their output columns") {
    // the streaming queries execute on construction (cheap at spec SF);
    // their column-name parity is linted by constructing them once each
    val schemas = streamingEager.toSeq.sorted
      .filter(SparkEntry.queries.contains)
      .map(name => name -> SparkEntry.queries(name)(spark, sfDir).schema)
      .toMap
    val names = oracleNameOffenders(schemas)
    assert(names.isEmpty,
      s"output columns the oracle never names: ${names.mkString(", ")}")
  }
}
