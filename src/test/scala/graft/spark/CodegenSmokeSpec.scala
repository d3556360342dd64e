package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Strict-codegen sweep of the ENTIRE query surface.
  *
  * Spark's projection factories silently fall back to interpreter mode
  * when generated code fails to compile — the plan still answers
  * correctly, PlanAuditSpec still sees its WholeStageCodegen nodes, and
  * the only trace is a WARN in the log. That is exactly how
  * graft_fingerprint ran interpreted for a round: its generated call
  * hit a Scala default-argument (no bytecode overload) and Janino
  * rejected it (found via the sf1 run's fallback warnings).
  *
  * This spec closes the class: every registered query runs in a session
  * with `codegen.factoryMode = CODEGEN_ONLY` and `codegen.fallback =
  * false`, so ANY expression whose generated code does not compile
  * fails the suite loudly instead of degrading silently.
  */
class CodegenSmokeSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-codegen-smoke")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .config("spark.sql.codegen.fallback", "false")
      .withExtensions(new graft.expr.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("every registered query executes with codegen fallback disabled " +
      "(no kernel's generated code fails to compile)") {
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      withClue(s"query $name under CODEGEN_ONLY: ") {
        fn(spark, dir).write.format("noop").mode("overwrite").save()
      }
    }
  }

  test("the fused pipeline executes under CODEGEN_ONLY too") {
    graft.pipeline.QualityPipeline(
        graft.model.PagesSynth.pages(spark, 200, 4))
      .write.format("noop").mode("overwrite").save()
  }
}
