package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.GraftFunctions._
import graft.model.PagesSynth

/** The composed webtext quality-filter pipeline (SURVEY §3.5):
  *
  * {{{
  * pages(url, warc_ts, html, text, lang)
  *   → extract   (html-only rows through graft_html_text; P1 branch)
  *   → pii       (tokenize → fused scan → refine → span join → scrub; one pass)
  *   → langid    (char-n-gram profiles, JVM-singleton state)
  *   → perplexity(per-lang trigram LM)
  *   → heuristics(Gopher/C4 rules, lang-aware stopwords)
  *   → keep/drop + full rule lineage
  * }}}
  *
  * Everything is per-row column expressions — zero shuffles, zero custom
  * optimizer rules (SURVEY §4.2): the plan is a single WholeStageCodegen
  * project over the scan, and scaling is bounded only by input split
  * parallelism. The only exchange a full job performs is the salted
  * repartition before the partitioned write (graft.io).
  *
  * Stage ordering is the reference's cheap-predicate-first idea
  * (backend/pdf/PDFRedactor.py:73-81) applied to columns: the extract
  * branch runs only for rows with no `text`.
  */
object QualityPipeline {

  final val PerplexityMax: Double = PagesSynth.PerplexityMax
  final val LangConfMin: Double = PagesSynth.LangConfMin

  /** Pipeline-level rules appended to the heuristic lineage. */
  private def pipelineRules(ppl: Column, conf: Column): Column = array(
    struct(
      lit("perplexity_max").as("rule"),
      (ppl > PerplexityMax).as("fired"),
      ppl.as("value"),
      lit(PerplexityMax).as("threshold")),
    struct(
      lit("lang_conf_min").as("rule"),
      (conf < LangConfMin).as("fired"),
      conf.as("value"),
      lit(LangConfMin).as("threshold")))

  /** pages(url, warc_ts, html, text, lang) → output rows (SURVEY §1.4). */
  def apply(pages: DataFrame): DataFrame = {
    pages
      // P1 branch: rows with text go straight through; html-only rows are
      // extracted. Rows with neither are dropped (S2 validation analog).
      .withColumn("raw_text",
        coalesce(col("text"), html_text(col("html"))))
      .filter(col("raw_text").isNotNull)
      .withColumn("pii", pii_process(col("raw_text")))
      .withColumn("lid", langid(col("pii.full_text")))
      .withColumn("perplexity", perplexity(col("pii.full_text"), col("lid.lang")))
      .withColumn("rule_lineage",
        concat(
          quality_rules(col("raw_text"), col("lid.lang")),
          pipelineRules(col("perplexity"), col("lid.conf"))))
      .withColumn("keep", !exists(col("rule_lineage"), r => r("fired")))
      .select(
        col("url"),
        col("warc_ts"),
        col("lang").as("lang_claimed"),
        col("lid.lang").as("lang_pred"),
        col("lid.conf").as("lang_conf"),
        col("perplexity"),
        col("keep"),
        col("pii.full_text").as("extracted_text"),
        col("pii.scrubbed_text").as("scrubbed_text"),
        col("pii.pii_matches").as("pii_matches"),
        col("pii.n_redacted").as("n_redacted"),
        col("rule_lineage"),
        to_date(col("warc_ts")).as("part_date"),
        pmod(xxhash64(regexp_extract(col("url"), "^https?://([^/]+)", 1)),
          lit(64)).cast("int").as("host_bucket"))
  }
}
