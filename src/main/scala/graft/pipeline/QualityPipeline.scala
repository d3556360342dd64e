package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.GraftFunctions._

/** The composed webtext quality-filter pipeline (SURVEY §3.5):
  *
  * {{{
  * pages(url, warc_ts, html, text, lang)
  *   → extract   (html-only rows through graft_html_text; P1 branch)
  *   → graft_page_process: ONE fused per-document pass —
  *       tokenize → fused PII scan → refine → span join → scrub
  *       → langid → perplexity → lang-aware Gopher/C4 heuristics
  *       → keep/drop + full rule lineage + per-row fault isolation (O1)
  * }}}
  *
  * Everything is per-row column expressions — zero shuffles, zero custom
  * optimizer rules (SURVEY §4.2): the plan is a project over the scan, and
  * scaling is bounded only by input split parallelism. The only exchange
  * a full job performs is the salted repartition before the partitioned
  * write (graft.io.IcebergStyleTable).
  *
  * The fused pass tokenizes each document exactly once (vs ~4x for the
  * à-la-carte stage expressions, which remain available for per-stage
  * queries) — the dominant cost at 100 TB is this per-row CPU.
  */
object QualityPipeline {

  final val PerplexityMax: Double = graft.core.Heuristics.PerplexityMax
  final val LangConfMin: Double = graft.core.Heuristics.LangConfMin

  /** pages(url, warc_ts, html, text, lang) → output rows (SURVEY §1.4). */
  def apply(pages: DataFrame): DataFrame = {
    pages
      // P1 branch: rows with text go straight through; html-only rows are
      // extracted. Rows with neither are dropped (S2 validation analog).
      .withColumn("raw_text",
        coalesce(col("text"), html_text(col("html"))))
      .filter(col("raw_text").isNotNull)
      .withColumn("p", page_process(col("raw_text")))
      .select(
        col("url"),
        col("warc_ts"),
        col("lang").as("lang_claimed"),
        col("p.lang").as("lang_pred"),
        col("p.conf").as("lang_conf"),
        col("p.perplexity").as("perplexity"),
        col("p.keep").as("keep"),
        col("p.full_text").as("extracted_text"),
        col("p.scrubbed_text").as("scrubbed_text"),
        col("p.pii_matches").as("pii_matches"),
        col("p.n_redacted").as("n_redacted"),
        col("p.rule_lineage").as("rule_lineage"),
        col("p.error").as("error"),
        to_date(col("warc_ts")).as("part_date"),
        pmod(xxhash64(regexp_extract(col("url"), "^https?://([^/]+)", 1)),
          lit(64)).cast("int").as("host_bucket"))
  }
}
