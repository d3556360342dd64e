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
      // S2 validation analog FIRST, on source columns only — keeps the
      // (expensive) html extraction out of the pushed-down filter, which
      // would otherwise evaluate graft_html_text twice per html row
      .filter(col("text").isNotNull || col("html").isNotNull)
      // P1 branch, matching the reference predicate exactly: blank text
      // (empty or whitespace) routes to extraction when html exists —
      // present-but-blank text fields are common on real crawl data.
      // "whitespace" = the reference's str.strip() (ALL whitespace, not
      // just 0x20 — plain trim() would score a "\n\t" doc instead of
      // routing it). Explicit trim char-set, NOT a regexp: this predicate
      // runs per row on the pipeline hot path and a \s regexp costs
      // regex-engine scans per document for nothing.
      .withColumn("raw_text",
        when(col("text").isNotNull &&
          length(trim(col("text"), " \t\n\r\u000B\f\u0085\u00A0")) > 0,
          col("text"))
          .otherwise(when(col("html").isNotNull, html_text(col("html")))
            .otherwise(col("text"))))
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
        // host for salting: any scheme, case-insensitive; URLs with no
        // extractable host hash the whole URL instead of all collapsing
        // into the hash('') bucket (a recreated hot partition otherwise)
        pmod(xxhash64(coalesce(nullif(regexp_extract(col("url"),
          "(?i)^[a-z][a-z0-9+.-]*://([^/]+)", 1), lit("")), col("url"))),
          lit(64)).cast("int").as("host_bucket"))
  }
}
