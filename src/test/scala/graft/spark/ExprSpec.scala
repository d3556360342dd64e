package graft.spark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Expression-layer gates: SQL registration (extensions + registry), null
  * propagation, catalyst schema shape, plan shape (no shuffles in the
  * per-row stages, expressions visible in the plan).
  */
class ExprSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("graft_* functions callable from SQL (extensions-injected)") {
    val r = spark.sql(
      """SELECT graft_langid('the quick brown fox and all of that') AS lid,
        |  graft_word_count('a b c') AS wc,
        |  graft_pii_process('ssn 123-45-6789 here').scrubbed_text AS scrub,
        |  graft_perplexity('the of and to be', 'en') AS ppl,
        |  size(graft_quality_rules('x', 'en')) AS n_rules,
        |  graft_extract_text('  a   b ') AS ext
        |""".stripMargin).head()
    assert(r.getStruct(0).getString(0) == "en")
    assert(r.getLong(1) == 3L)
    assert(r.getString(2) == "ssn [PII:SSN] here")
    assert(r.getDouble(3) > 1.0)
    assert(r.getInt(4) >= 20)
    assert(r.getString(5) == "a b")
  }

  test("null propagation: null text -> null outputs, no crash") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("ok text here")))
      .toDF("id", "text")
    val out = df.select(col("id"),
      graft.expr.GraftFunctions.pii_process(col("text")).as("p"),
      graft.expr.GraftFunctions.langid(col("text")).as("l"),
      graft.expr.GraftFunctions.word_count(col("text")).as("wc"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2) && out(0).isNullAt(3))
    assert(!out(1).isNullAt(1))

    // vector expressions: null embedding -> null, and determinism
    val vdf = Seq((1L, Option.empty[Seq[Double]]),
        (2L, Some(Seq(0.5, -0.25, 1.0, 0.125))))
      .toDF("id", "emb")
    val cents = org.apache.spark.sql.functions.typedLit(
      Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0)))
    val vout = vdf.select(col("id"),
      graft.expr.GraftFunctions.lsh_project(col("emb")).as("sig"),
      graft.expr.GraftFunctions.ivf_assign(col("emb"), cents).as("cell"))
      .orderBy("id").collect()
    assert(vout(0).isNullAt(1) && vout(0).isNullAt(2))
    assert(!vout(1).isNullAt(1))
    val sig = vout(1).getLong(1)
    assert(sig >= 0 && sig < 65536, s"sig=$sig outside 16 bits")
    // cosine argmax against axis centroids: emb[0]=0.5 vs emb[1]=-0.25
    assert(vout(1).getLong(2) == 0L)
  }

  test("pii schema shape matches SURVEY §1.4 output contract") {
    val df = Seq("call (415) 555-0199 now").toDF("text")
      .select(graft.expr.GraftFunctions.pii_process(col("text")).as("p"))
    val st = df.schema("p").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(st.fieldNames.toSeq ==
      Seq("full_text", "scrubbed_text", "pii_matches", "n_redacted"))
    val m = df.select(explode(col("p.pii_matches")).as("m"))
      .select("m.pii_type", "m.start", "m.end", "m.text").head()
    assert(m.getString(0) == "Phone Number")
    assert(m.getInt(1) == 5 && m.getInt(2) == 19)
  }

  test("pipeline plan is shuffle-free and codegen'd up to the sink") {
    val out = graft.pipeline.QualityPipeline(
      graft.model.PagesSynth.pages(spark, 50, 2))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "per-row pipeline must not shuffle:\n" +
      plan.take(1500))
    // WSCG spans render as "*(n)" in executedPlan.toString; the projects
    // holding CodegenFallback expressions sit outside them by design
    assert(plan.contains("*("), plan.take(1500))
    assert(plan.contains("graft_page_process") || plan.contains("pageprocess"),
      plan.take(1500))
  }

  test("html extraction expression handles binary, string-ish, broken input") {
    val df = Seq(
      ("<html><body><p>hello &amp; world</p><script>x()</script></body>",
        1L),
      ("no tags at all", 2L),
      ("<unclosed", 3L)).toDF("h", "id")
    val out = df.select(col("id"),
      graft.expr.GraftFunctions.html_text(encode(col("h"), "utf-8")).as("t"))
      .orderBy("id").collect()
    assert(out(0).getString(1).contains("hello & world"))
    assert(!out(0).getString(1).contains("x()"))
    assert(out(1).getString(1) == "no tags at all")
    assert(out(2).getString(1) == "")
  }

  test("graft_bounded_ids: exact count, complete list <= cap, hot key " +
    "capped across many partitions, SQL-registered") {
    import graft.expr.GraftFunctions.bounded_ids
    // 3 keys over 16 partitions: a 2-member band, an exactly-64-member
    // band (the gate's boundary — must stay COMPLETE), and a 1000-member
    // hot band (must be trimmed at cap without affecting the count)
    val rows = Seq.tabulate(2)(i => (1L, 100L + i)) ++
      Seq.tabulate(64)(i => (2L, 200L + i)) ++
      Seq.tabulate(1000)(i => (3L, 300L + i))
    val df = spark.createDataFrame(rows).toDF("band", "doc_id")
      .repartition(16)
    val got = df.groupBy("band")
      .agg(count(lit(1)).as("bn"), bounded_ids(col("doc_id"), 65).as("ids"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getSeq[Long](2))).toMap
    assert(got(1L)._1 == 2L && got(1L)._2.sorted == (100L to 101L))
    // kept-band invariant: bn <= 64 < cap => list complete regardless of
    // how the 64 rows were split across partial buffers
    assert(got(2L)._1 == 64L && got(2L)._2.sorted == (200L until 264L))
    // hot-key skew guard: exact count, list capped at 65 distinct members
    assert(got(3L)._1 == 1000L && got(3L)._2.length == 65 &&
      got(3L)._2.distinct.length == 65 &&
      got(3L)._2.forall(id => id >= 300L && id < 1300L))
    // registry path (analyzer wraps the bare AggregateFunction)
    val viaSql = spark.createDataFrame(rows).toDF("band", "doc_id")
      .createOrReplaceTempView("bids_t")
    val sq = spark.sql("SELECT band, count(1) bn, " +
      "graft_bounded_ids(doc_id, 65) ids FROM bids_t GROUP BY band")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2).length).toMap
    assert(sq(1L) == 2 && sq(2L) == 64 && sq(3L) == 65)
  }

  test("graft_absmax == array_max(transform(abs)) — differential incl. " +
    "empty/null/edge values") {
    val rnd = new scala.util.Random(42)
    val arrays: Seq[Option[Seq[Double]]] =
      Seq(None, Some(Seq.empty[Double]), Some(Seq(0.0)), Some(Seq(-0.0)),
        Some(Seq(-1.5, 1.5)), Some(Seq(Double.MinPositiveValue, -1e308)),
        Some(Seq(Double.NegativeInfinity, 3.0))) ++
        Seq.fill(50)(Some(Seq.fill(1 + rnd.nextInt(200))(
          (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(20) - 10))))
    val df = arrays.zipWithIndex
      .map { case (a, i) => (i.toLong, a) }.toDF("id", "emb")
    val out = df.select(col("id"),
      graft.expr.GraftFunctions.absmax(col("emb")).as("k"),
      array_max(transform(col("emb"), x => abs(x))).as("h"))
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null mismatch at ${r.get(0)}")
      if (!r.isNullAt(1))
        assert(java.lang.Double.compare(r.getDouble(1), r.getDouble(2)) == 0,
          s"value mismatch at ${r.get(0)}: ${r.getDouble(1)} vs " +
            s"${r.getDouble(2)}")
    }
  }
}
