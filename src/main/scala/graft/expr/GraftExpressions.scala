package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core._

/** Custom Catalyst expressions for the quality-filter engine.
  *
  * Design (SURVEY §2.8): these are native `Expression`s, not Scala UDFs.
  * As of round 4 every kernel has REAL whole-stage codegen — `doGenCode`
  * emits a direct static call into [[Kernels]] — rather than
  * `CodegenFallback`. The distinction matters structurally, not just per
  * call: `CollapseCodegenStages.supportCodegen` excludes a plan node
  * containing ANY CodegenFallback expression from the generated span, so
  * a fallback `graft_page_process` pushed the WHOLE pipeline projection
  * (including its cheap built-in columns) out of WSCG into the
  * interpreted `ProjectExec`. With static-call codegen the full
  * scan→project pipeline compiles into one generated stage.
  *
  * Model/pattern state stays JVM-singleton (`graft.core` lazy vals
  * compile once per executor, the analog of the reference's
  * class-load-time `re.compile`, backend/pdf/PIIDetector.py:63-68), and
  * every expression is null-intolerant (null in → null out).
  *
  * `regexp_extract_all` cannot express the fused scan because it has no
  * per-alternative attribution and no offsets — hence [[PiiExtractAll]]
  * (SURVEY §2.8 rationale).
  */
object GraftSchemas {
  val matchStruct: StructType = StructType(Seq(
    StructField("pii_type", StringType, nullable = false),
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false),
    StructField("text", StringType, nullable = false)))

  val tokenStruct: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false),
    StructField("detected_as", StringType, nullable = true)))

  val ruleStruct: StructType = StructType(Seq(
    StructField("rule", StringType, nullable = false),
    StructField("fired", BooleanType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("threshold", DoubleType, nullable = false)))

  val piiProcessStruct: StructType = StructType(Seq(
    StructField("full_text", StringType, nullable = false),
    StructField("scrubbed_text", StringType, nullable = false),
    StructField("pii_matches", ArrayType(matchStruct, containsNull = false),
      nullable = false),
    StructField("n_redacted", IntegerType, nullable = false)))

  val langStruct: StructType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("conf", DoubleType, nullable = false)))

  val htmlSafeStruct: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("error", StringType, nullable = true)))

  /** Output of the fused per-document pass. */
  val pageProcessStruct: StructType = StructType(Seq(
    StructField("full_text", StringType, nullable = false),
    StructField("scrubbed_text", StringType, nullable = false),
    StructField("pii_matches", ArrayType(matchStruct, containsNull = false),
      nullable = false),
    StructField("n_redacted", IntegerType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("conf", DoubleType, nullable = false),
    StructField("perplexity", DoubleType, nullable = false),
    StructField("rule_lineage", ArrayType(ruleStruct, containsNull = false),
      nullable = false),
    StructField("keep", BooleanType, nullable = false),
    StructField("error", StringType, nullable = true)))

  /** Constant-string UTF8String cache: rule names, PII type labels, and
    * language codes come from small fixed sets, but
    * `UTF8String.fromString` allocates a fresh byte[] every call — ~30
    * allocations per document across the lineage arrays. UTF8String is
    * immutable, so sharing is safe; the bound guards against a corrupt
    * caller flooding the map. */
  private val utf8Cache =
    new java.util.concurrent.ConcurrentHashMap[String, UTF8String]()
  def constUtf8(s: String): UTF8String =
    if (utf8Cache.size > 256 && !utf8Cache.containsKey(s))
      UTF8String.fromString(s)
    else utf8Cache.computeIfAbsent(s, UTF8String.fromString(_))

  def matchesToCatalyst(ms: Seq[PiiMatch]): ArrayData =
    new GenericArrayData(ms.map { m =>
      InternalRow(constUtf8(m.piiType.value), m.start, m.end,
        UTF8String.fromString(m.text))
    }.toArray[Any])

  def rulesToCatalyst(rs: Seq[RuleResult]): ArrayData =
    new GenericArrayData(rs.map { r =>
      InternalRow(constUtf8(r.rule), r.fired, r.value, r.threshold)
    }.toArray[Any])
}

/** Static kernel entry points shared by the interpreted `eval` path and
  * the generated code — one body per kernel, two call sites. Generated
  * calls must be static-dispatch and resolvable by Janino through the
  * executor classloader, which plain-object forwarder methods are.
  * Overloads on the input type (UTF8String vs byte[]) let the html
  * kernels accept BINARY or STRING children with the overload resolved
  * statically from the child's declared Java type. */
object Kernels {

  def extractText(v: UTF8String): UTF8String =
    UTF8String.fromString(Tokenizer.tokenizeArrays(v.toString)._1)

  def piiExtract(v: UTF8String): ArrayData =
    GraftSchemas.matchesToCatalyst(PiiDetector.extract(v.toString))

  def piiProcess(v: UTF8String): InternalRow = {
    val (full, matches, labeled, scrubbed) =
      PiiDetector.detectAndScrub(v.toString)
    InternalRow(
      UTF8String.fromString(full),
      UTF8String.fromString(scrubbed),
      GraftSchemas.matchesToCatalyst(matches),
      labeled.count(_.detectedAs.isDefined))
  }

  def pageProcess(v: UTF8String): InternalRow = {
    val r = DocProcessor.process(v.toString)
    InternalRow(
      UTF8String.fromString(r.fullText),
      UTF8String.fromString(r.scrubbedText),
      GraftSchemas.matchesToCatalyst(r.matches),
      r.nRedacted,
      GraftSchemas.constUtf8(r.lang),
      r.langConf,
      r.perplexity,
      GraftSchemas.rulesToCatalyst(r.rules),
      r.keep,
      r.error.map(UTF8String.fromString).orNull)
  }

  def piiTokens(v: UTF8String): ArrayData = {
    val (_, _, labeled, _) = PiiDetector.detectAndScrub(v.toString)
    new GenericArrayData(labeled.map { t =>
      InternalRow(UTF8String.fromString(t.text), t.start, t.end,
        t.detectedAs.map(GraftSchemas.constUtf8).orNull)
    }.toArray[Any])
  }

  def langid(v: UTF8String): InternalRow = {
    val (lang, conf) = LangId.predict(v.toString)
    InternalRow(GraftSchemas.constUtf8(lang), conf)
  }

  def perplexity(t: UTF8String, l: UTF8String): Double =
    NGramLM.perplexity(t.toString, l.toString)

  def qualityRules(t: UTF8String, l: UTF8String): ArrayData =
    GraftSchemas.rulesToCatalyst(
      Heuristics.evaluate(t.toString, l.toString))

  /** Same accumulation order as [[VecMath.cosine]] (bit-identical
    * results — differential-tested in FusedKernelDiffSpec), but reading
    * the ArrayData elements in place: the previous `toDoubleArray()`
    * form allocated TWO array copies per invocation, which on the
    * pairwise exhibits (millions of cosine calls) was gigabytes of
    * allocation churn per query. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = a.getDouble(i)
      val yi = b.getDouble(i)
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  def shingles(v: UTF8String): ArrayData = {
    val text = v.toString
    val words = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      val w0 = i
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > w0)
        words += text.substring(w0, i).toLowerCase(java.util.Locale.ROOT)
    }
    val out = new java.util.LinkedHashSet[String]()
    if (words.isEmpty) {
      // EMPTY array, aligned with Dedup.shingles(""): a single
      // empty-string shingle would score any two blank docs at Jaccard
      // 1.0 and glue every blank document into one mega-cluster — the
      // exact degenerate cluster the banding skew guard (no bands for
      // blank docs) exists to prevent
    } else if (words.length < 3) {
      out.add(words.mkString(" "))
    } else {
      var j = 0
      while (j + 3 <= words.length) {
        out.add(words(j) + " " + words(j + 1) + " " + words(j + 2))
        j += 1
      }
    }
    new GenericArrayData(
      out.toArray.map(s => UTF8String.fromString(s.asInstanceOf[String]): Any))
  }

  def htmlText(v: UTF8String): UTF8String =
    UTF8String.fromString(HtmlText.extract(v.toString))
  def htmlText(v: Array[Byte]): UTF8String =
    UTF8String.fromString(HtmlText.extract(
      new String(v, java.nio.charset.StandardCharsets.UTF_8)))

  private def htmlTextSafeImpl(s: => String): InternalRow =
    try InternalRow(UTF8String.fromString(HtmlText.extract(s)), null)
    catch {
      case e: Throwable =>
        InternalRow(UTF8String.EMPTY_UTF8, UTF8String.fromString(
          s"HtmlExtractError: ${e.getClass.getName}: ${e.getMessage}"))
    }
  def htmlTextSafe(v: UTF8String): InternalRow = htmlTextSafeImpl(v.toString)
  def htmlTextSafe(v: Array[Byte]): InternalRow = htmlTextSafeImpl(
    new String(v, java.nio.charset.StandardCharsets.UTF_8))

  /** Blankness under the canonical [[graft.core.Blank.Chars]] set —
    * exactly `length(trim(text, Chars)) == 0`, but allocation-free: the
    * trim form copies nearly the whole text per row (UTF8String.trim
    * materializes the trimmed copy) just to test emptiness; this walks
    * the UTF-8 bytes and stops at the first non-blank code point. */
  def isBlankText(v: UTF8String): Boolean = {
    val n = v.numBytes()
    var i = 0
    while (i < n) {
      val b = v.getByte(i) & 0xff
      if (b < 0x80) {
        if (!(b == 0x20 || (b >= 0x09 && b <= 0x0D) || (b >= 0x1C && b <= 0x1F)))
          return false
        i += 1
      } else {
        // decode one multibyte code point (Spark strings are valid UTF-8)
        var cp = 0
        var len = 0
        if ((b & 0xE0) == 0xC0) { cp = b & 0x1F; len = 2 }
        else if ((b & 0xF0) == 0xE0) { cp = b & 0x0F; len = 3 }
        else { cp = b & 0x07; len = 4 }
        if (i + len > n) return false // malformed tail: treat as non-blank
        var j = 1
        while (j < len) { cp = (cp << 6) | (v.getByte(i + j) & 0x3F); j += 1 }
        if (!graft.core.Blank.isBlankCodePoint(cp)) return false
        i += len
      }
    }
    true
  }

  def minhash(v: UTF8String): ArrayData =
    new GenericArrayData(Dedup.minHashSignature(v.toString))

  def lshBands(v: UTF8String): ArrayData =
    new GenericArrayData(Dedup.lshBandKeysGuarded(v.toString))

  def lshProject(v: ArrayData): Long = {
    val len = v.numElements()
    var sig = 0L
    var b = 1
    while (b <= 16) {
      var s = 0.0
      var i = 1
      while (i <= len) {
        // weight in [-4, 4]; 1-based (b, i) to match the SQL mirror;
        // elements read in place (no toDoubleArray copy per row)
        s += v.getDouble(i - 1) * ((2654435761L * i + 40503L * b) % 9 - 4).toDouble
        i += 1
      }
      if (s > 0) sig |= (1L << (b - 1))
      b += 1
    }
    sig
  }

  /** max(abs(x)) over a NON-EMPTY double array — exactly
    * `array_max(transform(a, x -> abs(x)))` for null-free elements
    * (max is order-independent; abs values are >= 0.0 or NaN, and
    * `Double.compare` keeps NaN greatest like Spark's ordering, so the
    * 0.0 seed is exact). The caller maps the empty array to null. */
  def absMax(a: ArrayData): Double = {
    val n = a.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(a.getDouble(i))
      if (java.lang.Double.compare(v, m) > 0) m = v
      i += 1
    }
    m
  }

  /** Same accumulation order as [[VecMath.cosine]] with a primitive
    * centroid side — used by [[ivfAssign]] below. */
  private def cosineAD(a: ArrayData, y: Array[Double]): Double = {
    val n = math.min(a.numElements(), y.length)
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = a.getDouble(i)
      val yi = y(i)
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  // The centroid table arrives as a LITERAL: the same ArrayData instance
  // for every row of a query. Its nested GenericArrayData elements box
  // every double, so reading them per row cost k x dim unboxing virtual
  // calls per row (at auto-k = 447 on a 200k-vector table: ~5.7G boxed
  // reads — measured 16 s for ann_ivf_auto at sf10). Convert ONCE per
  // thread per literal (identity-keyed; a different codebook literal
  // reconverts). Same doubles, same accumulation order — bit-identical.
  private val ivfCentCache =
    new ThreadLocal[(ArrayData, Array[Array[Double]])]()

  private def decodeCentroids(cents: ArrayData): Array[Array[Double]] = {
    val k = cents.numElements()
    val arr = new Array[Array[Double]](k)
    var i = 0
    while (i < k) { arr(i) = cents.getArray(i).toDoubleArray(); i += 1 }
    arr
  }

  def ivfAssign(a: ArrayData, cents: ArrayData): Long = {
    // identity-keyed caching is only sound for GenericArrayData (the
    // form literals take, with a stable boxed backing array) — other
    // ArrayData implementations (ColumnarArray, UnsafeArrayData) may
    // legally reuse one instance over different buffer contents per
    // row, so those decode per call like the pre-cache code did
    val cc =
      if (cents.isInstanceOf[
          org.apache.spark.sql.catalyst.util.GenericArrayData]) {
        var cached = ivfCentCache.get()
        if (cached == null || (cached._1 ne cents)) {
          cached = (cents, decodeCentroids(cents))
          ivfCentCache.set(cached)
        }
        cached._2
      } else decodeCentroids(cents)
    var best = 0L
    var bestSim = Double.NegativeInfinity
    var i = 0
    while (i < cc.length) {
      val sim = cosineAD(a, cc(i))
      if (sim > bestSim) { bestSim = sim; best = i.toLong }
      i += 1
    }
    best
  }
}

/** Base for string-input kernels with REAL codegen: subclasses implement
  * `doGenCode` as a direct static call into [[Kernels]] (or graft.core),
  * so they stay INSIDE whole-stage codegen spans. Deliberately NOT a
  * `CodegenFallback`: the WSCG planner (`CollapseCodegenStages
  * .supportCodegen`) excludes any plan node containing a CodegenFallback
  * expression from the generated span — an overridden doGenCode on a
  * CodegenFallback subclass is never called (measured: the project
  * dropped out of the WSCG subtree entirely). */
abstract class StringKernelCodegenExpression extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def nullIntolerant: Boolean = true
  /** Static call expression for one input, e.g.
    * `c => s"graft.expr.Kernels.langid($c)"`. */
  protected def staticCall(c: String): String
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, staticCall)
}

/** Binary analog of [[StringKernelCodegenExpression]]. */
abstract class BinaryKernelCodegenExpression extends BinaryExpression
    with ExpectsInputTypes {
  override def nullIntolerant: Boolean = true
  protected def staticCall(a: String, b: String): String
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, staticCall)
}

/** `graft_extract_text(text)` — canonical full_text rebuild (G1 contract:
  * blank-skip, single-space rejoin; byte-identical per input). */
case class ExtractText(child: Expression) extends StringKernelCodegenExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    Kernels.extractText(v.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.expr.Kernels.extractText($c)"
  override protected def withNewChildInternal(c: Expression): ExtractText = copy(c)
  override def prettyName: String = "graft_extract_text"
}

/** `graft_pii_extract(full_text)` — fused multi-pattern scan + refine +
  * sort; ARRAY<STRUCT<pii_type,start,end,text>> (D1-D3). */
case class PiiExtractAll(child: Expression) extends StringKernelCodegenExpression {
  override def dataType: DataType =
    ArrayType(GraftSchemas.matchStruct, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Kernels.piiExtract(v.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.expr.Kernels.piiExtract($c)"
  override protected def withNewChildInternal(c: Expression): PiiExtractAll = copy(c)
  override def prettyName: String = "graft_pii_extract"
}

/** `graft_pii_process(text)` — the whole document-local redaction pipeline
  * in one pass: tokenize → scan/refine/sort → span join → scrub.
  * STRUCT<full_text, scrubbed_text, pii_matches, n_redacted>. */
case class PiiProcess(child: Expression) extends StringKernelCodegenExpression {
  override def dataType: DataType = GraftSchemas.piiProcessStruct
  override def nullSafeEval(v: Any): Any =
    Kernels.piiProcess(v.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.expr.Kernels.piiProcess($c)"
  override protected def withNewChildInternal(c: Expression): PiiProcess = copy(c)
  override def prettyName: String = "graft_pii_process"
}

/** `graft_page_process(text)` — the fused whole-pipeline pass:
  * tokenize once → PII scan/refine/join/scrub + langid + perplexity +
  * lang-aware heuristics + keep/drop + full rule lineage, with per-row
  * fault isolation (error column instead of stage failure, O1). */
case class PageProcess(child: Expression) extends StringKernelCodegenExpression {
  override def dataType: DataType = GraftSchemas.pageProcessStruct
  override def nullSafeEval(v: Any): Any =
    Kernels.pageProcess(v.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.expr.Kernels.pageProcess($c)"
  override protected def withNewChildInternal(c: Expression): PageProcess = copy(c)
  override def prettyName: String = "graft_page_process"
}

/** `graft_pii_tokens(text)` — labeled token lineage:
  * ARRAY<STRUCT<text,start,end,detected_as>> (J1-J2 output). */
case class PiiTokens(child: Expression) extends StringKernelCodegenExpression {
  override def dataType: DataType =
    ArrayType(GraftSchemas.tokenStruct, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Kernels.piiTokens(v.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.expr.Kernels.piiTokens($c)"
  override protected def withNewChildInternal(c: Expression): PiiTokens = copy(c)
  override def prettyName: String = "graft_pii_tokens"
}

/** `graft_langid(text)` — STRUCT<lang, conf> from the broadcast-free
  * JVM-singleton profile table (per-executor init). */
case class LangIdExpr(child: Expression) extends StringKernelCodegenExpression {
  override def dataType: DataType = GraftSchemas.langStruct
  override def nullSafeEval(v: Any): Any =
    Kernels.langid(v.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.expr.Kernels.langid($c)"
  override protected def withNewChildInternal(c: Expression): LangIdExpr = copy(c)
  override def prettyName: String = "graft_langid"
}

/** `graft_perplexity(text, lang)` — trigram stupid-backoff perplexity under
  * the per-language LM (unknown lang → en model). */
case class PerplexityExpr(left: Expression, right: Expression)
    extends BinaryKernelCodegenExpression {
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(t: Any, l: Any): Any =
    Kernels.perplexity(t.asInstanceOf[UTF8String], l.asInstanceOf[UTF8String])
  override protected def staticCall(a: String, b: String): String =
    s"graft.expr.Kernels.perplexity($a, $b)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PerplexityExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_perplexity"
}

/** `graft_quality_rules(text, lang)` — full Gopher/C4 rule lineage:
  * ARRAY<STRUCT<rule,fired,value,threshold>>. The stopword rule is
  * lang-aware (per-language stopword lists). */
case class QualityRules(left: Expression, right: Expression)
    extends BinaryKernelCodegenExpression {
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType =
    ArrayType(GraftSchemas.ruleStruct, containsNull = false)
  override def nullSafeEval(t: Any, l: Any): Any =
    Kernels.qualityRules(t.asInstanceOf[UTF8String],
      l.asInstanceOf[UTF8String])
  override protected def staticCall(a: String, b: String): String =
    s"graft.expr.Kernels.qualityRules($a, $b)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QualityRules =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_quality_rules"
}

/** `graft_cosine(a, b)` — cosine similarity of two ARRAY<DOUBLE> vectors
  * in one native pass (sequential double math, deterministic). The HOF
  * formulation (`aggregate(zip_with(...))`) is interpreted per element and
  * costs ~10µs/pair at 64 dims; this is ~100ns — the difference between a
  * feasible and an infeasible pairwise stage (measured 135s → seconds on
  * a 13.5M-pair sweep). */
/** `graft_absmax(emb)` — max(abs(x)) of ARRAY<DOUBLE> (DOUBLE; null for
  * null input or the empty array, matching `array_max` on an empty
  * `transform` result). Native whole-stage-codegen form of
  * `array_max(transform(emb, x -> abs(x)))`, whose per-element lambda
  * is CodegenFallback and evaluated interpreted in the int8-quantization
  * scan. Element nulls are not expected (the input is a cast of the
  * parquet float vectors) — same contract as [[CosineSim]]. */
case class AbsMax(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(DoubleType))
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() == 0) null else Kernels.absMax(a)
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |if ($c.numElements() == 0) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = graft.expr.Kernels.absMax($c);
      |}""".stripMargin)
  override protected def withNewChildInternal(c: Expression): AbsMax = copy(c)
  override def prettyName: String = "graft_absmax"
}

case class CosineSim(left: Expression, right: Expression)
    extends BinaryKernelCodegenExpression {
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def staticCall(a: String, b: String): String =
    s"graft.expr.Kernels.cosine($a, $b)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_cosine"
}

/** `graft_shingles(text)` — distinct 3-word shingle strings (whitespace
  * word split — the same `Character.isWhitespace` contract as
  * [[graft.core.Tokenizer.words]] and [[graft.core.Dedup.shingles]], so
  * the LSH banding stage and this confirmation stage agree on multi-line
  * text — lowercased, first-occurrence order). Native form of the HOF
  * pyramid `array_distinct(transform(sequence(...), slice/concat))` whose
  * interpreted evaluation dominates the Jaccard dedup stage. The DuckDB
  * oracle mirrors via `regexp_split_to_array(text, '\s+')`. */
case class ShingleExpr(child: Expression) extends StringKernelCodegenExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Kernels.shingles(v.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.expr.Kernels.shingles($c)"
  override protected def withNewChildInternal(c: Expression): ShingleExpr = copy(c)
  override def prettyName: String = "graft_shingles"
}

/** `graft_html_text(html)` — deterministic HTML→text extraction for
  * html-only rows (P1 branch analog). BINARY (UTF-8) or STRING input
  * (no ExpectsInputTypes: TypeCollection is private[sql] in Spark 4; the
  * Kernels overload on the child's Java type handles both). */
case class HtmlTextExpr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = v match {
    case b: Array[Byte] => Kernels.htmlText(b)
    case u: UTF8String => Kernels.htmlText(u)
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Kernels.htmlText($c)")
  override protected def withNewChildInternal(c: Expression): HtmlTextExpr = copy(c)
  override def prettyName: String = "graft_html_text"
}

/** `graft_html_text_safe(html)` — STRUCT<text, error>: the same extraction
  * wrapped in per-row fault isolation (SURVEY O1, the reference's per-file
  * try/except at backend/pdf/PDFRedactor.py:39-43). The pipeline routes
  * html-only rows through THIS form: an extraction failure on one garbage
  * page degrades to `(text = '', error = <class: message>)` instead of
  * failing the whole stage — the round-3 verdict's task-killer, where one
  * malformed numeric entity on one html-routed page escaped the fused
  * kernel's fault envelope. The plain [[HtmlTextExpr]] stays the exact
  * unguarded function for à-la-carte use and the oracle queries. */
case class HtmlTextSafeExpr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = GraftSchemas.htmlSafeStruct
  override def nullSafeEval(v: Any): Any =
    try {
      v match {
        case b: Array[Byte] => Kernels.htmlTextSafe(b)
        case u: UTF8String => Kernels.htmlTextSafe(u)
      }
    } catch {
      // a child of unexpected runtime type still degrades per-row
      case e: Throwable =>
        InternalRow(UTF8String.EMPTY_UTF8, UTF8String.fromString(
          s"HtmlExtractError: ${e.getClass.getName}: ${e.getMessage}"))
    }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Kernels.htmlTextSafe($c)")
  override protected def withNewChildInternal(c: Expression): HtmlTextSafeExpr = copy(c)
  override def prettyName: String = "graft_html_text_safe"
}

/** `graft_is_blank(text)` — true iff every code point is in the canonical
  * blank set ([[graft.core.Blank.Chars]]); the pipeline's P1 route
  * predicate in allocation-free form (see [[Kernels.isBlankText]]). */
case class IsBlankText(child: Expression) extends StringKernelCodegenExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any =
    Kernels.isBlankText(v.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.expr.Kernels.isBlankText($c)"
  override protected def withNewChildInternal(c: Expression): IsBlankText = copy(c)
  override def prettyName: String = "graft_is_blank"
}

/** `graft_word_count(text)` — tokenizer-contract word count (BIGINT).
  * Allocation-free eval (no word-list materialization). */
case class WordCount(child: Expression) extends StringKernelCodegenExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Tokenizer.wordCount(v.asInstanceOf[UTF8String].toString)
  override protected def staticCall(c: String): String =
    s"graft.core.Tokenizer.wordCount($c.toString())"
  override protected def withNewChildInternal(c: Expression): WordCount = copy(c)
  override def prettyName: String = "graft_word_count"
}

/** `graft_minhash(text)` — MinHash signature, ARRAY<BIGINT>(128). */
case class MinHashSig(child: Expression) extends StringKernelCodegenExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Kernels.minhash(v.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.expr.Kernels.minhash($c)"
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(c)
  override def prettyName: String = "graft_minhash"
}

/** `graft_lsh_bands(text)` — LSH band keys (32 bands x 4 rows),
  * ARRAY<BIGINT>. Empty/whitespace docs emit NO bands (skew guard — see
  * [[graft.core.Dedup.lshBandKeysGuarded]]). */
case class LshBands(child: Expression) extends StringKernelCodegenExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Kernels.lshBands(v.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.expr.Kernels.lshBands($c)"
  override protected def withNewChildInternal(c: Expression): LshBands = copy(c)
  override def prettyName: String = "graft_lsh_bands"
}

/** `graft_simhash(text)` — 64-bit SimHash (BIGINT). */
case class SimHashExpr(child: Expression) extends StringKernelCodegenExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Dedup.simHash(v.asInstanceOf[UTF8String].toString)
  override protected def staticCall(c: String): String =
    s"graft.core.Dedup.simHash($c.toString())"
  override protected def withNewChildInternal(c: Expression): SimHashExpr = copy(c)
  override def prettyName: String = "graft_simhash"
}

/** `graft_lsh_project(emb)` — 16-hyperplane signed-random-projection LSH
  * signature (BIGINT, low 16 bits). Hyperplane weights are small integers
  * derived from (bit, dim) by fixed mixing arithmetic, so the exact same
  * signature is computable in plain SQL (the DuckDB oracle mirrors it).
  * Native sequential double math — the interpreted
  * `aggregate(zip_with(...))` HOF form costs ~10µs/row; this is ~100ns.
  * ANN use: candidates = rows whose signature is within a small hamming
  * radius of the query's (multi-probe); rank candidates by exact cosine. */
case class LshProject(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(DoubleType))
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Kernels.lshProject(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Kernels.lshProject($c)")
  override protected def withNewChildInternal(c: Expression): LshProject = copy(c)
  override def prettyName: String = "graft_lsh_project"
}

/** `graft_ivf_assign(emb, centroids)` — IVF coarse-quantizer assignment:
  * index (BIGINT) of the centroid with max cosine similarity (ties → lowest
  * index). Centroids arrive as a broadcast literal ARRAY<ARRAY<DOUBLE>> —
  * the coarse codebook is tiny by construction, so assignment is a pure
  * map: no shuffle, no window, no per-row join. */
case class IvfAssign(left: Expression, right: Expression)
    extends BinaryKernelCodegenExpression {
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.ivfAssign(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def staticCall(a: String, b: String): String =
    s"graft.expr.Kernels.ivfAssign($a, $b)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IvfAssign =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_ivf_assign"
}

/** `graft_bpe_count(text)` — token count under the trained BPE merge
  * table (whitespace words, lowercased, [[graft.core.Bpe]] merges;
  * BIGINT). The merge table is a JVM singleton trained deterministically
  * from SeedCorpus, and the DuckDB oracle re-applies the identical merges
  * as a literal replace chain ([[graft.core.Bpe.tokenCountSql]]). */
case class BpeCount(child: Expression) extends StringKernelCodegenExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Bpe.countText(v.asInstanceOf[UTF8String].toString)
  override protected def staticCall(c: String): String =
    s"graft.core.Bpe.countText($c.toString())"
  override protected def withNewChildInternal(c: Expression): BpeCount = copy(c)
  override def prettyName: String = "graft_bpe_count"
}

/** `graft_fingerprint(text)` — rolling-hash document fingerprint (BIGINT). */
case class FingerprintExpr(child: Expression) extends StringKernelCodegenExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Dedup.fingerprint(v.asInstanceOf[UTF8String].toString, 64)
  // window arg EXPLICIT: Scala default args don't exist as a bytecode
  // overload, so Janino saw "no applicable method" and the WHOLE
  // projection silently fell back to interpreter mode (caught via the
  // sf1 run's fallback warnings; CodegenSmokeSpec now sweeps every
  // registered kernel against this class of bug)
  override protected def staticCall(c: String): String =
    s"graft.core.Dedup.fingerprint($c.toString(), 64)"
  override protected def withNewChildInternal(c: Expression): FingerprintExpr = copy(c)
  override def prettyName: String = "graft_fingerprint"
}
