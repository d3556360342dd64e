package graft.core

/** Deterministic per-language seed vocabularies.
  *
  * Everything model-shaped in this engine (the fastText-style langid
  * profiles, the KenLM-style n-gram LM, and the synthetic pages generator)
  * is derived from these embedded word lists — no external data, no wall
  * clock, no floating seed. The five languages match the driver testdata
  * distribution (en/fr/es/de/zh, TESTDATA.md / FIXTURES.md §2).
  *
  * Word lists are common function/content words from public frequency
  * lists; for zh we use synthetic 2-5 character groupings of common hanzi
  * so that word-level statistics (Gopher rules, LM tokens) stay meaningful.
  */
object SeedCorpus {

  val languages: IndexedSeq[String] = IndexedSeq("en", "fr", "es", "de", "zh")

  private val en = ("the be to of and a in that have it for not on with he " +
    "as you do at this but his by from they we say her she or an will my " +
    "one all would there their what so up out if about who get which go me " +
    "when make can like time no just him know take people into year your " +
    "good some could them see other than then now look only come its over " +
    "think also back after use two how our work first well way even new " +
    "want because any these give day most us great little world own old " +
    "right still might while last never under same another place found " +
    "house water between should each both few those things before").split(' ')

  private val fr = ("le la les de des un une et est dans pour que qui sur " +
    "avec ne pas au du il elle nous vous ils sont être avoir je tu ce " +
    "cette mais ou donc car si plus sans sous entre comme aussi très bien " +
    "tout tous faire dit deux leur ses son ma mon mes notre votre leurs " +
    "quand alors encore toujours jamais rien chose monde temps jour homme " +
    "femme enfant année pays ville eau grand petit nouveau premier dernier " +
    "même autre quelque chaque depuis pendant contre vers chez après avant " +
    "peu beaucoup trop assez moins autant ainsi donc pourtant cependant " +
    "peut doit fait était avait seront étaient").split(' ')

  private val es = ("el la los las de del un una unos unas y es en para " +
    "que se no por con su al lo como más pero sus le ya o este porque " +
    "esta entre cuando muy sin sobre también me hasta hay donde quien " +
    "desde todo nos durante todos uno les ni contra otros ese eso ante " +
    "ellos esto antes algunos qué unos yo otro otras otra él tanto esa " +
    "estos mucho quienes nada muchos cual poco ella estar estas algunas " +
    "algo nosotros tiempo vida mundo casa agua día hombre mujer niño año " +
    "país ciudad grande pequeño nuevo primero último mismo hacer decir " +
    "puede debe hecho era había serán estaban siempre nunca").split(' ')

  private val de = ("der die das und ist in den von zu mit sich des auf " +
    "für nicht ein eine als auch es an werden aus er hat dass sie nach " +
    "wird bei einer um am sind noch wie einem über einen so zum war haben " +
    "nur oder aber vor zur bis mehr durch man sein wurde sei dieser ihre " +
    "seine ihr unser euer kann muss soll will machen sagen gehen kommen " +
    "sehen wissen zeit leben welt haus wasser tag mann frau kind jahr " +
    "land stadt groß klein neu erste letzte gleich andere jede seit " +
    "während gegen ohne zwischen immer nie etwas nichts viel wenig").split(' ')

  // Common hanzi grouped into deterministic 2-5 char pseudo-words.
  private val zhChars = "的一是不了人我在有他这为之大来以个中上们到说国和地" +
    "也子时道出而要于就下得可你年生自会那后能对着事其里所去行过家十用发天" +
    "如然作方成者多日都三小军二无同么经法当起与好看学进种将还分此心前面又" +
    "定见只主没公从知使意明王文风每东水天气长高路山开关门间问"
  private val zh: Array[String] = {
    val chars = zhChars
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    var k = 0
    while (i + 2 <= chars.length) {
      val len = 2 + (k % 4) // 2..5 chars
      val end = math.min(i + len, chars.length)
      if (end - i >= 2) out += chars.substring(i, end)
      i = end
      k += 1
    }
    // widen vocab with rotations for variety (still deterministic)
    val base = out.toArray
    base ++ base.sliding(2).map(_.mkString).toArray
  }

  val vocab: Map[String, IndexedSeq[String]] = Map(
    "en" -> en.toIndexedSeq, "fr" -> fr.toIndexedSeq, "es" -> es.toIndexedSeq,
    "de" -> de.toIndexedSeq, "zh" -> zh.toIndexedSeq)

  /** Gopher stopword list (Rae et al. 2021, App. A1.1) — English. */
  val gopherStopwords: Set[String] =
    Set("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-language stopword lists for the lang-aware stopword rule: the
    * Gopher list for en; the highest-frequency function words (vocab head)
    * for the other languages. */
  val stopwords: Map[String, Set[String]] = Map(
    "en" -> gopherStopwords,
    "fr" -> vocab("fr").take(12).toSet,
    "es" -> vocab("es").take(12).toSet,
    "de" -> vocab("de").take(12).toSet,
    "zh" -> vocab("zh").take(12).toSet)

  def stopwordsFor(lang: String): Set[String] =
    stopwords.getOrElse(lang, gopherStopwords)

  /** Deterministic Zipf-ish word sampler: rank-weighted choice driven by a
    * caller-owned java.util.Random (LCG — platform-independent). */
  def sampleWord(lang: String, rnd: java.util.Random): String = {
    val v = vocab(lang)
    // Zipf via inverse-CDF approximation: rank ~ u^2 * n keeps low ranks hot.
    val u = rnd.nextDouble()
    val rank = math.min((u * u * v.length).toInt, v.length - 1)
    v(rank)
  }

  /** Deterministic pseudo-corpus for model fitting: `n` words of `lang`. */
  def corpus(lang: String, n: Int, seed: Long): IndexedSeq[String] = {
    val rnd = new java.util.Random(seed)
    IndexedSeq.fill(n)(sampleWord(lang, rnd))
  }
}
