package graft.query

/** Q3's POS-driven query re-segmentation (the last piece of the reference's
  * variant machinery, VERDICT r3 task #3) — a faithful transcription of
  * `QueryVariants.getQueryVariants` (QueryVariants.java:71-152), the span
  * rules of `KeywordExtractor.getKeywordsFromSentence`
  * (KeywordExtractor.java:107-177) and the tiling of
  * `QueryVariants.getWordSpans` (:274-326), driven by a DETERMINISTIC
  * lexicon + suffix-rule tagger in place of RDRPOSTagger
  * (SentenceExtractor.java:52-59 loads an external POS model this sandbox
  * has no weights for).
  *
  * The tagger only has to be right about the classes the machinery reads
  * AFTER the reference's own tag coercion (QueryVariants.java:79-87 folds
  * the N-, V-, JJ, CD and P-tags all into NNP), which collapses the problem to: content
  * word vs determiner vs preposition/joiner vs adverb vs wh-word vs
  * stopword. Closed classes come from small lexicons (the stopword list is
  * the reference's own `dictionary/en-stopwords`); open classes from suffix
  * rules. Tags can differ from RDR on genuinely ambiguous words — the
  * SEGMENTATION rules are exact, and QueryVariantsSpec pins the reference
  * test queries' segmentations (QueryVariantsTest.java:31-69 shapes).
  *
  * Output: faithful re-segmentations of the query — each a token list where
  * multi-word spans are '_'-joined n-gram terms (matching the tokenizer's
  * stored span form) and glue words may be dropped by the tiling — sorted by
  * the reference's variant value (rarest-part-first, Q3Variants.variantValue)
  * and deduped. Dash/num/morph expansion of each variant is Q3Variants'
  * existing machinery; this module only re-segments.
  */
object PosSegments {

  /** The reference's `dictionary/en-stopwords` (minus the dotted junk rows
    * that can never appear in a parsed query term). */
  private[query] val StopWords: Set[String] = Set(
    "i", "a", "e.g", "i.e", "the", "of", "and", "in", "to", "was", "is",
    "for", "on", "as", "with", "by", "he", "that", "at", "from", "his", "it",
    "an", "were", "we've", "we're", "which", "are", "this", "also", "be",
    "had", "or", "has", "first", "their", "after", "its", "new", "but",
    "who", "her", "not", "she", "she's", "they", "have", "been", "other",
    "when", "during", "all", "into", "there", "time", "may", "more",
    "school", "years", "over", "only", "would", "later", "most", "where",
    "between", "some", "up", "city", "about", "such", "him", "then", "made",
    "out", "state", "three", "while", "used", "can", "under", "known",
    "many", "year", "part", "became", "these", "than", "team", "no",
    "second", "including", "being", "through", "before", "both", "however",
    "how", "until", "well", "since", "them", "de", "each", "same", "found",
    "so", "use", "now", "end", "if", "age", "day", "any", "due", "did",
    "own", "led", "off", "do", "you", "you're", "young", "without", "take",
    "described", "site", "royal", "services", "radio", "together", "social",
    "force", "northern", "per", "we", "my", "want", "your", "seem", "else's",
    "don't", "me", "couldn't", "what", "doesn't", "can't", "isn't", "i've",
    "it's", "i'm", "will", "us", "much", "our", "what's", "often", "few")

  // ---- the deterministic tagger ---------------------------------------------
  private val Determiners = Set("the", "a", "an", "this", "these", "those",
    "every", "each", "some", "any", "no", "that")
  private val Prepositions = Set("of", "in", "on", "at", "by", "for", "with",
    "from", "into", "onto", "over", "under", "about", "between", "during",
    "without", "within", "through", "after", "before", "against", "among",
    "around", "behind", "below", "beside", "besides", "via", "per", "since",
    "until", "upon", "toward", "towards", "across", "along", "amid", "as")
  private val Conjunctions = Set("and", "or", "but", "nor", "yet", "vs", "versus")
  private val Pronouns = Set("i", "we", "you", "he", "she", "it", "they",
    "me", "us", "him", "them", "my", "our", "your", "his", "her", "its",
    "their", "mine", "ours", "yours", "theirs")
  private val Modals = Set("can", "could", "will", "would", "shall", "should",
    "may", "might", "must")
  private val WhWords = Set("who", "whom", "whose", "what", "which", "when",
    "where", "why", "how", "whether")
  private val BeVerbs = Set("is", "are", "am", "was", "were", "be", "been",
    "being", "has", "have", "had", "do", "does", "did", "not")

  /** Penn-ish raw tag — lexicon first, then suffix rules, default NN. */
  private[query] def rawTag(w: String): String =
    if (Determiners(w)) "DT"
    else if (w == "to") "TO"
    else if (Prepositions(w)) "IN"
    else if (Conjunctions(w)) "CC"
    else if (Pronouns(w)) "PRP"
    else if (Modals(w)) "MD"
    else if (WhWords(w)) "WRB"
    else if (BeVerbs(w)) "VBZ"
    else if (w.forall(c => c >= '0' && c <= '9')) "CD"
    else if (w.length > 3 && w.endsWith("ly")) "RB"
    else if (w.length > 4 && w.endsWith("ing")) "VBG"
    else if (w.length > 3 && w.endsWith("ed")) "VBN"
    else "NN"

  private[query] final case class Tok(word: String, tag: String, stop: Boolean)

  /** Tag + the reference's coercion (QueryVariants.java:79-87): N- and
    * V-tags → NNP; JJ, CD and P-tags → NNP with the stopword bit cleared. */
  private[query] def tagged(words: Seq[String]): Array[Tok] =
    words.map { w0 =>
      val w = w0.toLowerCase
      val t = rawTag(w)
      val stop = StopWords.contains(w)
      if (t.startsWith("N") || t.startsWith("V")) Tok(w, "NNP", stop)
      else if (t == "JJ" || t == "CD" || t.startsWith("P")) Tok(w, "NNP", stop = false)
      else Tok(w, t, stop)
    }.toArray

  // ---- span predicates (KeywordExtractor.java:179-243, post-coercion) -------
  private def isProperNoun(t: Array[Tok], i: Int): Boolean = t(i).tag == "NNP"
  private def isName(t: Array[Tok], i: Int): Boolean =
    (t(i).tag.startsWith("N") || t(i).tag == "VBG" || t(i).tag == "VBN") && !t(i).stop
  private def isTopAdj(t: Array[Tok], i: Int): Boolean =
    t(i).tag.startsWith("JJ") || t(i).tag.startsWith("R") || t(i).tag.startsWith("VBG")
  private def isJoiner(t: Array[Tok], i: Int): Boolean =
    t(i).tag == "IN" || t(i).tag == "TO" || (t(i).tag == "CC" && t(i).word == "and")

  /** 1-4 word keyword spans — getKeywordsFromSentence transcription (queries
    * have no comma separators, so the comma guards are vacuous here). */
  private[query] def keywordSpans(t: Array[Tok]): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    val n = t.length
    for (i <- 0 until n)
      if (isName(t, i) || isTopAdj(t, i)) out += ((i, i + 1))
    for (i <- 1 until n) {
      if (isName(t, i) && (isName(t, i - 1) || isTopAdj(t, i - 1)))
        out += ((i - 1, i + 1))
      if (t(i).tag == "CD" && isName(t, i - 1))
        out += ((i - 1, i + 1))
    }
    for (i <- 2 until n) {
      if (isName(t, i)) {
        if ((isName(t, i - 1) || isTopAdj(t, i - 1)) &&
            (isName(t, i - 2) || isTopAdj(t, i - 2)))
          out += ((i - 2, i + 1))
        else if ((isProperNoun(t, i - 1) || isJoiner(t, i - 1)) && isProperNoun(t, i - 2))
          out += ((i - 2, i + 1))
      } else if (t(i).tag == "CD" && isName(t, i - 1) && isName(t, i - 2))
        out += ((i - 2, i + 1))
    }
    for (i <- 3 until n) {
      if (isName(t, i) &&
          (isName(t, i - 1) || isTopAdj(t, i - 1)) &&
          (isName(t, i - 2) || isTopAdj(t, i - 2)) &&
          (isName(t, i - 3) || isTopAdj(t, i - 3)))
        out += ((i - 3, i + 1))
      else if (isProperNoun(t, i) && isProperNoun(t, i - 3)) {
        if (isProperNoun(t, i - 1) && isProperNoun(t, i - 2))
          out += ((i - 3, i + 1))
        else if (isJoiner(t, i - 1) && t(i - 2).tag == "DT")
          out += ((i - 3, i + 1))
        else if ((isProperNoun(t, i - 1) || isJoiner(t, i - 1)) &&
                 (isProperNoun(t, i - 2) || isJoiner(t, i - 2)))
          out += ((i - 3, i + 1))
      }
    }
    out.result().distinct
  }

  /** All tilings of [0, n): seed with the spans at 0 (elongating the first
    * word per getQueryVariants:95-109 when nothing starts there), then extend
    * each living span chain with every span starting at ceiling(end) —
    * ceiling, not equality, so glue words between spans are DROPPED — and
    * emit the chains that reach the sentence end (getWordSpans:274-326). */
  private[query] def tilings(t: Array[Tok]): Seq[Seq[(Int, Int)]] = {
    val n = t.length
    if (n == 0) return Nil
    val byStart = scala.collection.immutable.TreeMap.empty[Int, Seq[(Int, Int)]] ++
      keywordSpans(t).groupBy(_._1)
    val seeded: scala.collection.SortedMap[Int, Seq[(Int, Int)]] =
      byStart.headOption match {
        case None => scala.collection.immutable.TreeMap(0 -> Seq((0, n)))
        case Some((k, spansAtK)) if k > 0 =>
          val elongated = spansAtK.flatMap { case (s, e) => Seq((0, s), (0, e)) }.distinct
          byStart + (0 -> elongated)
        case _ => byStart
      }
    var living: Seq[Vector[(Int, Int)]] = seeded(0).map(Vector(_))
    val good = Seq.newBuilder[Seq[(Int, Int)]]
    var guard = 0
    while (living.nonEmpty && guard < 64) {
      guard += 1
      val next = Seq.newBuilder[Vector[(Int, Int)]]
      living.foreach { chain =>
        val end = chain.last._2
        if (end == n) good += chain
        seeded.iteratorFrom(end).take(1).foreach { case (_, spans) =>
          spans.foreach(sp => next += (chain :+ sp))
        }
      }
      living = next.result()
    }
    good.result()
  }

  /** Faithful re-segmentations as token lists over the RAW words
    * (multi-word spans '_'-joined), omittable glue dropped like
    * createTokens:185-192, deduped, value-sorted ascending
    * (QueryVariants.java:146, evaluateQueries:156-175 via
    * [[Q3Variants.variantValue]]), capped (permuteQueries limit(24)). */
  def segmentations(words: Seq[String], df: String => Long,
                    cap: Int = 24): Seq[Seq[String]] = {
    if (words.isEmpty || words.size > 8) return Nil // tiling is O(2^n); queries are short
    val t = tagged(words)
    def wordOf(sp: (Int, Int)): String =
      (sp._1 until sp._2).map(i => t(i).word).mkString("_")
    val tokenLists = tilings(t).map { chain =>
      val ls = chain.map(wordOf)
      if (ls.size == 1) ls
      else ls.filterNot(OmittableWords.contains)
    }.filter(_.nonEmpty).distinct
    tokenLists.sortBy(terms => Q3Variants.variantValue(terms, df)).take(cap)
  }

  /** Every '_'-joined span term any segmentation of these subqueries could
    * produce — hashed alongside the query's own terms so the planner's single
    * stats lookup prices every variant (same contract as
    * [[Q3Variants.candidateTerms]]). `joinStored` maps a span's raw parts to
    * the index's stored span form (stemmed parts joined with '_'). */
  def candidateSpanTerms(subqueries: Seq[Subquery],
                         joinStored: Seq[String] => String): Seq[String] =
    subqueries.filter(eligible).flatMap { sq =>
      val t = tagged(sq.include)
      keywordSpans(t).filter(sp => sp._2 - sp._1 > 1).map { case (s, e) =>
        joinStored((s until e).map(i => t(i).word))
      } ++ {
        // elongated first words can also join multi-word prefixes
        val spans = keywordSpans(t)
        val firstStart = spans.map(_._1).minOption.getOrElse(0)
        if (firstStart > 0)
          spans.filter(_._1 == firstStart).flatMap { case (_, e) =>
            Seq(firstStart, e).filter(_ > 1).map(x =>
              joinStored((0 until x).map(i => t(i).word)))
          }
        else if (spans.isEmpty && sq.include.size > 1)
          Seq(joinStored(sq.include.map(_.toLowerCase)))
        else Nil
      }
    }.distinct

  /** Same eligibility as the rest of Q3: plain literal conjunctions only. */
  def eligible(sq: Subquery): Boolean =
    sq.coherences.isEmpty && sq.include.nonEmpty &&
      sq.include.forall(w => !w.contains(':') && !w.contains('_'))

  /** The reference's omittable glue words (QueryVariants.isOmittableWord,
    * :205-210) — shared with QueryEngine's omit-variant pass. */
  val OmittableWords: Set[String] = Set(
    "vs", "or", "and", "versus", "is", "the", "why", "when", "if", "who", "are", "am")
}
