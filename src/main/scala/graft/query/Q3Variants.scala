package graft.query

/** Deterministic, POS-independent transcription of the reference's query
  * variant machinery — the part of Q3 that does NOT require a POS model.
  *
  * Reference sources:
  *   - dash-combine: `QueryVariants.combineDashWords` (QueryVariants.java:248-268)
  *     — a word containing `-` gains a variant with the dashes stripped, if
  *     the combined form is a known n-gram (NGramBloomFilter).
  *   - num-split: `QueryVariants.splitWordNum` (QueryVariants.java:212-246)
  *     — a word with a letter↔digit boundary (numWordBoundary:43) gains a
  *     variant split as `left_right` at the first boundary whose joined
  *     n-gram is known.
  *   - morphological variants of the LAST query word:
  *     `EnglishDictionary.findWordVariants`/`ingForm` (EnglishDictionary
  *     .java:62-165) gated by `getWordVariants`' term-frequency > 100
  *     (EnglishDictionary.java:44-56).
  *   - variant value + ordering: `QueryVariants.evaluateQueries`
  *     (QueryVariants.java:156-175), ascending sort (:146-147); alternative
  *     variants admitted until the variant set reaches 6
  *     (QueryPermutation.java:109-111).
  *
  * The reference gates on a static English wordlist + an imported term
  * frequency dict + an n-gram Bloom filter. None of those exist for a code
  * corpus, so every gate maps onto the one structure that plays both roles
  * here: the snapshot's own term_stats df. "Known n-gram" / "isWord" ⇒
  * df > 0 (the corpus is the dictionary); the tf>100 morph gate ⇒
  * df > QuerySpec.morphDfGate (default 100, same constant). This keeps the
  * exact candidate-generation control flow while replacing only the lookup
  * backend — the same liberty the rest of the engine takes for lexicon
  * lookups (SURVEY §2.1).
  */
object Q3Variants {

  /** Candidate variant of one subquery, pending the df gate. */
  final case class Candidate(base: Subquery, variant: Subquery, faithful: Boolean)

  /** Letter↔digit boundary positions i such that (charAt(i), charAt(i+1))
    * crosses the boundary — numWordBoundary `[0-9][a-zA-Z]|[a-zA-Z][0-9]`. */
  def numBoundaries(w: String): Seq[Int] = {
    def isDig(c: Char) = c >= '0' && c <= '9'
    def isAl(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    (0 until w.length - 1).filter { i =>
      val a = w.charAt(i); val b = w.charAt(i + 1)
      (isDig(a) && isAl(b)) || (isAl(a) && isDig(b))
    }
  }

  /** All `left_right` split candidates of one word (one per boundary). */
  def numSplitCandidates(w: String): Seq[String] =
    if (w.contains(':') || w.contains('_')) Nil
    else numBoundaries(w).map(i => w.substring(0, i + 1) + "_" + w.substring(i + 1))

  /** Dash-stripped combination, when the word has an interior dash. */
  def dashCombined(w: String): Option[String] =
    if (w.contains(':') || !w.contains('-')) None
    else Some(w.replace("-", "")).filter(c => c.nonEmpty && c != w)

  /** EnglishDictionary.ingForm:150-164, exact transcription. */
  def ingForm(s: String): String = {
    if (s.endsWith("t") && !s.endsWith("tt")) s + "ting"
    else if (s.endsWith("n") && !s.endsWith("nn")) s + "ning"
    else if (s.endsWith("m") && !s.endsWith("mm")) s + "ming"
    else if (s.endsWith("r") && !s.endsWith("rr")) s + "ring"
    else s + "ing"
  }

  private val doubledIng = ".*(\\w)\\1ing$".r.pattern // EnglishDictionary.java:43

  /** EnglishDictionary.findWordVariants:62-148, exact control-flow
    * transcription with `isWord` = caller's liveness predicate. */
  def findWordVariants(s: String, isWord: String => Boolean): Seq[String] = {
    val sl = s.length
    if (sl < 2) return Nil
    def pick(cands: String*): Seq[String] = {
      val live = cands.filter(isWord)
      if (live.nonEmpty) live else Nil
    }
    if (s.endsWith("s")) {
      val r = pick(s.substring(0, sl - 1), s + "es")
      if (r.nonEmpty) return r
    }
    if (s.endsWith("sm")) {
      val r = pick(s.substring(0, sl - 1) + "t", s.substring(0, sl - 1) + "ts")
      if (r.nonEmpty) return r
    }
    if (s.endsWith("st")) {
      pick(s.substring(0, sl - 1) + "m", s + "s")
    } else if (doubledIng.matcher(s).matches() && sl > 4) {
      pick(s.substring(0, sl - 4), s.substring(0, sl - 3) + "ed")
    } else {
      pick(s + "s", ingForm(s), s + "ed")
    }
  }

  /** getWordVariants analog: findWordVariants candidates that clear the
    * frequency gate (reference: tf > 100; here corpus df > gate). */
  def wordVariants(s: String, df: String => Long, gate: Long): Seq[String] =
    findWordVariants(s, w => df(w) > 0L).filter(w => df(w) > gate)

  /** Variant value — QueryVariants.evaluateQueries:156-175. Lower = better
    * (rarer parts); variants are sorted ascending (:146-147). */
  def variantValue(terms: Seq[String], df: String => Long): Double =
    terms.iterator.map { word =>
      val parts = word.split('_')
      val qp = parts.iterator.map(p => 1.0 / (1 + df(p))).sum
      if (qp == 0) 0.0 else 1.0 / qp
    }.sum

  private def eligible(sq: Subquery): Boolean =
    sq.coherences.isEmpty && sq.include.nonEmpty && sq.include.forall(!_.contains(':'))

  /** Every term a gate decision could need — hashed alongside the query's own
    * terms so the planner's single stats lookup answers all gates. */
  def candidateTerms(subqueries: Seq[Subquery]): Seq[String] =
    subqueries.filter(eligible).flatMap { sq =>
      sq.include.flatMap(w => dashCombined(w).toSeq ++ numSplitCandidates(w)) ++
        (sq.include.lastOption match {
          case Some(last) if !last.contains('_') =>
            // all three suffix families' raw candidates (gate picks later)
            val sl = last.length
            if (sl < 2) Nil
            else Seq(last.substring(0, sl - 1), last + "es",
              last.substring(0, math.max(0, sl - 1)) + "t", last.substring(0, math.max(0, sl - 1)) + "ts",
              last.substring(0, math.max(0, sl - 1)) + "m", last + "s",
              ingForm(last), last + "ed") ++
              (if (sl > 4) Seq(last.substring(0, sl - 4), last.substring(0, sl - 3) + "ed") else Nil)
          case _ => Nil
        })
    }.distinct

  /** Gated variant subqueries for one base set, value-sorted faithful-first,
    * capped at `cap` per base subquery (QueryPermutation.java:109-111 admits
    * alternatives until the set reaches 6). */
  def expand(subqueries: Seq[Subquery], df: String => Long,
             morphDfGate: Long, cap: Int = 6): Seq[Subquery] = {
    val out = Seq.newBuilder[Subquery]
    subqueries.filter(eligible).foreach { sq =>
      val inc = sq.include
      val cands = Seq.newBuilder[Candidate]

      // dash-combine: one variant, every combinable dash word combined;
      // unknown combinations keep the original word (QueryVariants.java:252-262)
      val dashInc = inc.map(w => dashCombined(w).filter(c => df(c) > 0L).getOrElse(w))
      if (dashInc != inc)
        cands += Candidate(sq, sq.copy(include = dashInc), faithful = true)

      // num-split: one variant, each splittable word split at its first
      // known boundary (QueryVariants.java:217-240)
      val numInc = inc.map(w => numSplitCandidates(w).find(c => df(c) > 0L).getOrElse(w))
      if (numInc != inc)
        cands += Candidate(sq, sq.copy(include = numInc), faithful = true)

      // morphological variants of the last word (QueryVariants.java:124-139)
      inc.lastOption.filter(!_.contains('_')).toSeq
        .flatMap(last => wordVariants(last, df, morphDfGate).map(v =>
          sq.copy(include = inc.init :+ v)))
        .foreach(v => cands += Candidate(sq, v, faithful = false))

      val all = cands.result()
      val (faithful, alt) = all.partition(_.faithful)
      val ordered =
        faithful.sortBy(c => variantValue(c.variant.include, df)) ++
          alt.sortBy(c => variantValue(c.variant.include, df))
      out ++= ordered.take(cap).map(_.variant)
    }
    out.result()
  }
}
