package graft.analysis

import graft.core.{DocMeta, WordFlags, WordMeta}

/** One extracted keyword of a document: stable term string, packed word
  * metadata (56-bit position mask + flags), and raw term frequency. */
final case class Keyword(term: String, meta: Long, tf: Int)

/** Result of analyzing one document. `length` is the token count (the BM25
  * length); `docMeta` is the packed document metadata. */
final case class DocAnalysis(keywords: Array[Keyword], length: Int, docMeta: Long)

/** Mutable per-term aggregation cell used inside [[Tokenizer.analyze]]. */
private[analysis] final class TermAgg {
  var mask: Long = 0L
  var tf: Int = 0
  var flags: Int = 0
}

/** Corpus-wide term frequencies for extraction-time TF-IDF (the reference's
  * term-frequency dictionary, TermFrequencyDict.java). Absent terms read as
  * frequency 1 (the reference's clamp, WordsTfIdfCounts.java:139-141). */
final case class TfIdfDict(df: Map[String, Long], docCount: Double) {
  def freq(term: String): Double = math.max(1L, df.getOrElse(term, 1L)).toDouble
}

/** Document analysis front-end: code-aware tokenization, keyword-shape gate,
  * junk filtering, position bitmask, flags, synthetic meta-terms.
  *
  * The reference pipeline is HTML/NLP-oriented
  * (/root/reference/code/libraries/language-processing/.../SentenceExtractor.java:63-103,
  * /root/reference/code/features-convert/keyword-extraction/.../DocumentKeywordExtractor.java:27-125);
  * our corpus is source code, so sentences become lines, POS-driven span
  * extraction degrades to identifier tokens, and the synthetic `site:`/`tld:`
  * meta-keywords (AbstractDocumentProcessorPlugin.java:32-96) become
  * `repo:`/`lang:`/`ext:`/`path:` terms. The position-bitmask state machine is
  * replicated exactly from KeywordPositionBitmask.java:9-85 because BM25's
  * per-term count is `bitCount(mask)`.
  */
object Tokenizer {

  final val PositionWidth       = 56
  final val PositionMask        = (1L << PositionWidth) - 1
  final val UnmodulatedPortion  = 16
  final val MaxWordLength       = 64   // DocumentKeywordsBuilder.java:21
  final val MaxKeywordsPerDoc   = 1500 // DocumentKeywordExtractor.java:104-105

  /** Keyword shape gate, unrolled regex from DocumentKeywordExtractor.java:127-164:
    * `[\da-zA-Z]{1,15}([.\-_/:+*][\da-zA-Z]{1,10}){0,4}` */
  private val wordShape =
    "[\\da-zA-Z]{1,15}([.\\-_/:+*][\\da-zA-Z]{1,10}){0,4}".r.pattern

  def isIndexableWord(w: String): Boolean =
    w.nonEmpty && w.length <= MaxWordLength && wordShape.matcher(w).matches()

  /** Split a line of code/text into raw tokens: runs of word characters glued
    * by the joiner chars ./-_/:+* (mirrors the shape gate's alphabet). */
  def splitLine(line: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = line.length
    var i = 0
    def isWordChar(c: Char) = Character.isLetterOrDigit(c)
    def isJoiner(c: Char) = c == '.' || c == '-' || c == '_' || c == '/' || c == ':' || c == '+' || c == '*'
    while (i < n) {
      while (i < n && !isWordChar(line.charAt(i))) i += 1
      val start = i
      var end = i
      while (i < n && (isWordChar(line.charAt(i)) || (isJoiner(line.charAt(i)) && i + 1 < n && isWordChar(line.charAt(i + 1))))) {
        i += 1
        if (i <= n && (i == n || !isJoiner(line.charAt(i - 1)))) end = i
      }
      if (end > start) out += line.substring(start, end)
    }
    out.toArray
  }

  /** Sub-split identifiers: camelCase, snake_case, dotted.paths → parts.
    * Each part is emitted alongside the compound token so both
    * `IndexJournalWriter` and `index_journal_writer` and `index` match.
    * Hand-rolled single pass — this runs per token of every document, and a
    * regex implementation (Pattern.compile per call) dominated the whole
    * index build's CPU profile. Split points: joiner chars, lower/digit→Upper
    * boundaries, and the last Upper of an acronym run followed by lower
    * (HTTPServer → HTTP, Server). ASCII classes only, same split semantics
    * as the original `([a-z0-9])([A-Z])` / `([A-Z]+)([A-Z][a-z])` pair. */
  def identifierParts(token: String): Array[String] = {
    val n = token.length
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder(16)
    def isUp(c: Char) = c >= 'A' && c <= 'Z'
    def isLowDig(c: Char) = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
    def isJoin(c: Char) = c == ' ' || c == '.' || c == '_' || c == '/' || c == ':' ||
      c == '-' || c == '+' || c == '*'
    def flush(): Unit = if (sb.length > 0) { parts += sb.toString; sb.setLength(0) }
    var i = 0
    var prev = ' ' // last char appended to the current part
    while (i < n) {
      val c = token.charAt(i)
      if (isJoin(c)) { flush(); prev = ' ' }
      else {
        if (sb.length > 0 && isUp(c) &&
            (isLowDig(prev) || (isUp(prev) && i + 1 < n && {
              val d = token.charAt(i + 1); d >= 'a' && d <= 'z'
            }))) {
          flush()
        }
        sb.append(c)
        prev = c
      }
      i += 1
    }
    flush()
    if (parts.length <= 1) Array.empty else parts.toArray
  }

  /** Normalize to the stored term form: ASCII-flatten + lower-case
    * (AsciiFlattener + SentenceExtractorStringUtils analog). Already-normal
    * tokens (the common case in code) return themselves — no allocation. */
  def normalize(token: String): String = {
    var i = 0
    val n = token.length
    while (i < n) {
      val c = token.charAt(i)
      if (c >= 128 || (c >= 'A' && c <= 'Z')) return normalizeSlow(token)
      i += 1
    }
    if (n >= 2 && token.charAt(n - 2) == '\'' && token.charAt(n - 1) == 's')
      token.substring(0, n - 2)
    else token
  }

  private def normalizeSlow(token: String): String = {
    val sb = new StringBuilder(token.length)
    var i = 0
    while (i < token.length) {
      val c = token.charAt(i)
      if (c < 128) sb.append(Character.toLowerCase(c))
      else {
        val norm = java.text.Normalizer.normalize(c.toString, java.text.Normalizer.Form.NFD)
        norm.foreach(ch => if (ch < 128) sb.append(Character.toLowerCase(ch)))
      }
      i += 1
    }
    val s = sb.toString
    if (s.endsWith("'s")) s.dropRight(2) else s // possessive strip
  }

  /** Junk filter analog of WordPatterns.java:13-82: too many digits-only
    * segments / repeated joiners are noise. */
  def isJunk(w: String): Boolean = {
    if (w.isEmpty || w.length > MaxWordLength) return true
    var digits = 0
    w.foreach(c => if (Character.isDigit(c)) digits += 1)
    digits > 16
  }

  /** Position state machine — exact transcription of
    * KeywordPositionBitmask.LinePosition (reference :62-85). */
  final class LinePosition {
    private var lineLengthCtr = 0
    private var bitMaskPos = 1
    def pos(): Int =
      if (bitMaskPos < UnmodulatedPortion) bitMaskPos
      else UnmodulatedPortion + ((bitMaskPos - UnmodulatedPortion) % (PositionWidth - UnmodulatedPortion))
    def next(sentenceLength: Int): Unit = {
      if (sentenceLength > 10) { lineLengthCtr = 0; bitMaskPos += 1 }
      lineLengthCtr += sentenceLength
      if (lineLengthCtr > 15) { lineLengthCtr = 0; bitMaskPos += 1 }
    }
  }

  /** Analyze one corpus document.
    *
    * @param repo    repository (plays the reference's domain role)
    * @param path    file path within the repo
    * @param lang    language tag
    * @param content file content
    * @param repoRank domain rank 0..255 (0 best) for doc_meta
    * @param yearByte encoded year byte for doc_meta
    */
  /** Mail-like artifact pattern (ArtifactKeywords.java:10) with the
    * reference's ignore lists. */
  private val mailLike =
    "[a-zA-Z0-9._\\-]+@[a-zA-Z0-9]+(\\.[a-zA-Z0-9]+)+".r.pattern
  private val ignoredMailDomains = Set("@hotmail.com", "@gmail.com", "@paypal.com")
  private val ignoredMailUsers = Set("info", "legal", "contact", "press",
    "donotreply", "noreply", "no-reply", "admin", "root")

  def analyze(repo: String, path: String, lang: String, content: String,
              repoRank: Int = DocMeta.UnknownRank, yearByte: Int = 0,
              tfIdfDict: TfIdfDict = null, stem: Boolean = false,
              ngrams: Boolean = false): DocAnalysis = {
    val lines = content.split('\n')
    // one map, one mutable cell per term — the three-map/boxed-merge version
    // of this aggregation was the analyze hot path's top allocator
    val agg = new java.util.HashMap[String, TermAgg](256)
    var totalTokens = 0

    // stored term form: normalize, then optionally Porter-stem (C2 — the
    // reference stems every non-synthetic term, SentenceExtractor.java:196-208)
    def termOf(raw: String): String = {
      val t = normalize(raw)
      if (stem) Porter.stem(t) else t
    }

    def add(term: String, posBit: Long, flag: Int): Unit = {
      if (term.nonEmpty && !isJunk(term)) {
        var cell = agg.get(term)
        if (cell == null) { cell = new TermAgg; agg.put(term, cell) }
        cell.mask |= posBit
        cell.tf += 1
        cell.flags |= flag
      }
    }

    // Title analog: the first non-empty line (a file's package/header line)
    // gets position bit 0 semantics (posBit=1, KeywordPositionBitmask :21-29)
    // and the Title flag.
    val firstIdx = lines.indexWhere(_.trim.nonEmpty)
    if (firstIdx >= 0) {
      val toks = splitLine(lines(firstIdx))
      toks.foreach { raw =>
        val t = termOf(raw)
        if (isIndexableWord(raw)) add(t, 1L, WordFlags.Title)
        identifierParts(raw).foreach(p => add(termOf(p), 1L, WordFlags.Title))
      }
    }

    // A9/K5 deterministic analogs (no POS model — degraded, documented):
    //  - NamesWords (NameLikeKeywords.java:20-49): capitalized tokens play
    //    the proper-name-span role; single tokens need per-doc count ≥
    //    minCount+1 = 3 and must not be ALL-caps (reference skips those,
    //    :30-31); adjacent capitalized pairs (span terms, ngram indexes
    //    only) need count ≥ 2 (hasEnough, :53-61).
    //  - Subjects (SubjectLikeKeywords.java:27-69): the sentence-lead token
    //    with ≥ 2 tokens following is the [Noun](Verb)(…) subject analog
    //    (kw.end+2 < sentence.length, :36-38), gated by the same
    //    extraction-time TF-IDF value (≥ 100, :62-63); with no TF dict the
    //    reference's unknown-term clamp makes every candidate pass the gate,
    //    so candidates are flagged unconditionally.
    val nameCounts = new java.util.HashMap[String, Int]()
    val subjectCands = new java.util.HashSet[String]()
    def isCapitalized(w: String): Boolean =
      w.length >= 2 && Character.isUpperCase(w.charAt(0)) &&
        w.exists(Character.isLowerCase)
    def isCapLike(w: String): Boolean =
      w.nonEmpty && Character.isUpperCase(w.charAt(0))

    // Body: every line is a virtual sentence; position advances per the
    // reference state machine.
    val linePos = new LinePosition
    var li = 0
    while (li < lines.length) {
      val toks = splitLine(lines(li))
      if (toks.nonEmpty) {
        val posBit = (1L << linePos.pos()) & PositionMask
        if (toks.length >= 3 && isIndexableWord(toks(0)))
          subjectCands.add(termOf(toks(0)))
        // K3 analog: adjacent-token 2/3/4-gram spans, underscore-joined like
        // the reference's word spans (KeywordExtractor.java:107-177 emits
        // 1-4 token POS-matched spans; without a POS model we emit every
        // adjacent indexable run up to 4 — configurable because it roughly
        // triples journal volume). Quoted phrases up to 4 words retrieve
        // EXACT adjacency through one full-span advice term; a span's
        // existence is proof of contiguity, unlike pairwise a_b+b_c which
        // can false-positive on `a b … b c` in one position group.
        var prevOk: String = null
        var prev2: String = null
        var prev3: String = null
        var prevCap = false
        toks.foreach { raw =>
          totalTokens += 1
          val t = termOf(raw)
          val ok = isIndexableWord(raw)
          val cap = isCapLike(raw)
          if (ok) {
            add(t, posBit, 0)
            if (isCapitalized(raw)) nameCounts.merge(t, 1, _ + _)
          }
          if (ngrams) {
            if (ok && prevOk != null) {
              add(prevOk + "_" + t, posBit, 0)
              if (cap && prevCap) nameCounts.merge(prevOk + "_" + t, 1, _ + _)
              if (prev2 != null) {
                add(prev2 + "_" + prevOk + "_" + t, posBit, 0)
                if (prev3 != null)
                  add(prev3 + "_" + prev2 + "_" + prevOk + "_" + t, posBit, 0)
              }
            }
            if (ok) { prev3 = prev2; prev2 = prevOk; prevOk = t }
            else { prev3 = null; prev2 = null; prevOk = null }
            prevCap = ok && cap
          }
          identifierParts(raw).foreach(p => add(termOf(p), posBit, 0))
        }
        linePos.next(toks.length)
      }
      li += 1
    }

    // URL-keyword analog (UrlKeywords.java:18-39): path tokens → UrlPath,
    // repo tokens → UrlDomain. They ride position bit 0 semantics (mask 0 is
    // fine — flags drive their scoring through the prio tier).
    splitLine(path).foreach { raw =>
      val t = termOf(raw)
      if (isIndexableWord(raw)) add(t, 0L, WordFlags.UrlPath)
      identifierParts(raw).foreach(p => add(termOf(p), 0L, WordFlags.UrlPath))
    }
    splitLine(repo).foreach { raw =>
      val t = termOf(raw)
      if (isIndexableWord(raw)) add(t, 0L, WordFlags.UrlDomain)
    }

    // Synthetic meta-keywords (C11 analog of site:/tld:/format: —
    // AbstractDocumentProcessorPlugin.java:32-96).
    val ext = path.lastIndexOf('.') match {
      case -1 => ""
      case i  => path.substring(i + 1)
    }
    add(s"lang:${lang.toLowerCase}", 0L, WordFlags.Synthetic)
    add(s"repo:${repo.toLowerCase}", 0L, WordFlags.Synthetic)
    if (ext.nonEmpty) add(s"ext:${ext.toLowerCase}", 0L, WordFlags.Synthetic)

    // Artifact keywords (K8 — ArtifactKeywords.java:17-44): mail-like tokens
    // emit the address plus user/domain variants as synthetic terms, with the
    // reference's ignore lists; never stemmed, bypass the shape gate.
    var ali = 0
    while (ali < lines.length) {
      val line = lines(ali)
      if (line.indexOf('@') >= 0) {
        val mm = mailLike.matcher(line)
        while (mm.find()) {
          val lc = mm.group().toLowerCase
          if (lc.length >= 6) {
            val at = lc.indexOf('@')
            add(lc, 0L, WordFlags.Synthetic)
            val domain = lc.substring(at)
            val user = lc.substring(0, at)
            if (!ignoredMailDomains.contains(domain)) {
              add(domain.substring(1), 0L, WordFlags.Synthetic)
              add(domain, 0L, WordFlags.Synthetic)
            }
            if (!ignoredMailUsers.contains(user)) add(user, 0L, WordFlags.Synthetic)
          }
        }
      }
      ali += 1
    }

    // Extraction-time TF-IDF flag (A5/K5 — WordsTfIdfCounts.java:113-141):
    // value = -75·(0.1 + 0.9·tf/maxTf)·ln(freq/docCount); flag terms with
    // tf > 1 and value > 100. Needs the corpus TF dictionary (S7); without
    // one the flag is simply not assigned, like the reference with an empty
    // dict.
    var maxTf = 0
    agg.values.forEach(c => if (c.tf > maxTf) maxTf = c.tf)
    if (tfIdfDict != null && !agg.isEmpty) {
      agg.forEach { (t, cell) =>
        if (cell.tf > 1) {
          val v = (0.1 + 0.9 * cell.tf / maxTf.toDouble) *
            math.log(tfIdfDict.freq(t) / tfIdfDict.docCount)
          if ((-v * 75).toInt > 100) cell.flags |= WordFlags.TfIdfHigh
        }
      }
    }

    // Subjects/NamesWords assignment (KeywordMetadata.java:36-62 analog —
    // flags land on the stored term so the prio tier, the prio-BM25 count
    // (WordFlags.PrioBm25Mask counts Subjects) and SiteWords' topic mask all
    // see them).
    nameCounts.forEach { (t, c) =>
      val need = if (t.indexOf('_') >= 0) 2 else 3
      if (c >= need) {
        val cell = agg.get(t)
        if (cell != null) cell.flags |= WordFlags.NamesWords
      }
    }
    subjectCands.forEach { t =>
      val cell = agg.get(t)
      if (cell != null) {
        val pass = tfIdfDict == null || {
          val v = (0.1 + 0.9 * cell.tf / math.max(1, maxTf).toDouble) *
            math.log(tfIdfDict.freq(t) / tfIdfDict.docCount)
          (-v * 75).toInt >= 100
        }
        if (pass) cell.flags |= WordFlags.Subjects
      }
    }

    // Assemble, cap at MaxKeywordsPerDoc by tf desc (term asc tiebreak) for
    // determinism (reference caps by insertion order at ~1500).
    var kws: Array[Keyword] = new Array[Keyword](agg.size)
    var ki = 0
    val aggIt = agg.entrySet().iterator()
    while (aggIt.hasNext) {
      val e = aggIt.next()
      val c = e.getValue
      kws(ki) = Keyword(e.getKey, WordMeta.encode(c.mask, c.flags), c.tf)
      ki += 1
    }
    if (kws.length > MaxKeywordsPerDoc) {
      kws = kws.sortBy(k => (-k.tf, k.term)).take(MaxKeywordsPerDoc)
    }

    // Quality analog (DocumentValuator.java:16-48): log of content-to-raw
    // ratio; for plain code we derive a small deterministic 0..15 value from
    // line-length statistics (long auto-generated lines → worse quality).
    val avgLineLen = if (lines.isEmpty) 0.0 else content.length.toDouble / lines.length
    val quality = math.min(15, math.max(0, (avgLineLen / 40).toInt))
    val asl = math.min(3, if (totalTokens == 0) 0 else math.max(0, (totalTokens / math.max(1, lines.length)) / 4))

    val docMeta = DocMeta.encode(
      asl = asl, rank = repoRank, encSize = 0, topology = 0,
      yearByte = yearByte, sets = 0, quality = quality, flags = 0)

    DocAnalysis(kws.sortBy(_.term), totalTokens, DocMeta.withSize(docMeta, totalTokens))
  }
}
