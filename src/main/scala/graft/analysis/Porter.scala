package graft.analysis

/** Porter stemmer — the classic suffix-stripping algorithm (M.F. Porter,
  * "An algorithm for suffix stripping", Program 14(3) 1980), in the form of
  * the author's published reference implementation (including its two
  * post-paper corrections in step 2: -bli → -ble and -logi → -log). The
  * reference engine stems every indexed and query term with the same
  * algorithm (ca.rmen porterstemmer; SentenceExtractor.java:196-208,
  * UrlKeywords.java:13).
  *
  * Tokens that are not purely a-z (identifiers with digits/joiners, already
  * rare in natural text) are returned unchanged — Porter's consonant rules
  * are undefined on them, and stemming `sha256` into nonsense would hurt a
  * code corpus. Stemming is idempotent at the call sites that matter here
  * (index + query apply the same function to the same normalized form).
  */
object Porter {

  def stem(word: String): String = {
    val n = word.length
    if (n <= 2) return word
    var ci = 0
    while (ci < n) {
      val c = word.charAt(ci)
      if (c < 'a' || c > 'z') return word
      ci += 1
    }
    val s = new Stemmer(word.toCharArray)
    s.run()
    // NB: can't shortcut on unchanged length — step 2 rewrites y→i in place
    new String(s.b, 0, s.k + 1)
  }

  private final class Stemmer(val b: Array[Char]) {
    var k: Int = b.length - 1
    private var j: Int = 0

    private def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y'                         => if (i == 0) true else !cons(i - 1)
      case _                           => true
    }

    /** Number of consonant-vowel-consonant measures in b[0..j]. */
    private def m(): Int = {
      var n = 0
      var i = 0
      while (i <= j && cons(i)) i += 1
      if (i > j) return 0
      var done = false
      while (!done) {
        while (i <= j && !cons(i)) i += 1
        if (i > j) done = true
        else {
          n += 1
          while (i <= j && cons(i)) i += 1
          if (i > j) done = true
        }
      }
      n
    }

    private def vowelInStem(): Boolean = {
      var i = 0
      while (i <= j) { if (!cons(i)) return true; i += 1 }
      false
    }

    private def doublec(i: Int): Boolean =
      i >= 1 && b(i) == b(i - 1) && cons(i)

    /** consonant-vowel-consonant ending at i, last consonant not w/x/y —
      * restores an 'e' on words like cav(e), lov(e), hop(e). */
    private def cvc(i: Int): Boolean =
      i >= 2 && cons(i) && !cons(i - 1) && cons(i - 2) && {
        val ch = b(i); ch != 'w' && ch != 'x' && ch != 'y'
      }

    private def ends(s: String): Boolean = {
      val l = s.length
      val o = k - l + 1
      if (o < 0) return false
      var i = 0
      while (i < l) {
        if (b(o + i) != s.charAt(i)) return false
        i += 1
      }
      j = k - l
      true
    }

    private def setto(s: String): Unit = {
      var i = 0
      while (i < s.length) { b(j + 1 + i) = s.charAt(i); i += 1 }
      k = j + s.length
    }

    private def r(s: String): Unit = if (m() > 0) setto(s)

    /** Step 1: plurals and -ed/-ing. */
    private def step1(): Unit = {
      if (b(k) == 's') {
        if (ends("sses")) k -= 2
        else if (ends("ies")) setto("i")
        else if (b(k - 1) != 's') k -= 1
      }
      if (ends("eed")) { if (m() > 0) k -= 1 }
      else if ((ends("ed") || ends("ing")) && vowelInStem()) {
        k = j
        if (ends("at")) setto("ate")
        else if (ends("bl")) setto("ble")
        else if (ends("iz")) setto("ize")
        else if (doublec(k)) {
          k -= 1
          val ch = b(k)
          if (ch == 'l' || ch == 's' || ch == 'z') k += 1
        } else if (m() == 1 && cvc(k)) setto("e")
      }
    }

    /** Step 2: terminal y → i when there is another vowel in the stem. */
    private def step2(): Unit =
      if (ends("y") && vowelInStem()) b(k) = 'i'

    /** Step 3: double suffixes → single (-ization → -ize etc.). */
    private def step3(): Unit = {
      if (k == 0) return
      b(k - 1) match {
        case 'a' =>
          if (ends("ational")) r("ate")
          else if (ends("tional")) r("tion")
        case 'c' =>
          if (ends("enci")) r("ence")
          else if (ends("anci")) r("ance")
        case 'e' =>
          if (ends("izer")) r("ize")
        case 'l' =>
          if (ends("bli")) r("ble")
          else if (ends("alli")) r("al")
          else if (ends("entli")) r("ent")
          else if (ends("eli")) r("e")
          else if (ends("ousli")) r("ous")
        case 'o' =>
          if (ends("ization")) r("ize")
          else if (ends("ation")) r("ate")
          else if (ends("ator")) r("ate")
        case 's' =>
          if (ends("alism")) r("al")
          else if (ends("iveness")) r("ive")
          else if (ends("fulness")) r("ful")
          else if (ends("ousness")) r("ous")
        case 't' =>
          if (ends("aliti")) r("al")
          else if (ends("iviti")) r("ive")
          else if (ends("biliti")) r("ble")
        case 'g' =>
          if (ends("logi")) r("log")
        case _ =>
      }
    }

    /** Step 4: -ic-, -full, -ness etc. */
    private def step4(): Unit = b(k) match {
      case 'e' =>
        if (ends("icate")) r("ic")
        else if (ends("ative")) r("")
        else if (ends("alize")) r("al")
      case 'i' =>
        if (ends("iciti")) r("ic")
      case 'l' =>
        if (ends("ical")) r("ic")
        else if (ends("ful")) r("")
      case 's' =>
        if (ends("ness")) r("")
      case _ =>
    }

    /** Step 5: -ant, -ence etc. dropped in context m > 1. */
    private def step5(): Unit = {
      if (k == 0) return
      val matched = b(k - 1) match {
        case 'a' => ends("al")
        case 'c' => ends("ance") || ends("ence")
        case 'e' => ends("er")
        case 'i' => ends("ic")
        case 'l' => ends("able") || ends("ible")
        case 'n' => ends("ant") || ends("ement") || ends("ment") || ends("ent")
        case 'o' => (ends("ion") && j >= 0 && (b(j) == 's' || b(j) == 't')) || ends("ou")
        case 's' => ends("ism")
        case 't' => ends("ate") || ends("iti")
        case 'u' => ends("ous")
        case 'v' => ends("ive")
        case 'z' => ends("ize")
        case _   => false
      }
      if (matched && m() > 1) k = j
    }

    /** Step 6: terminal -e and -ll cleanup. */
    private def step6(): Unit = {
      j = k
      if (b(k) == 'e') {
        val a = m()
        if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
      }
      if (b(k) == 'l' && doublec(k) && m() > 1) k -= 1
    }

    def run(): Unit =
      if (k > 1) { step1(); step2(); step3(); step4(); step5(); step6() }
  }
}
