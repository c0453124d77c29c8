package graft.analysis

/** Per-document 60-bit order-sensitive simhash fingerprint, persisted in the
  * `documents` table at index build time (VERDICT r3 task #7). The reference
  * computes an EasyLSH fingerprint per document at conversion time
  * (EasyLSH.java:12-60 via DocumentLanguageData.java:36-44) so near-dup
  * detection downstream never re-reads text; this is that column with
  * EasyLSH's semantics — ordered 2-shingles, per-OCCURRENCE sign votes, one
  * bit per vote tally — re-based on the engine's portable md5 hash (h60:
  * first 15 hex chars of md5 as a 60-bit int) so DuckDB can recompute it:
  *
  *   bit j = [ Σ over shingles of (2·((h60(prev ⊔ ' ' ⊔ cur) >> j) & 1) − 1) > 0 ]
  *
  * Tokens are the non-empty space-separated chunks of the content; a
  * single-token document votes on the token itself; an empty document is 0.
  * Hamming distance between fingerprints approximates ordered-content
  * dissimilarity (EasyLSH.hammingDistance) — SparkEntry's d9 oracle consumes
  * the persisted column for near-dup pair flagging.
  */
object Fingerprint {

  final val Bits = 60

  private val hexDigits = "0123456789abcdef".toCharArray

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5(s), as a 60-bit long — bit-identical to
    * TextOps.h60 (Spark `conv(substring(md5(c), 1, 15), 16, 10)`) and the
    * DuckDB oracle form `('0x' || substring(md5(c), 1, 15))::BIGINT`. */
  def h60(s: String): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // 15 hex chars = 7.5 bytes: bytes 0-6 fully, high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v << 4) | ((d(7) & 0xF0L) >> 4)
  }

  /** 60-bit ordered-shingle simhash of `content`. */
  def simhash60(content: String): Long = {
    val counts = new Array[Int](Bits)
    var prev: String = null
    var first: String = null
    var nTokens = 0
    var nShingles = 0
    def vote(h: Long): Unit = {
      var j = 0
      while (j < Bits) {
        counts(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
    }
    var i = 0
    val n = content.length
    val sb = new java.lang.StringBuilder(32)
    while (i <= n) {
      val c = if (i < n) content.charAt(i) else ' '
      if (c == ' ') {
        if (sb.length() > 0) {
          val tok = sb.toString
          sb.setLength(0)
          nTokens += 1
          if (prev != null) { vote(h60(prev + " " + tok)); nShingles += 1 }
          else first = tok
          prev = tok
        }
      } else sb.append(c)
      i += 1
    }
    if (nTokens == 0) return 0L
    if (nShingles == 0) vote(h60(first)) // single-token doc
    var fp = 0L
    var j = 0
    while (j < Bits) {
      if (counts(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  /** Hamming distance between two fingerprints (EasyLSH.hammingDistance). */
  def distance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Hex-format helper for diagnostics. */
  def hex(v: Long): String = {
    val out = new Array[Char](15)
    var i = 0
    while (i < 15) { out(14 - i) = hexDigits(((v >>> (4 * i)) & 0xF).toInt); i += 1 }
    new String(out)
  }
}
