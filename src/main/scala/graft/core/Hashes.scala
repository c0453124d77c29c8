package graft.core

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Stable hashing used throughout the engine.
  *
  * The reference folds murmur3_128 to 64 bits and maps through a dense lexicon
  * (/root/reference/code/features-index/lexicon/src/main/java/nu/marginalia/lexicon/KeywordLexicon.java:25,49-69);
  * we key postings directly by a stable 64-bit term hash instead (the dense id
  * only exists so the reference can index flat arrays). Rank-identity depends
  * on scores and doc ids, not on internal term ids, so any fixed 64-bit hash
  * works — we freeze xxHash64(seed=42) via Spark's XXH64 so the same value is
  * computable as a Catalyst column (`xxhash64`) AND on the driver without a
  * row round-trip.
  */
object Hashes {
  final val TermHashSeed = 42L

  def termHash(term: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(term),
      org.apache.spark.sql.types.StringType, TermHashSeed)

  private val HexDigits = "0123456789abcdef".toCharArray

  def sha256Hex(s: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(i * 2) = HexDigits((d(i) >> 4) & 0xF)
      out(i * 2 + 1) = HexDigits(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }
}
