package graft.core

/** Per-(term, document) metadata packed into one 64-bit long.
  *
  * Layout (identical to the reference so rank math is bit-compatible —
  * see /root/reference/code/common/model/src/main/java/nu/marginalia/model/idx/WordMetadata.java:14-17):
  *
  * {{{
  *   bits  0..7   flags     (WordFlags bit set)
  *   bits  8..63  positions (56-bit sentence-group occurrence bitmask)
  * }}}
  */
object WordMeta {
  final val FlagsMask: Long     = 0xFFL
  final val PositionsShift: Int = 8
  final val PositionsMask: Long = 0xFF_FFFF_FFFF_FFFFL

  def encode(positions: Long, flags: Int): Long =
    (flags.toLong & FlagsMask) | ((positions & PositionsMask) << PositionsShift)

  def positions(meta: Long): Long = (meta >>> PositionsShift) & PositionsMask
  def flags(meta: Long): Int      = (meta & FlagsMask).toInt

  /** BM25 "count" for the full tier = number of distinct sentence-groups the
    * term occurs in (reference SearchResultKeywordScore.positionCount:33-35). */
  def positionCount(meta: Long): Int = java.lang.Long.bitCount(positions(meta))

  def hasFlags(meta: Long, mask: Long): Boolean    = (meta & mask) == mask
  def hasAnyFlags(meta: Long, mask: Long): Boolean = (meta & mask) != 0
}

/** Word flag bits, same ordinals as the reference
  * (/root/reference/code/common/model/src/main/java/nu/marginalia/model/idx/WordFlags.java:6-42). */
object WordFlags {
  final val Title: Int        = 1 << 0
  final val Subjects: Int     = 1 << 1
  final val TfIdfHigh: Int    = 1 << 2
  final val NamesWords: Int   = 1 << 3
  final val Synthetic: Int    = 1 << 4
  final val Site: Int         = 1 << 5
  final val SiteAdjacent: Int = 1 << 6
  final val UrlPath: Int      = 1 << 7
  final val UrlDomain: Int    = 1 << 8

  /** Flags that make a posting eligible for the priority tier
    * (reference ReverseIndexPriorityParameters.java:14-27). */
  final val PriorityMask: Long =
    (Title | Subjects | TfIdfHigh | NamesWords | Site | SiteAdjacent | UrlPath | UrlDomain).toLong

  /** Flags counted by the priority-tier BM25 "count"
    * (reference Bm25Factor.calculateBm25Prio:41-47). */
  final val PrioBm25Mask: Long =
    (Site | SiteAdjacent | UrlPath | UrlDomain | Subjects).toLong

  /** Flags that gate result disqualification
    * (reference IndexResultValuator.flagsFilterMask:51-52). */
  final val ResultFilterMask: Long =
    (Title | Subjects | UrlDomain | UrlPath).toLong
}
