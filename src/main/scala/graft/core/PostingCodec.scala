package graft.core

/** Compressed posting-block codec.
  *
  * A posting list for one (term, docRange) is stored as a single binary blob:
  *
  * {{{
  *   header:  varint n (posting count)
  *   body:    n × [ varint docIdDelta, varint zigzag(metaDelta) ]
  * }}}
  *
  * Both delta chains RESTART at every 128-posting group boundary (the first
  * entry of a group stores the absolute docId / meta). A side skip index of
  * (firstDocId, byteOffset) per group lets lookups and galloping intersection
  * seek straight to a group and decode only it.
  *
  * DocIds are rank-encoded longs sorted ascending. The reference stores raw
  * longs in static B-trees
  * (/root/reference/code/features-index/index-reverse/.../ReverseIndexFullConverter.java:52-135);
  * delta+varint compression is our design liberty per the north rule, and the
  * skip structure plays the role of the reference's B-tree index layers
  * (/root/reference/code/libraries/btree/src/main/java/nu/marginalia/btree/BTreeReader.java:52-71).
  */
object PostingCodec {
  final val SkipInterval = 128

  /** Decoded posting list: parallel arrays, sorted by docId ascending. */
  final case class Postings(docIds: Array[Long], metas: Array[Long]) {
    def length: Int = docIds.length
  }

  /** Skip entry i: absolute first docId of group i and the byte offset of its
    * first entry within the encoded body. */
  final case class SkipIndex(docIds: Array[Long], offsets: Array[Int])

  // ---- varint primitives ------------------------------------------------

  def writeVarLong(buf: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7FL) != 0L) {
      buf.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    buf.write(v.toInt)
  }

  def zigzag(v: Long): Long   = (v << 1) ^ (v >> 63)
  def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  final class Reader(val bytes: Array[Byte], var pos: Int = 0) {
    def readVarLong(): Long = {
      var shift = 0
      var result = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xFF
        pos += 1
        result |= (b & 0x7FL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      result
    }
  }

  // ---- block encode/decode ----------------------------------------------

  /** Encode sorted (docId, meta) pairs. Returns (blob, skipIndex). */
  def encode(docIds: Array[Long], metas: Array[Long]): (Array[Byte], SkipIndex) = {
    require(docIds.length == metas.length, "parallel arrays must align")
    val out = new java.io.ByteArrayOutputStream(docIds.length * 3 + 8)
    val nSkips = (docIds.length + SkipInterval - 1) / SkipInterval
    val skipDocs = new Array[Long](nSkips)
    val skipOffs = new Array[Int](nSkips)

    writeVarLong(out, docIds.length.toLong)
    var prevDoc = 0L
    var prevMeta = 0L
    var i = 0
    while (i < docIds.length) {
      if (i % SkipInterval == 0) {
        skipDocs(i / SkipInterval) = docIds(i)
        skipOffs(i / SkipInterval) = out.size()
        prevDoc = 0L  // chain restart: group head is stored absolute
        prevMeta = 0L
      }
      writeVarLong(out, docIds(i) - prevDoc)
      writeVarLong(out, zigzag(metas(i) - prevMeta))
      prevDoc = docIds(i)
      prevMeta = metas(i)
      i += 1
    }
    (out.toByteArray, SkipIndex(skipDocs, skipOffs))
  }

  def decode(bytes: Array[Byte]): Postings = {
    val r = new Reader(bytes)
    val n = r.readVarLong().toInt
    val docs = new Array[Long](n)
    val metas = new Array[Long](n)
    var prevDoc = 0L
    var prevMeta = 0L
    var i = 0
    while (i < n) {
      if (i % SkipInterval == 0) { prevDoc = 0L; prevMeta = 0L }
      prevDoc += r.readVarLong()
      prevMeta += unzigzag(r.readVarLong())
      docs(i) = prevDoc
      metas(i) = prevMeta
      i += 1
    }
    Postings(docs, metas)
  }

  /** Posting count without full decode (header read only). */
  def count(bytes: Array[Byte]): Int = new Reader(bytes).readVarLong().toInt

  /** Seek-scan membership: does the list contain docId? Decodes at most one
    * 128-posting group via the skip index (needed where meta 0L is a stored
    * value — the priority tier stores all-zero metas). */
  def containsDoc(bytes: Array[Byte], skip: SkipIndex, docId: Long): Boolean = {
    if (skip.docIds.isEmpty || docId < skip.docIds(0)) return false
    var lo = 0
    var hi = skip.docIds.length - 1
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (skip.docIds(mid) <= docId) lo = mid else hi = mid - 1
    }
    val total = count(bytes)
    val r = new Reader(bytes, skip.offsets(lo))
    val end = math.min(total, (lo + 1) * SkipInterval)
    var prevDoc = 0L
    var i = lo * SkipInterval
    while (i < end) {
      prevDoc += r.readVarLong()
      r.readVarLong() // skip meta delta
      if (prevDoc == docId) return true
      if (prevDoc > docId) return false
      i += 1
    }
    false
  }

  /** Seek-scan: meta for a given docId, decoding at most one 128-posting
    * group. Returns 0L when absent (the reference's hash-map default —
    * IndexMetadataService.TermMetadata.getTermMetadata). */
  def lookup(bytes: Array[Byte], skip: SkipIndex, docId: Long): Long = {
    if (skip.docIds.isEmpty || docId < skip.docIds(0)) return 0L
    // last group whose first docId <= target
    var lo = 0
    var hi = skip.docIds.length - 1
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (skip.docIds(mid) <= docId) lo = mid else hi = mid - 1
    }
    val total = count(bytes)
    val r = new Reader(bytes, skip.offsets(lo))
    val end = math.min(total, (lo + 1) * SkipInterval)
    var prevDoc = 0L
    var prevMeta = 0L
    var i = lo * SkipInterval
    while (i < end) {
      prevDoc += r.readVarLong()
      prevMeta += unzigzag(r.readVarLong())
      if (prevDoc == docId) return prevMeta
      if (prevDoc > docId) return 0L
      i += 1
    }
    0L
  }
}
