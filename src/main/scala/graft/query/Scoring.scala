package graft.query

import graft.core.{DocMeta, WordFlags, WordMeta}

/** BM25 tuning pair (reference Bm25Parameters). */
final case class Bm25Params(k: Double, b: Double)

/** Ranking parameters — defaults are the reference's `sensibleDefaults()`
  * (/root/reference/code/api/index-api/.../ResultRankingParameters.java:39-55).
  * NOTE: BASELINE.json's prose says b=0.75 but the reference's actual default
  * is (1.2, 0.5); rank-identity is measured against the reference, so we
  * default to the reference values and take (k, b) as parameters (SURVEY §2.10).
  */
final case class RankingParams(
    fullParams: Bm25Params = Bm25Params(1.2, 0.5),
    prioParams: Bm25Params = Bm25Params(1.5, 0),
    shortDocumentThreshold: Int = 2000,
    shortDocumentPenalty: Double = 2.0,
    domainRankBonus: Double = 1 / 25.0,
    qualityPenalty: Double = 1 / 15.0,
    shortSentenceThreshold: Int = 2,
    shortSentencePenalty: Double = 5.0,
    bm25FullWeight: Double = 1.0,
    bm25PrioWeight: Double = 1.0,
    tcfWeight: Double = 2.0,
    temporalBias: Int = Scoring.TemporalNone,
    temporalBiasWeight: Double = 0.1)

/** Per-(candidate, term) inputs to the valuator. */
final case class TermScoreInput(term: String, termMeta: Long, dfFull: Long, dfPrio: Long)

/** Result-ranking math, transcribed exactly from the reference:
  *  - BM25 full/prio:  Bm25Factor.java:15-79
  *  - term coherence:  TermCoherenceFactor.java:9-31
  *  - priority bonus:  PriorityTermBonus.java:9-18
  *  - document part + normalization: ResultValuator.java:40-147
  * All factors are pure doubles; the engine (mapPartitions kernel) and the
  * driver share this one implementation. The independent test oracle
  * re-derives the same numbers from the formulas without importing this file.
  */
object Scoring {
  final val AvgLength       = 5000.0 // Bm25Factor.AVG_LENGTH
  final val ScalingFactor   = 250.0  // ResultValuator.scalingFactor
  final val MaxYear         = 2027   // PubDate.MAX_YEAR = now().year+1; frozen for determinism
  final val MinYear         = 1995
  final val TemporalNone    = 0
  final val TemporalRecent  = 1
  final val TemporalOld     = 2

  /** idf — Bm25Factor.invFreq:64-79. */
  def invFreq(docCount: Long, freq: Long): Double =
    math.log(1.0 + (docCount - freq + 0.5) / (freq + 0.5))

  /** tf saturation — Bm25Factor.f:71-79. */
  def tfSat(k: Double, b: Double, count: Double, length: Int): Double = {
    val lengthRatio = length / AvgLength
    (count * (k + 1)) / (count + k * (1 - b + b * lengthRatio))
  }

  def bm25Full(p: Bm25Params, terms: Seq[TermScoreInput], length: Int, docCount: Long): Double = {
    val len = if (length <= 0) AvgLength.toInt else length
    terms.iterator.map { t =>
      invFreq(docCount, t.dfFull) * tfSat(p.k, p.b, WordMeta.positionCount(t.termMeta).toDouble, len)
    }.sum
  }

  def bm25Prio(p: Bm25Params, terms: Seq[TermScoreInput], docCount: Long): Double =
    terms.iterator.map { t =>
      val count = java.lang.Long.bitCount(t.termMeta & WordFlags.PrioBm25Mask).toDouble
      invFreq(docCount, t.dfPrio) * tfSat(p.k, 0, count, 0)
    }.sum

  /** (bitCount(AND of all position masks) / 56) ^ 0.25 — TermCoherenceFactor. */
  def termCoherence(terms: Seq[TermScoreInput]): Double = {
    var mask = 0xFF_FFFF_FFFF_FFFFL
    terms.foreach(t => mask &= WordMeta.positions(t.termMeta))
    math.pow(java.lang.Long.bitCount(mask) / 56.0, 0.25)
  }

  /** Document-level additive part — ResultValuator.java:53-88. */
  def overallPart(params: RankingParams, docMeta: Long, length: Int, hasPriorityTerm: Boolean): Double = {
    val rank = DocMeta.rank(docMeta)
    val asl = DocMeta.asl(docMeta)
    val quality = DocMeta.quality(docMeta)
    val topology = DocMeta.topology(docMeta)
    val year = DocMeta.year(docMeta)

    val aslPenalty = if (asl >= params.shortSentenceThreshold) 0.0 else -params.shortSentencePenalty
    val qualityPenalty = -quality * params.qualityPenalty
    val rankingBonus = (255.0 - rank) * params.domainRankBonus
    val topologyBonus = math.log(1.0 + topology)
    val docLengthPenalty = if (length > params.shortDocumentThreshold) 0.0 else -params.shortDocumentPenalty
    val temporalBias = params.temporalBias match {
      case TemporalRecent => -math.abs(year - MaxYear) * params.temporalBiasWeight
      case TemporalOld    => -math.abs(year - MinYear) * params.temporalBiasWeight
      case _              => 0.0
    }
    val prioBonus = if (hasPriorityTerm) 2.0 else 0.0

    aslPenalty + docLengthPenalty + qualityPenalty + rankingBonus + topologyBonus + temporalBias + prioBonus
  }

  /** score = sqrt((1+250)/(1 + max(0,raw)/max(1,setSize))) — LOWER IS BETTER
    * (ResultValuator.normalize:143-147). */
  def normalize(value: Double, setSize: Int): Double = {
    val v = if (value < 0) 0.0 else value
    math.sqrt((1.0 + ScalingFactor) / (1.0 + v / math.max(1.0, setSize.toDouble)))
  }

  /** Full valuation of one candidate for one term set (single subquery) —
    * ResultValuator.calculateSearchResultValue with numberOfSets=1.
    * `terms` must exclude synthetic/`:`-keywords (isKeywordSpecial). */
  def score(params: RankingParams, terms: Seq[TermScoreInput], docMeta: Long,
            length: Int, docCount: Long, hasPriorityTerm: Boolean): Double = {
    var best = 10.0
    val regular = terms.filterNot(t =>
      t.term.contains(":") || WordMeta.hasFlags(t.termMeta, WordFlags.Synthetic.toLong))
    if (regular.nonEmpty) {
      val over = overallPart(params, docMeta, length, hasPriorityTerm)
      val tcf = params.tcfWeight * termCoherence(regular)
      val bm = params.bm25FullWeight * bm25Full(params.fullParams, regular, length, docCount)
      val bmp = params.bm25PrioWeight * bm25Prio(params.prioParams, regular, docCount)
      best = math.min(best, normalize(bm + bmp + tcf + over, regular.length))
    }
    best
  }

  /** Disqualification — IndexResultValuator.calculatePreliminaryScore:98-133:
    * coherence-set overlap 0, or (no flagged terms ∧ not all-synthetic ∧ no
    * positions). `coherences` are lists of term metas per coherence set. */
  def disqualified(terms: Seq[TermScoreInput], coherences: Seq[Seq[Long]]): Boolean = {
    for (set <- coherences) {
      var overlap = 0xFF_FFFF_FFFF_FFFFL
      set.foreach(m => overlap &= WordMeta.positions(m))
      if (overlap == 0L) return true
    }
    var minFlags = 8
    var minPos = 4
    var allSynthetic = terms.nonEmpty
    terms.foreach { t =>
      minFlags = math.min(minFlags, java.lang.Long.bitCount(t.termMeta & WordFlags.ResultFilterMask))
      minPos = math.min(minPos, WordMeta.positionCount(t.termMeta))
      allSynthetic &&= WordMeta.hasFlags(t.termMeta, WordFlags.Synthetic.toLong)
    }
    minFlags == 0 && !allSynthetic && minPos == 0
  }

  /** Upper bound on the raw additive score for WAND pruning: the largest raw
    * value any candidate in a block could reach given per-term max position
    * counts. Must over-estimate, never under-estimate. */
  def rawUpperBound(params: RankingParams, maxPosCounts: Seq[(Long, Long, Int)],
                    docCount: Long): Double = {
    // (dfFull, dfPrio, maxPosCount) per term
    val bm = maxPosCounts.iterator.map { case (df, _, c) =>
      invFreq(docCount, df) * tfSat(params.fullParams.k, params.fullParams.b, c.toDouble, 0)
    }.sum
    val bmp = maxPosCounts.iterator.map { case (_, dfp, _) =>
      invFreq(docCount, dfp) * tfSat(params.prioParams.k, 0, 5.0, 0) // ≤5 prio flags
    }.sum
    val tcfMax = params.tcfWeight * 1.0
    val overMax = 255.0 * params.domainRankBonus + math.log(256.0) + 2.0
    params.bm25FullWeight * bm + params.bm25PrioWeight * bmp + tcfMax + overMax
  }
}
