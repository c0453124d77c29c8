package graft.query

import graft.analysis.Tokenizer

/** Query-language front-end (SURVEY §2.9 Q1-Q5), a combinator-free
  * hand-rolled scanner over the reference's token grammar
  * (/root/reference/code/features-search/query-parser/src/main/java/nu/marginalia/query_parser/QueryTokenizer.java:14-61,
  * QueryParser.java:14-101):
  *
  *   - `"quoted phrase"`  → parts become includes + one coherence constraint;
  *                          on an n-gram index the engine additionally
  *                          requires the joined `a_b` span terms (exact
  *                          adjacency — QueryEngine phrase-span promotion)
  *   - `-term`            → exclude
  *   - `?term`            → priority (scored bonus, not required)
  *   - `key:value`        → advice (required for the match, excluded from
  *                          scoring — QuerySearchTermsAccumulator.java:36-38)
  *   - `q>x` / `q<x`      → quality limit   (GREATER_THAN is >=, LESS_THAN <=,
  *   - `year=x|>x|<x`     → year limit       SpecificationLimit.java:22-32)
  *   - `size>x|<x|=x`     → size limit
  *   - `(grouped terms)`  → advice group (required, unscored)
  *   - `near:repo`        → link-graph neighborhood restriction (self +
  *                          linked domains via the snapshot's
  *                          domain_neighbors table; degrades to the site
  *                          restriction alone when the table is absent)
  *   - `site:repo`        → single-site restriction: the repo's synthetic
  *                          term as advice, per-domain cap raised to 1000,
  *                          `near:` disabled (QueryFactory.java:170-182)
  *   - `qs=RF_TITLE|...`  → query strategy (QueryParser.java:85): RF_* makes
  *                          every include term require that flag
  *   - `rank>x|<x|=x`     → rank limit
  *   - anything else      → include (normalized via the same Tokenizer path
  *                          the index used, so terms hash identically)
  *
  * The reference further expands POS-driven variants/permutations
  * (QueryVariants.java:72-120, ≤24 permutations ≤5 variants). Without a POS
  * model the deterministic subset lives engine-side (QueryEngine Q3
  * expansion, identity variant always first): on n-gram indexes each
  * adjacent include pair spawns a joined-span variant subquery, and every
  * query gains the df-gated dash-combine / num-split / morphological
  * last-word variants (Q3Variants), and — on ngram indexes, behind
  * `QuerySpec.posSegments` — the POS-driven re-segmentation variants
  * (PosSegments, the reference's permuteQueriesNew family with a
  * deterministic tagger standing in for the RDR POS model).
  */
object QueryParser {

  private val limitPat = "(q|year|size|rank)([<>=])(\\d+)".r

  def parse(query: String,
            limitByDomain: Int = 10,
            limitTotal: Int = 10,
            params: RankingParams = RankingParams()): QuerySpec = {
    val include = Seq.newBuilder[String]
    val exclude = Seq.newBuilder[String]
    val priority = Seq.newBuilder[String]
    val advice = Seq.newBuilder[String]
    val coherences = Seq.newBuilder[Seq[String]]
    var year = SpecLimit.none
    var quality = SpecLimit.none
    var size = SpecLimit.none
    var rank = SpecLimit.none
    var strategy = QueryStrategy.Auto
    var nearRepo: Option[String] = None
    var siteDomain = false

    def norm(t: String): String = Tokenizer.normalize(t)

    val toks = tokenize(query)
    toks.foreach {
      case Quoted(body) =>
        val parts = Tokenizer.splitLine(body).map(norm).filter(_.nonEmpty).toSeq
        if (parts.nonEmpty) {
          include ++= parts
          if (parts.size > 1) coherences += parts
        }
      case Plain(t) =>
        t match {
          case limitPat(field, op, v) =>
            val lim = op match {
              case ">" => SpecLimit.greaterThan(v.toInt)
              case "<" => SpecLimit.lessThan(v.toInt)
              case _   => SpecLimit.equalTo(v.toInt)
            }
            field match {
              case "q"    => quality = lim
              case "year" => year = lim
              case "size" => size = lim
              case "rank" => rank = lim
            }
          case _ if t.startsWith("qs=") =>
            // query strategy (QueryParser.java:85): RF_* field requirements,
            // SENTENCE/TOPIC/AUTO pass-throughs
            strategy = QueryStrategy.parse(t.drop(3))
          case _ if t.startsWith("-") && t.length > 1 => exclude += norm(t.drop(1))
          case _ if t.startsWith("?") && t.length > 1 => priority += norm(t.drop(1))
          case _ if t.startsWith("near:") && t.length > 5 =>
            // reference `near:` restricts results to the named site's
            // link-graph neighborhood (QueryParser.java near-dot handling,
            // DbNearDomainsQuery); resolved by the engine against the
            // snapshot's domain_neighbors table — snapshots without one
            // degrade to the site restriction itself (synthetic repo term)
            nearRepo = Some(t.drop(5).toLowerCase)
          case _ if t.startsWith("site:") && t.length > 5 =>
            // reference `site:` is an advice term that also pins the domain
            // (QuerySearchTermsAccumulator.java:95-101): required for the
            // match, excluded from scoring, per-domain result cap raised to
            // 1000 and near-neighborhood resolution disabled
            // (QueryFactory.java:170-182)
            advice += "repo:" + t.drop(5).toLowerCase
            siteDomain = true
          case _ if t.contains(":")                   => advice += norm(t)
          case _ if t.nonEmpty                        => include += norm(t)
          case _                                      =>
        }
      case Paren(body) =>
        // parenthesized terms are advice — required for the match, excluded
        // from scoring (reference QueryParser advice grouping)
        advice ++= Tokenizer.splitLine(body).map(norm).filter(_.nonEmpty)
    }

    QuerySpec(
      subqueries = Seq(Subquery(
        include = include.result().distinct,
        exclude = exclude.result().distinct,
        priority = priority.result().distinct,
        advice = advice.result().distinct,
        coherences = coherences.result())),
      year = year, quality = quality, size = size, rank = rank,
      limitByDomain = if (siteDomain) math.max(limitByDomain, 1000) else limitByDomain,
      limitTotal = limitTotal, params = params,
      strategy = strategy, nearRepo = if (siteDomain) None else nearRepo)
  }

  // ---- scanner -------------------------------------------------------------

  private sealed trait Tok
  private final case class Quoted(body: String) extends Tok
  private final case class Plain(body: String) extends Tok
  private final case class Paren(body: String) extends Tok

  private def tokenize(q: String): Seq[Tok] = {
    val out = Seq.newBuilder[Tok]
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '"') {
        val end = q.indexOf('"', i + 1)
        if (end < 0) { out += Plain(q.substring(i + 1)); i = n }
        else { out += Quoted(q.substring(i + 1, end)); i = end + 1 }
      } else if (c == '(') {
        val end = q.indexOf(')', i + 1)
        if (end < 0) { out += Paren(q.substring(i + 1)); i = n }
        else { out += Paren(q.substring(i + 1, end)); i = end + 1 }
      } else {
        var j = i
        while (j < n && !q.charAt(j).isWhitespace) j += 1
        out += Plain(q.substring(i, j))
        i = j
      }
    }
    out.result()
  }
}
