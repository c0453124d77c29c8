package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** W1: URL canonicalization — the reference's EdgeUrl / EdgeDomain /
  * QueryParams normalization chain as row-local column expressions:
  *
  *   - protocol lowercased; default ports elided (http:80, https:443,
  *     port < 1 → none) — EdgeUrl.port(), EdgeUrl.java:140-151;
  *   - host lowercased and split into (subdomain, domain) with the
  *     reference's exact quirks — IP literals and dot-less hosts are whole
  *     domains, two-label hosts have no subdomain, and "gov-style" TLDs
  *     (.ac.jp / .co.uk / … — ≥2 dots in the last 7 chars plus the
  *     `\.(ac|co|org|gov|edu|com)\.[a-z]{2}` tail test, EdgeDomain.java:
  *     57-68) pull THREE labels into the domain — EdgeDomain.java:19-55;
  *   - empty path → "/" (EdgeUrl.java:108), fragments dropped;
  *   - query params filtered through the reference's whitelist
  *     (QueryParams.isPermittedParam:48-90, transcribed in its exact
  *     rule order — `.cgi` paths keep everything, `/posting.php` keeps
  *     nothing, `p=`/`f=` are dropped on forum thread pages, …), then
  *     sorted and re-joined; empty → none — QueryParams.java:15-46;
  *   - `canonical` re-renders exactly as EdgeUrl.toString():153-173.
  *
  * The reference's `urlencodeFixer` pre-parse byte repair (EdgeUrl.java:
  * 52-89) is NOT reproduced — it patches malformed crawl bytes before
  * java.net.URI can parse them; this operator canonicalizes well-formed
  * URLs, which is the part with dedup/canonicalization semantics.
  *
  * Scale: every column is a row-local string/regex expression riding the
  * scan inside whole-stage codegen — no UDF, no shuffle, no driver state.
  * This is the canonicalization a crawl-frontier dedup or a URL-keyed
  * exact dedup (d1 family) would key on at 100 TB.
  */
object UrlOps {

  /** The reference's param whitelist, rule order preserved. `path` and `x`
    * (one `k=v` segment) are any string columns. */
  private def isPermittedParam(path: Column, x: Column): Column =
    when(path.endsWith(".cgi"), lit(true))
      .when(path.endsWith("/posting.php"), lit(false))
      .when(x.startsWith("id="), lit(true))
      .when(x.startsWith("p=") || x.startsWith("f="),
        !(path.endsWith("showthread.php") || path.endsWith("viewtopic.php")))
      .when(x.startsWith("i=") || x.startsWith("start=") || x.startsWith("t=") ||
        x.startsWith("v=") || x.startsWith("post="), lit(true))
      .when(path.endsWith("index.php"),
        x.startsWith("showtopic=") || x.startsWith("showforum="))
      .when(path.endsWith("StoryView.py"),
        x.startsWith("project=") || x.startsWith("story="))
      .otherwise(lit(false))

  /** Parse + canonicalize `urlCol`; keeps every other column. Adds proto,
    * host, port (null when elided), subdomain, domain, path, param (null
    * when sanitized away), canonical. */
  def urlCanonical(df: DataFrame, urlCol: String = "url"): DataFrame = {
    val u = col(urlCol)
    val proto = lower(regexp_extract(u, "^([A-Za-z]+)://", 1))
    val authority = regexp_extract(u, "^[A-Za-z]+://([^/?#]*)", 1)
    val host = lower(substring_index(authority, ":", 1))
    // try_cast, not cast: a malformed port (trailing ':', junk digits) must
    // degrade to no-port, not throw under ANSI mode
    val portRaw = when(authority.contains(":"),
      substring_index(authority, ":", -1).try_cast("long"))
    val port = when(portRaw.isNull || portRaw < 1, lit(null).cast("long"))
      .when(proto === "http" && portRaw === 80, lit(null).cast("long"))
      .when(proto === "https" && portRaw === 443, lit(null).cast("long"))
      .otherwise(portRaw)
    val path0 = regexp_extract(u, "^[A-Za-z]+://[^/?#]*([^?#]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    // anchor the query to the FIRST '?' that precedes any '#': a bare
    // `\?([^#]*)` would match a '?' sitting inside the fragment
    val query = regexp_extract(u, "^[^#?]*\\?([^#]*)", 1)
    val parts = filter(split(query, "&"), x => x =!= "")
    val kept = array_sort(filter(parts, x => isPermittedParam(path, x)))
    val joined = array_join(kept, "&")
    val param = when(joined === "", lit(null).cast("string")).otherwise(joined)

    val isIp = length(host) >= 7 &&
      host.rlike("^\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}$")
    val tail7 = substring(host, -7, 7)
    val isGov = length(host) >= 8 &&
      (length(tail7) - length(regexp_replace(tail7, "\\.", ""))) >= 2 &&
      host.rlike("\\.(ac|co|org|gov|edu|com)\\.[a-z]{2}$")
    val nLabels = size(split(host, "\\."))
    val last2 = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val last3 = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    val domain = when(!host.contains(".") || isIp, host)
      .when(nLabels <= 2, host)
      .when(isGov, last3)
      .otherwise(last2)
    // the prefix before ".<domain>" — the reference stores exactly this split
    val subdomain = when(domain === host, lit(""))
      .otherwise(host.substr(lit(1), length(host) - length(domain) - 1))

    df.withColumn("proto", proto)
      .withColumn("host", host)
      .withColumn("port", port)
      .withColumn("domain", domain)
      .withColumn("subdomain", subdomain)
      .withColumn("path", path)
      .withColumn("param", param)
      .withColumn("canonical", concat(
        proto, lit("://"), host,
        when(port.isNull, lit("")).otherwise(concat(lit(":"), port.cast("string"))),
        path,
        when(param.isNull, lit("")).otherwise(concat(lit("?"), param))))
  }

  /** W3: crawl-frontier assembly — the crawl-queue feeding workflow the
    * reference runs across CRAWL_QUEUE + `suggestForCrawling`
    * (DomainInformationService.java:80-82) and EdgeUrl canonical identity,
    * composed from this family's parts: candidate URLs are canonicalized
    * ([[urlCanonical]]), deduped to one min-doc_id representative per
    * canonical ([[graft.ops.DedupOps.urlDedup]]), and joined against the
    * domain profile ([[graft.ops.AdjacencyOps.domainProfile]]); each
    * frontier row carries the rendered domain rank as its crawl priority
    * (unknown domains — no pages, no links — flag `new_domain` and sort
    * last at priority −1, the "suggest for crawling" arm).
    *
    * `candidates`: (doc_id, url, domain_id); `docsByDomain`/`links`: as
    * [[graft.ops.AdjacencyOps.domainProfile]].
    *
    * Scale: canonicalization rides the scan; the dedup is one
    * hash-aggregate + AQE join-back; the profile is one-row-per-domain and
    * broadcasts onto the frontier join. No window touches the candidate
    * set — the global priority order is the consumer's `orderBy` over
    * (priority, canonical), a TakeOrderedAndProject under any `limit`. */
  def crawlFrontier(candidates: DataFrame, docsByDomain: DataFrame,
                    links: DataFrame, iters: Int): DataFrame = {
    val kept = graft.ops.DedupOps.urlDedup(candidates.select("doc_id", "url"))
      .where(col("keep"))
      .join(candidates.select("doc_id", "domain_id"), "doc_id")
    val profile = graft.ops.AdjacencyOps.domainProfile(docsByDomain, links, iters)
    kept.join(profile, Seq("domain_id"), "left")
      .select(col("doc_id"), col("canonical"), col("domain_id"),
        coalesce(col("pages_known"), lit(0L)).as("pages_known"),
        col("ranking"),
        (coalesce(col("pages_known"), lit(0L)) === 0L).as("new_domain"),
        coalesce(col("ranking"), lit(-1.0)).as("priority"))
      .orderBy(col("priority").desc, col("canonical"))
  }
}
