package graft

import graft.ops.UrlOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz parity for URL canonicalization: 500 seeded URLs are ASSEMBLED from
  * known components, so the expected output of every stage (case folding,
  * port elision, path defaulting, param whitelist + sort, domain split,
  * canonical rendering) is computable directly from the components by a
  * plain-Scala transcription of the reference logic (EdgeUrl.java:140-173,
  * EdgeDomain.java:19-68, QueryParams.java:15-90) — no URI parser in the
  * twin, so the test exercises BOTH the column parse and the normalization.
  */
class UrlFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-url-fuzz")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private case class Parts(proto: String, user: String, host: String,
                           port: Option[Int], path: String,
                           params: Seq[String], frag: String)

  private val protos = Seq("http", "HTTPS", "HtTp", "ftp", "https")
  private val hosts = Seq(
    "WWW.Example.COM", "www.example.com", "forum.example.co.uk", "uj.edu.pl",
    "a.b.site.ac.jp", "x.y.z.deep.example.org", "192.168.1.10", "10.0.0.1",
    "localhost", "EXAMPLE.com", "l7072i3.l7c.net", "endless.horse",
    "www.marginalia.abcf.de", "site.gov.uk", "e.com")
  private val paths = Seq(
    "", "/", "/a", "/forum/viewtopic.php", "/forum/showthread.php",
    "/forum/posting.php", "/index.php", "/cgi-bin/run.cgi",
    "/wiki/StoryView.py", "/deep/path/page.html")
  private val paramPool = Seq(
    "id=1", "p=22", "f=3", "i=4", "start=50", "t=6", "v=7", "post=8",
    "showtopic=9", "showforum=10", "project=x", "story=y",
    "utm_source=feed", "junk=1", "m=0", "follow=a")
  // "#sec?9" locks the query anchor: a '?' INSIDE the fragment must not be
  // parsed as a query string
  private val frags = Seq("", "#top", "#sec2", "#sec?9")

  // userinfo must be stripped before the host/port split (URI.getHost())
  private val users = Seq("", "", "", "bob@", "user:pass@")

  private def gen(rng: scala.util.Random): Parts = Parts(
    protos(rng.nextInt(protos.length)),
    users(rng.nextInt(users.length)),
    hosts(rng.nextInt(hosts.length)),
    rng.nextInt(5) match {
      case 0 => Some(80)
      case 1 => Some(443)
      case 2 => Some(8080)
      case _ => None
    },
    paths(rng.nextInt(paths.length)),
    Seq.fill(rng.nextInt(4))(paramPool(rng.nextInt(paramPool.length))),
    frags(rng.nextInt(frags.length)))

  private def raw(p: Parts): String =
    p.proto + "://" + p.user + p.host + p.port.map(":" + _).getOrElse("") + p.path +
      (if (p.params.nonEmpty) "?" + p.params.mkString("&") else "") + p.frag

  // --- plain-Scala transcription of the reference normalization ------------

  private def permitted(path: String, x: String): Boolean =
    if (path.endsWith(".cgi")) true
    else if (path.endsWith("/posting.php")) false
    else if (x.startsWith("id=")) true
    else if (x.startsWith("p=") || x.startsWith("f="))
      !(path.endsWith("showthread.php") || path.endsWith("viewtopic.php"))
    else if (x.startsWith("i=") || x.startsWith("start=") ||
      x.startsWith("t=") || x.startsWith("v=") || x.startsWith("post=")) true
    else if (path.endsWith("index.php"))
      x.startsWith("showtopic=") || x.startsWith("showforum=")
    else if (path.endsWith("StoryView.py"))
      x.startsWith("project=") || x.startsWith("story=")
    else false

  private def expected(p: Parts): (String, String, Option[Long], String, String, Option[String], String) = {
    val proto = p.proto.toLowerCase
    val host = p.host.toLowerCase
    val port: Option[Long] = p.port match {
      case Some(x) if x < 1 => None
      case Some(80) if proto == "http" => None
      case Some(443) if proto == "https" => None
      case o => o.map(_.toLong)
    }
    val path = if (p.path.isEmpty) "/" else p.path
    val kept = p.params.filter(_.nonEmpty).filter(permitted(path, _)).sorted
    val param = if (kept.isEmpty) None else Some(kept.mkString("&"))
    // EdgeDomain split
    val isIp = host.length >= 7 &&
      host.matches("\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}")
    val tail7 = if (host.length >= 7) host.substring(host.length - 7) else host
    val isGov = host.length >= 8 && tail7.count(_ == '.') >= 2 &&
      host.matches(".*\\.(ac|co|org|gov|edu|com)\\.[a-z]{2}")
    val labels = host.split('.')
    val domain =
      if (!host.contains('.') || isIp) host
      else if (labels.length <= 2) host
      else if (isGov) labels.takeRight(3).mkString(".")
      else labels.takeRight(2).mkString(".")
    val sub = if (domain == host) ""
      else host.substring(0, host.length - domain.length - 1)
    val canonical = proto + "://" + host + port.map(":" + _).getOrElse("") +
      path + param.map("?" + _).getOrElse("")
    (proto, host, port, sub, domain, param, canonical)
  }

  test("500 seeded URLs: column canonicalization equals the component-wise twin") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val cases = (0 until 500).map(i => (i.toLong, gen(rng)))
    val df = UrlOps.urlCanonical(
      cases.map { case (i, p) => (i, raw(p)) }.toDF("doc_id", "url"))
    val got = df.collect().map { r =>
      r.getAs[Long]("doc_id") -> ((
        r.getAs[String]("proto"), r.getAs[String]("host"),
        Option(r.getAs[Any]("port")).map(_.asInstanceOf[Long]),
        r.getAs[String]("subdomain"), r.getAs[String]("domain"),
        Option(r.getAs[String]("param")), r.getAs[String]("canonical")))
    }.toMap
    cases.foreach { case (i, p) =>
      assert(got(i) === expected(p), s"case $i: ${raw(p)}")
    }
  }
}
