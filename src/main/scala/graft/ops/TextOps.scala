package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Phase-2 output of [[TextOps.packChunks]]: a doc placed at its stream
  * offset. Top-level so the Dataset encoder stays codegen-compatible
  * (nested private case classes force interpreted fallback). */
private[graft] case class PackedDoc(lang: String, doc_id: Long, start: Long, n: Long)

/** Relational text-analysis operators over a `documents(doc_id, text, lang,
  * source, n_chars)` table — the tokenize → tf → df → TF-IDF → BM25 chain of
  * the index pipeline (SURVEY §2.4 A1/A4/A5, §2.7 C6) expressed declaratively
  * so Catalyst owns the physical plan, plus language-ID / quality / token
  * statistics / fingerprinting for training-data curation.
  *
  * Every operator here is DuckDB-oracle-checkable: the math sticks to
  * engine-portable primitives (md5-derived 30-bit hashes, explicit double
  * literals, deterministic ORDER BY).
  *
  * Scale notes: tokenization is a narrow map (no shuffle); tf/df are
  * map-side-combined hash aggregations keyed by (doc,term) / term; at 100 TB
  * the only wide exchanges are those aggregations, which partition evenly
  * because term skew is bounded by the per-doc dedup of `df`.
  */
object TextOps {

  /** Portable 60-bit hash: identical in Spark and DuckDB.
    * Spark: conv(substring(md5(s),1,15),16,10)  ≡  DuckDB: ('0x'||substring(md5(s),1,15))::BIGINT */
  def h60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 30-bit variant — small enough that products with ≤2^20 multipliers never
    * overflow a signed 64-bit int (DuckDB errors on overflow; Spark wraps). */
  def h30(c: Column): Column = h60(c) % 1073741824L

  /** One row per non-empty whitespace token. */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .where(col("term") =!= "")

  /** Tokens with 1-based position `i` over the RAW split array (empty tokens
    * hold their position — mirrors DuckDB `toks[i]`). */
  def tokensPos(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos0", "term")))
      .withColumn("i", col("pos0") + 1).drop("pos0")

  /** A4: per-(doc, term) frequency. */
  def termTf(docs: DataFrame): DataFrame =
    tokens(docs).groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** A1/A6: document frequency per term. */
  def termDf(docs: DataFrame): DataFrame =
    termTf(docs).groupBy("term").agg(count(lit(1)).as("df"))

  /** Doc length in non-empty tokens. */
  def docLen(docs: DataFrame): DataFrame =
    tokens(docs).groupBy("doc_id").agg(count(lit(1)).as("dl"))

  /** A5: reference TF-IDF shape (WordsTfIdfCounts.java:113-137):
    * (0.1 + 0.9·tf/maxTf) · ln(N/df). */
  def tfidf(docs: DataFrame): DataFrame = {
    val n = docs.select(count(lit(1)).as("n"))
    val tf = termTf(docs)
    val maxTf = tf.groupBy("doc_id").agg(max("tf").as("max_tf"))
    tf.join(maxTf, "doc_id")
      .join(termDf(docs), "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(
        expr("(0.1D + 0.9D * tf / max_tf) * ln(cast(n as double) / df)"), 5))
      .select("doc_id", "term", "tf", "tfidf")
  }

  final val Bm25K = 1.2
  final val Bm25B = 0.75
  final val AvgDl = 20.0 // fixed norm constant for the relational surface

  /** C6/R1 composition form: unsorted BM25 scores of `queryTerms` over every
    * matching doc — (doc_id, score) with NO global sort or limit, so callers
    * that join/combine scores (disjunctions, stratified rankings) don't drag
    * a full corpus sort below their join; only the outermost top-k should
    * order. Classic BM25 with (k1=1.2, b=0.75) per the north_star's stated
    * relational parameters; the snapshot engine (graft.query.Scoring) keeps
    * the reference's own (1.2, 0.5) chain for rank-identity. */
  def bm25Scores(docs: DataFrame, queryTerms: Seq[String],
                 extraFilter: Column = lit(true)): DataFrame = {
    val base = docs.where(extraFilter)
    val n = base.select(count(lit(1)).as("n"))
    val tf = termTf(base).where(col("term").isin(queryTerms: _*))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "term")
      .join(docLen(base), "doc_id")
      .crossJoin(broadcast(n))
      .withColumn("s", expr(
        s"ln(1D + (cast(n as double) - df + 0.5D) / (df + 0.5D))" +
          s" * (tf * (${Bm25K}D + 1D)) / (tf + ${Bm25K}D * (1D - ${Bm25B}D + ${Bm25B}D * dl / ${AvgDl}D))"))
      .groupBy("doc_id").agg(round(sum(col("s")), 4).as("score"))
  }

  /** BM25 top-k: [[bm25Scores]] + the one global ordered truncation. */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int,
               extraFilter: Column = lit(true)): DataFrame =
    bm25Scores(docs, queryTerms, extraFilter)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)

  /** Oracle-SQL body shared by the BM25-family queries (DuckDB dialect). */
  def bm25OracleSql(terms: Seq[String], k: Int, where: String = "TRUE"): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH base AS (SELECT * FROM documents WHERE $where),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM base),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok WHERE term <> '' AND term IN ($inList) GROUP BY doc_id, term),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok WHERE term <> '' GROUP BY doc_id),
       |n AS (SELECT count(*) AS n FROM base)
       |SELECT doc_id, round(sum(ln(1 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5))
       |  * (tf * (CAST(${Bm25K} AS DOUBLE) + 1)) / (tf + CAST(${Bm25K} AS DOUBLE) * (1 - CAST(${Bm25B} AS DOUBLE) + CAST(${Bm25B} AS DOUBLE) * dl / CAST(${AvgDl} AS DOUBLE)))), 4) AS score
       |FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN n
       |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  /** Q7/J1-J2 relational form: docs containing ALL of `include` and NONE of
    * `exclude`, BM25-scored over the includes (conjunction = semi joins,
    * exclusion = anti join — the posting-intersection semantics of
    * BTreeReader.retainEntries/rejectEntries at DataFrame level). */
  def conjunctiveQuery(docs: DataFrame, include: Seq[String], exclude: Seq[String], k: Int): DataFrame = {
    val toks = tokens(docs)
    val matching = include.map(t => toks.where(col("term") === t).select("doc_id").distinct())
      .reduce((a, b) => a.join(b, Seq("doc_id"), "left_semi"))
    val excluded = exclude.foldLeft(matching) { (acc, t) =>
      acc.join(toks.where(col("term") === t).select("doc_id").distinct(), Seq("doc_id"), "left_anti")
    }
    bm25Scores(docs, include)
      .join(excluded, Seq("doc_id"), "left_semi")
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Phrase match via positions: docs where `w1` is immediately followed by
    * `w2` (the coherence/position-mask analog, SURVEY §2.10 R3 / K4).
    * Row-local `exists` over the split array — token adjacency never leaves
    * the row, so the scan is a pure filter with zero shuffle (round 1 pushed
    * every token position through a per-doc window `lead`). Assumes doc_id
    * is unique in `docs` (it is the documents table's key). */
  def phraseMatch(docs: DataFrame, w1: String, w2: String): DataFrame = {
    // adjacency via zip_with over the bound array and its tail — the array
    // is tokenized once per row; an element_at(split(...), i) lambda would
    // re-split the document per element after Catalyst inlines the
    // projection (O(n²))
    val toks = col("toks")
    val hit = exists(
      zip_with(toks, slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => a === w1 && b === w2),
      x => x)
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(hit)
      .select("doc_id").orderBy("doc_id")
  }

  /** T1: stopword-ratio language ID (n-gram-heuristic analog). */
  final val EnStopwords = Seq("the", "a", "of", "and", "is")
  def langId(docs: DataFrame): DataFrame = {
    val stops = EnStopwords
    tokens(docs)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tok"),
        sum(when(col("term").isin(stops: _*), 1L).otherwise(0L)).as("n_stop"))
      .withColumn("en_ratio", round(expr("n_stop / cast(n_tok as double)"), 6))
      .withColumn("pred_lang", when(expr("n_stop / cast(n_tok as double)") > 0.02, "en").otherwise("und"))
      .select("doc_id", "pred_lang", "en_ratio")
      .orderBy("doc_id")
  }

  /** T2: quality scoring from length / stopword / token-shape ratios
    * (DocumentValuator.java:16-48 analog for plain text). */
  def quality(docs: DataFrame): DataFrame =
    tokens(docs)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tok"),
        sum(length(col("term"))).as("sum_len"),
        sum(when(col("term").isin(EnStopwords: _*), 1L).otherwise(0L)).as("n_stop"))
      .join(docs.select("doc_id", "n_chars"), "doc_id")
      .withColumn("avg_tok_len", round(expr("sum_len / cast(n_tok as double)"), 6))
      .withColumn("stop_ratio", round(expr("n_stop / cast(n_tok as double)"), 6))
      .withColumn("quality", round(expr(
        "0.5D * (n_stop / cast(n_tok as double))" +
          " + 0.3D * least(cast(1.0 as double), n_tok / cast(100.0 as double))" +
          " + (CASE WHEN sum_len / cast(n_tok as double) BETWEEN 3 AND 8 THEN 0.2D ELSE 0D END)"), 6))
      .select("doc_id", "n_tok", "avg_tok_len", "stop_ratio", "quality")
      .orderBy("doc_id")

  /** T3: token counting — whitespace tokens, distinct terms, regex word runs
    * (the BPE-ish pre-token count). */
  def tokenStats(docs: DataFrame): DataFrame =
    tokens(docs).groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), countDistinct(col("term")).as("n_distinct"))
      .join(docs.select(col("doc_id"),
        regexp_count(col("text"), lit("[a-z0-9]+")).cast("long").as("n_runs")), "doc_id")
      .select("doc_id", "n_tok", "n_distinct", "n_runs")
      .orderBy("doc_id")

  /** T4: positional rolling-hash document fingerprint:
    * Σ h30(term)·((i mod 64)+1)  mod  2^31−1  over non-empty positions. */
  def fingerprint(docs: DataFrame): DataFrame =
    tokensPos(docs).where(col("term") =!= "")
      .withColumn("h", h30(col("term")))
      .groupBy("doc_id")
      .agg((sum(col("h") * (col("i") % 64 + 1)) % 2147483647L).as("fp"))
      .select("doc_id", "fp")
      .orderBy("doc_id")

  /** n-gram array over the raw split, built row-locally (same
    * projection-collapse discipline as DedupOps.shingles: `toks` is bound to
    * a column first, adjacency never leaves the row, zero shuffle). Position
    * i covers toks(i..i+n-1), 1-based, joined with '_'. */
  private[graft] def gramArray(toks: Column, n: Int): Column =
    when(size(toks) >= n, transform(sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws("_", (0 until n).map(k => element_at(toks, i + k)): _*)))
      .otherwise(array().cast("array<string>"))

  /** T5: within-document repetition signals, the Gopher/MassiveText
    * repetition filters (Rae et al. 2021, "Scaling Language Models", table A1)
    * over whitespace tokens:
    *   top1_frac — occurrences of the most frequent unigram / total tokens,
    *   top2_frac — occurrences of the most frequent 2-gram / total 2-grams,
    *   dup3_frac — fraction of 3-gram positions whose 3-gram repeats in-doc.
    *
    * One generator pass per gram order unioned BEFORE the aggregation, so the
    * whole operator is exactly two map-side-combined hash aggregates keyed by
    * doc — at 100 TB the exchanges carry (doc, n, gram, count) partials and
    * per-(doc, n) summaries, never raw token streams. */
  def repetition(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val exploded = (1 to 3).map(n =>
        base.select(col("doc_id"), lit(n).as("n"), explode(gramArray(col("toks"), n)).as("gram")))
      .reduce(_ unionAll _)
    val counted = exploded.groupBy("doc_id", "n", "gram").agg(count(lit(1)).as("c"))
    val perN = counted.groupBy("doc_id", "n").agg(
      max("c").as("m"), sum("c").as("tot"),
      sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup"))
    perN.groupBy("doc_id").agg(
      max(when(col("n") === 1, col("tot"))).as("n_tok"),
      round(max(when(col("n") === 1, col("m").cast("double") / col("tot").cast("double"))), 6).as("top1_frac"),
      round(max(when(col("n") === 2, col("m").cast("double") / col("tot").cast("double"))), 6).as("top2_frac"),
      round(max(when(col("n") === 3, col("dup").cast("double") / col("tot").cast("double"))), 6).as("dup3_frac"))
      .orderBy("doc_id")
  }

  /** T6: deterministic hash-based stratified sampling — the data-mixing
    * primitive of corpus curation (per-language keep rates, reproducible
    * across runs and engines because the sampling key is md5(doc_id), not an
    * RNG). Pure narrow filter: no shuffle, trivially scales, and at 100 TB
    * the same predicate pushes into the scan. `rates` maps lang → percent
    * kept (0-100); `default` covers unlisted languages. */
  def sampleStratified(docs: DataFrame, rates: Map[String, Int], default: Int): DataFrame = {
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(default)) {
      case (acc, (l, r)) => when(col("lang") === l, lit(r)).otherwise(acc)
    }
    docs.where(h60(col("doc_id").cast("string")) % 100L < rate)
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** T12: temperature-flattened mixture sampling — the multilingual-LM
    * rebalancing step (exponentiated smoothing, XLM §3.1 style): the target
    * share of group g is q_g ∝ n_g^α, which flattens the group distribution
    * for α < 1 (tail languages upsampled relative to their share), realized
    * as per-group keep-rates r_g = min(1, q_g · f · N / n_g) applied through
    * the SAME deterministic md5 gate as [[sampleStratified]] — the sample is
    * reproducible row-by-row and oracle-checkable, never rand()-dependent.
    *
    * Scale shape: everything before the filter is a #groups-sized aggregate
    * (one row per language) broadcast back onto the scan; the corpus itself
    * never shuffles and the gate is a pushable row-local predicate. */
  def temperatureSample(docs: DataFrame, alpha: Double, targetFrac: Double): DataFrame = {
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_g"))
    val tot = counts.agg(sum("n_g").as("n_total"), sum(pow(col("n_g"), lit(alpha))).as("z"))
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("rate", least(lit(1.0),
        (pow(col("n_g"), lit(alpha)) / col("z")) * lit(targetFrac) * col("n_total") / col("n_g")))
      .select("lang", "rate")
    docs.join(broadcast(rates), "lang")
      .where(h60(col("doc_id").cast("string")) % 10000L < col("rate") * lit(10000.0))
      .select(col("doc_id"), col("lang"), round(col("rate"), 6).as("rate"))
      .orderBy("doc_id")
  }

  /** T7: token-budget sequence packing — the "concatenate and chunk into
    * fixed-length training sequences" step of LLM pretraining (each language
    * is one deterministic document stream ordered by doc_id; chunk c covers
    * stream tokens [c·budget, (c+1)·budget)). Emits one row per
    * (doc, chunk) intersection with the token count the doc contributes, so
    * a doc spanning a boundary appears in both chunks.
    *
    * The stream offset is a per-language prefix sum. A
    * `Window.partitionBy(lang)` would sort EACH LANGUAGE INTO ONE TASK — at
    * 100 TB the dominant language is most of the corpus, so that window is a
    * single-machine sort. Instead: two-phase distributed prefix sum over a
    * slim (lang, doc_id, n) projection — range-repartition by (lang, doc_id)
    * keeps the sort distributed; phase 1 collects one (partition, lang,
    * token-total) row per partition×language (bounded by the shuffle
    * partition count, NOT the corpus); phase 2 re-walks each sorted
    * partition with its language's broadcast base offsets. The projection is
    * persisted between phases so both walk the SAME partitioning. */
  def packChunks(docs: DataFrame, budget: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sorted = docs
      .select(col("lang"), col("doc_id").cast("long").as("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .repartitionByRange(col("lang"), col("doc_id"))
      .sortWithinPartitions("lang", "doc_id")
      .select(spark_partition_id().as("pid"), col("lang"), col("doc_id"), col("n"))
      .as[(Int, String, Long, Long)]
      .persist()
    try {
      // phase 1: per-(partition, lang) token totals → per-(partition, lang)
      // base offset = totals of the same lang in earlier partitions. Range
      // partitioning guarantees earlier pid ⇒ earlier (lang, doc_id) keys.
      val totals = sorted.groupBy($"pid", $"lang").agg(sum($"n").as("t"))
        .as[(Int, String, Long)].collect().sortBy(_._1)
      val baseOffset: Map[(Int, String), Long] = {
        val run = scala.collection.mutable.Map.empty[String, Long]
        totals.map { case (pid, lang, t) =>
          val off = run.getOrElse(lang, 0L)
          run(lang) = off + t
          (pid, lang) -> off
        }.toMap
      }
      val bOff = spark.sparkContext.broadcast(baseOffset)
      // phase 2: walk each sorted partition once, carrying a running offset
      // per language seeded from the broadcast bases
      val placed = sorted.mapPartitions { it =>
        val run = scala.collection.mutable.Map.empty[String, Long]
        it.map { case (pid, lang, docId, n) =>
          val start = run.getOrElse(lang, bOff.value.getOrElse((pid, lang), 0L))
          run(lang) = start + n
          PackedDoc(lang, docId, start, n)
        }
      }.toDF()
      placed
        .select(col("lang"), col("doc_id"), col("start"), col("n"),
          explode(sequence(expr(s"start div ${budget}L"),
            expr(s"(start + n - 1) div ${budget}L"))).as("chunk"))
        .select(col("lang"), col("doc_id"), col("chunk"),
          (least(col("start") + col("n"), (col("chunk") + 1) * budget)
            - greatest(col("start"), col("chunk") * budget)).as("toks"))
        .orderBy("lang", "doc_id", "chunk")
    } finally sorted.unpersist()
  }

  /** DuckDB oracle for [[packChunks]] — the single-node window form of the
    * same math (fine at oracle scale; the Spark side exists precisely
    * because this window doesn't distribute). */
  def packChunksOracleSql(budget: Long): String =
    s"""WITH t AS (
       |  SELECT lang, CAST(doc_id AS BIGINT) AS doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
       |         CAST(coalesce(sum(len(string_split(text, ' '))) OVER (
       |           PARTITION BY lang ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
       |  FROM documents)
       |SELECT lang, doc_id, chunk,
       |       least(start + n, (chunk + 1) * $budget) - greatest(start, chunk * $budget) AS toks
       |FROM (SELECT lang, doc_id, n, start,
       |        unnest(generate_series(start // $budget, (start + n - 1) // $budget)) AS chunk
       |      FROM t) u
       |ORDER BY lang, doc_id, chunk""".stripMargin

  /** PII patterns for [[piiScrub]] — RE2-compatible (no lookaround, no
    * backreferences) so Spark's java.util.regex and DuckDB's RE2 agree on
    * every match. Email before IP before phone: an email can contain
    * digits-and-dots that the later patterns would otherwise bite into. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re  = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** T8: PII scrubbing — the redaction pass every public-web training
    * pipeline runs before tokenization (emails, IPv4 addresses, phone-shaped
    * numbers → typed placeholders). Pure narrow map: three codegen'd
    * `regexp_replace`/`regexp_count` passes per row, no shuffle, no UDF —
    * at 100 TB it rides the scan. Emits per-kind redaction counts plus the
    * md5 of the scrubbed text so an oracle can verify the rewrite without
    * hauling full documents through the comparison. */
  def piiScrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, Ipv4Re, "<IP>")
    val t3 = regexp_replace(t2, PhoneRe, "<PHONE>")
    docs.select(
        col("doc_id"),
        regexp_count(t0, lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(t1, lit(Ipv4Re)).cast("long").as("n_ips"),
        regexp_count(t2, lit(PhoneRe)).cast("long").as("n_phones"),
        md5(t3).as("clean_md5"))
      .orderBy("doc_id")
  }

  /** T9: weighted-lexicon topic scorer — transcription of the reference's
    * topic detectors (features-convert/topic-detection/.../
    * TextileCraftDetector.java:125-148; RecipeDetector and
    * WoodworkingDetector share the identical testP shape): each matched
    * lexicon term accumulates its weight with geometric saturation over
    * repeats — the reference folds occurrences with `merge(old, v) =
    * 0.5·old + v`, whose closed form after tf occurrences is
    * `v·(2 − 2^(1−tf))` — and the per-doc sum is damped by
    * `lengthPenalty = sqrt(AVG)/sqrt(max(AVG, n_tok))`, AVG_LENGTH = 1000
    * (TextileCraftDetector.java:14,144-147). The reference Porter-stems both
    * sides; pass a pre-stemmed lexicon and `stem = true` to match (the
    * driver-oracle path runs unstemmed — the fixture vocabulary is already
    * in base form, and DuckDB has no Porter).
    * Scale: the lexicon broadcasts (it is tiny by construction), the match
    * is a narrow semi-join riding the token scan, and the only exchanges
    * carry (doc, term, tf) partials for matched terms plus per-doc lengths —
    * never raw token streams. */
  def topicScore(docs: DataFrame, lexicon: Map[String, Double],
                 avgLength: Int = 1000, stem: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lex = broadcast(lexicon.toSeq.sortBy(_._1).toDF("term", "v"))
    val toks0 = tokens(docs)
    val toks =
      if (!stem) toks0
      else toks0.withColumn("term", graft.functions.GraftFunctions.stem(col("term")))
    val matched = toks.join(lex, "term")
      .groupBy("doc_id", "term", "v").agg(count(lit(1)).as("tf"))
      .groupBy("doc_id")
      .agg(sum(col("v") * (lit(2.0) - pow(lit(2.0), lit(1.0) - col("tf")))).as("raw"))
    docs.select(col("doc_id"))
      .join(docLen(docs), Seq("doc_id"), "left")
      .join(matched, Seq("doc_id"), "left")
      .select(col("doc_id"),
        // +1e-9 nudge before round: achievable scores (weight grid × the
        // dyadic saturation factor) land EXACTLY on 6th-decimal midpoints,
        // where Spark's BigDecimal HALF_UP and DuckDB's scaled-double round
        // disagree on the binary representation. The nudge moves every
        // midpoint 1e-9 off-center — 7 orders above sum-order ulp noise,
        // 4 below the score grid — so both engines round identically.
        round(coalesce(col("raw"), lit(0.0)) *
          sqrt(lit(avgLength.toDouble)) /
          sqrt(greatest(lit(avgLength.toDouble), coalesce(col("dl"), lit(0L)).cast("double")))
          + lit(1e-9),
          6).as("topic_score"))
      .orderBy("doc_id")
  }

  /** T11: publication-date sniffing — transcription of the reference's
    * PubDateParser.attemptParseDate chain (features-convert/pubdate/.../
    * PubDateParser.java:19-27,53-82,125-134):
    *   1. length gate: 4 ≤ len < 32 (:20);
    *   2. ISO-8601: date, then date-time, then zoned date-time (:155-160);
    *   3. RFC-1123 (:163-166);
    *   4. otherwise the highest-year-looking-substring heuristic (:53-82):
    *      all non-overlapping \d{4} runs, kept if in [minYear, maxYear];
    *      several DISTINCT valid years → the (min+max)/2 integer-division
    *      guess (guessYear:136-138); exactly one → that year; none → null;
    *   5. final validateDate range check [minYear, maxYear] (:186-188) —
    *      an ISO-parsed out-of-range year nulls out here.
    * Reference MIN_YEAR = 1995, MAX_YEAR = currentYear+1 (PubDate.java:12-15)
    * — maxYear is a parameter with a FIXED default so results stay
    * deterministic across runs. The DOM/OpenGraph/JSON-LD heuristics need
    * HTML; this is the text/attribute-level core every one of them funnels
    * into (each heuristic ends in attemptParseDate).
    * Scale: pure per-row expression chain (codegen'd try_to_timestamp +
    * regexp), no shuffle, rides the scan. */
  def pubDateYear(docs: DataFrame, dateCol: String,
                  minYear: Int = 1995, maxYear: Int = 2027): DataFrame = {
    val s0 = col(dateCol)
    val s = when(length(s0) >= 4 && length(s0) < 32, s0)
    val iso   = try_to_timestamp(s, lit("yyyy-MM-dd"))
    val isoDt = try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ss"))
    val isoZ  = try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ssXXX"))
    // RFC-1123: Spark's CORRECTED parser rejects 'EEE' as a PARSE pattern
    // (DATETIME_PATTERN_RECOGNITION), so the day-of-week prefix is stripped
    // textually first — it is redundant with the date anyway.
    val rfc   = try_to_timestamp(
      regexp_replace(s, "^[A-Za-z]{3}, ", ""), lit("dd MMM yyyy HH:mm:ss zzz"))
    val yrs = filter(
      transform(regexp_extract_all(s, lit("\\d{4}"), lit(0)),
        y => y.cast("int")),
      y => y >= minYear && y <= maxYear)
    val mn = array_min(yrs)
    val mx = array_max(yrs)
    val raw = when(iso.isNotNull, year(iso))
      .when(isoDt.isNotNull, year(isoDt))
      .when(isoZ.isNotNull, year(isoZ))
      .when(rfc.isNotNull, year(rfc))
      .when(mx.isNotNull && mn =!= mx, ((mn + mx) / 2).cast("int"))
      .when(mx.isNotNull, mx)
    docs.select(col("doc_id"),
        when(raw >= minYear && raw <= maxYear, raw).as("pub_year"))
      .orderBy("doc_id")
  }

  /** T13: Naive-Bayes "reference vs crawl" document classifier — the
    * quality-filter shape of CCNet (Wenzek et al. 2020 §4.4) and the GPT-3
    * data pipeline (Brown et al. 2020 appendix A): train a linear
    * bag-of-words classifier with the target corpus as the positive class
    * and the rest as negative, then score every document by the summed
    * per-token log-likelihood ratio plus the class-prior log-odds:
    *   score(doc) = ln(n⁺/n⁻) + Σ_tokens tf · [ln P̂(t|+) − ln P̂(t|−)],
    * with add-1 (Laplace) smoothing over the corpus vocabulary V:
    * P̂(t|c) = (cnt_c(t)+1)/(tot_c+|V|). Training and scoring are one job —
    * the model IS the per-term count table.
    *
    * Scale: token expansion is narrow; the model is a vocabulary-keyed
    * aggregate with map-side combine (term skew bounded by per-doc tf
    * pre-aggregation); scoring joins the (doc,term,tf) stream with the
    * model ON TERM — vocabulary at web scale is too large to broadcast, so
    * the join stays an unhinted shuffle join that AQE sizes; per-doc sums
    * are one combined agg keyed by doc. The corpus text never shuffles. */
  def nbClassify(docs: DataFrame, targetFilter: Column): DataFrame = {
    val base = docs.select(col("doc_id"), targetFilter.as("is_t"), col("text"))
    val toks = base.select(col("doc_id"), col("is_t"),
      explode(split(col("text"), " ")).as("term")).where(col("term") =!= "")
    val cnt = toks.groupBy("term").agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("is_t"), 0L).otherwise(1L)).as("co"))
    val tot = cnt.agg(sum("ct").as("t"), sum("co").as("o"), count(lit(1)).as("v"))
    val prior = base.agg(
      (log(sum(when(col("is_t"), 1L).otherwise(0L)).cast("double"))
        - log(sum(when(col("is_t"), 0L).otherwise(1L)).cast("double"))).as("prior"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val raw = tf.join(cnt, "term").crossJoin(broadcast(tot))
      .withColumn("llr", col("tf") * (
        log((col("ct") + 1).cast("double") / (col("t") + col("v")).cast("double"))
          - log((col("co") + 1).cast("double") / (col("o") + col("v")).cast("double"))))
      .groupBy("doc_id").agg(sum("llr").as("raw"))
    base.select(col("doc_id"))
      .join(raw, Seq("doc_id"), "left")
      .crossJoin(broadcast(prior))
      .withColumn("nb_score", round(coalesce(col("raw"), lit(0.0)) + col("prior"), 4))
      // prediction from the ROUNDED score: the gate both engines compare on
      // must be downstream of the rounding that absorbs sum-order ulp noise
      .select(col("doc_id"), col("nb_score"),
        (col("nb_score") > 0).cast("int").as("pred_target"))
      .orderBy("doc_id")
  }

  /** T14: DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): per-document hashed-bigram
    * log importance weight between a target-domain distribution and the
    * raw-corpus distribution, add-1-smoothed over B hash buckets:
    *   logw(doc) = Σ_bigrams [ln p̂_target(h(g)) − ln p̂_raw(h(g))],
    *   p̂_c(b) = (cnt_c(b)+1)/(tot_c+B),   h = h30 mod B.
    * The paper resamples ∝ exp(logw); the deterministic pipeline analogs —
    * a fixed log-ratio threshold gate (row-local) or o3-style global top-k —
    * compose downstream of these weights, so the op itself never needs a
    * global sort.
    *
    * Scale: bigram expansion is row-local; BOTH distributions are B-row
    * aggregates (B is a parameter — broadcastable at any corpus size, unlike
    * the NB vocabulary); per-doc sums are one map-side-combined agg keyed by
    * (doc, bucket) then doc. The corpus text never shuffles. */
  def dsirWeights(docs: DataFrame, targetFilter: Column, buckets: Int = 8192): DataFrame = {
    val base = docs.select(col("doc_id"), targetFilter.as("is_t"),
      split(col("text"), " ").as("toks"))
    val grams = base.select(col("doc_id"), col("is_t"),
      explode(gramArray(col("toks"), 2)).as("gram"))
      .withColumn("b", h30(col("gram")) % buckets)
    val dist = grams.groupBy("b").agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ctb"),
      count(lit(1)).as("crb")) // raw = whole corpus, target included (paper §3)
    val tot = dist.agg(sum("ctb").as("tt"), sum("crb").as("tr"))
    val perDoc = grams.groupBy("doc_id", "b").agg(count(lit(1)).as("n"))
      .join(broadcast(dist), "b")
      .crossJoin(broadcast(tot))
      .withColumn("w", col("n") * (
        log((col("ctb") + 1).cast("double") / (col("tt") + buckets).cast("double"))
          - log((col("crb") + 1).cast("double") / (col("tr") + buckets).cast("double"))))
      .groupBy("doc_id").agg(sum("w").as("raw"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), round(coalesce(col("raw"), lit(0.0)), 4).as("dsir_logw"))
      .orderBy("doc_id")
  }

  /** T15: CCNet head/middle/tail bucketing (Wenzek et al. 2020 §4.3): split
    * each language's documents into three quality tiers by per-document score
    * percentile — CCNet buckets on LM perplexity per language shard; the
    * score here is the [[quality]] column (higher = better, so `head` is the
    * TOP third). Bucket boundaries are group-atomic: every document sharing a
    * (lang, rounded score) lands in the bucket where its score group STARTS
    * in the descending cumulative count, so no within-group tiebreak exists
    * and the result is deterministic. Returns (doc_id, lang, quality, bucket).
    *
    * Scale shape — the distributed-percentile pattern: the corpus reduces to
    * a per-(lang, rounded-score) HISTOGRAM (a map-side-combined aggregate,
    * ≤ langs × distinct rounded scores rows); the rank window runs over that
    * histogram, never the corpus; the bucket table broadcasts back onto the
    * score stream as a row-local gate. The corpus itself is never globally
    * sorted and never shuffles past the score aggregation. */
  def ccnetBuckets(docs: DataFrame): DataFrame = {
    val q = quality(docs).select(col("doc_id"), col("quality"))
      .join(docs.select("doc_id", "lang"), "doc_id")
    val hist = q.groupBy("lang", "quality").agg(count(lit(1)).as("c"))
    val byLang = Window.partitionBy("lang")
    val desc = byLang.orderBy(col("quality").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val buckets = hist
      .withColumn("cum", coalesce(sum("c").over(desc), lit(0L)))
      .withColumn("n", sum("c").over(byLang))
      .withColumn("bucket",
        when(col("cum") < col("n") / 3.0, "head")
          .when(col("cum") < col("n") * 2.0 / 3.0, "middle")
          .otherwise("tail"))
      .select("lang", "quality", "bucket")
    q.join(broadcast(buckets), Seq("lang", "quality"))
      .select("doc_id", "lang", "quality", "bucket")
      .orderBy("doc_id")
  }

  /** T16: Gopher quality-rule gates (Rae et al. 2021, App. A Table A1)
    * adapted to single-line token text: word count in [minWords, maxWords],
    * mean word length in [minMeanLen, maxMeanLen], ≥ minAlphaFrac of words
    * containing an alphabetic character, and at least minStopKinds DISTINCT
    * stopwords (Gopher's "contains at least 2 of the stop words" rule).
    * Gopher's repetition rules live in [[repetition]] (t5) and its line-level
    * rules don't apply to single-line text. Returns the per-rule booleans and
    * the overall `pass` so a pipeline can gate or audit rule-by-rule.
    *
    * Scale shape: one map-side-combined aggregate per doc over the token
    * stream; every gate is then a row-local comparison. Nothing shuffles but
    * the per-doc summary rows. */
  def gopherRules(docs: DataFrame,
                  minWords: Long = 50L, maxWords: Long = 100000L,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  minAlphaFrac: Double = 0.8, minStopKinds: Long = 2L): DataFrame =
    tokens(docs).groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        round(avg(length(col("term"))), 6).as("mean_len"),
        round(avg(when(col("term").rlike("[a-z]"), 1.0).otherwise(0.0)), 6).as("frac_alpha"),
        countDistinct(when(col("term").isin(EnStopwords: _*), col("term"))).as("n_stop_kinds"))
      .withColumn("pass_words", col("n_words").between(minWords, maxWords))
      .withColumn("pass_len", col("mean_len").between(minMeanLen, maxMeanLen))
      .withColumn("pass_alpha", col("frac_alpha") >= minAlphaFrac)
      .withColumn("pass_stop", col("n_stop_kinds") >= minStopKinds)
      .withColumn("pass",
        col("pass_words") && col("pass_len") && col("pass_alpha") && col("pass_stop"))
      .orderBy("doc_id")

  /** T17: bigram-LM log-perplexity scoring — the actual LM quality filter of
    * CCNet (Wenzek et al. 2020 §4.4 scores each paragraph with a KenLM model
    * trained on Wikipedia and buckets by perplexity; [[ccnetBuckets]] is the
    * bucketing, this is the scorer): train an add-1-smoothed bigram language
    * model on the target slice, then score every document by its mean
    * negative log bigram probability
    *   logppl(doc) = −(1/|G|) Σ_{(w1,w2)∈G} ln P̂(w2|w1),
    *   P̂(w2|w1) = (C(w1,w2)+1) / (C(w1)+|V|)
    * with C counted on the TARGET slice only and |V| = the corpus-wide
    * distinct-token count (unseen histories back off to uniform 1/|V|).
    * Lower = more target-like. Docs with <2 tokens score 0.
    *
    * Scale: the model is two aggregates over the target slice only (bigram
    * and history counts); scoring left-joins the corpus bigram stream
    * against them keyed by gram — a web-scale vocabulary is too large to
    * broadcast, so the join stays an AQE-sized shuffle join with per-doc
    * (w1,w2) pre-aggregation bounding skew; per-doc means are one map-side
    * combined agg. The corpus text itself never shuffles. */
  def lmLogPpl(docs: DataFrame, targetFilter: Column): DataFrame = {
    val base = docs.select(col("doc_id"), targetFilter.as("is_t"),
      split(col("text"), " ").as("toks"))
    val pairs = base.where(size(col("toks")) >= 2)
      .select(col("doc_id"), col("is_t"), explode(expr(
        "transform(sequence(1, size(toks)-1), " +
          "i -> struct(element_at(toks, i) AS w1, element_at(toks, i+1) AS w2))")).as("p"))
      .select(col("doc_id"), col("is_t"),
        col("p.w1").as("w1"), col("p.w2").as("w2"))
    val c2 = pairs.where(col("is_t")).groupBy("w1", "w2")
      .agg(count(lit(1)).as("c2"))
    val c1 = pairs.where(col("is_t")).groupBy("w1")
      .agg(count(lit(1)).as("c1"))
    val vdf = base.select(explode(col("toks")).as("t"))
      .agg(countDistinct("t").as("v"))
    val scored = pairs.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("n"))
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vdf))
      .withColumn("lp", col("n") * log(
        (coalesce(col("c2"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")))
      .groupBy("doc_id").agg((-sum("lp") / sum("n")).as("raw"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(coalesce(col("raw"), lit(0.0)), 4).as("lm_logppl"))
      .orderBy("doc_id")
  }

  /** T18: C4-style heuristic cleaning gates (Raffel et al. 2020 §2.2)
    * adapted to single-line token text: ends in terminal punctuation
    * (C4's "retain lines ending in terminal punctuation"), at least
    * `minWords` words (C4 discards pages with <3 sentences / lines with <5
    * words), no curly brace (C4 removes any page containing "{" as a code
    * marker), no "lorem ipsum", and no blocked word (C4 filters on a
    * blocklist; `badWords` is the caller-supplied stand-in). Returns the
    * per-rule booleans and the overall `pass`, rule-by-rule auditable like
    * [[gopherRules]]. Every gate is a row-local expression riding the scan —
    * nothing shuffles. */
  def c4Rules(docs: DataFrame, minWords: Long = 5L,
              badWords: Seq[String] = Seq("nsfwplaceholder")): DataFrame = {
    val lowered = lower(col("text"))
    val badHit = badWords.map(w => array_contains(split(lowered, " "), w))
      .reduce(_ || _)
    docs.select(col("doc_id"),
        size(filter(split(col("text"), " "), t => t =!= "")).cast("long").as("n_words"),
        col("text").rlike("[.!?\"]$").as("pass_terminal"),
        (!col("text").contains("{")).as("pass_brace"),
        (!lowered.contains("lorem ipsum")).as("pass_lorem"),
        (!badHit).as("pass_words_clean"))
      .withColumn("pass_min_words", col("n_words") >= minWords)
      .withColumn("pass",
        col("pass_terminal") && col("pass_brace") && col("pass_lorem") &&
          col("pass_words_clean") && col("pass_min_words"))
      .orderBy("doc_id")
  }

  /** T19: within-document repeated-line removal — the row-local member of
    * the boilerplate-dedup family (C4 drops repeated spans, Raffel et al.
    * 2020 §2.2; CCNet dedups paragraphs corpus-wide — that cross-doc case
    * is d10): keep the FIRST occurrence of each distinct line, preserving
    * order, and report how many lines were dropped. Navigation chrome,
    * repeated headers, and copy-pasted banners collapse to one copy.
    *
    * Scale: entirely row-local — split / array_distinct (which preserves
    * first-occurrence order) / array_join ride the scan inside codegen; no
    * shuffle, no UDF, works unchanged at 100 TB. */
  def lineDedup(docs: DataFrame): DataFrame = {
    val lines = split(col("text"), "\n")
    docs.select(col("doc_id"),
        array_join(array_distinct(lines), "\n").as("text"),
        (size(lines) - size(array_distinct(lines))).cast("long").as("n_dropped"))
      .orderBy("doc_id")
  }

  /** T10: important-words summary extraction — the plain-text analog of the
    * reference's SummaryExtractor chain (summary-extraction/.../
    * SummaryExtractor.java:38-56): the text is scanned in fixed
    * `window`-token passages, each scored by HOW MANY of the important
    * words occur in it (HeuristicTextUtil.countOccurrencesOfAnyWord:17-40
    * counts distinct words present, not total hits, case-insensitive on
    * word boundaries); the best passage wins (ties → earliest; no hits
    * anywhere → the opening passage, the FallbackHeuristic role), is
    * cleaned with the reference's truncatedCharacters regex
    * `[^a-zA-Z0-9]{3,}` → ' ' (SummaryExtractor.java:17,45) and abbreviated
    * to `maxLen` chars (max-summary-length = 255, ConverterModule.java:27).
    * The DOM-shape heuristics (tag density, meta/OpenGraph description)
    * have no analog on a plain-text corpus.
    * Scale: one narrow pass emits (doc, win, hits) through a map-side
    * combined agg; the argmax is a per-doc struct-max reduction (no window
    * sort); the chosen passage's text is recomputed from the doc row by
    * array slice — token streams never shuffle. */
  def summarize(docs: DataFrame, importantWords: Seq[String],
                window: Int = 32, maxLen: Int = 255): DataFrame = {
    val words = importantWords.map(_.toLowerCase).distinct
    val wins = tokensPos(docs)
      .withColumn("win", ((col("i") - 1) / window).cast("long"))
      .groupBy("doc_id", "win")
      .agg(count_distinct(
        when(lower(col("term")).isin(words: _*), lower(col("term")))).as("hits"))
    // argmax without a per-doc sort: max of (hits, -win) structs
    val best = wins
      .groupBy("doc_id")
      .agg(max(struct(col("hits"), (-col("win")).as("negwin"))).as("b"))
      .select(col("doc_id"), (-col("b.negwin")).as("win"), col("b.hits").as("hits"))
    docs.select(col("doc_id"), col("text")).join(best, "doc_id")
      .select(col("doc_id"), col("win"), col("hits"),
        substring(
          regexp_replace(
            array_join(slice(split(col("text"), " "),
              (col("win") * window + 1).cast("int"), lit(window)), " "),
            "[^a-zA-Z0-9]{3,}", " "),
          1, maxLen).as("summary"))
      .orderBy("doc_id")
  }
}
