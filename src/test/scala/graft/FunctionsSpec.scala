package graft

import graft.analysis.{Fingerprint, Porter}
import graft.core.Hashes
import graft.functions.{GraftExtensions, GraftFunctions, PorterStemExpr, Simhash60Expr}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native Catalyst expressions + the SparkSessionExtensions SQL surface:
  * column results must equal the driver-side implementations exactly, under
  * BOTH the codegen and interpreted evaluation paths, and the plan must stay
  * free of ScalaUDF (the whole point of going native). */
class FunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-functions")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val words = Seq(
    "running", "caresses", "relational", "hopping", "sky", "analytics",
    "generalization", "x", "", "multidimensional")

  private val docBodies = Seq(
    "alpha beta gamma delta", "alpha beta", "single", "",
    "the quick brown fox jumps over the lazy dog",
    "a a a a a", "tok001 tok002 tok001 tok002")

  test("graft_stem / graft_simhash60 / graft_term_hash equal the driver implementations") {
    import spark.implicits._
    val df = words.toDF("w")
      .withColumn("stemmed", GraftFunctions.stem(col("w")))
      .withColumn("h", GraftFunctions.termHash(col("w")))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    for ((w, s, h) <- rows) {
      assert(s === Porter.stem(w), s"stem($w)")
      assert(h === Hashes.termHash(w), s"termHash($w)")
    }
    val fps = docBodies.toDF("body")
      .select(col("body"), GraftFunctions.simhash60(col("body")).as("fp"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    for ((body, fp) <- fps) assert(fp === Fingerprint.simhash60(body), s"simhash($body)")
  }

  test("identical results under codegen-only and interpreted evaluation") {
    import spark.implicits._
    def run(): Seq[(String, Long)] =
      words.toDF("w")
        .select(GraftFunctions.stem(col("w")).as("s"),
                GraftFunctions.simhash60(col("w")).as("f"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val byMode = Seq("CODEGEN_ONLY", "NO_CODEGEN").map { mode =>
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try run() finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(byMode.head === byMode.last)
  }

  test("null-safe and plan stays UDF-free") {
    import spark.implicits._
    val df = Seq(Some("running"), None).toDF("w")
      .select(GraftFunctions.stem(col("w")).as("s"),
              GraftFunctions.simhash60(col("w")).as("f"))
    val rows = df.collect()
    assert(rows.exists(r => r.isNullAt(0) && r.isNullAt(1)))
    assert(rows.exists(r => !r.isNullAt(0) && r.getString(0) == "run"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"plan contains a UDF:\n$plan")
  }

  test("SQL surface: register() resolves the functions for spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_stem('generalization') AS s,
        |       graft_simhash60('alpha beta gamma') AS f,
        |       graft_term_hash('tok001') AS h""".stripMargin).collect().head
    assert(r.getString(0) === Porter.stem("generalization"))
    assert(r.getLong(1) === Fingerprint.simhash60("alpha beta gamma"))
    assert(r.getLong(2) === Hashes.termHash("tok001"))
    // arity errors surface at analysis, not execution
    val err = intercept[Exception](spark.sql("SELECT graft_stem('a','b')").collect())
    assert(err.getMessage.contains("one argument"))
  }

  test("spark.sql.extensions entry point injects without error") {
    // The injection contract: a no-arg class applying each description. A
    // full end-to-end check needs a fresh SparkContext (extensions bind at
    // session build), which a shared-JVM suite can't do; register() above
    // covers the registry path with the same descriptions.
    new GraftExtensions().apply(new SparkSessionExtensions)
    // direct expression construction also works without any registry
    assert(PorterStemExpr(org.apache.spark.sql.catalyst.expressions.Literal("running"))
      .eval(null).toString === "run")
    assert(Simhash60Expr(org.apache.spark.sql.catalyst.expressions.Literal("alpha beta"))
      .eval(null) === Fingerprint.simhash60("alpha beta"))
  }
}
