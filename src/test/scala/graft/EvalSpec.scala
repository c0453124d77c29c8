package graft

import graft.ops.EvalOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Assistant instant-answer evaluators: MathParser-semantics expression
  * evaluation and Units conversion (MathParserTest vectors + Units.java
  * cases). */
class EvalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-eval")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ev(s: String): Double = EvalOps.evalMath(s)

  // ---- math: MathParserTest.java:16-23 vectors -----------------------------

  test("math: basic arithmetic and precedence") {
    assert(ev("3+5") === 8.0)
    assert(ev("3+5-5") === 3.0)
    assert(ev("(3.5 + 2)*3") === 16.5)
    assert(ev("2+3*4") === 14.0)
    assert(ev("2*3^2") === 18.0)       // ^ binds before *
    assert(ev("2^3^2") === 64.0)       // left-associative (reference pass order)
    assert(ev("100/5/2") === 10.0)     // left-associative
  }

  test("math: trivial numeric short-circuit (MathParser.java:42-45)") {
    assert(ev("3.5") === 3.5)
    assert(ev(".5") === 0.5)
    assert(ev("42") === 42.0)
  }

  test("math: functions, adjacency application, constants") {
    assert(ev("1+(300+log(5))") === 301.0 + math.log(5))
    assert(ev("sqrt(1+300)") === math.sqrt(301))
    assert(ev("sqrt(pi)") === math.sqrt(math.Pi))
    assert(ev("log 5") === math.log(5))        // function without parens
    assert(ev("3+-5+log 5") === -2.0 + math.log(5))
    assert(ev("cos(0)") === 1.0)
    assert(ev("sin 0 + tan 0") === 0.0)
    assert(ev("2*pi") === 2 * math.Pi)
    assert(ev("e^2") === math.pow(math.E, 2))
  }

  test("math: unary minus — leading, after operator/function; NOT after a value") {
    assert(ev("-5+3") === -2.0)
    assert(ev("3+-5+5") === 3.0)
    assert(ev("3--5") === 8.0)
    assert(ev("-(2+3)") === -5.0)
    assert(ev("log -5").isNaN)          // MathParserTest.java:23
    assert(ev("4-2") === 2.0)           // binary minus untouched
  }

  test("math: x/0 → NaN; malformed throws") {
    assert(ev("5/0").isNaN)
    assert(ev("3/(2-2)").isNaN)
    intercept[Exception](ev("3+"))
    intercept[Exception](ev("(3"))
    intercept[Exception](ev("3)"))
    intercept[Exception](ev("foo+1"))
    intercept[Exception](ev("3 $ 4"))
  }

  test("math column: malformed/NaN rows become null") {
    val out = Seq("3+5", "5/0", "nope(", "sqrt(16)").toDF("e")
      .select(EvalOps.mathEval(col("e")).as("v")).as[Option[Double]].collect()
    assert(out.toSeq === Seq(Some(8.0), None, None, Some(4.0)))
  }

  // ---- units (Units.java:47-117, UnitsTest.java cases) ---------------------

  test("units: base-ratio conversion (cm→m, km→ft, oz→tons)") {
    assert(EvalOps.convertUnit(3.33, "cm", "m").get === (0.01 * 3.33) / 1.0)
    assert(EvalOps.convertUnit(10, "km", "ft").get === (1000.0 * 10) / 0.3048)
    assert(EvalOps.convertUnit(10, "oz", "tons").get === (0.028349523125 * 10) / 1000.0)
  }

  test("units: temperature affine cases — all 9 directions of UnitsTest.convert5") {
    assert(EvalOps.convertUnit(50, "K", "K").get === 50.0)
    assert(EvalOps.convertUnit(50, "F", "K").get === 5 * (50 - 32.0) / 9 + 273.15)
    assert(EvalOps.convertUnit(50, "C", "K").get === 323.15)
    assert(EvalOps.convertUnit(50, "K", "F").get === 32.0 + 9 * (50 - 273.15) / 5)
    assert(EvalOps.convertUnit(50, "F", "F").get === 50.0)
    assert(EvalOps.convertUnit(50, "C", "F").get === 122.0)
    assert(EvalOps.convertUnit(50, "K", "C").get === 50 - 273.15)
    assert(EvalOps.convertUnit(50, "F", "C").get === 10.0)
    assert(EvalOps.convertUnit(50, "C", "C").get === 50.0)
  }

  test("units: aliases, identity, unknown and cross-type rejections") {
    assert(EvalOps.convertUnit(1, "kilometers", "METERS").get === 1000.0)
    assert(EvalOps.convertUnit(7, "ft", "feet").get === 7.0) // same unit via alias
    assert(EvalOps.convertUnit(1, "kg", "m") === None)       // cross-type
    assert(EvalOps.convertUnit(1, "cubits", "m") === None)   // unknown
  }

  test("units column: value string runs through the math evaluator (Units.java:64)") {
    val out = Seq(("3+7", "km", "m"), ("2", "kg", "g"), ("x(", "km", "m"), ("1", "kg", "km"))
      .toDF("v", "f", "t")
      .select(EvalOps.unitConvert(col("v"), col("f"), col("t")).as("o"))
      .as[Option[Double]].collect()
    assert(out.toSeq === Seq(Some(10000.0), Some(2000.0), None, None))
  }
}
