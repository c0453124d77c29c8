package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Assistant "instant answer" evaluators: arithmetic expression evaluation
  * and unit conversion, as column functions over expression/measurement
  * columns.
  *
  * Reference semantics:
  *  - MathParser (`code/services-core/assistant-service/src/main/java/nu/marginalia/assistant/eval/MathParser.java`):
  *    tokenize (numbers with one optional '.', alphabetic runs, `()+-/*^`),
  *    then reduce in fixed passes — parenthesize (:145-179), unary minus
  *    (leading, or after `+-*/` or a function name, :61-95), function
  *    application by adjacency (`log 5` ≡ `log(5)`, :97-120), then
  *    left-associative binary passes: pow, then mul/div, then add/sub
  *    (:123-143). Constants
  *    `e`/`pi` (:23); functions sqrt/log/log10/log2/cos/sin/tan (:375-395);
  *    x/0 → NaN (:353-357). Purely-numeric inputs short-circuit (:42-45).
  *  - Units (`.../eval/Units.java:47-117`): same-unit identity, unknown unit
  *    or cross-type → no answer, temperature C/F/K by the affine special
  *    cases (:91-117), everything else by base-value ratio
  *    `fromBase · value / toBase` (:74); the value string itself goes through
  *    the math evaluator first (:64). The reference's DecimalFormat
  *    significant-figure presentation (:82-88) is display-layer and not
  *    reproduced — we return the raw double.
  *
  * The unit catalog here is a compact standard-factor table of our own (the
  * reference ships a 62-row CSV; factors are public constants). Scale shape:
  * both evaluators are row-local scalar functions over a column — no shuffle,
  * no state; they ride whatever scan carries the expression column.
  */
object EvalOps {

  // ---- math expression evaluation -----------------------------------------

  private sealed trait Ast
  private final case class Num(v: Double) extends Ast
  private final case class Neg(a: Ast) extends Ast
  private final case class Fn(name: String, a: Ast) extends Ast
  private final case class Bin(op: Char, l: Ast, r: Ast) extends Ast

  private sealed trait Tok
  private final case class TNum(v: Double) extends Tok
  private final case class TWord(s: String) extends Tok // constant or function name
  private final case class TOp(c: Char) extends Tok
  private final case class TGroup(inner: List[Tok]) extends Tok
  private final case class TAst(a: Ast) extends Tok

  private val Constants = Map("e" -> math.E, "pi" -> math.Pi)
  private val TrivialNumber = "([0-9]+\\.[0-9]*|\\.[0-9]+)".r

  /** Evaluate an arithmetic expression string. Throws IllegalArgumentException
    * on malformed input (callers that want a column use [[mathEval]], which
    * maps failures to null). */
  def evalMath(expr: String): Double = expr match {
    case TrivialNumber(_) => expr.toDouble
    case _ => eval(group(tokenize(expr)))
  }

  private def tokenize(s: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ("()+-/*^".indexOf(c) >= 0) { out += TOp(c); i += 1 }
      else if (c.isDigit) { // numbers start with a digit (MathParser.java:189)
        val j0 = i
        var dot = false
        while (i < s.length && (s.charAt(i).isDigit || (s.charAt(i) == '.' && !dot))) {
          if (s.charAt(i) == '.') dot = true
          i += 1
        }
        out += TNum(s.substring(j0, i).toDouble)
      }
      else if (c.isLetter) {
        val j0 = i
        while (i < s.length && s.charAt(i).isLetter) i += 1
        out += TWord(s.substring(j0, i))
      }
      else if (c.isWhitespace) i += 1
      else throw new IllegalArgumentException(s"Can't tokenize '$c' in: $s")
    }
    out.toList
  }

  /** Fold balanced parentheses into TGroup nodes. */
  private def group(toks: List[Tok]): List[Tok] = {
    def go(rest: List[Tok], acc: List[Tok]): (List[Tok], List[Tok]) = rest match {
      case Nil => (acc.reverse, Nil)
      case TOp('(') :: tl =>
        val (inner, after) = goClosed(tl, Nil)
        go(after, TGroup(inner) :: acc)
      case TOp(')') :: _ => throw new IllegalArgumentException("Unbalanced parentheses")
      case h :: tl => go(tl, h :: acc)
    }
    def goClosed(rest: List[Tok], acc: List[Tok]): (List[Tok], List[Tok]) = rest match {
      case Nil => throw new IllegalArgumentException("Unbalanced parentheses")
      case TOp(')') :: tl => (acc.reverse, tl)
      case TOp('(') :: tl =>
        val (inner, after) = goClosed(tl, Nil)
        goClosed(after, TGroup(inner) :: acc)
      case h :: tl => goClosed(tl, h :: acc)
    }
    val (res, leftover) = go(toks, Nil)
    require(leftover.isEmpty, "Unbalanced parentheses")
    res
  }

  private def toAst(t: Tok): Ast = t match {
    case TNum(v) => Num(v)
    case TWord(w) => Num(Constants.getOrElse(w,
      throw new IllegalArgumentException(s"Unknown symbol: $w")))
    case TGroup(inner) => reduce(inner) match {
      case single :: Nil => toAst(single)
      case other => throw new IllegalArgumentException(s"Can't evaluate group of ${other.size}")
    }
    case TAst(a) => a
  }

  /** The reference's fixed reduction passes over one token list (inner groups
    * are reduced on demand by [[toAst]]): unary minus, function adjacency,
    * then the three left-associative binary classes. */
  private def reduce(toks: List[Tok]): List[Tok] = {
    // unary minus: '-' at the head of a (sub)expression, or after one of
    // `+-*/` or a function name — NOT after `^` or a value, exactly the
    // reference's "+-%*/A" gate (MathParser.java:79-90)
    def negate(ts: List[Tok], atStart: Boolean): List[Tok] = ts match {
      case TOp('-') :: arg :: tl if atStart =>
        TAst(Neg(toAst(negOne(arg)))) :: negate(tl, atStart = false)
      case h :: TOp('-') :: arg :: tl if isPreNeg(h) =>
        negOne(h) :: TAst(Neg(toAst(negOne(arg)))) :: negate(tl, atStart = false)
      case h :: tl => negOne(h) :: negate(tl, atStart = false)
      case Nil => Nil
    }
    def isPreNeg(t: Tok): Boolean = t match {
      case TOp(c) => "+-*/".indexOf(c) >= 0
      case TWord(w) => !Constants.contains(w) // function name
      case _ => false
    }
    def negOne(t: Tok): Tok = t match {
      case TGroup(_) => TAst(toAst(t))
      case other => other
    }
    // function application by adjacency: word that is not a constant eats the
    // next token
    def fns(ts: List[Tok]): List[Tok] = ts match {
      case TWord(w) :: arg :: tl if !Constants.contains(w) => TAst(Fn(w, toAst(arg))) :: fns(tl)
      case h :: tl => h :: fns(tl)
      case Nil => Nil
    }
    // one left-associative binary class
    def bin(ts: List[Tok], ops: String): List[Tok] = ts match {
      case l :: TOp(c) :: r :: tl if ops.indexOf(c) >= 0 =>
        bin(TAst(Bin(c, toAst(l), toAst(r))) :: tl, ops)
      case h :: tl => h :: bin(tl, ops)
      case Nil => Nil
    }
    bin(bin(bin(fns(negate(toks, atStart = true)), "^"), "*/"), "+-")
  }

  private def eval(toks: List[Tok]): Double = reduce(toks) match {
    case single :: Nil => evalAst(toAst(single))
    case other => throw new IllegalArgumentException(s"Can't evaluate ${other.size} terms")
  }

  private def evalAst(a: Ast): Double = a match {
    case Num(v) => v
    case Neg(x) => -evalAst(x)
    case Bin('+', l, r) => evalAst(l) + evalAst(r)
    case Bin('-', l, r) => evalAst(l) - evalAst(r)
    case Bin('*', l, r) => evalAst(l) * evalAst(r)
    case Bin('/', l, r) =>
      val d = evalAst(r); if (d == 0) Double.NaN else evalAst(l) / d
    case Bin('^', l, r) => math.pow(evalAst(l), evalAst(r))
    case Bin(op, _, _) => throw new IllegalArgumentException(s"Unknown operator $op")
    case Fn(name, x) =>
      val v = evalAst(x)
      name.toLowerCase match {
        case "sqrt" => math.sqrt(v)
        case "log" => math.log(v)
        case "log10" => math.log10(v)
        case "log2" => math.log(v) / math.log(2)
        case "cos" => math.cos(v)
        case "sin" => math.sin(v)
        case "tan" => math.tan(v)
        case other => throw new IllegalArgumentException(s"Unknown function $other")
      }
  }

  /** Column form: evaluate an expression-string column; malformed rows → null.
    * Row-local scalar work — rides the scan, no shuffle. */
  def mathEval(expr: Column): Column = {
    val f = udf((s: String) =>
      if (s == null) None
      else try {
        val v = evalMath(s); if (v.isNaN) None else Some(v)
      } catch { case _: Exception => None })
    f(expr)
  }

  // ---- unit conversion -----------------------------------------------------

  /** (canonical name, dimension, value in base units). Standard public
    * factors; the catalog is deliberately compact — the reference's is a
    * 62-row CSV of the same shape. */
  final case class UnitDef(name: String, utype: String, base: Double)

  private val UnitList: Seq[(UnitDef, Seq[String])] = Seq(
    UnitDef("km", "DISTANCE", 1000.0) -> Seq("km", "kilometers", "kilometer"),
    UnitDef("m", "DISTANCE", 1.0) -> Seq("m", "meters", "meter"),
    UnitDef("cm", "DISTANCE", 0.01) -> Seq("cm", "centimeters", "centimeter"),
    UnitDef("mm", "DISTANCE", 0.001) -> Seq("mm", "millimeters", "millimeter"),
    UnitDef("in", "DISTANCE", 0.0254) -> Seq("in", "inches", "inch"),
    UnitDef("ft", "DISTANCE", 0.3048) -> Seq("ft", "feet", "foot"),
    UnitDef("yd", "DISTANCE", 0.9144) -> Seq("yd", "yards", "yard"),
    UnitDef("miles", "DISTANCE", 1609.344) -> Seq("miles", "mile"),
    UnitDef("kg", "WEIGHT", 1.0) -> Seq("kg", "kilograms", "kilogram"),
    UnitDef("g", "WEIGHT", 0.001) -> Seq("g", "grams", "gram"),
    UnitDef("lb", "WEIGHT", 0.45359237) -> Seq("lb", "lbs", "pounds", "pound"),
    UnitDef("oz", "WEIGHT", 0.028349523125) -> Seq("oz", "ounces", "ounce"),
    UnitDef("tons", "WEIGHT", 1000.0) -> Seq("tons", "ton", "tonne", "tonnes"),
    UnitDef("C", "TEMPERATURE", 1.0) -> Seq("c", "celsius"),
    UnitDef("F", "TEMPERATURE", 1.0) -> Seq("f", "fahrenheit"),
    UnitDef("K", "TEMPERATURE", 1.0) -> Seq("k", "kelvin"))

  private val UnitsByName: Map[String, UnitDef] =
    UnitList.flatMap { case (u, names) => names.map(_ -> u) }.toMap

  /** Units.java:47-89 semantics on doubles (identity / unknown / cross-type /
    * temperature affine / base ratio). */
  def convertUnit(value: Double, fromName: String, toName: String): Option[Double] = {
    val from = UnitsByName.get(fromName.toLowerCase)
    val to = UnitsByName.get(toName.toLowerCase)
    (from, to) match {
      case (Some(f), Some(t)) if f == t => Some(value)
      case (Some(f), Some(t)) if f.utype == t.utype =>
        if (f.utype == "TEMPERATURE") Some(convertTemperature(value, f.name, t.name))
        else Some(f.base * value / t.base)
      case _ => None
    }
  }

  private def convertTemperature(v: Double, from: String, to: String): Double =
    (from, to) match {
      case ("C", "K") => v + 273.15
      case ("C", "F") => 32.0 + 9 * v / 5
      case ("F", "C") => 5 * (v - 32.0) / 9
      case ("F", "K") => 5 * (v - 32.0) / 9 + 273.15
      case ("K", "C") => v - 273.15
      case ("K", "F") => 32.0 + 9 * (v - 273.15) / 5
      case _ => 0.0 // unreachable: same-unit handled by identity (Units.java:116)
    }

  /** Column form: the value string goes through the math evaluator first,
    * exactly like Units.java:64. Unknown/cross-type/unparseable → null. */
  def unitConvert(value: Column, from: Column, to: Column): Column = {
    val f = udf((v: String, fn: String, tn: String) =>
      if (v == null || fn == null || tn == null) None
      else try {
        val num = evalMath(v)
        if (num.isNaN) None else convertUnit(num, fn, tn)
      } catch { case _: Exception => None })
    f(value, from, to)
  }
}
