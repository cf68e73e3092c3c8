package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Parser for user band-algebra expressions (SURVEY §2.2 P8).
  *
  * The reference executes strings like `"10000.*((B8A-B04)/(B8A+B04))"`
  * through a sandboxed Python `exec` (`cube_builder/utils/interpreter.py:
  * 28-60`). Here the same grammar parses once into a tiny AST with three
  * renderers, so evaluation is always compiled and safe by construction
  * (no code execution — only arithmetic over bound band samples):
  *
  *  - [[BandExprParser.toColumn]] — a Catalyst `Column` tree (scalar P8);
  *  - [[BandExprParser.toJava]] — a Java source fragment inlined into the
  *    whole-stage-codegen loop of [[BandExprArray]] (array P8);
  *  - [[BandExprParser.evalAst]] — direct Scala evaluation, the
  *    interpreted fallback of the same expression.
  *
  * Grammar: numbers (numpy-style trailing dot allowed), identifiers bound
  * via `env`, `+ - * / %`, `**` (power), unary minus, parentheses, and the
  * whitelisted functions `sqrt|abs|min|max|pow|floor|ceil|exp|log|clip`.
  */
object BandExprParser {

  /** Band-algebra AST. All arithmetic is double-typed. */
  sealed trait Ast extends Serializable
  final case class Num(v: Double) extends Ast
  final case class Ref(name: String) extends Ast
  final case class Bin(op: Char, l: Ast, r: Ast) extends Ast // + - * / % ^(pow)
  final case class Neg(a: Ast) extends Ast
  final case class Fn(name: String, args: List[Ast]) extends Ast

  def parse(expression: String): Ast = new Parser(expression).parse()

  /** Free band references of an expression, in first-appearance order. */
  def refs(ast: Ast): Seq[String] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    def walk(a: Ast): Unit = a match {
      case Ref(n)       => out += n
      case Bin(_, l, r) => walk(l); walk(r)
      case Neg(x)       => walk(x)
      case Fn(_, args)  => args.foreach(walk)
      case _            =>
    }
    walk(ast)
    out.toSeq
  }

  /** Compile to a Catalyst Column over bound band columns. */
  def compile(expression: String, env: Map[String, Column]): Column =
    toColumn(parse(expression), env)

  def toColumn(ast: Ast, env: Map[String, Column]): Column = ast match {
    case Num(v) => lit(v)
    case Ref(n) => env.getOrElse(n,
      throw new IllegalArgumentException(s"unbound band '$n'"))
    case Bin('+', l, r) => toColumn(l, env) + toColumn(r, env)
    case Bin('-', l, r) => toColumn(l, env) - toColumn(r, env)
    case Bin('*', l, r) => toColumn(l, env) * toColumn(r, env)
    case Bin('/', l, r) =>
      // Spark's Divide returns null on a zero divisor (non-ANSI); the
      // generated-Java array path follows IEEE 754 (±Inf / NaN), matching
      // numpy in the reference. Emit IEEE semantics here so scalar and
      // array P8 agree (x/0 → ±Inf → dtype clamp; 0/0 → NaN → nodata).
      val lc = toColumn(l, env).cast("double")
      val rc = toColumn(r, env).cast("double")
      when(rc === 0.0,
        when(lc > 0.0, lit(Double.PositiveInfinity))
          .when(lc < 0.0, lit(Double.NegativeInfinity))
          .otherwise(lit(Double.NaN)))
        .otherwise(lc / rc)
    case Bin('%', l, r) =>
      // Same alignment: Java's % with a zero divisor is NaN, not null.
      val lc = toColumn(l, env).cast("double")
      val rc = toColumn(r, env).cast("double")
      when(rc === 0.0, lit(Double.NaN)).otherwise(lc % rc)
    case Bin('^', l, r) => pow(toColumn(l, env), toColumn(r, env))
    case Bin(op, _, _)  => throw new IllegalArgumentException(s"bad op '$op'")
    case Neg(a)         => negate(toColumn(a, env))
    case Fn(name, args) =>
      val cs = args.map(toColumn(_, env))
      (name, cs) match {
        case ("sqrt", List(a))         => sqrt(a)
        case ("abs", List(a))          => abs(a)
        case ("min", as) if as.size >= 2 => least(as: _*)
        case ("max", as) if as.size >= 2 => greatest(as: _*)
        case ("pow", List(a, b))       => pow(a, b)
        case ("floor", List(a))        => floor(a)
        case ("ceil", List(a))         => ceil(a)
        case ("exp", List(a))          => exp(a)
        case ("log", List(a))          => log(a)
        case ("clip", List(a, lo, hi)) => least(greatest(a, lo), hi)
        case _ =>
          throw new IllegalArgumentException(s"unsupported function '$name'")
      }
  }

  /** Render as a Java double expression with band refs bound to local
    * variable names (for `doGenCode`). Semantics match [[toColumn]]; the
    * one documented divergence is NaN ordering inside min/max/clip (Java
    * `Math.min/max` propagate NaN, Spark's least/greatest sort it last) —
    * final NaN→nodata clamping happens outside the rendered fragment in
    * both paths.
    */
  def toJava(ast: Ast, bind: Map[String, String]): String = ast match {
    case Num(v) => s"(${v}D)"
    case Ref(n) => bind.getOrElse(n,
      throw new IllegalArgumentException(s"unbound band '$n'"))
    case Bin('^', l, r) =>
      s"java.lang.Math.pow(${toJava(l, bind)}, ${toJava(r, bind)})"
    case Bin(op, l, r) => s"(${toJava(l, bind)} $op ${toJava(r, bind)})"
    case Neg(a)        => s"(- ${toJava(a, bind)})"
    case Fn(name, args) =>
      val js = args.map(toJava(_, bind))
      def fold(f: String, as: List[String]): String =
        as.reduce((a, b) => s"java.lang.Math.$f($a, $b)")
      (name, js) match {
        case ("sqrt", List(a))  => s"java.lang.Math.sqrt($a)"
        case ("abs", List(a))   => s"java.lang.Math.abs($a)"
        case ("min", as) if as.size >= 2 => fold("min", as)
        case ("max", as) if as.size >= 2 => fold("max", as)
        case ("pow", List(a, b)) => s"java.lang.Math.pow($a, $b)"
        case ("floor", List(a)) => s"java.lang.Math.floor($a)"
        case ("ceil", List(a))  => s"java.lang.Math.ceil($a)"
        case ("exp", List(a))   => s"java.lang.Math.exp($a)"
        case ("log", List(a))   => s"java.lang.Math.log($a)"
        case ("clip", List(a, lo, hi)) =>
          s"java.lang.Math.min(java.lang.Math.max($a, $lo), $hi)"
        case _ =>
          throw new IllegalArgumentException(s"unsupported function '$name'")
      }
  }

  /** Compile the AST once into a closure over an index-bound sample
    * array (the non-codegen fallback of [[BandExprArray]]) — no per-pixel
    * Map allocation, no per-pixel name lookup. Semantics mirror
    * [[toJava]] exactly (IEEE division, Java Math functions).
    */
  def compileIndexed(ast: Ast, names: Seq[String]): Array[Double] => Double = {
    val idx = names.zipWithIndex.toMap
    def c(a: Ast): Array[Double] => Double = a match {
      case Num(v) => _ => v
      case Ref(n) =>
        val j = idx.getOrElse(n,
          throw new IllegalArgumentException(s"unbound band '$n'"))
        arr => arr(j)
      case Bin('+', l, r) => val lf = c(l); val rf = c(r); arr => lf(arr) + rf(arr)
      case Bin('-', l, r) => val lf = c(l); val rf = c(r); arr => lf(arr) - rf(arr)
      case Bin('*', l, r) => val lf = c(l); val rf = c(r); arr => lf(arr) * rf(arr)
      case Bin('/', l, r) => val lf = c(l); val rf = c(r); arr => lf(arr) / rf(arr)
      case Bin('%', l, r) => val lf = c(l); val rf = c(r); arr => lf(arr) % rf(arr)
      case Bin('^', l, r) =>
        val lf = c(l); val rf = c(r); arr => math.pow(lf(arr), rf(arr))
      case Bin(op, _, _) => throw new IllegalArgumentException(s"bad op '$op'")
      case Neg(x)        => val f = c(x); arr => -f(arr)
      case Fn(name, args) =>
        val fs = args.map(c).toArray
        (name, fs.length) match {
          case ("sqrt", 1)  => arr => math.sqrt(fs(0)(arr))
          case ("abs", 1)   => arr => math.abs(fs(0)(arr))
          case ("min", k) if k >= 2 =>
            arr => { var m = fs(0)(arr); var i = 1; while (i < fs.length) { m = math.min(m, fs(i)(arr)); i += 1 }; m }
          case ("max", k) if k >= 2 =>
            arr => { var m = fs(0)(arr); var i = 1; while (i < fs.length) { m = math.max(m, fs(i)(arr)); i += 1 }; m }
          case ("pow", 2)   => arr => math.pow(fs(0)(arr), fs(1)(arr))
          case ("floor", 1) => arr => math.floor(fs(0)(arr))
          case ("ceil", 1)  => arr => math.ceil(fs(0)(arr))
          case ("exp", 1)   => arr => math.exp(fs(0)(arr))
          case ("log", 1)   => arr => math.log(fs(0)(arr))
          case ("clip", 3)  => arr => math.min(math.max(fs(0)(arr), fs(1)(arr)), fs(2)(arr))
          case _ =>
            throw new IllegalArgumentException(s"unsupported function '$name'")
        }
    }
    c(ast)
  }

  /** Interpreted evaluation over bound samples (the non-codegen fallback
    * of [[BandExprArray]]); mirrors [[toJava]].
    */
  def evalAst(ast: Ast, env: Map[String, Double]): Double = ast match {
    case Num(v) => v
    case Ref(n) => env(n)
    case Bin('+', l, r) => evalAst(l, env) + evalAst(r, env)
    case Bin('-', l, r) => evalAst(l, env) - evalAst(r, env)
    case Bin('*', l, r) => evalAst(l, env) * evalAst(r, env)
    case Bin('/', l, r) => evalAst(l, env) / evalAst(r, env)
    case Bin('%', l, r) => evalAst(l, env) % evalAst(r, env)
    case Bin('^', l, r) => math.pow(evalAst(l, env), evalAst(r, env))
    case Bin(op, _, _)  => throw new IllegalArgumentException(s"bad op '$op'")
    case Neg(a)         => -evalAst(a, env)
    case Fn(name, args) =>
      val vs = args.map(evalAst(_, env))
      (name, vs) match {
        case ("sqrt", List(a))  => math.sqrt(a)
        case ("abs", List(a))   => math.abs(a)
        case ("min", as) if as.size >= 2 => as.min
        case ("max", as) if as.size >= 2 => as.max
        case ("pow", List(a, b)) => math.pow(a, b)
        case ("floor", List(a)) => math.floor(a)
        case ("ceil", List(a))  => math.ceil(a)
        case ("exp", List(a))   => math.exp(a)
        case ("log", List(a))   => math.log(a)
        case ("clip", List(a, lo, hi)) => math.min(math.max(a, lo), hi)
        case _ =>
          throw new IllegalArgumentException(s"unsupported function '$name'")
      }
  }

  private final class Parser(input: String) {
    private var pos = 0

    def parse(): Ast = {
      val c = parseAddSub()
      skipWs()
      require(pos >= input.length, s"trailing input at $pos in: $input")
      c
    }

    private def skipWs(): Unit =
      while (pos < input.length && input.charAt(pos).isWhitespace) pos += 1

    private def peek: Char = if (pos < input.length) input.charAt(pos) else ' '

    private def parseAddSub(): Ast = {
      var left = parseMulDiv()
      var done = false
      while (!done) {
        skipWs()
        peek match {
          case '+' => pos += 1; left = Bin('+', left, parseMulDiv())
          case '-' => pos += 1; left = Bin('-', left, parseMulDiv())
          case _   => done = true
        }
      }
      left
    }

    private def parseMulDiv(): Ast = {
      var left = parsePow()
      var done = false
      while (!done) {
        skipWs()
        peek match {
          case '*' if pos + 1 >= input.length || input.charAt(pos + 1) != '*' =>
            pos += 1; left = Bin('*', left, parsePow())
          case '/' => pos += 1; left = Bin('/', left, parsePow())
          case '%' => pos += 1; left = Bin('%', left, parsePow())
          case _   => done = true
        }
      }
      left
    }

    private def parsePow(): Ast = {
      val base = parseUnary()
      skipWs()
      if (peek == '*' && pos + 1 < input.length && input.charAt(pos + 1) == '*') {
        pos += 2
        Bin('^', base, parsePow()) // right-associative
      } else base
    }

    private def parseUnary(): Ast = {
      skipWs()
      peek match {
        case '-' => pos += 1; Neg(parseUnary())
        case '+' => pos += 1; parseUnary()
        case _   => parseAtom()
      }
    }

    private def parseAtom(): Ast = {
      skipWs()
      val c = peek
      if (c == '(') {
        pos += 1
        val inner = parseAddSub()
        skipWs()
        require(peek == ')', s"expected ')' at $pos in: $input")
        pos += 1
        inner
      } else if (c.isDigit || c == '.') {
        parseNumber()
      } else if (c.isLetter || c == '_') {
        val name = parseIdent()
        skipWs()
        if (peek == '(') {
          pos += 1
          val args = parseArgs()
          checkFn(name, args)
          Fn(name.toLowerCase, args)
        } else Ref(name)
      } else throw new IllegalArgumentException(s"unexpected '$c' at $pos in: $input")
    }

    private def checkFn(name: String, args: List[Ast]): Unit = {
      val arity: PartialFunction[String, Int => Boolean] = {
        case "sqrt" | "abs" | "floor" | "ceil" | "exp" | "log" => _ == 1
        case "pow"                                             => _ == 2
        case "min" | "max"                                     => _ >= 2
        case "clip"                                            => _ == 3
      }
      val n = name.toLowerCase
      require(arity.isDefinedAt(n) && arity(n)(args.length),
        s"unsupported function '$name'/${args.length} in: $input")
    }

    private def parseArgs(): List[Ast] = {
      skipWs()
      if (peek == ')') { pos += 1; return Nil }
      val buf = scala.collection.mutable.ListBuffer(parseAddSub())
      skipWs()
      while (peek == ',') {
        pos += 1
        buf += parseAddSub()
        skipWs()
      }
      require(peek == ')', s"expected ')' at $pos in: $input")
      pos += 1
      buf.toList
    }

    private def parseIdent(): String = {
      val start = pos
      while (pos < input.length &&
             (input.charAt(pos).isLetterOrDigit || input.charAt(pos) == '_')) pos += 1
      input.substring(start, pos)
    }

    private def parseNumber(): Ast = {
      val start = pos
      while (pos < input.length && (input.charAt(pos).isDigit || input.charAt(pos) == '.')) pos += 1
      if (pos < input.length && (peek == 'e' || peek == 'E')) {
        pos += 1
        if (peek == '+' || peek == '-') pos += 1
        while (pos < input.length && input.charAt(pos).isDigit) pos += 1
      }
      val text = input.substring(start, pos)
      // numpy-style "10000." parses as a double
      Num(java.lang.Double.parseDouble(if (text.endsWith(".")) text + "0" else text))
    }
  }
}
