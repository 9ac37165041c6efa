package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL-surface bridge for the reference's 36 named sketch alias types
  * (`codegen/generated.cpp.j2:195-224`, `src/theta_sketch.cpp:363`,
  * `src/frequent_items_sketch.cpp:356`): `CAST(b AS sketch_kll_double)`
  * and `b::sketch_kll_float` parse and carry the family/element metadata
  * the bind layer dispatches on.
  *
  * Spark's CAST grammar only accepts its own type names, and extensions
  * cannot add catalog types — so the alias-cast syntax is bridged one
  * level up: a delegating [[ParserInterface]] rewrites the SQL TEXT,
  * turning both cast spellings into `graft_sketch_cast(expr,
  * 'sketch_...')` calls (the function the r12 metadata design already
  * dispatches on), then hands the result to Spark's real parser. The
  * reference's own cast is `DefaultCasts::ReinterpretCast` — a no-op on
  * the bytes that only changes the static type — and the rewrite keeps
  * exactly that semantics: bytes pass through, binding metadata changes.
  *
  * The scanner is quote/comment-aware (single/double-quoted strings with
  * doubled-quote and backslash escapes, backquoted identifiers, `--` and
  * bracketed comments), so alias-type spellings INSIDE literals or
  * comments are never rewritten. Only spellings matching the closed
  * 36-name inventory rewrite; every other `CAST`/`::` is left for Spark
  * to parse (and fail) exactly as before — the bridge cannot change the
  * meaning of any query the stock parser accepts, because the stock
  * parser accepts no `sketch_*` type.
  */
object SketchCastRewrite {

  /** alias type name → (family, element-lane tag, narrow-input tag) —
    * the metadata triple [[graft.Registration]] dispatches on. Lanes
    * follow SURVEY §1.4: narrow ints ride the long lane with a cast-back
    * tag; unsigned widen to the next signed type (utinyint→smallint,
    * usmallint→int, uinteger→long), except UBIGINT which rides the
    * dedicated unsigned lane (raw uint64 bits under an unsigned
    * comparator, Decimal(20,0) at the surface); REQ is float-native and
    * TDigest double-native, so their alias types carry no lane tag
    * (probes normalize, q76 pins the REQ deviation). */
  val aliasTypes: Map[String, (String, Option[String], Option[String])] = {
    val elemSuffixes: Seq[(String, (Option[String], Option[String]))] = Seq(
      "tinyint" -> ((Some("long"), Some("tinyint"))),
      "smallint" -> ((Some("long"), Some("smallint"))),
      "integer" -> ((Some("long"), Some("int"))),
      "bigint" -> ((Some("long"), None)),
      "float" -> ((Some("float"), None)),
      "double" -> ((Some("double"), None)),
      "utinyint" -> ((Some("long"), Some("smallint"))),
      "usmallint" -> ((Some("long"), Some("int"))),
      "uinteger" -> ((Some("long"), None)),
      "ubigint" -> ((Some("ulong"), None)))
    val quantile = for {
      fam <- Seq("quantiles", "kll")
      (suf, (lane, narrow)) <- elemSuffixes
    } yield s"sketch_${fam}_$suf" -> ((fam, lane, narrow))
    // REQ registers all 10 suffixes in the reference; every lane lands on
    // float-native Java REQ here (the documented cast-to-float deviation)
    val req = elemSuffixes.map { case (suf, _) =>
      s"sketch_req_$suf" -> (("req", None, None))
    }
    val tdigest = Seq("float", "double").map(suf =>
      s"sketch_tdigest_$suf" -> (("tdigest", None, None)))
    val untyped = Seq(
      "sketch_hll" -> (("hll", None, None)),
      "sketch_cpc" -> (("cpc", None, None)),
      "sketch_theta" -> (("theta", None, None)),
      "sketch_frequent_items" -> (("frequent_items", None, None)))
    (quantile ++ req ++ tdigest ++ untyped).toMap
  }

  private def isIdentChar(c: Char): Boolean =
    c == '_' || Character.isLetterOrDigit(c)

  /** The identifier whose last character sits at `endExcl - 1`, if any:
    * (start index, text). */
  private def identEndingAtIn(s: String, norm: Array[Boolean],
                              endExcl: Int): Option[(Int, String)] = {
    var b = endExcl
    while (b > 0 && norm(b - 1) && isIdentChar(s.charAt(b - 1))) b -= 1
    if (b < endExcl) Some((b, s.substring(b, endExcl))) else None
  }

  /** Positions of normal-state (outside strings/comments/backquotes)
    * characters. Recomputed per pass — SQL strings are small and passes
    * are bounded by the cast count. */
  private def normalMask(s: String): Array[Boolean] = {
    val m = new Array[Boolean](s.length)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' | '"' =>
          val q = s.charAt(i)
          i += 1 // opening quote is not normal-state payload
          var done = false
          while (i < s.length && !done) {
            if (s.charAt(i) == '\\' && i + 1 < s.length) i += 2
            else if (s.charAt(i) == q) {
              if (i + 1 < s.length && s.charAt(i + 1) == q) i += 2 // '' escape
              else { done = true; i += 1 }
            } else i += 1
          }
        case '`' =>
          i += 1
          while (i < s.length && s.charAt(i) != '`') i += 1
          if (i < s.length) i += 1
        case '-' if i + 1 < s.length && s.charAt(i + 1) == '-' =>
          while (i < s.length && s.charAt(i) != '\n') i += 1
        case '/' if i + 1 < s.length && s.charAt(i + 1) == '*' =>
          i += 2
          while (i + 1 < s.length &&
            !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) i += 1
          i = math.min(s.length, i + 2)
        case _ =>
          m(i) = true
          i += 1
      }
    }
    m
  }

  /** One rewrite of the FIRST alias cast found, or None when the text is
    * clean. Iterated to fixpoint by [[apply]] — nested spellings (an
    * alias cast inside another CAST's operand) surface on later passes. */
  private def rewriteOne(s: String): Option[String] = {
    val norm = normalMask(s)
    val lower = s.toLowerCase(java.util.Locale.ROOT)

    def identEndingAt(endExcl: Int): Option[(Int, String)] =
      identEndingAtIn(s, norm, endExcl)

    // -- CAST(expr AS sketch_x) --------------------------------------------
    var i = 0
    while (i < s.length) {
      if (norm(i) && lower.startsWith("cast", i) &&
          identEndingAt(i).isEmpty && // "cast" begins an identifier here
          (i + 4 >= s.length || !isIdentChar(s.charAt(i + 4)))) {
        var j = i + 4
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        if (j < s.length && s.charAt(j) == '(' && norm(j)) {
          var depth = 1
          var k = j + 1
          var lastAs = -1 // position of a depth-1 " as " keyword
          while (k < s.length && depth > 0) {
            if (norm(k)) {
              s.charAt(k) match {
                case '(' => depth += 1
                case ')' => depth -= 1
                case 'a' | 'A' if depth == 1 &&
                    lower.startsWith("as", k) &&
                    k > 0 && !isIdentChar(s.charAt(k - 1)) &&
                    k + 2 < s.length && !isIdentChar(s.charAt(k + 2)) =>
                  lastAs = k
                case _ =>
              }
            }
            k += 1
          }
          if (depth == 0 && lastAs > 0) {
            val close = k - 1
            val typeName = s.substring(lastAs + 2, close).trim
            if (aliasTypes.contains(typeName.toLowerCase(java.util.Locale.ROOT))) {
              val expr = s.substring(j + 1, lastAs).trim
              val fn = s"graft_sketch_cast($expr, '${typeName.toLowerCase(java.util.Locale.ROOT)}')"
              return Some(s.substring(0, i) + fn + s.substring(close + 1))
            }
          }
        }
      }
      i += 1
    }

    // -- expr::sketch_x ----------------------------------------------------
    i = 0
    while (i < s.length - 1) {
      if (norm(i) && s.charAt(i) == ':' && s.charAt(i + 1) == ':') {
        var t = i + 2
        while (t < s.length && s.charAt(t).isWhitespace) t += 1
        val tEnd = {
          var e = t
          while (e < s.length && norm(e) && isIdentChar(s.charAt(e))) e += 1
          e
        }
        val typeName = lower.substring(t, tEnd)
        if (aliasTypes.contains(typeName)) {
          // operand: scan back over one postfix-primary chain —
          // qualified names, call/index suffixes, literals
          var b = i
          while (b > 0 && s.charAt(b - 1).isWhitespace) b -= 1
          var more = b > 0
          var bad = false
          while (more && b > 0 && !bad) {
            more = false
            s.charAt(b - 1) match {
              case ')' | ']' =>
                val shut = s.charAt(b - 1)
                val open = if (shut == ')') '(' else '['
                var depth = 0
                var p = b - 1
                var found = -1
                while (p >= 0 && found < 0) {
                  if (norm(p)) {
                    if (s.charAt(p) == shut) depth += 1
                    else if (s.charAt(p) == open) {
                      depth -= 1
                      if (depth == 0) found = p
                    }
                  }
                  p -= 1
                }
                if (found < 0) bad = true // unbalanced — leave for Spark
                else {
                  b = found
                  // a call's function name, if any
                  identEndingAt(b).foreach { case (st, _) => b = st }
                }
              case '\'' | '"' | '`' =>
                // literal / backquoted operand: the whole span is
                // non-normal in the mask (opener through closer), so the
                // operand start is the normal/non-normal boundary
                var p = b - 1
                while (p >= 0 && !norm(p)) p -= 1
                b = p + 1
                // a string-prefix identifier (X'..' hex) if present
                identEndingAt(b).foreach { case (st, _) => b = st }
              case c if isIdentChar(c) =>
                identEndingAt(b).foreach { case (st, _) => b = st }
              case _ => // operand chain ends (operator, comma, paren, start)
            }
            if (!bad && b > 0) {
              // keep walking across qualified segments, index chains, and
              // inner :: casts (`a::int::sketch_hll` binds left-to-right)
              if (s.charAt(b - 1) == '.') { b -= 1; more = true }
              else if (s.charAt(b - 1) == ')' || s.charAt(b - 1) == ']') more = true
              else if (b > 1 && s.charAt(b - 1) == ':' && s.charAt(b - 2) == ':') {
                b -= 2
                while (b > 0 && s.charAt(b - 1).isWhitespace) b -= 1
                more = true
              }
            }
          }
          val expr = s.substring(b, i).trim
          if (!bad && expr.nonEmpty) {
            val fn = s"graft_sketch_cast($expr, '$typeName')"
            return Some(s.substring(0, b) + fn + s.substring(tEnd))
          }
        }
      }
      i += 1
    }
    None
  }

  /** Alias types that are LOSSLESS as a bare `BINARY` DDL column type:
    * the untyped families recover by runtime family sniff, `_double`
    * lanes are the probe default, and REQ/TDigest probes force their
    * native lane whatever the suffix. `CREATE TABLE t (s
    * sketch_kll_double)` (test/sql/datasketch_kll.test:56,
    * datasketch_hll.test:111) therefore rewrites to BINARY with
    * identical binding behavior. Narrow/float integer lanes are NOT in
    * this set: erasing them to BINARY would silently mis-lane
    * element-typed probes, so those DDL spellings keep Spark's loud
    * UNSUPPORTED_DATATYPE error (use CTAS, which carries the metadata
    * tags automatically). */
  val ddlLossless: Set[String] =
    Set("sketch_hll", "sketch_cpc", "sketch_theta", "sketch_frequent_items",
      "sketch_quantiles_double", "sketch_kll_double") ++
      aliasTypes.keys.filter(n =>
        n.startsWith("sketch_req_") || n.startsWith("sketch_tdigest_"))

  /** Rewrite lossless alias types used as DDL column TYPES to BINARY —
    * only in CREATE/REPLACE statements, and only where the alias name
    * sits in type position (immediately after a column-name identifier).
    * A non-DDL statement never reaches this path, so a column merely
    * NAMED like an alias type cannot be rewritten. */
  private def rewriteDdl(s: String): String = {
    val head = s.dropWhile(_.isWhitespace).take(8).toLowerCase(java.util.Locale.ROOT)
    if (!head.startsWith("create") && !head.startsWith("replace")) return s
    val norm = normalMask(s)
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      var matched = false
      if (norm(i) && isIdentChar(s.charAt(i)) &&
          (i == 0 || !isIdentChar(s.charAt(i - 1)))) {
        var e = i
        while (e < s.length && norm(e) && isIdentChar(s.charAt(e))) e += 1
        val word = lower.substring(i, e)
        if (ddlLossless.contains(word)) {
          // type position: preceded by an identifier (the column name)
          // separated by whitespace only
          var p = i
          while (p > 0 && s.charAt(p - 1).isWhitespace) p -= 1
          // the preceding identifier must be the COLUMN NAME — an `AS`
          // keyword means this is a cast/alias position inside a CTAS
          // query body, which belongs to the expression rewrite instead
          val prevIdent = if (p > 0 && p < i && norm(p - 1) && isIdentChar(s.charAt(p - 1)))
            identEndingAtIn(s, norm, p).map(_._2.toLowerCase(java.util.Locale.ROOT))
          else None
          if (prevIdent.exists(w => w != "as" && w != "returns")) {
            out.append("BINARY")
            i = e
            matched = true
          }
        }
      }
      if (!matched) { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  def apply(sql: String): String = {
    // cheap gate: virtually no query mentions the alias types
    if (!sql.toLowerCase(java.util.Locale.ROOT).contains("sketch_")) return sql
    var cur = rewriteDdl(sql)
    var guard = 0
    var next = rewriteOne(cur)
    while (next.isDefined && guard < 256) {
      cur = next.get
      guard += 1
      next = rewriteOne(cur)
    }
    cur
  }
}

/** Delegating parser: rewrites sketch alias-type casts in the SQL text,
  * then defers everything to Spark's parser. Injected by
  * [[graft.GraftExtensions]]. */
class SketchCastParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(SketchCastRewrite(sqlText))
  override def parsePlanWithParameters(sqlText: String,
      ctx: ParameterContext): LogicalPlan =
    delegate.parsePlanWithParameters(SketchCastRewrite(sqlText), ctx)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(SketchCastRewrite(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(SketchCastRewrite(sqlText))
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
