package graft.parser

import java.time.{Instant, LocalDate, LocalDateTime, ZoneId, ZoneOffset}
import scala.util.matching.Regex

import graft.engine.Pipeline
import graft.engine.Pipeline._
import graft.engine.SeriesMatch
import graft.engine.SeriesMatch.{All, GroupTag, Name, Regex => SelRegex, Sel, SetOp}

/** Scannerless recursive-descent parser for the SiriDB query language,
  * transliterating the libcleri grammar
  * (/root/reference/grammar/grammar.py: START :877-892, select_stmt
  * :818-831, series_match :449-464, aggregate_functions :577-600,
  * where_series :350-366, int_expr/time_expr :227-239).
  *
  * Time and integer expressions are evaluated here with int64
  * truncating semantics and div/mod-by-zero query errors
  * (src/expr/expr.c:17-100); `now` is captured once per query
  * (src/siri/db/query.c:109,592-595); time-unit suffixes [smhdw]
  * multiply out per src/siri/db/time.c:34-54 and are then scaled by
  * the database precision factor (include/siri/db/time.h:30-34);
  * ISO8601 date strings parse in UTC (src/siri/db/query.c:916-945).
  */
final class QueryParser(input: String, now: Long, factor: Long = 1L,
    tz: String = "NAIVE") {
  private var p = 0

  private def err(m: String): Nothing = throw QueryError(m)

  // ---- lexing helpers ----

  private def ws(): Unit = {
    while (p < input.length &&
        (input(p).isWhitespace || input(p) == '#')) {
      if (input(p) == '#') while (p < input.length && input(p) != '\n') p += 1
      else p += 1
    }
  }

  private def eof: Boolean = { ws(); p >= input.length }

  /** Literal token like `(`, `=>`, `,`, `<=` … */
  private def tryLit(s: String): Boolean = {
    ws()
    if (input.startsWith(s, p)) { p += s.length; true } else false
  }

  private def expectLit(s: String): Unit =
    if (!tryLit(s)) err(s"expecting '$s' at position $p")

  private val word: Regex = "[a-z_]+".r

  private def peekWord: Option[String] = {
    ws()
    word.findPrefixOf(input.substring(p))
  }

  private def tryKw(kw: String): Boolean = {
    ws()
    if (peekWord.contains(kw)) { p += kw.length; true } else false
  }

  private def expectKw(kw: String): Unit =
    if (!tryKw(kw)) err(s"expecting '$kw' at position $p")

  /** Quoted string; adjacent quoted fragments concatenate
    * (grammar r_singleq_str / r_doubleq_str :37-39). */
  private def tryString(): Option[String] = {
    ws()
    if (p >= input.length || (input(p) != '\'' && input(p) != '"')) return None
    val sb = new StringBuilder
    var more = true
    while (more) {
      val q = input(p); p += 1
      val end = input.indexOf(q, p)
      if (end < 0) err("unterminated string literal")
      sb.append(input.substring(p, end))
      p = end + 1
      ws()
      more = p < input.length && (input(p) == '\'' || input(p) == '"')
    }
    Some(sb.toString)
  }

  private def expectString(): String =
    tryString().getOrElse(err(s"expecting a string literal at position $p"))

  private def tryGrave(): Option[String] = {
    ws()
    if (p >= input.length || input(p) != '`') return None
    p += 1
    val end = input.indexOf('`', p)
    if (end < 0) err("unterminated grave-quoted name")
    val s = input.substring(p, end); p = end + 1
    Some(s)
  }

  /** /regex/ or /regex/i (grammar r_regex :44). */
  private def tryRegexTok(): Option[(String, Boolean)] = {
    ws()
    if (p >= input.length || input(p) != '/') return None
    val start = p + 1
    var i = start
    while (i < input.length && input(i) != '/') {
      if (input(i) == '\\') i += 1
      i += 1
    }
    if (i >= input.length) err("unterminated regular expression")
    val pat = input.substring(start, i)
    p = i + 1
    val ci = p < input.length && input(p) == 'i' && { p += 1; true }
    // the reference compiles every /regex/ as it parses (re.c via
    // enter_series_re / filter) and errors immediately on a bad one
    graft.meta.Naming.compileAnchored(
      graft.engine.SeriesMatch.anchored(pat, ci))
    Some((pat, ci))
  }

  private val numRe: Regex = "[0-9]+".r

  private def tryUInt(): Option[Long] = {
    ws()
    numRe.findPrefixOf(input.substring(p)).map { s =>
      // [0-9]+[smhdw] is a time string, not a bare integer
      p += s.length; s.toLong
    }
  }

  // ---- int_expr / time_expr (evaluated while parsing) ----

  private def applyOp(a: Long, op: Char, b: Long): Long = op match {
    case '+' => a + b
    case '-' => a - b
    case '*' => a * b
    case '/' =>
      if (b == 0) err("Division by zero error") else a / b // expr.c:58-61
    case '%' =>
      if (b == 0) err("Modulo by zero error") else a % b // expr.c:53-56
  }

  private def binExpr(primary: () => Long): Long = {
    def term(): Long = {
      var a = primary()
      var done = false
      while (!done) {
        ws()
        if (p < input.length && (input(p) == '*' || input(p) == '/' || input(p) == '%')) {
          val op = input(p); p += 1
          a = applyOp(a, op, primary())
        } else done = true
      }
      a
    }
    var a = term()
    var done = false
    while (!done) {
      ws()
      if (p < input.length && (input(p) == '+' || input(p) == '-')) {
        val op = input(p); p += 1
        a = applyOp(a, op, term())
      } else done = true
    }
    a
  }

  private def intPrimary(): Long = {
    ws()
    if (tryLit("(")) { val v = binExpr(() => intPrimary()); expectLit(")"); v }
    else if (tryLit("-")) -intPrimary()
    else if (tryLit("+")) intPrimary()
    else tryUInt().getOrElse(err(s"expecting an integer at position $p"))
  }

  def parseIntExpr(): Long = binExpr(() => intPrimary())

  private val unitSecs = Map('s' -> 1L, 'm' -> 60L, 'h' -> 3600L,
    'd' -> 86400L, 'w' -> 604800L) // time.c:34-54

  private def timePrimary(): Long = {
    ws()
    if (tryLit("(")) { val v = binExpr(() => timePrimary()); expectLit(")"); v }
    else if (tryLit("-")) -timePrimary()
    else if (tryKw("now")) now
    else if (p < input.length && (input(p) == '\'' || input(p) == '"'))
      parseDate(expectString()) * factor
    else {
      val n = tryUInt().getOrElse(err(s"expecting a time value at position $p"))
      if (p < input.length && unitSecs.contains(input(p)) &&
          !word.findPrefixOf(input.substring(p)).exists(_.length > 1)) {
        val u = input(p); p += 1
        n * unitSecs(u) * factor
      } else n
    }
  }

  def parseTimeExpr(): Long = binExpr(() => timePrimary())

  /** ISO8601 under the database timezone (src/siri/db/query.c:916-945,
    * src/iso8601/iso8601.c:563+). NAIVE — the creation default — reads
    * dates as server-local time (help/help_timezones.md); any other
    * configured zone applies that zone; an explicit offset in the
    * string ('Z', '+hh[:mm]', '-hh:mm') always wins. */
  private def parseDate(s: String): Long = {
    val zone: ZoneId =
      if (tz == "NAIVE") ZoneId.systemDefault()
      else try ZoneId.of(tz) catch {
        case _: Exception => err(s"Unknown time zone: '$tz'. (see 'help timezones' for a list of valid time zones)")
      }
    val t0 = s.trim.replace("T", " ")
    // split an explicit trailing offset. The reference allows a tz
    // suffix only from day precision up (iso8601.c:606-649 formats
    // with the tz flag), so only strip one when what remains is still
    // a full date (two dashes) — "1970-1-10" must NOT lose its day to
    // a bogus "-10" offset.
    val offRe = "([+-][0-9]{2}(:?[0-9]{2})?|Z)$".r
    val (t, explicit) = offRe.findFirstIn(t0) match {
      case Some(o) if t0.dropRight(o.length).count(_ == '-') >= 2 ||
          t0.contains(" ") =>
        val base = t0.dropRight(o.length).trim
        if (o == "Z") (base, Some(ZoneOffset.UTC))
        else {
          val norm = if (o.length == 3) o + ":00"
            else if (!o.contains(":")) o.take(3) + ":" + o.drop(3) else o
          (base, Some(ZoneOffset.of(norm)))
        }
      case _ => (t0, None)
    }
    // the reference accepts every prefix precision %Y, %Y-%m, %Y-%m-%d,
    // + optional " %H[:%M[:%S]]" with strptime's non-padded fields
    // (iso8601.c:578-649)
    val dtRe = ("^([0-9]{4})(?:-([0-9]{1,2})(?:-([0-9]{1,2})" +
      "(?: ([0-9]{1,2})(?::([0-9]{1,2})(?::([0-9]{1,2}))?)?)?)?)?$").r
    t match {
      case dtRe(y, mo, d, h, mi, sec) =>
        def i(v: String, dflt: Int) = if (v == null) dflt else v.toInt
        try {
          val ldt = java.time.LocalDateTime.of(y.toInt, i(mo, 1), i(d, 1),
            i(h, 0), i(mi, 0), i(sec, 0))
          explicit match {
            case Some(off) => ldt.toEpochSecond(off)
            case None => ldt.atZone(zone).toEpochSecond
          }
        } catch {
          case _: Exception => err(s"unable to parse date/time string '$s'")
        }
      case _ => err(s"unable to parse date/time string '$s'")
    }
  }

  // ---- series_match (grammar :449-464) ----

  /** Series-match paren recursion guard — libcleri caps parse
    * recursion at 500 and the reference surfaces it as the message
    * below (query.c:600-611, test_select.py: 501 nested parens). */
  private var selDepth = 0

  private def seriesOperand(): Sel = {
    ws()
    if (tryLit("(")) {
      selDepth += 1
      if (selDepth > 500)
        throw QueryError(
          "Memory allocation error or maximum recursion depth reached.")
      val s = seriesMatch(); expectLit(")"); selDepth -= 1; s
    }
    else if (tryLit("*")) All
    else if (tryKw("all")) All
    else tryRegexTok().map { case (pat, ci) => SelRegex(pat, ci): Sel }
      .orElse(tryGrave().map(GroupTag(_): Sel))
      .orElse(tryString().map(Name(_): Sel))
      .getOrElse(err(s"expecting a series name, *, /regex/ or `group` at position $p"))
  }

  private def trySetOpr(): Option[String] = {
    ws()
    if (tryLit(",") || tryLit("|")) Some(",")
    else if (tryLit("&")) Some("&")
    else if (tryLit("-")) Some("-")
    else if (tryLit("^")) Some("^")
    else if (tryKw("union")) Some(",")
    else if (tryKw("intersection")) Some("&")
    else if (tryKw("difference")) Some("-")
    else if (tryKw("symmetric_difference")) Some("^")
    else None
  }

  def seriesMatch(): Sel = {
    var acc = seriesOperand()
    var op = trySetOpr()
    while (op.isDefined) { // left-to-right fold (listener.c:1559-1565)
      acc = SetOp(op.get, acc, seriesOperand())
      op = trySetOpr()
    }
    acc
  }

  // ---- aggregate_functions (grammar :577-600) ----

  private val simpleAggs: Map[String, AggFn] = Map(
    "count" -> Count, "sum" -> Sum, "mean" -> Mean, "median" -> Median,
    "median_low" -> MedianLow, "median_high" -> MedianHigh, "min" -> Min,
    "max" -> Max, "variance" -> Variance, "pvariance" -> PVariance,
    "stddev" -> Stddev, "first" -> First, "last" -> Last)

  private def optTimeArg(): Option[Long] = {
    expectLit("(")
    val v = if (tryLit(")")) None else { val t = parseTimeExpr(); expectLit(")"); Some(t) }
    v.foreach(gb => if (gb <= 0)
      err("Group by time must be an integer value larger than zero."))
    v
  }

  /** One function; Right(ts) is an offset() marker that folds into the
    * preceding bucketed aggregate below. */
  private def aggrFn(): Seq[Either[Stage, Long]] = {
    ws()
    if (tryLit("*") || tryKw("all") || tryKw("points")) return Nil // passthrough
    val w = peekWord.getOrElse(err(s"expecting an aggregation function at position $p"))
    w match {
      case f if simpleAggs.contains(f) =>
        p += f.length
        Seq(Left(Agg(simpleAggs(f), optTimeArg())))
      case "difference" =>
        p += w.length
        optTimeArg() match {
          case Some(gb) => Seq(Left(Agg(DifferenceAgg, Some(gb))))
          case None => Seq(Left(Difference))
        }
      case "derivative" =>
        p += w.length
        expectLit("(")
        if (tryLit(")")) Seq(Left(Derivative(1.0)))
        else {
          val unit = parseTimeExpr()
          if (unit == 0) // aggregate.c:384-388
            err("Time-span must be an integer value larger than zero.")
          if (tryLit(",")) {
            val gb = parseTimeExpr(); expectLit(")")
            if (gb == 0) // aggregate.c:397-404
              err("Group by time must be an integer value larger than zero.")
            Seq(Left(Agg(DerivativeAgg(unit), Some(gb)))) // aggregate.c:370-411
          } else { expectLit(")"); Seq(Left(Derivative(unit.toDouble))) }
        }
      case "timeval" =>
        p += w.length; expectLit("("); expectLit(")"); Seq(Left(Timeval))
      case "interval" =>
        p += w.length; expectLit("("); expectLit(")"); Seq(Left(Interval))
      case "filter" =>
        p += w.length; expectLit("(")
        val op = Seq("==", "!=", "<=", ">=", "<", ">", "!~", "~")
          .find(tryLit).getOrElse("==")
        val st: Stage =
          tryRegexTok().map { case (pat, ci) =>
            // bare /re/ means ==; != keeps the non-matching points
            // (itest/test_select.py:250-263)
            if (op != "==" && op != "!=")
              err("Regular expressions can only be used with 'equal' (==) or 'not equal' (!=) operator.")
            FilterRegex(pat, ci, negate = op == "!="): Stage
          }.orElse(tryString().map(FilterStr(op, _): Stage))
            .getOrElse {
              if (tryKw("nan")) FilterNum(op, Double.NaN)
              else if (tryKw("inf")) FilterNum(op, Double.PositiveInfinity)
              else {
                // signed literals per grammar r_integer/r_float
                // (grammar.py:34-35); '-inf' is a keyword form, but a
                // '-' followed by digits must stay with the number
                val save = p
                if (tryLit("-") && tryKw("inf")) FilterNum(op, Double.NegativeInfinity)
                else { p = save; FilterNum(op, parseFloatLit()) }
              }
            }
        expectLit(")")
        Seq(Left(st))
      case "limit" =>
        p += w.length; expectLit("(")
        val n = parseIntExpr()
        if (n <= 0) err("Limit must be an integer value larger than zero.")
        expectLit(",")
        val fw = peekWord.filter(simpleAggs.contains)
          .getOrElse(err(s"expecting an aggregation function at position $p"))
        p += fw.length
        expectLit(")")
        Seq(Left(LimitFn(n.toInt, simpleAggs(fw))))
      case "offset" =>
        p += w.length; expectLit("(")
        val ts = parseTimeExpr(); expectLit(")")
        Seq(Right(ts))
      case other => err(s"unknown aggregation function '$other'")
    }
  }

  private val floatRe: Regex = "[-+]?[0-9]*\\.?[0-9]+".r

  private def parseFloatLit(): Double = {
    ws()
    floatRe.findPrefixOf(input.substring(p)) match {
      case Some(s) => p += s.length; s.toDouble
      case None => err(s"expecting a number at position $p")
    }
  }

  /** Chain of functions joined by `=>`; offset() folds into the
    * preceding bucketed aggregate (aggregate.c:224-236). */
  def aggregateFunctions(): Seq[Stage] = {
    var stages = aggrFn()
    while (tryLit("=>")) stages ++= aggrFn()
    stages.foldLeft(Vector.empty[Stage]) {
      case (acc :+ Agg(fn, Some(gb), _), Right(ts)) =>
        acc :+ Agg(fn, Some(gb), ts % gb)
      case (_, Right(_)) => // aggregate.c:225-229
        err("Offset must be used after an aggregation method.")
      case (acc, Left(st)) => acc :+ st
    }
  }

  // ---- where cexpr (grammar where_series :350-366 and the per-entity
  //      variants :319-431); prop kinds: i=int expr, t=time expr,
  //      s=string, y=series-type keyword ----

  /** where_series props (siridb_series_cexpr_cb, series.c:85-112). */
  private val seriesProps = Map("length" -> 'i', "pool" -> 'i',
    "start" -> 't', "end" -> 't', "shard_duration" -> 't',
    "name" -> 's', "type" -> 'y')
  private val groupProps = Map("name" -> 's', "expression" -> 's', "series" -> 'i')
  private val tagProps = Map("name" -> 's', "series" -> 'i')
  private val userProps = Map("name" -> 's', "access" -> 'a')
  private val poolProps = Map("pool" -> 'i', "servers" -> 'i', "series" -> 'i')
  private val shardProps = Map("sid" -> 'i', "pool" -> 'i', "size" -> 'i',
    "start" -> 't', "end" -> 't', "server" -> 's', "status" -> 's',
    "type" -> 'z') // type is the number|log keyword pair (grammar :407-423)

  /** Nested-paren depth inside a where expression — the reference's
    * cexpr builder keeps a fixed stack of CEXPR_MAX_CURLY_DEPTH=6
    * (cexpr.h:7, cexpr.c:659) and errors when it fills. */
  private var whereDepth = 0

  private def cexprCmp(props: Map[String, Char]): Cexpr = {
    ws()
    if (tryLit("(")) {
      whereDepth += 1
      if (whereDepth >= 6)
        throw QueryError("Max depth reached in 'where' expression!") // listener.c:1903
      val c = cexprOr(props); expectLit(")"); whereDepth -= 1; return c
    }
    val prop = peekWord.getOrElse(err(s"expecting a property name at position $p"))
    p += prop.length
    val op = Seq("==", "!=", "<=", ">=", "<", ">", "!~", "~")
      .find(tryLit).getOrElse(err(s"expecting a comparison operator at position $p"))
    val kind = props.getOrElse(prop, err(s"unknown property '$prop'"))
    // grammar permits ~ / !~ only on string props (grammar.py :350-366)
    if ((op == "~" || op == "!~") && kind != 's')
      err(s"cannot use '$op' on property '$prop'")
    kind match {
      case 'i' => CCmp(prop, op, Left(parseIntExpr()))
      case 't' => CCmp(prop, op, Left(parseTimeExpr()))
      case 's' => CCmp(prop, op, Right(expectString()))
      case 'y' =>
        if (op != "==" && op != "!=") err("type supports only == and !=")
        val t = peekWord.filter(Set("string", "integer", "float"))
          .getOrElse(err("expecting string, integer or float"))
        p += t.length
        CCmp(prop, op, Right(t))
      case 'z' => // shard type keywords (grammar :407-423)
        if (op != "==" && op != "!=") err("type supports only == and !=")
        val t = peekWord.filter(Set("number", "log"))
          .getOrElse(err("expecting number or log"))
        p += t.length
        CCmp(prop, op, Right(t))
      case 'a' => // access compares as BITS against an access keyword
        // with int operators (grammar :427: k_access int_operator
        // access_keywords)
        val kw = peekWord.filter(accessKws)
          .getOrElse(err(s"expecting an access keyword at position $p"))
        p += kw.length
        CCmp("access_bits", op, Left(graft.meta.Access.fromKeyword(kw).toLong))
      case 'b' => // bool props: bool_operator (== !=) with the true/
        // false keywords (grammar :402: k_online bool_operator _boolean)
        if (op != "==" && op != "!=") err(s"cannot use '$op' on property '$prop'")
        val kw = peekWord.filter(Set("true", "false"))
          .getOrElse(err(s"expecting true or false at position $p"))
        p += kw.length
        CCmp(prop, op, Right(kw))
      case 'l' => // log_level compares as the logger ordinal against a
        // level keyword (grammar :401: k_log_level int_operator
        // log_keywords; logger.h:14-18 debug=0..critical=4)
        if (op == "~" || op == "!~") err(s"cannot use '$op' on property '$prop'")
        val kw = peekWord.filter(logLevels.contains)
          .getOrElse(err(s"expecting a log level at position $p"))
        p += kw.length
        CCmp("log_level_int", op, Left(logLevels(kw)))
    }
  }

  /** log_keywords ordinals (logger.h:14-18). */
  private val logLevels = Map("debug" -> 0L, "info" -> 1L,
    "warning" -> 2L, "error" -> 3L, "critical" -> 4L)

  private def cexprAnd(props: Map[String, Char]): Cexpr = {
    var a = cexprCmp(props)
    while (tryKw("and")) a = CAnd(a, cexprCmp(props))
    a
  }

  private def cexprOr(props: Map[String, Char]): Cexpr = {
    var a = cexprAnd(props)
    while (tryKw("or")) a = COr(a, cexprAnd(props))
    a
  }

  private def tryWhere(props: Map[String, Char] = seriesProps): Option[Cexpr] =
    if (tryKw("where")) Some(cexprOr(props)) else None

  // ---- statements ----

  private def selectStmt(): SelectStmt = {
    def chain(): SelectChain = {
      val stages = aggregateFunctions()
      val prefix = if (tryKw("prefix")) expectString() else ""
      val suffix = if (tryKw("suffix")) expectString() else ""
      SelectChain(stages, prefix, suffix)
    }
    // select_aggregates is ','-separated, but ',' after `from` belongs
    // to series_match — the chain list ends at `from`
    val chains = Vector.newBuilder[SelectChain]
    chains += chain()
    while (tryLit(",")) chains += chain()
    expectKw("from")
    val sel = seriesMatch()
    val where = tryWhere()
    val range: Option[Stage] =
      if (tryKw("after")) Some(TimeRange(Some(parseTimeExpr()), None))
      else if (tryKw("between")) {
        val a = parseTimeExpr(); expectKw("and")
        val b = parseTimeExpr()
        if (a > b) // exit_between_expr (listener.c:2115-2123)
          err(s"Start time ($a) should not be greater than end time ($b)")
        Some(TimeRange(Some(a), Some(b)))
      }
      else if (tryKw("before")) Some(TimeRange(None, Some(parseTimeExpr())))
      else if (tryKw("head")) {
        val n = parseIntExpr() // 1..MAX_HEADTAIL (siri.h:21, listener.c:1972)
        if (n <= 0 || n > 1000000L)
          err(s"Head must be a value between 1 and 1000000, got $n")
        Some(Head(n.toInt))
      } else if (tryKw("tail")) {
        val n = parseIntExpr() // listener.c:1993
        if (n <= 0 || n > 1000000L)
          err(s"Tail must be a value between 1 and 1000000, got $n")
        Some(Tail(n.toInt))
      }
      else None
    val merge =
      if (tryKw("merge")) {
        expectKw("as")
        val name = expectString()
        val using = if (tryKw("using")) aggregateFunctions() else Nil
        Some(MergeAs(name, using))
      } else None
    val result = chains.result()
    // prefix/suffix must give every select column a unique name
    // (siridb_presuf_is_unique, presuf.c:105-119; listener.c:3992-3999)
    if (result.size > 1 &&
        result.map(c => (c.prefix, c.suffix)).distinct.size != result.size)
      err("When using multiple select methods, add a prefix " +
        "and/or suffix to the selection to make them unique.")
    SelectStmt(result, sel, where, range, merge)
  }

  private val seriesCols = Set("name", "type", "length", "start", "end",
    "shard_duration", "pool")

  /** Optional per-entity column list (grammar *_columns :242-317). */
  private def entityCols(props: Map[String, Char]): Seq[String] = {
    val cols = Vector.newBuilder[String]
    var more = peekWord.exists(props.contains)
    while (more) {
      val c = peekWord.get; p += c.length
      cols += c
      more = tryLit(",")
      if (more && !peekWord.exists(props.contains)) { p -= 1; more = false }
    }
    cols.result()
  }

  private def listEntity(entity: String, props: Map[String, Char]): Statement = {
    val cols = entityCols(props)
    val where = tryWhere(props)
    // Optional(limit_expr) closes EVERY list statement (grammar :832)
    val limit = if (tryKw("limit")) Some(parseIntExpr()) else None
    ListEntityStmt(entity, where, cols, limit)
  }

  private def listStmt(): Statement = {
    expectKw("list")
    if (tryKw("groups")) return listEntity("groups", groupProps)
    if (tryKw("tags")) return listEntity("tags", tagProps)
    if (tryKw("users")) return listEntity("users", userProps)
    if (tryKw("pools")) return listEntity("pools", poolProps)
    if (tryKw("shards")) return listEntity("shards", shardProps)
    if (tryKw("servers")) return listEntity("servers", serverProps)
    expectKw("series")
    val cols = Vector.newBuilder[String]
    var more = peekWord.exists(seriesCols)
    while (more) {
      val c = peekWord.get; p += c.length
      cols += c
      more = tryLit(",") // a ',' continues the column list only if a
      if (more && !peekWord.exists(seriesCols)) { p -= 1; more = false }
    }
    val sel = peekSeriesMatchStart().map(_ => seriesMatch())
    val where = tryWhere()
    val limit = if (tryKw("limit")) Some(parseIntExpr()) else None
    val c = cols.result()
    ListSeriesStmt(if (c.isEmpty) Seq("name") else c, sel, where, limit)
  }

  private def peekSeriesMatchStart(): Option[Unit] = {
    ws()
    if (p < input.length &&
        (input(p) == '\'' || input(p) == '"' || input(p) == '/' ||
          input(p) == '`' || input(p) == '*' || input(p) == '(' ||
          peekWord.contains("all"))) Some(())
    else None
  }

  private def countStmt(): Statement = {
    expectKw("count")
    if (tryKw("series")) {
      // `count series length` vs `count series [match]` — length wins
      // unless followed by a comparison operator (then it's a where prop;
      // not valid here, so keyword check suffices)
      if (tryKw("length")) {
        val sel = peekSeriesMatchStart().map(_ => seriesMatch())
        CountStmt("series_length", sel, tryWhere())
      } else {
        val sel = peekSeriesMatchStart().map(_ => seriesMatch())
        CountStmt("series", sel, tryWhere())
      }
    }
    else if (tryKw("groups")) CountStmt("groups", None, tryWhere(groupProps))
    else if (tryKw("tags")) CountStmt("tags", None, tryWhere(tagProps))
    else if (tryKw("pools")) CountStmt("pools", None, tryWhere(poolProps))
    else if (tryKw("users")) CountStmt("users", None, tryWhere(userProps))
    else if (tryKw("servers")) {
      // all three forms take Optional(where_server) (grammar :694-703)
      if (tryKw("received_points"))
        CountStmt("servers_received", None, tryWhere(serverProps))
      else if (tryKw("selected_points"))
        CountStmt("servers_selected", None, tryWhere(serverProps))
      else CountStmt("servers", None, tryWhere(serverProps))
    }
    else if (tryKw("shards")) {
      if (tryKw("size")) CountStmt("shards_size", None, tryWhere(shardProps))
      else CountStmt("shards", None, tryWhere(shardProps))
    }
    else err("expecting series, groups, tags, pools, users, servers or shards after 'count'")
  }

  // ---- DDL / admin (grammar :716-768) ----

  private def expectGrave(): String =
    tryGrave().getOrElse(err(s"expecting a `grave-quoted` name at position $p"))

  private def expectRegex(): String =
    tryRegexTok().map(_._1).getOrElse(err(s"expecting a /regex/ at position $p"))

  private def setPassword(): String = {
    expectKw("set"); expectKw("password"); expectString()
  }

  private def createStmt(): Statement = {
    expectKw("create")
    if (tryKw("group")) {
      val name = expectGrave(); expectKw("for")
      CreateGroup(name, expectRegex())
    } else if (tryKw("user")) {
      val name = expectString()
      CreateUser(name, setPassword())
    } else err("expecting group or user after 'create'")
  }

  /** Server reference: quoted 'name' or a bare uuid token
    * (grammar uuid :447: Choice(r_uuid_str, string)). */
  private def tryServerRef(): Option[String] = {
    tryString().orElse {
      ws()
      "[0-9a-fA-F][0-9a-fA-F-]{7,}".r.findPrefixOf(input.substring(p))
        .map { s => p += s.length; s }
    }
  }

  private def dropStmt(): Statement = {
    expectKw("drop")
    if (tryKw("group")) DropGroup(expectGrave())
    else if (tryKw("tag")) DropTag(expectGrave())
    else if (tryKw("user")) DropUser(expectString())
    else if (tryKw("server"))
      DropServer(tryServerRef().getOrElse(err("expecting a server name or uuid")))
    else if (tryKw("series")) {
      // bare `drop series` drops ALL series in the reference (the
      // match and where are both Optional, grammar drop_series; the
      // drop_threshold guard still protects against the mass drop)
      val sel = peekSeriesMatchStart().map(_ => seriesMatch())
      val where = tryWhere()
      DropSeries(sel, where, tryIgnoreThreshold())
    }
    else if (tryKw("shards"))
      DropShards(tryWhere(shardProps), tryIgnoreThreshold())
    else err("expecting group, tag, user, server, series or shards after 'drop'")
  }

  private def tryIgnoreThreshold(): Boolean =
    if (tryKw("set")) {
      expectKw("ignore_threshold")
      if (tryKw("true")) true
      else if (tryKw("false")) false
      else err("expecting true or false")
    } else false

  private def alterStmt(): Statement = {
    expectKw("alter")
    if (tryKw("series")) {
      val sel = seriesMatch()
      val where = tryWhere()
      if (tryKw("tag")) AlterSeriesTag(sel, where, expectGrave(), untag = false)
      else if (tryKw("untag")) AlterSeriesTag(sel, where, expectGrave(), untag = true)
      else err("expecting tag or untag")
    } else if (tryKw("user")) {
      // grammar alter_user :675-677: set_password | set_name
      val name = expectString()
      expectKw("set")
      if (tryKw("password")) AlterUser(name, expectString())
      else if (tryKw("name")) AlterUserName(name, expectString())
      else err("expecting password or name after 'set'")
    } else if (tryKw("group")) {
      // grammar alter_group :655-657: set_expression | set_name
      val name = expectGrave()
      expectKw("set")
      if (tryKw("expression")) AlterGroup(name, expectRegex())
      else if (tryKw("name")) AlterGroupName(name, expectString())
      else err("expecting expression or name after 'set'")
    } else if (tryKw("tag")) {
      // grammar alter_tag :660-661: set_name takes a string literal
      val name = expectGrave()
      expectKw("set"); expectKw("name")
      AlterTag(name, expectString())
    } else if (tryKw("servers")) {
      // all-servers form (grammar alter_servers :671); a where clause
      // filters the (single-node: one-element) fleet
      val where = tryWhere(serverProps)
      expectKw("set")
      val st = serverSet(None)
      where.map(_ => st).getOrElse(st)
    } else if (tryKw("server")) {
      val ref = tryServerRef()
      expectKw("set")
      serverSet(ref.orElse(Some("local")))
    } else if (tryKw("database")) {
      expectKw("set")
      val prop = peekWord.getOrElse(err("expecting a database property"))
      p += prop.length
      var ignore = false
      val value = prop match {
        case "drop_threshold" => parseFloatLit().toString
        case "list_limit" | "select_points_limit" => parseIntExpr().toString
        case "expiration_num" | "expiration_log" =>
          val v = parseTimeExpr().toString
          // Optional(set_ignore_threshold) (grammar set_expiration_*):
          // bypasses the planner's drop-threshold guard on the shards
          // the new expiration would expire (listener.c:4384-4402)
          ignore = tryIgnoreThreshold()
          v
        case "timezone" => expectString()
        case "tee" => if (tryKw("false")) "false" else expectString()
        case other => err(s"unknown database property '$other'")
      }
      AlterDatabase(prop, value, ignore)
    } else err("expecting series, user, group, tag, server or database after 'alter'")
  }

  /** set_log_level / set_backup_mode / set_address / set_port
    * (grammar :615-628). */
  private def serverSet(ref: Option[String]): Statement = {
    val prop = peekWord
      .getOrElse(err("expecting log_level, backup_mode, address or port"))
    p += prop.length
    prop match {
      case "log_level" =>
        val lvl = peekWord.filter(Set("debug", "info", "warning", "error", "critical"))
          .getOrElse(err("expecting a log level (debug, info, warning, error, critical)"))
        p += lvl.length
        AlterServer(ref, "log_level", lvl)
      case "backup_mode" =>
        if (tryKw("true")) AlterServer(ref, "backup_mode", "true")
        else if (tryKw("false")) AlterServer(ref, "backup_mode", "false")
        else err("expecting true or false")
      case "address" => AlterServer(ref, "address", expectString())
      case "port" => AlterServer(ref, "port", parseIntExpr().toString)
      case other => err(s"unknown server property '$other'")
    }
  }

  /** where_server / server_columns props (grammar :369-431;
    * src/siri/db/props.c:204-286). */
  private val serverProps = Map(
    "name" -> 's', "address" -> 's', "port" -> 'i', "uuid" -> 's',
    "pool" -> 'i', "version" -> 's', "online" -> 'b', "status" -> 's',
    "active_handles" -> 'i', "active_tasks" -> 'i', "buffer_path" -> 's',
    "buffer_size" -> 'i', "dbpath" -> 's', "fifo_files" -> 'i',
    "idle_percentage" -> 'i', "idle_time" -> 'i', "ip_support" -> 's',
    "libuv" -> 's', "list_limit" -> 'i', "log_level" -> 'l',
    "max_open_files" -> 'i', "mem_usage" -> 'i', "open_files" -> 'i',
    "received_points" -> 'i', "reindex_progress" -> 's',
    "selected_points" -> 'i', "select_points_limit" -> 'i',
    "startup_time" -> 'i', "sync_progress" -> 's', "uptime" -> 'i')

  /** access_expr (grammar :200-215, :465): comma list of access keywords. */
  private val accessKws = Set("read", "write", "modify", "full",
    "select", "show", "list", "count", "create", "insert", "drop",
    "grant", "revoke", "alter")

  private def accessExpr(): Seq[String] = {
    val out = Vector.newBuilder[String]
    var more = true
    while (more) {
      val w = peekWord.filter(accessKws)
        .getOrElse(err(s"expecting an access keyword at position $p"))
      p += w.length
      out += w
      more = tryLit(",")
    }
    out.result()
  }

  private def grantStmt(): Statement = {
    expectKw("grant")
    val access = accessExpr()
    expectKw("to"); expectKw("user")
    val name = expectString()
    val pw = if (tryKw("set")) { expectKw("password"); Some(expectString()) } else None
    GrantUser(access, name, pw)
  }

  private def revokeStmt(): Statement = {
    expectKw("revoke")
    val access = accessExpr()
    expectKw("from"); expectKw("user")
    RevokeUser(access, expectString())
  }

  private def showStmt(): Statement = {
    expectKw("show")
    val props = Vector.newBuilder[String]
    var w = peekWord
    while (w.isDefined) {
      props += w.get; p += w.get.length
      w = if (tryLit(",")) peekWord else None
    }
    ShowStmt(props.result())
  }

  def parse(): Statement = {
    val timeit = tryKw("timeit")
    val stmt: Statement = peekWord match {
      case Some("select") => expectKw("select"); selectStmt()
      case Some("list") => listStmt()
      case Some("count") => countStmt()
      case Some("show") => showStmt()
      case Some("create") => createStmt()
      case Some("drop") => dropStmt()
      case Some("alter") => alterStmt()
      case Some("grant") => grantStmt()
      case Some("revoke") => revokeStmt()
      case Some("help") =>
        expectKw("help")
        // topics can be multi-word ('help alter database')
        val words = Vector.newBuilder[String]
        var w = peekWord
        while (w.isDefined) { words += w.get; p += w.get.length; w = peekWord }
        val t = words.result()
        HelpStmt(if (t.isEmpty) None else Some(t.mkString(" ")))
      case _ => CalcStmt(parseTimeExpr()) // calc_stmt (grammar :770)
    }
    ws()
    if (p < input.length) err(s"unexpected input at position $p: '${input.substring(p).take(20)}'")
    if (timeit) TimeitStmt(stmt) else stmt
  }
}

object QueryParser {
  /** Parse with `now` captured once (query.c:109,592-595); `tz` is the
    * database timezone applied to ISO8601 date strings. */
  def parse(q: String, now: Long = System.currentTimeMillis() / 1000,
      factor: Long = 1L, tz: String = "NAIVE"): Statement = {
    // MAX_QUERY_PKG_SIZE (clserver.c:41,454-468) — the reference
    // measures the package in BYTES
    if (q.getBytes(java.nio.charset.StandardCharsets.UTF_8).length > 65535)
      throw QueryError("Query too long.")
    new QueryParser(q, now, factor, tz).parse()
  }
}
