package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Pipeline._
import graft.engine.SeriesMatch._
import graft.parser._

/** Pins the parser against the reference grammar
  * (grammar/grammar.py) and the parse-time constant folding
  * (src/siri/db/query.c:715-850, src/expr/expr.c). */
class QueryParserSpec extends AnyFunSuite {

  private val NOW = 1706659200L
  private def parse(q: String) = QueryParser.parse(q, NOW)

  test("calc: int64 arithmetic with units, parens, precedence") {
    assert(parse("1 + 2 * 3") === CalcStmt(7))
    assert(parse("(1 + 2) * 3") === CalcStmt(9))
    assert(parse("2h + 30m") === CalcStmt(9000))
    assert(parse("1d") === CalcStmt(86400))
    assert(parse("1w") === CalcStmt(604800))
    assert(parse("now - now % 1d") === CalcStmt(NOW - NOW % 86400))
    assert(parse("'2016-11-14'") === CalcStmt(1479081600L))
    assert(parse("'2016-11-14 13:30:00'") === CalcStmt(1479130200L))
    assert(parse("7 / 2") === CalcStmt(3)) // truncating int64 division
  }

  test("calc: division/modulo by zero are query errors — expr.c:53-61") {
    assertThrows[QueryError](parse("5 / 0"))
    assertThrows[QueryError](parse("5 % 0"))
  }

  test("ms-precision factor scales units and dates but not integers") {
    val s = QueryParser.parse("1h", NOW * 1000, factor = 1000L)
    assert(s === CalcStmt(3600000L))
    val d = QueryParser.parse("'2016-11-14'", NOW * 1000, factor = 1000L)
    assert(d === CalcStmt(1479081600000L))
    val i = QueryParser.parse("42", NOW * 1000, factor = 1000L)
    assert(i === CalcStmt(42L))
  }

  test("select: chain, series match, between, merge-using") {
    val q = "select filter(> 0) => sum(1h) from /^cpu\\./ , 'mem' " +
      "between 100 and 1d merge as 'all' using mean(2h)"
    parse(q) match {
      case SelectStmt(Seq(chain), sel, None, Some(range), Some(merge)) =>
        assert(chain.stages === Seq(FilterNum(">", 0.0), Agg(Sum, Some(3600))))
        assert(sel === SetOp(",", Regex("^cpu\\."), Name("mem")))
        assert(range === TimeRange(Some(100L), Some(86400L)))
        assert(merge === MergeAs("all", Seq(Agg(Mean, Some(7200)))))
      case other => fail(other.toString)
    }
  }

  test("select: multiple chains need unique prefix/suffix — listener.c:3992-3999") {
    assertThrows[QueryError](parse("select min(1h), max(1h) from 'a'"))
    parse("select min(1h) prefix 'a-', max(1h) from 'a'") match {
      case SelectStmt(chains, _, _, _, _) => assert(chains.size === 2)
      case other => fail(other.toString)
    }
  }

  test("select: offset folds into the preceding aggregate — aggregate.c:224-236") {
    parse("select sum(1h) => offset(10m) from 'a'") match {
      case SelectStmt(Seq(chain), _, _, _, _) =>
        assert(chain.stages === Seq(Agg(Sum, Some(3600), 600)))
      case other => fail(other.toString)
    }
    assert(intercept[QueryError](parse("select offset(10m) from 'a'")).msg ===
      "Offset must be used after an aggregation method.")
    // zero time arguments use the reference's exact messages
    assert(intercept[QueryError](parse("select derivative(0) from 'a'")).msg ===
      "Time-span must be an integer value larger than zero.")
    assert(intercept[QueryError](parse("select derivative(1h, 0) from 'a'")).msg ===
      "Group by time must be an integer value larger than zero.")
    assert(intercept[QueryError](parse("select sum(6 - 6) from 'a'")).msg ===
      "Group by time must be an integer value larger than zero.")
    assert(intercept[QueryError](parse("select limit(6 - 6, mean) from 'a'")).msg ===
      "Limit must be an integer value larger than zero.")
  }

  test("select: head/tail/after/before ranges") {
    parse("select * from all head 5") match {
      case SelectStmt(Seq(c), All, _, Some(Head(5)), _) => assert(c.stages.isEmpty)
      case other => fail(other.toString)
    }
    parse("select * from * after now - 1h") match {
      case SelectStmt(_, All, _, Some(TimeRange(Some(a), None)), _) =>
        assert(a === NOW - 3600)
      case other => fail(other.toString)
    }
  }

  test("series match set algebra with keywords and parens") {
    parse("select * from ('a' | 'b') & /x/ - `g` head 1") match {
      case SelectStmt(_, sel, _, _, _) =>
        assert(sel === SetOp("-",
          SetOp("&", SetOp(",", Name("a"), Name("b")), Regex("x")),
          GroupTag("g")))
      case other => fail(other.toString)
    }
    assert(parse("select * from 'a' union 'b' head 1")
      .asInstanceOf[SelectStmt].sel === SetOp(",", Name("a"), Name("b")))
  }

  test("where cexpr: and/or precedence, all operators") {
    parse("list series where length > 5 and name ~ 'x' or type == integer") match {
      case ListSeriesStmt(Seq("name"), None, Some(w), None) =>
        assert(w === COr(
          CAnd(CCmp("length", ">", Left(5)), CCmp("name", "~", Right("x"))),
          CCmp("type", "==", Right("integer"))))
      case other => fail(other.toString)
    }
  }

  test("list series with columns, match and limit") {
    parse("list series name, length, pool /^i\\./ limit 20") match {
      case ListSeriesStmt(cols, Some(Regex("^i\\.", false)), None, Some(20)) =>
        assert(cols === Seq("name", "length", "pool"))
      case other => fail(other.toString)
    }
  }

  test("count series / count series length / timeit") {
    assert(parse("count series") === CountStmt("series", None, None))
    assert(parse("count series length") === CountStmt("series_length", None, None))
    assert(parse("timeit count series") === TimeitStmt(CountStmt("series", None, None)))
  }

  test("filter variants: regex, string, nan/inf literals") {
    def stages(q: String) =
      parse(q).asInstanceOf[SelectStmt].chains.head.stages
    assert(stages("select filter(/err.*/i) from 'a' head 1") ===
      Seq(FilterRegex("err.*", caseInsensitive = true)))
    assert(stages("select filter(~ 'x') from 'a' head 1") === Seq(FilterStr("~", "x")))
    assert(stages("select filter(!= nan) from 'a' head 1").toString.contains("NaN"))
    assert(stages("select filter(== inf) from 'a' head 1") ===
      Seq(FilterNum("==", Double.PositiveInfinity)))
    assert(stages("select filter(== -inf) from 'a' head 1") ===
      Seq(FilterNum("==", Double.NegativeInfinity)))
  }

  test("filter: signed numeric literals keep their sign — grammar r_integer/r_float :34-35") {
    def stages(q: String) =
      parse(q).asInstanceOf[SelectStmt].chains.head.stages
    assert(stages("select filter(> -5) from 'a' head 1") === Seq(FilterNum(">", -5.0)))
    assert(stages("select filter(<= -2.5) from 'a' head 1") ===
      Seq(FilterNum("<=", -2.5)))
  }

  test("where cexpr: ~ and !~ are string-prop-only — grammar :350-366") {
    assertThrows[QueryError](parse("list series where length ~ 5"))
    assertThrows[QueryError](parse("list series where start !~ 100"))
    // still fine on a string prop
    parse("list series where name !~ 'x'")
  }

  test("head/tail bounds: 1..1000000 — siri.h:21, listener.c:1972,1993") {
    val e = intercept[QueryError](parse("select * from 'a' head 0"))
    assert(e.msg === "Head must be a value between 1 and 1000000, got 0")
    assertThrows[QueryError](parse("select * from 'a' tail 1000001"))
    parse("select * from 'a' head 1000000")
  }

  test("between with start > end is a query error — listener.c:2115-2123") {
    val e = intercept[QueryError](
      parse("select * from 'a' between 200 and 100"))
    assert(e.msg === "Start time (200) should not be greater than end time (100)")
    parse("select * from 'a' between 100 and 100") // equal bounds allowed
  }

  test("adjacent quoted fragments concatenate — grammar :38-39") {
    assert(parse("select * from 'se' 'ries' head 1")
      .asInstanceOf[SelectStmt].sel === Name("series"))
  }

  test("syntax errors carry position info") {
    val e = intercept[QueryError](parse("select bogus(1h) from 'a'"))
    assert(e.msg.contains("bogus"))
    assertThrows[QueryError](parse("select sum(1h from 'a'"))
    assertThrows[QueryError](parse("list series where frobnicate > 1"))
  }
}
