package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.engine.{Pipeline, SeriesMatch}
import graft.engine.Pipeline.FilterRegex
import graft.engine.SeriesMatch.{Env, Regex => SelRegex}

/** PCRE2-dialect conformance for the two regex surfaces (series match
  * and filter(/re/)). The reference compiles every pattern with PCRE2
  * after overwriting the slashes with '^' and '$'
  * (src/siri/db/re.c:31-44) — i.e. /re/ is an anchored FULL match and
  * /a|b/ anchors as ^a|b$ with NO grouping. The corpus below pins the
  * agreed Java↔PCRE2 subset (expectations hand-derived from
  * pcre2pattern(3) semantics) and documents the divergences.
  */
class RegexConformanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def javaMatch(p: String, s: String, ci: Boolean = false): Boolean =
    java.util.regex.Pattern.compile(SeriesMatch.anchored(p, ci)).matcher(s).find()

  /** (pattern-as-written-between-slashes, input, PCRE2 result). */
  private val agreed: Seq[(String, String, Boolean)] = Seq(
    // anchoring itself: /re/ is a FULL match
    ("cpu", "cpu", true),
    ("cpu", "cpu.0", false), // NOT a substring search
    ("cpu\\..*", "cpu.0", true),
    (".*\\.0", "cpu.0", true),
    // alternation is NOT grouped by the anchors: ^a|b$ matches a
    // leading 'a...' or a trailing '...b' (exactly what PCRE2 sees)
    ("a|b", "a-tail", true),
    ("a|b", "head-b", true),
    ("a|b", "head-b-tail", false),
    ("(a|b)", "a", true),
    ("(a|b)", "ab", false),
    // classes, ranges, negation
    ("[a-z]+\\.[0-9]+", "disk.12", true),
    ("[^.]+", "nodots", true),
    ("[^.]+", "with.dot", false),
    // quantifiers: greedy, lazy, possessive, bounded
    ("a{2,3}", "aa", true),
    ("a{2,3}", "aaaa", false),
    ("ab*?c", "abbbc", true),
    ("a++b", "aaab", true),
    ("(?>a+)ab", "aaab", false), // atomic group eats all a's
    // escapes and word boundaries
    ("\\d+\\.\\d+", "10.25", true),
    ("\\w+-\\s\\w+", "cpu- load", true),
    ("\\bcpu\\b.*", "cpu load", true),
    // anchors inside the pattern (double anchor is harmless)
    ("^cpu$", "cpu", true),
    ("\\Acpu\\z", "cpu", true),
    // backreference and named group (both dialects use (?<name>...))
    ("(ab)-\\1", "ab-ab", true),
    ("(?<x>ab)-\\k<x>", "ab-ab", true),
    // lookahead / lookbehind
    ("(?=cpu).*", "cpu.0", true),
    ("(?!mem).*", "cpu.0", true),
    ("c(?<=c)pu", "cpu", true),
    // inline flags
    ("(?i)CPU\\..*", "cpu.9", true),
    // \Q..\E literal quoting
    ("\\Qc.p+u\\E", "c.p+u", true),
    ("\\Qc.p+u\\E", "cxp+u", false),
    // POSIX bracket classes: PCRE2 compiles them; Java would silently
    // read a class of LITERALS — anchored() translates them to \p{..}
    ("[[:digit:]]+", "123", true),
    ("[[:digit:]]+", "12a", false),
    ("[[:alpha:]_]+", "cpu_load", true),
    ("[[:^digit:]]+", "abc", true),
    ("[[:^digit:]]+", "a1c", false),
    ("[[:xdigit:]]+", "1aF", true),
    ("[[:word:]]+", "cpu_0", true),
    // line-terminator parity ((?d) UNIX_LINES): PCRE2's `.` refuses
    // only \n (Java default also refuses \r/NEL/LS/PS), and `$`
    // matches before a final \n ONLY (Java default: any terminator)
    ("a.b", "a\rb", true),
    ("a.b", "a\nb", false),
    ("abc", "abc\n", true),
    ("abc", "abc\r", false))

  test("agreed subset: Java anchored matching reproduces PCRE2 on the corpus") {
    agreed.foreach { case (p, s, exp) =>
      assert(javaMatch(p, s) === exp, s"/$p/ on '$s' expected $exp")
    }
  }

  test("/re/i maps to PCRE2_CASELESS") {
    assert(javaMatch("mem\\.[0-9]", "MEM.3", ci = true))
    assert(!javaMatch("mem\\.[0-9]", "MEM.3", ci = false))
  }

  /** Constructs PCRE2 accepts that Java REJECTS at compile time — the
    * engine surfaces these as the reference's query error ("Cannot
    * compile regular expression '%s': %s", re.c:55-67) at PLAN time,
    * never as a raw PatternSyntaxException from inside an executor
    * task. The divergence envelope is: Python-syntax named groups,
    * recursion/subroutine calls, \K match reset, callouts, \g backref
    * forms, branch reset, and conditionals. (POSIX classes diverge
    * silently — pinned below.) */
  private val javaRejects = Seq(
    "(?P<n>ab)",  // PCRE2/Python named-group syntax
    "(?R)",       // recursion
    "(?1)ab",     // subroutine call
    "a\\Kb",      // match-start reset
    "(?C0)ab",    // callout
    "\\g{1}(a)",  // PCRE2 backref syntax
    "(?|(a)|(b))", // branch reset
    "(?(1)a|b)")  // conditional

  test("documented divergences: PCRE2-only constructs raise the reference's query error") {
    javaRejects.foreach { p =>
      val e = intercept[graft.parser.QueryError](SeriesMatch.anchored(p))
      assert(e.getMessage.startsWith("Cannot compile regular expression"), p)
    }
    // ... and through the parser surface too, not just the helper
    assertThrows[graft.parser.QueryError](
      graft.parser.QueryParser.parse("list series /a\\Kb/"))
  }

  test("possessive quantifiers and atomic groups agree with PCRE2 — allowed, pinned") {
    // both engines: possessive/atomic consume without backtracking,
    // so the trailing 'a' can never match
    assert(!javaMatch("a*+a", "aaa"))
    assert(!javaMatch("(?>a*)a", "aaa"))
    assert(javaMatch("a*+b", "aaab"))
    assert(javaMatch("\\d++", "123"))
    // PCRE2 1.8+-era escapes Java shares: \h \v \R
    assert(javaMatch("a\\hb", "a b"))
    assert(javaMatch("a\\Rb", "a\nb"))
  }

  test("POSIX bracket classes translate to \\p{..}; unknown names fail loudly") {
    // Java has no POSIX bracket expressions — untranslated it would
    // silently read a class of the literal characters. anchored()
    // rewrites them (agreed-corpus rows above prove the semantics);
    // an unknown class name raises the reference's compile error
    // (PCRE2: "unknown POSIX class name") instead of matching garbage.
    assert(SeriesMatch.anchored("[[:digit:]]+") === "(?d)^[\\p{Digit}]+$")
    val e = intercept[graft.parser.QueryError](
      SeriesMatch.anchored("[[:bogus:]]+"))
    assert(e.getMessage.startsWith("Cannot compile regular expression"))
    assert(e.getMessage.contains("unknown POSIX class name"))
    // ... and the parser surface rejects it the same way
    assertThrows[graft.parser.QueryError](
      graft.parser.QueryParser.parse("list series /[[:bogus:]]+/"))
  }

  test("both engine surfaces apply the anchored translation") {
    val cat = Seq("cpu.0", "cpu.1", "xcpu.0", "cpu").toDF("series")
    val env = Env(catalog = cat)
    def sel(p: String) = SeriesMatch.eval(SelRegex(p), env)
      .collect().map(_.getString(0)).toSet
    assert(sel("cpu") === Set("cpu")) // full match, not substring
    assert(sel("cpu\\..*") === Set("cpu.0", "cpu.1"))
    assert(sel(".*cpu.*") === Set("cpu.0", "cpu.1", "xcpu.0", "cpu"))
    val vals = Seq(("s", 1L, "error: disk full", 1L), ("s", 2L, "ok", 2L))
      .toDF("series", "ts", "val", "pid")
    val kept = Pipeline(vals, Seq(FilterRegex("error.*")))
      .collect().map(_.getString(2)).toSet
    assert(kept === Set("error: disk full")) // anchored on the value too
  }
}
