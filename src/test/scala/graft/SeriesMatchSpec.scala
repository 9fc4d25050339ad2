package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.SeriesMatch
import graft.engine.SeriesMatch._

/** Set algebra over series names (grammar series_match,
  * imap set ops src/imap/imap.c:474-744) on a small catalog. */
class SeriesMatchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def cat = Seq("cpu.0", "cpu.1", "mem.0", "mem.1", "disk.0")
    .toDF("series")

  private def env = Env(
    catalog = cat,
    groups = Map("cpus" -> "^cpu\\..*"),
    tags = c => Seq(("hot", "cpu.0"), ("hot", "disk.0")).toDF("tag", "series"))

  private def names(sel: Sel): Set[String] =
    SeriesMatch.eval(sel, env).collect().map(_.getString(0)).toSet

  test("selectors: name, all, regex, regex/i, group, tag") {
    assert(names(Name("cpu.0")) === Set("cpu.0"))
    assert(names(Name("nope")) === Set.empty)
    assert(names(All) === Set("cpu.0", "cpu.1", "mem.0", "mem.1", "disk.0"))
    assert(names(Regex("^mem\\..*")) === Set("mem.0", "mem.1"))
    assert(names(Regex("^MEM\\..*", caseInsensitive = true)) === Set("mem.0", "mem.1"))
    assert(names(GroupTag("cpus")) === Set("cpu.0", "cpu.1"))
    assert(names(GroupTag("hot")) === Set("cpu.0", "disk.0"))
  }

  test("set operators: union, intersection, difference, symmetric difference") {
    val cpus = Regex("^cpu\\..*")
    val zeros = Regex(".*\\.0$")
    assert(names(SetOp(",", cpus, zeros)) === Set("cpu.0", "cpu.1", "mem.0", "disk.0"))
    assert(names(SetOp("&", cpus, zeros)) === Set("cpu.0"))
    assert(names(SetOp("-", cpus, zeros)) === Set("cpu.1"))
    assert(names(SetOp("^", cpus, zeros)) === Set("cpu.1", "mem.0", "disk.0"))
  }

  test("nested expressions evaluate left-to-right with grouping") {
    // (cpu | mem) & .1  ->  {cpu.1, mem.1}
    val e = SetOp("&", SetOp(",", Regex("^cpu\\..*"), Regex("^mem\\..*")), Regex(".*\\.1$"))
    assert(names(e) === Set("cpu.1", "mem.1"))
  }

  test("select restricts a points frame via semi join / predicate") {
    val pts = Seq(("cpu.0", 1L, 1.0, 0L), ("cpu.1", 1L, 2.0, 1L),
      ("mem.0", 1L, 3.0, 2L)).toDF("series", "ts", "val", "pid")
    val semi = SeriesMatch.select(pts, SetOp(",", Name("cpu.0"), Name("mem.0")), env)
    assert(semi.select("series").collect().map(_.getString(0)).toSet ===
      Set("cpu.0", "mem.0"))
    val pred = SeriesMatch.select(pts, Regex("^cpu\\..*"), env)
    assert(pred.count() === 2)
  }
}
