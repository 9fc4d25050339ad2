package graft.parser

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

import graft.engine.{Pipeline, SeriesMatch, SeriesStore}
import graft.engine.Pipeline._
import graft.engine.SeriesMatch.{All, Env, Name, Sel, Regex => SelRegex}

/** Turns a parsed statement into one Catalyst plan over the typed
  * point frames — the Spark analog of the reference's listener
  * callback chain (src/siri/db/listener.c). The planner only does
  * SiriDB-specific rewrites (series typing, skip-points fast path,
  * presuf naming); scan pruning, partial aggregation, join strategy
  * etc. stay with Catalyst.
  */
/** Typed point frames + catalog backing a query session; defaults to
  * the driver's events-derived families, overridable (e.g. with an
  * Ingest store — see graft.server.HttpApi). */
final case class Frames(
    f: DataFrame, i: DataFrame, s: DataFrame, m: DataFrame, cat: DataFrame)

final case class EngineEnv(
    spark: SparkSession,
    dir: String,
    groups: Map[String, String] = Map.empty,
    tags: Map[String, Seq[String]] = Map.empty,
    factor: Long = 1L,
    frames: Option[Frames] = None) {

  lazy val pointsF: DataFrame = frames.map(_.f).getOrElse(SeriesStore.pointsF(spark, dir))
  lazy val pointsI: DataFrame = frames.map(_.i).getOrElse(SeriesStore.pointsI(spark, dir))
  lazy val pointsS: DataFrame = frames.map(_.s).getOrElse(SeriesStore.pointsS(spark, dir))
  lazy val pointsM: DataFrame = frames.map(_.m).getOrElse(SeriesStore.points(spark, dir))
  lazy val catalog: DataFrame = frames.map(_.cat).getOrElse(SeriesStore.catalogAll(spark, dir))

  lazy val matchEnv: Env = Env(
    catalog = catalog,
    groups = groups,
    tags = cat => {
      import spark.implicits._
      tags.toSeq.flatMap { case (t, ss) => ss.map(t -> _) }.toDF("tag", "series")
    })
}

object Planner {

  /** Props usable in `where` on series → catalog columns
    * (siridb_series_cexpr_cb, src/siri/db/series.c:85-112). */
  private def propCol(prop: String, env: EngineEnv): Column = prop match {
    case "name" => col("series")
    case "shard_duration" => lit(604800L * env.factor) // emulated constant
    case p => col(p) // length, pool, start, end, type
  }

  private def cexprCol(c: Cexpr, env: EngineEnv): Column = c match {
    case CAnd(l, r) => cexprCol(l, env) && cexprCol(r, env)
    case COr(l, r) => cexprCol(l, env) || cexprCol(r, env)
    case CCmp(prop, op, v) =>
      val pc = propCol(prop, env)
      val lv: Column = v.fold(lit(_), lit(_))
      op match {
        case "==" => pc === lv
        case "!=" => pc =!= lv
        case "<" => pc < lv
        case ">" => pc > lv
        case "<=" => pc <= lv
        case ">=" => pc >= lv
        case "~" => pc.contains(v.toOption.get) // string-contains (cexpr.h:11-20)
        case "!~" => !pc.contains(v.toOption.get)
      }
  }

  /** Catalog rows matching a series selection + where predicate. */
  private def selCatalog(sel: Option[Sel], where: Option[Cexpr], env: EngineEnv): DataFrame = {
    val base = sel match {
      case None | Some(All) => env.catalog
      case Some(Name(n)) => env.catalog.where(col("series") === n)
      case Some(SelRegex(pat, ci)) =>
        env.catalog.where(col("series").rlike(if (ci) "(?i)" + pat else pat))
      case Some(s) =>
        env.catalog.join(SeriesMatch.eval(s, env.matchEnv), Seq("series"), "left_semi")
    }
    where.map(w => base.where(cexprCol(w, env))).getOrElse(base)
  }

  /** Decide the typed base frame for a selection — the engine analog
    * of the reference's per-series type dispatch. Metadata-sized
    * collect: at most 3 distinct type values. */
  private def baseFrame(sel: Sel, where: Option[Cexpr], env: EngineEnv): DataFrame = {
    val types = selCatalog(Some(sel), where, env)
      .select(col("type")).distinct().collect().map(_.getString(0)).toSet
    val frame =
      if (types == Set("integer")) env.pointsI
      else if (types == Set("float")) env.pointsF
      else if (types == Set("string")) env.pointsS
      else if (types.subsetOf(Set("integer", "float"))) env.pointsM // int→double promotion (points.c:368-376)
      else throw QueryError("Cannot use string and number series in one selection")
    val matched = SeriesMatch.select(frame, sel, env.matchEnv)
    where match {
      case Some(w) =>
        matched.join(selCatalog(Some(sel), where, env).select(col("series")),
          Seq("series"), "left_semi")
      case None => matched
    }
  }

  /** Functions allowed on string ("log") series; everything else is a
    * type error (points.c:368-433, series.c:72-76). */
  private val stringOkFns: Set[AggFn] = Set(Count, First, Last)

  private def checkStringOk(stages: Seq[Stage]): Unit = stages.foreach {
    case Agg(fn, _, _) if !stringOkFns(fn) =>
      throw QueryError(s"Cannot use ${fn.name}() on string type.")
    case Difference => throw QueryError("Cannot use difference() on string type.")
    case Derivative(_) => throw QueryError("Cannot use derivative() on string type.")
    case LimitFn(_, fn) if !stringOkFns(fn) =>
      throw QueryError(s"Cannot use ${fn.name}() on string type.")
    case FilterNum(_, _) =>
      throw QueryError("Cannot use a number filter on string type.")
    case _ => ()
  }

  private def isStringFrame(df: DataFrame): Boolean =
    df.schema("val").dataType == StringType

  def run(stmt: Statement, env: EngineEnv): DataFrame = stmt match {
    case TimeitStmt(inner) => run(inner, env) // wall-clock handled by caller

    case CalcStmt(v) =>
      import env.spark.implicits._
      Seq(v).toDF("calc")

    case ShowStmt(props) =>
      import env.spark.implicits._
      val known = Map(
        "dbname" -> "graft", "time_precision" -> "s", "version" -> "2.0.55",
        "timezone" -> "NAIVE", "who_am_i" -> "graft", "server" -> "local",
        "status" -> "running", "list_limit" -> "10000",
        "select_points_limit" -> "1000000", "drop_threshold" -> "1.0")
      val sel = if (props.isEmpty) known.keys.toSeq.sorted else props
      sel.map(pp => (pp, known.getOrElse(pp, "unknown"))).toDF("name", "value")

    case ListSeriesStmt(cols, sel, where, limit) =>
      val outCols = cols.map {
        case "name" => col("series").as("name")
        case "shard_duration" => lit(604800L * env.factor).as("shard_duration")
        case c => col(c)
      }
      selCatalog(sel, where, env)
        .select(outCols: _*)
        .limit(limit.getOrElse(10000L).toInt) // list_limit default (db.h:17)

    case CountStmt("series", sel, where) =>
      selCatalog(sel, where, env).agg(count(lit(1)).as("series"))

    case CountStmt("series_length", sel, where) =>
      // skip-points fast path: answered from the catalog, never the
      // point data (siridb_aggregate_can_skip, aggregate.c:495-510)
      selCatalog(sel, where, env).agg(sum(col("length")).as("series_length"))

    case CountStmt("groups", _, _) =>
      import env.spark.implicits._
      Seq(env.groups.size.toLong).toDF("groups")

    case CountStmt("tags", _, _) =>
      import env.spark.implicits._
      Seq(env.tags.size.toLong).toDF("tags")

    case CountStmt("pools", _, _) =>
      env.catalog.select(col("pool")).distinct().agg(count(lit(1)).as("pools"))

    case CountStmt(other, _, _) =>
      throw QueryError(s"count $other is not supported")

    case SelectStmt(chains, sel, where, range, merge) =>
      val base0 = baseFrame(sel, where, env)
      val stringSeries = isStringFrame(base0)
      // multiple chains share one scan — the reference's points_map
      // cache (listener.c:5626-5658)
      val base = if (chains.size > 1) base0.cache() else base0
      val outs = chains.map { c =>
        if (stringSeries) checkStringOk(c.stages)
        val piped = Pipeline(base, range.toSeq ++ c.stages)
        if (c.prefix.nonEmpty || c.suffix.nonEmpty)
          piped.withColumn("series",
            concat(lit(c.prefix), col("series"), lit(c.suffix)))
        else piped
      }
      // unify value types across chains (count->int vs mean->float)
      val needDouble = outs.exists(_.schema("val").dataType == DoubleType) &&
        outs.exists(_.schema("val").dataType == LongType)
      val unified = if (needDouble)
        outs.map(o => o.withColumn("val", col("val").cast("double")))
      else outs
      val selected = unified.reduce(_.unionByName(_))
      merge match {
        case Some(MergeAs(name, using)) =>
          if (stringSeries) checkStringOk(using)
          Pipeline.merge(selected, name, using)
        case None => selected
      }
  }

  /** Parse + plan in one step (the engine's `/query` entry point). */
  def query(q: String, env: EngineEnv, now: Option[Long] = None): DataFrame = {
    val nowTs = now.getOrElse(System.currentTimeMillis() / 1000 * env.factor)
    run(QueryParser.parse(q, nowTs, env.factor), env)
  }
}
