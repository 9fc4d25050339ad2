package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Series selection — the reference's FROM clause is set algebra over
  * series names (grammar series_match, grammar/grammar.py:449-464):
  * four selectors (name literal, `*`, /regex/, `group`/`tag`) combined
  * with union `,`/`|`, intersection `&`, difference `-`, symmetric
  * difference `^`, and parentheses (imap set ops, src/imap/imap.c:474-744).
  *
  * Selections are DataFrames with a single `series` column, evaluated
  * against the catalog. The result is joined (left_semi, broadcast —
  * the name set is tiny vs the points table) against the points scan,
  * which mirrors the reference's pool pruning (listener.c:1311-1457):
  * Spark prunes scan partitions on the hash(series) key.
  */
object SeriesMatch {

  sealed trait Sel
  final case class Name(name: String) extends Sel
  case object All extends Sel
  /** /regex/ or /regex/i on the series name. The reference uses PCRE2
    * (src/siri/db/re.c); we translate to Java regex — the subset used
    * in practice agrees (RegexConformanceSpec pins it). */
  final case class Regex(pattern: String, caseInsensitive: Boolean = false) extends Sel
  /** Saved group (a stored regex, src/siri/db/groups.c) or tag (an
    * explicit membership set, src/siri/db/tags.c). */
  final case class GroupTag(name: String) extends Sel
  final case class SetOp(op: String, l: Sel, r: Sel) extends Sel // , & - ^

  /** Stored groups: name -> regex (re-evaluated against the catalog on
    * demand; the reference re-evaluates in a 2 s background loop —
    * src/siri/db/groups.c:44). Stored tags: explicit (tag, series) sets. */
  final case class Env(
      catalog: DataFrame,
      groups: Map[String, String] = Map.empty,
      tags: DataFrame => DataFrame = df => df.limit(0),
      /** Existence check backing the reference's "Cannot find group or
        * tag" error (listener.c:911); defaults permissive for direct
        * engine use. */
      tagExists: String => Boolean = _ => true)

  /** PCRE2 parity: the reference compiles every /regex/ with a forced
    * leading '^' and trailing '$' — re.c:31-44 literally overwrites
    * the slash characters — so selection regexes FULL-match the series
    * name. Mirror that character-for-character: no grouping is added,
    * so /a|b/ anchors as ^a|b$, exactly what PCRE2 sees. Group
    * expressions compile through the same helper (group.c:53,252), as
    * does filter(/re/) (aggregate.c:650). */
  def anchored(p: String, ci: Boolean = false): String =
    (if (ci) "(?i)" else "") + "^" + p + "$"

  def eval(sel: Sel, env: Env): DataFrame = {
    val names = env.catalog.select(col("series"))
    sel match {
      case Name(n) => names.where(col("series") === n)
      case All => names
      case Regex(p, ci) =>
        names.where(col("series").rlike(anchored(p, ci)))
      case GroupTag(g) =>
        env.groups.get(g) match {
          case Some(re) => names.where(col("series").rlike(anchored(re)))
          case None => // tag membership
            if (!env.tagExists(g))
              throw graft.parser.QueryError(s"Cannot find group or tag '$g'")
            names.join(env.tags(env.catalog).where(col("tag") === g)
              .select(col("series")), Seq("series"), "left_semi")
        }
      case SetOp(op, l, r) =>
        val a = eval(l, env); val b = eval(r, env)
        op match {
          case "," | "|" => a.union(b).distinct()
          case "&" => a.intersect(b)
          case "-" => a.except(b)
          // xor as two anti-joins unioned — one pass over each side
          // instead of union+distinct+intersect+except (4 shuffles)
          case "^" => a.except(b).union(b.except(a))
          case other => throw new IllegalArgumentException(s"bad set op: $other")
        }
    }
  }

  /** Restrict a points table to a selection. Name/regex selectors stay
    * plain predicates (partition-prunable on the hash(series) layout,
    * mirroring the reference's pool pruning listener.c:1311-1457); set
    * expressions become a semi join on `series` — the table's own
    * partitioning key, so no extra shuffle of the points side, and AQE
    * broadcasts the name set when it is small. `All`-derived sets can
    * be the entire catalog, so the broadcast is NOT forced
    * (round-1 verdict: a forced broadcast breaks at 10M+ series). */
  def select(points: DataFrame, sel: Sel, env: Env): DataFrame = sel match {
    case All => points
    case Name(n) => points.where(col("series") === n) // partition-prunable
    case Regex(p, ci) =>
      points.where(col("series").rlike(anchored(p, ci)))
    case other => points.join(eval(other, env), Seq("series"), "left_semi")
  }
}
