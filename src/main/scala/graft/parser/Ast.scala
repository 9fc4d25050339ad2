package graft.parser

import graft.engine.Pipeline.Stage
import graft.engine.SeriesMatch.Sel

/** Query error with a user-facing message (the reference surfaces
  * parse/semantic errors as query errors — src/siri/db/query.c:630-646). */
final case class QueryError(msg: String) extends RuntimeException(msg)

/** Authorization failure — the reference's CPROTO_ERR_USER_ACCESS
  * surface (src/siri/db/user.c:195-218, listener.c:433). */
final case class AccessError(msg: String) extends RuntimeException(msg)

/** AST of the SiriDB query language (grammar START rule,
  * /root/reference/grammar/grammar.py:877-892). Time/int expressions
  * are already constant-folded by the parser (the reference folds them
  * during the parse walk — src/siri/db/query.c:715-850), so the AST
  * carries only resolved constants.
  */
sealed trait Statement

/** One select column: an aggregate chain plus prefix/suffix naming
  * (grammar select_aggregate :602-605). */
final case class SelectChain(stages: Seq[Stage], prefix: String = "", suffix: String = "")

/** `merge as "name" [using <chain>]` (grammar :609-613). */
final case class MergeAs(name: String, using: Seq[Stage] = Nil)

/** `select <chains> from <match> [where <cexpr>]
  * [after/before/between/head/tail] [merge as ...]` (grammar :818-831). */
final case class SelectStmt(
    chains: Seq[SelectChain],
    sel: Sel,
    where: Option[Cexpr] = None,
    range: Option[Stage] = None,
    merge: Option[MergeAs] = None) extends Statement

/** `list series [cols] [match] [where] [limit N]` (grammar :803-812). */
final case class ListSeriesStmt(
    cols: Seq[String],
    sel: Option[Sel] = None,
    where: Option[Cexpr] = None,
    limit: Option[Long] = None) extends Statement

/** `count series [match] [where]` / `count series length ...`
  * (grammar :772-785). */
final case class CountStmt(
    target: String, // "series" | "series_length" | "groups" | "tags" | "pools"
    sel: Option[Sel] = None,
    where: Option[Cexpr] = None) extends Statement

/** Bare time expression — the calc statement (grammar :770). */
final case class CalcStmt(value: Long) extends Statement

/** `show [prop, ...]` (grammar :833-871). */
final case class ShowStmt(props: Seq[String]) extends Statement

/** `timeit <query>` prefix (grammar :873). */
final case class TimeitStmt(inner: Statement) extends Statement

/** `list groups/tags/users/pools/shards/servers [cols] [where] [limit N]`
  * (grammar :739-757; Optional(limit_expr) closes every list form). */
final case class ListEntityStmt(entity: String, where: Option[Cexpr] = None,
    cols: Seq[String] = Nil, limit: Option[Long] = None) extends Statement

/** `help [topic]` (grammar :897-945; topics from the help markdown set). */
final case class HelpStmt(topic: Option[String]) extends Statement

// ---- DDL / DML / admin (grammar :716-768; SURVEY §2.8) ----

sealed trait DdlStmt extends Statement
final case class CreateGroup(name: String, regex: String) extends DdlStmt
final case class CreateUser(name: String, password: String) extends DdlStmt
final case class DropGroup(name: String) extends DdlStmt
final case class DropTag(name: String) extends DdlStmt
final case class DropUser(name: String) extends DdlStmt
/** guarded by drop_threshold (db.h:15) unless ignoreThreshold. */
final case class DropSeries(sel: Option[Sel], where: Option[Cexpr],
    ignoreThreshold: Boolean) extends DdlStmt
final case class DropShards(where: Option[Cexpr],
    ignoreThreshold: Boolean) extends DdlStmt
/** `alter series <match> [where] tag/untag `t`` (listener.c:1699,5011,5066). */
final case class AlterSeriesTag(sel: Sel, where: Option[Cexpr],
    tag: String, untag: Boolean) extends DdlStmt
final case class AlterUser(name: String, password: String) extends DdlStmt
/** `alter user "x" set name "y"` (grammar set_name :626, :677). */
final case class AlterUserName(name: String, newName: String) extends DdlStmt
final case class AlterGroup(name: String, regex: String) extends DdlStmt
/** `alter group `x` set name "y"` (grammar :655-657). */
final case class AlterGroupName(name: String, newName: String) extends DdlStmt
final case class AlterTag(name: String, newName: String) extends DdlStmt
/** ignoreThreshold carries the grammar's Optional(set_ignore_threshold)
  * on set_expiration_num/log — it bypasses the drop-threshold guard on
  * the shards the new expiration would expire
  * (exit_set_expiration_xxx, listener.c:4384-4402). */
final case class AlterDatabase(prop: String, value: String,
    ignoreThreshold: Boolean = false) extends DdlStmt
final case class GrantUser(access: Seq[String], name: String,
    password: Option[String]) extends DdlStmt
final case class RevokeUser(access: Seq[String], name: String) extends DdlStmt
/** `drop server <uuid|'name'>` (grammar :734, listener.c:2983-3050). */
final case class DropServer(server: String) extends DdlStmt
/** `alter server <ref> set log_level|backup_mode|address|port ...` /
  * `alter servers set ...` (grammar :615-671; server=None is the
  * all-servers form; listener.c:4145-4287,4618). */
final case class AlterServer(server: Option[String], prop: String,
    value: String) extends DdlStmt

/** Entity predicate tree — the cexpr mini-language
  * (src/cexpr/cexpr.c; grammar where_series :350-366). */
sealed trait Cexpr
final case class CAnd(l: Cexpr, r: Cexpr) extends Cexpr
final case class COr(l: Cexpr, r: Cexpr) extends Cexpr
/** prop <op> value; value is a folded long or a string. */
final case class CCmp(prop: String, op: String, value: Either[Long, String]) extends Cexpr
