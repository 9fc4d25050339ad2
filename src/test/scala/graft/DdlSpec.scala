package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parser.{EngineEnv, Planner, QueryError}

/** DDL/admin statements end-to-end through the query surface
  * (SURVEY §2.8; success messages mirror listener.c:150-204). */
class DdlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def q(env: EngineEnv, s: String): Seq[Seq[Any]] =
    Planner.query(s, env, now = Some(1706659200L))
      .collect().map(_.toSeq.toVector).toVector

  private def msg(env: EngineEnv, s: String): String =
    q(env, s).head.head.toString

  test("groups: create, list with member counts, select via `group`, alter, drop") {
    val env = EngineEnv(spark, dir)
    assert(msg(env, "create group `clicks` for /^f\\.click\\..*/") ===
      "Successfully created group 'clicks'.")
    assertThrows[QueryError](q(env, "create group `clicks` for /x/"))
    assert(q(env, "list groups") === Seq(Seq("clicks", "^f\\.click\\..*", 8L)))
    assert(q(env, "count series `clicks`").head.head === 8L)
    assert(msg(env, "alter group `clicks` set expression /^f\\.click\\.0/") ===
      "Successfully updated group 'clicks'.")
    assert(q(env, "count series `clicks`").head.head === 1L)
    assert(msg(env, "drop group `clicks`") === "Successfully dropped group 'clicks'.")
    assertThrows[QueryError](q(env, "drop group `clicks`"))
  }

  test("tags: alter series tag/untag, list tags, select via `tag`") {
    val env = EngineEnv(spark, dir)
    assert(msg(env, "alter series /^i\\.error\\.[0-2]$/ tag `bad`") ===
      "Successfully tagged 3 series.")
    // tagging again adds nothing new
    assert(msg(env, "alter series /^i\\.error\\.[0-2]$/ tag `bad`") ===
      "Successfully tagged 0 series.")
    assert(q(env, "list tags") === Seq(Seq("bad", 3L)))
    // entity column selection (grammar tag_columns)
    assert(q(env, "list tags name") === Seq(Seq("bad")))
    assert(q(env, "list tags series, name") === Seq(Seq(3L, "bad")))
    assert(q(env, "count series `bad`").head.head === 3L)
    assert(msg(env, "alter series 'i.error.0' untag `bad`") ===
      "Successfully untagged 1 series.")
    assert(q(env, "count series `bad`").head.head === 2L)
  }

  test("users: create, grant, revoke, alter, list, count, drop") {
    val env = EngineEnv(spark, dir)
    assert(msg(env, "create user 'alice' set password 'pw1234'") ===
      "Successfully created user 'alice'.")
    // access folds to the largest profile repr (access.c:70-95):
    // read+insert has no full profile, so it prints "read and insert"
    assert(msg(env, "grant read, insert to user 'alice'") ===
      "Successfully granted permissions to user 'alice'.")
    assert(q(env, "list users").toSet contains Seq("alice", "read and insert"))
    assert(msg(env, "revoke insert from user 'alice'") ===
      "Successfully revoked permissions from user 'alice'.")
    assert(q(env, "list users").toSet contains Seq("alice", "read"))
    assert(msg(env, "alter user 'alice' set password 'pw5678'") ===
      "Successfully updated user 'alice'.")
    // where access compares BITS with int operators (grammar :427)
    assert(q(env, "list users where access == full").map(_.head) === Seq("iris"))
    assert(q(env, "list users where access >= read").map(_.head).toSet ===
      Set("iris", "alice"))
    assert(q(env, "list users where access < read").isEmpty)
    // the seeded default user iris (users.c:70-85) counts too
    assert(q(env, "count users").head.head === 2L)
    assert(msg(env, "drop user 'alice'") === "Successfully dropped user 'alice'.")
    assert(q(env, "count users").head.head === 1L)
  }

  test("access bits are enforced when the env carries a user — listener.c:433") {
    import graft.parser.AccessError
    val env0 = EngineEnv(spark, dir)
    q(env0, "create user 'bob' set password 'pw1234'")
    q(env0, "grant read to user 'bob'")
    val bob = env0.copy(user = Some("bob"))
    // read profile: select/list/count/show pass
    assert(q(bob, "show who_am_i").head === Seq("who_am_i", "bob")) // props.c
    assert(q(bob, "count series").head.head.asInstanceOf[Long] > 0L)
    assert(q(bob, "list series limit 1").size === 1)
    // write-side statements are denied with the reference message
    val e1 = intercept[AccessError](q(bob, "drop series /^f\\..*/ set ignore_threshold true"))
    assert(e1.msg === "Access denied. User 'bob' has no 'drop' privileges.")
    val e2 = intercept[AccessError](q(bob, "create group `g1` for /x/"))
    assert(e2.msg === "Access denied. User 'bob' has no 'create' privileges.")
    val e3 = intercept[AccessError](q(bob, "grant full to user 'bob'"))
    assert(e3.msg === "Access denied. User 'bob' has no 'grant' privileges.")
    // full-access default user passes everything
    val iris = env0.copy(user = Some("iris"))
    assert(q(iris, "count series").nonEmpty)
    assert(msg(iris, "create group `g2` for /^f\\..*/")
      .startsWith("Successfully created"))
  }

  test("drop series: threshold guard + tombstones hide data everywhere") {
    val env = EngineEnv(spark, dir)
    val total = q(env, "count series").head.head.asInstanceOf[Long]
    // tighten the threshold, then a 1/3-of-catalog drop must be refused
    q(env, "alter database set drop_threshold 0.1")
    val e = intercept[QueryError](q(env, "drop series /^f\\..*/"))
    assert(e.msg.contains("ignore_threshold"))
    assert(msg(env, "drop series /^f\\..*/ set ignore_threshold true")
      .startsWith("Successfully dropped"))
    assert(q(env, "count series").head.head === total - 40L)
    // dropped series are invisible to selects and lists
    assert(q(env, "list series /^f\\..*/").isEmpty)
    assert(q(env, "select count() from /^f\\..*/").isEmpty)
    // bare `drop series` is the reference's drop-ALL form: grammar
    // makes match and where optional; the threshold guard is what
    // stands between a client and an empty database
    val all = intercept[QueryError](q(env, "drop series"))
    assert(all.msg.contains("drop 100.00%"), all.msg)
    assert(msg(env, "drop series set ignore_threshold true")
      .startsWith("Successfully dropped"))
    assert(q(env, "count series").head.head === 0L)
  }

  test("re-inserting a dropped name creates a FRESH series: old points stay gone — series.c") {
    val sdir = java.nio.file.Files.createTempDirectory("graft-reinsert").toString
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val api = new graft.server.ApiCore(spark, sdir)
    api.runInsert(mapper.readTree(
      """{"phoenix": [[100, 1.0], [200, 2.0]], "bystander": [[100, 9.0]]}"""),
      "iris")
    assert(msg(api.env("iris"),
      "drop series 'phoenix' set ignore_threshold true")
      .startsWith("Successfully dropped 1"))
    assert(q(api.env("iris"), "list series 'phoenix'").isEmpty)
    // the same name on the write path again = a NEW series (the
    // reference hands it a fresh series id, so the pre-drop points
    // are unreachable): visible, with ONLY the new point
    api.runInsert(mapper.readTree("""{"phoenix": [[300, 3.0]]}"""), "iris")
    assert(q(api.env("iris"), "list series 'phoenix'").size === 1)
    val pts = graft.streaming.Ingest.points(spark, sdir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(pts === Set(("phoenix", 300L), ("bystander", 100L)),
      s"old points must be purged, bystander untouched: $pts")
    // the lifted tombstone survives persistence: a second server
    // process over the same store sees the re-created series
    val api2 = new graft.server.ApiCore(spark, sdir)
    assert(q(api2.env("iris"), "list series 'phoenix'").size === 1)
    // and a fresh series may change TYPE: drop the float series,
    // re-insert the name as a string ("log") series — the purge
    // removed the old catalog entry, so the new first point
    // establishes the type, exactly like a fresh series id would
    assert(msg(api.env("iris"),
      "drop series 'phoenix' set ignore_threshold true")
      .startsWith("Successfully dropped 1"))
    api.runInsert(mapper.readTree("""{"phoenix": [[400, "warn"]]}"""), "iris")
    val tp = q(api.env("iris"), "list series type 'phoenix'")
    assert(tp === Seq(Seq("string")), tp)
  }

  test("optimize pass merges fragments, purges tombstoned points, lifts tombstones — optimize.c") {
    val sdir = java.nio.file.Files.createTempDirectory("graft-optimize").toString
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val api = new graft.server.ApiCore(spark, sdir)
    // ten one-point batches = ten parquet fragments in one shard
    (1 to 10).foreach(i => api.runInsert(
      mapper.readTree(s"""{"frag": [[${i * 10}, $i.0]]}"""), "iris"))
    api.runInsert(mapper.readTree("""{"victim": [[100, 1.0]]}"""), "iris")
    assert(msg(api.env("iris"),
      "drop series 'victim' set ignore_threshold true")
      .startsWith("Successfully dropped 1"))
    val shard = new java.io.File(s"$sdir/points/sgroup=num/shard=0")
    def parts = shard.listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts === 11)
    api.optimizeNow()
    // fragments merged, the tombstoned series physically gone, and the
    // tombstone itself lifted — selects stop paying the anti-join
    assert(parts === 1)
    val pts = graft.streaming.Ingest.points(spark, sdir).collect()
      .map(_.getString(0)).toSet
    assert(pts === Set("frag"))
    assert(api.meta.droppedDf.isEmpty)
    assert(q(api.env("iris"), "count series").head.head === 1L)
  }

  test("DDL invalidates the per-thread select memo — no stale names after a drop") {
    val env = EngineEnv(spark, dir)
    val stmt = graft.parser.QueryParser
      .parse("select sum(3600) from /^i\\..*/", 1706659200L)
      .asInstanceOf[graft.parser.SelectStmt]
    Planner.run(stmt, env) // primes the (sel, where) memo
    val names1 = Planner.selectNames(stmt, env)
    // same thread, no transport drain in between — the DDL itself
    // must invalidate the memo
    q(env, "drop series /^i\\.click\\..*/ set ignore_threshold true")
    Planner.run(stmt, env)
    val names2 = Planner.selectNames(stmt, env)
    assert(names2.nonEmpty && names2.size < names1.size,
      s"${names1.size} -> ${names2.size}")
    assert(!names2.exists(_.startsWith("i.click.")))
    Planner.drainQueryCaches()
  }

  test("alter database set timezone drives date parsing — listener.c:4879-4930") {
    val env = EngineEnv(spark, dir)
    assert(msg(env, "alter database set timezone 'Europe/Amsterdam'") ===
      "Successfully changed timezone from 'NAIVE' to 'Europe/Amsterdam'.")
    // CET (+01:00) on 2016-11-14; CEST (+02:00) on 2016-07-01 (DST)
    assert(q(env, "'2016-11-14'").head.head === 1479081600L - 3600L)
    assert(q(env, "'2016-07-01 12:00:00'").head.head === 1467374400L - 7200L)
    // explicit offsets in the string win over the database zone
    assert(q(env, "'2016-11-14 00:00:00Z'").head.head === 1479081600L)
    assert(q(env, "'2016-11-14 00:00:00+05:30'").head.head ===
      1479081600L - 5L * 3600L - 1800L)
    // reference errors: unknown zone, already-set zone
    val e1 = intercept[QueryError](q(env, "alter database set timezone 'Mars/Olympus'"))
    assert(e1.msg.contains("Unknown time zone"))
    val e2 = intercept[QueryError](q(env, "alter database set timezone 'Europe/Amsterdam'"))
    assert(e2.msg.contains("already set"))
    assert(q(env, "show timezone") === Seq(Seq("timezone", "Europe/Amsterdam")))
  }

  test("alter database numeric bounds and list_limit capping") {
    val env = EngineEnv(spark, dir)
    // reference bounds with exact messages (listener.c:4296-4487,4735)
    assert(intercept[QueryError](q(env, "alter database set list_limit 2")).msg
      === "List limit should be a value greater than or equal to 1000 and smaller than 4294967296 but got 2")
    assert(intercept[QueryError](
      q(env, "alter database set drop_threshold 1.5")).msg ===
      "Drop threshold should be a value between or equal to 0 and 1.0 but got 1.500")
    assert(intercept[QueryError](
      q(env, "alter database set select_points_limit 0")).msg.startsWith(
      "Select points limit should be a value greater than 0"))
    q(env, "alter database set list_limit 1000")
    assert(q(env, "show list_limit") === Seq(Seq("list_limit", "1000")))
    // an explicit limit above list_limit errors (listener.c:1006-1023)
    val e = intercept[QueryError](q(env, "list series limit 1001"))
    assert(e.msg.startsWith("Limit must be a value between 1 and 1000"))
    assert(q(env, "list series limit 1").size === 1)
  }

  test("alter server set log_level/backup_mode/address/port; drop server") {
    val env = EngineEnv(spark, dir)
    assert(msg(env, "alter server set log_level debug") ===
      "Successfully set log level to 'debug' on 'local'.")
    assert(q(env, "show log_level") === Seq(Seq("log_level", "debug")))
    assert(msg(env, "alter servers set log_level info") ===
      "Successfully set log level to 'info' on 1 servers.")
    assertThrows[QueryError](q(env, "alter server set log_level loud"))
    // backup mode round-trip with the reference messages
    assert(msg(env, "alter server set backup_mode true") ===
      "Successfully enabled backup mode on 'local'.")
    val e1 = intercept[QueryError](q(env, "alter server set backup_mode true"))
    assert(e1.msg === "Backup mode is already enabled on 'local'.")
    assert(msg(env, "alter server set backup_mode false") ===
      "Successfully disabled backup mode on 'local'.")
    // the live server cannot re-address itself (MSG_ERR_SERVER_ADDRESS)
    val e2 = intercept[QueryError](q(env, "alter server 'local' set address 'else'"))
    assert(e2.msg.contains("not connected"))
    assertThrows[QueryError](q(env, "alter server 'local' set port 9999"))
    // backup mode gates every mutating statement except leaving backup
    // mode (MASTER_CHECK_ACCESSIBLE, listener.c:98-115); reads still work
    q(env, "alter server set backup_mode true")
    val eb = intercept[QueryError](q(env, "create group `g9` for /x/"))
    assert(eb.msg === "Server 'local' is currently not accessible to process this request")
    assertThrows[QueryError](q(env, "drop series 'x' set ignore_threshold true"))
    assert(q(env, "count series").nonEmpty) // reads unaffected
    assert(q(env, "show status") === Seq(Seq("status", "running | backup-mode")))
    q(env, "alter server set backup_mode false") // toggle always allowed
    assert(msg(env, "create group `g9` for /x/").startsWith("Successfully"))
    q(env, "drop group `g9`")
    // drop server: unknown ref vs the only-server guard (listener.c:2983)
    val e3 = intercept[QueryError](q(env, "drop server 'other'"))
    assert(e3.msg === "Cannot find server: other")
    val e4 = intercept[QueryError](q(env, "drop server 'local'"))
    assert(e4.msg.contains("only server for pool 0"))
  }

  test("show exposes ~30 server props") {
    val env = EngineEnv(spark, dir)
    assert(q(env, "show").size >= 25)
    assert(q(env, "show time_precision, version, mem_usage").size === 3)
  }

  test("entity views: pools, shards, servers, help") {
    val env = EngineEnv(spark, dir)
    assert(q(env, "list pools").nonEmpty)
    assert(q(env, "count shards").head.head.asInstanceOf[Long] > 0L)
    // full where_shard prop set incl. the number|log type keywords
    assert(q(env, "list shards where type == number and server ~ 'loc'").nonEmpty)
    assert(q(env, "list shards where type == log").isEmpty)
    assert(q(env, "count shards where status == 'ok'").head.head
      .asInstanceOf[Long] > 0L)
    assert(q(env, "list servers").head.head === "local")
    assert(q(env, "help select").head(1).toString.contains("merge"))
    assert(q(env, "help").size >= 8)
  }

  test("list servers: full prop columns and where across them — props.c:204-286") {
    val env = EngineEnv(spark, dir)
    // default columns (name, pool, version, online, status)
    assert(q(env, "list servers").head ===
      Seq("local", 0L, "2.0.55", "true", "running"))
    // explicit column selection over the full prop set
    assert(q(env, "list servers name, log_level, max_open_files").head ===
      Seq("local", "info", 65536L))
    // where works on both string and int props
    assert(q(env, "list servers name where status ~ 'run' and port == 9000").head.head === "local")
    assert(q(env, "list servers where pool > 0").isEmpty)
    // backup mode surfaces in the status prop
    q(env, "alter server set backup_mode true")
    assert(q(env, "list servers status").head.head === "running | backup-mode")
  }

  test("entity name/password validation + renames — test_group.py, test_user.py") {
    val env = EngineEnv(spark, dir)
    // group name limits (group.c:81-95) and duplicate/cross-namespace
    // collisions with the reference's exact strings
    assert(intercept[QueryError](q(env, "create group `` for /c.*/")).msg ===
      "Group name should be at least 1 characters.")
    assert(intercept[QueryError](
      q(env, s"create group `${"a" * 300}` for /c.*/")).msg ===
      "Group name should be at most 255 characters.")
    q(env, "create group `ga` for /a.*/")
    assert(intercept[QueryError](q(env, "create group `ga` for /a.*/")).msg ===
      "Group 'ga' already exists.")
    // invalid regex → re.c:55-67 message (anchored pattern form)
    assert(intercept[QueryError](q(env, "create group `inv` for /(/")).msg
      .startsWith("Cannot compile regular expression"))
    assert(intercept[QueryError](
      q(env, "alter group `ga` set expression /(.*/")).msg
      .startsWith("Cannot compile regular expression"))
    // alter group set name (+ trailing # comment parses, test_group.py:159)
    assert(msg(env, "alter group `ga` set name \"gb\" # bla") ===
      "Successfully updated group 'gb'.")
    assert(intercept[QueryError](
      q(env, "alter group `ga` set expression /x/")).msg ===
      "Cannot find group: 'ga'")
    // tag/group namespaces collide both ways (group.c:108, tag.c:269)
    q(env, "alter series 'f.cpu.0' tag `tx`")
    assert(intercept[QueryError](q(env, "create group `tx` for /x/")).msg ===
      "Tag 'tx' already exists.")
    assert(intercept[QueryError](q(env, "alter series 'f.cpu.0' tag `gb`")).msg ===
      "Cannot create tag `gb` because a group with this name already exist.")
    assert(intercept[QueryError](q(env, "alter tag `tx` set name \"gb\"")).msg ===
      "Group 'gb' already exists.")
    assert(msg(env, "alter tag `tx` set name \"ty\"") ===
      "Successfully updated tag 'ty'.")
    assert(intercept[QueryError](q(env, "alter tag `tx` set name \"tz\"")).msg ===
      "Cannot find tag: 'tx'")
    // user name/password validation (user.c:83-101,146-177)
    assert(intercept[QueryError](
      q(env, "create user 's' set password '123456'")).msg ===
      "User name should be at least 2 characters.")
    assert(intercept[QueryError](
      q(env, "create user '  ' set password '123456'")).msg
      .startsWith("User name contains illegal characters."))
    assert(intercept[QueryError](
      q(env, "create user 'aa' set password '123'")).msg ===
      "Password should be at least 4 characters.")
    q(env, "create user 'pee' set password 'hihihaha'")
    assert(intercept[QueryError](
      q(env, "alter user 'pee' set password 'dag'")).msg ===
      "Password should be at least 4 characters.")
    // renames keep grants; errors use the listener's strings
    q(env, "grant count to user 'pee'")
    assert(intercept[QueryError](q(env, "alter user 'pee' set name 'p'")).msg ===
      "User name should be at least 2 characters.")
    assert(intercept[QueryError](q(env, "alter user 'pee' set name ' p '")).msg
      .startsWith("User name contains illegal characters."))
    assert(intercept[QueryError](q(env, "alter user 'pee' set name 'iris'")).msg ===
      "User 'iris' already exists.")
    assert(intercept[QueryError](q(env, "alter user 'Pee' set name 'PPP'")).msg ===
      "Cannot find user: 'Pee'")
    assert(msg(env, "alter user 'pee' set name 'Pee'") ===
      "Successfully updated user 'Pee'.")
    assert(q(env, "list users where name == 'Pee'").head === Seq("Pee", "count"))
    assert(intercept[QueryError](q(env, "drop user 'pee'")).msg ===
      "User 'pee' does not exist.")
    assert(intercept[QueryError](q(env, "drop group `nope`")).msg ===
      "Group 'nope' does not exist.")
    assert(intercept[QueryError](q(env, "grant full to user 'ghost'")).msg ===
      "Cannot find user: 'ghost'")
  }

  test("help: full multi-word topics with usage depth — help/*.md") {
    val env = EngineEnv(spark, dir)
    val sel = q(env, "help select").head(1).toString
    assert(sel.contains("prefix") && sel.contains("between") &&
      sel.contains("merge as") && sel.contains("=>"))
    assert(q(env, "help alter database").head(1).toString.contains("timezone"))
    assert(q(env, "help timezones").head(1).toString.contains("NAIVE"))
    assert(q(env, "help functions").head(1).toString.contains("derivative"))
    assert(q(env, "help").size >= 25)
  }

  test("set expiration_* guards the drop threshold — listener.c:4384-4402") {
    val sdir = java.nio.file.Files.createTempDirectory("graft-expguard").toString
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val api = new graft.server.ApiCore(spark, sdir)
    // one ancient point -> a single num shard, 100% of which any
    // modern expiration window would expire
    api.runInsert(mapper.readTree("""{"old": [[100, 1.0]]}"""), "iris")
    val env = api.env("iris")
    val e = intercept[QueryError](q(env, "alter database set expiration_num 1w"))
    assert(e.msg === "This query would drop 100.00% of the shards in pool 0. Add 'set ignore_threshold true' to the query statement if you really want to do this.")
    // the refused query must not have applied the expiration
    assert(q(env, "show expiration_num").head(1) === "0")
    // expiration_log looks at log shards only — none here, so 0% and
    // the set goes through without ignore_threshold
    assert(msg(env, "alter database set expiration_log 1w")
      .contains("Successfully changed"))
    // ignore_threshold bypasses the guard (grammar set_ignore_threshold)
    assert(msg(env,
      "alter database set expiration_num 1w set ignore_threshold true")
      .contains("Successfully changed"))
    // expiration >= now (minus the reference's one-day backoff) refused
    val e2 = intercept[QueryError](
      q(env, "alter database set expiration_num 5000w"))
    assert(e2.msg.startsWith("Shard expiration time should be a value greater than or equal to zero (0) and smaller than "))
    // zero always passes: it disables expiration
    assert(msg(env, "alter database set expiration_num 0")
      .contains("Successfully changed"))
  }

  test("uptime is a real elapsed clock, monotonic from server start — props.c") {
    val sdir = java.nio.file.Files.createTempDirectory("graft-uptime").toString
    val api = new graft.server.ApiCore(spark, sdir)
    val env = api.env("iris")
    val u1 = q(env, "show uptime").head(1).toString.toLong
    assert(u1 >= 0L && u1 < 600L, s"uptime should start near zero, got $u1")
    Thread.sleep(1100)
    val u2 = q(env, "list servers uptime").head.head.toString.toLong
    assert(u2 >= u1, s"uptime went backwards: $u1 -> $u2")
    assert(u2 >= 1L, s"uptime never advanced: $u2")
  }

  test("select memo is store-scoped: two databases on one thread don't cross") {
    val sdir = java.nio.file.Files.createTempDirectory("graft-memo2").toString
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val api = new graft.server.ApiCore(spark, sdir)
    api.runInsert(mapper.readTree("""{"only-here": [[100, 1.0]]}"""), "iris")
    val demoEnv = EngineEnv(spark, dir)
    val stmt = graft.parser.QueryParser.parse("select * from /.*/", 1706659200L)
      .asInstanceOf[graft.parser.SelectStmt]
    // prime the memo against the demo store, then — same thread, no
    // transport drain — resolve the same AST against the Ingest store
    Planner.run(stmt, demoEnv)
    val demoNames = Planner.selectNames(stmt, demoEnv)
    val storeEnv = api.env("iris")
    Planner.run(stmt, storeEnv)
    val storeNames = Planner.selectNames(stmt, storeEnv)
    assert(storeNames === Seq("only-here"),
      s"memo leaked across stores: $storeNames")
    assert(demoNames !== storeNames)
    Planner.drainQueryCaches()
  }

  test("raised list_limit round-trips past the old 10,001-row transport cap") {
    val sdir = java.nio.file.Files.createTempDirectory("graft-biglist").toString
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val api = new graft.server.ApiCore(spark, sdir)
    val node = mapper.createObjectNode()
    (0 until 10050).foreach { i =>
      val arr = node.putArray(f"s-$i%05d")
      val pt = arr.addArray(); pt.add(1000 + i); pt.add(i)
    }
    api.runInsert(node, "iris")
    assert(api.runQuery("alter database set list_limit 20000", 1L, "iris")
      .toString.contains("Successfully changed"))
    val res = api.runQuery("list series", 1L, "iris")
    assert(res.get("rows").size() === 10050,
      s"transport truncated: ${res.get("rows").size()} of 10050 rows")
    // and an explicit limit above the old cap is honored exactly
    val lim = api.runQuery("list series limit 10100", 1L, "iris")
    assert(lim.get("rows").size() === 10050)
  }
}
