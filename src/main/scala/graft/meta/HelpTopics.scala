package graft.meta

/** Built-in help content — the engine analog of the reference's
  * markdown help set (reference help directory, wired through the
  * grammar's help statement, grammar.py:897-945). Texts are original
  * paraphrases that document THIS engine's surface; syntax lines
  * follow the shared grammar.
  */
object HelpTopics {

  val topics: Map[String, String] = Map(
    "select" ->
      """select
        |======
        |Syntax:
        |    select <aggregate(..)> [prefix 'p'] [suffix 's'] [, more...]
        |        from <series match> [where <cexpr>]
        |        [after <t> | before <t> | between <a> and <b> | head <n> | tail <n>]
        |        [merge as 'name' [using <aggregate(..)>]]
        |
        |Selects points from matched series. Multiple aggregates share one
        |scan of the data; when selecting more than one, give each a prefix
        |and/or suffix so output names stay unique. Aggregates chain with
        |'=>', feeding one result into the next, e.g.
        |    select median(1m) => difference() from 'series-001'
        |A time range restricts the scan; 'merge as' unions all selected
        |series into one, optionally re-aggregated with 'using'.
        |See 'help functions' for the aggregate set.""".stripMargin,
    "functions" ->
      """aggregate functions
        |===================
        |Bucketed or whole-series (empty parens) forms:
        |    count, sum, mean, median, median_low, median_high, min, max,
        |    variance, pvariance, stddev, first, last
        |Pairwise forms over consecutive points:
        |    difference([ts]), derivative([unit [, ts]]), interval(), timeval()
        |Point filters:
        |    filter(<op> <value>) with == != < > <= >= ~ !~ and
        |    numeric / string / regex / nan / inf literals
        |Dynamic re-bucketing:
        |    limit(N, fn) — re-buckets any series longer than N points
        |An offset(ts) after a bucketed aggregate shifts its labels.""".stripMargin,
    "list" ->
      """list
        |====
        |Syntax:
        |    list series [columns] [match] [where <cexpr>] [limit <n>]
        |    list groups|tags|users|pools|shards|servers [columns] [where ...]
        |
        |Shows database entities as a column table. Series columns: name,
        |type, length, start, end, shard_duration, pool. The output is
        |capped by the database list_limit (alterable).""".stripMargin,
    "list series" ->
      """list series
        |===========
        |Syntax:
        |    list series [col, ...] [match] [where <cexpr>] [limit <n>]
        |Series match: 'name', /regex/, `group`, combined with the set
        |operators , (union) & (intersection) - (difference) ^ (symmetric
        |difference). The where clause filters on name, type, length,
        |start, end, shard_duration and pool.""".stripMargin,
    "list servers" ->
      """list servers
        |============
        |Syntax:
        |    list servers [col, ...] [where <cexpr>]
        |Default columns: name, pool, version, online, status. All server
        |props are selectable: address, port, uuid, active_handles,
        |active_tasks, buffer_path, buffer_size, dbpath, fifo_files,
        |idle_percentage, idle_time, ip_support, libuv, list_limit,
        |log_level, max_open_files, mem_usage, open_files,
        |received_points, reindex_progress, selected_points,
        |select_points_limit, startup_time, sync_progress, uptime.""".stripMargin,
    "list groups" ->
      "list groups\n===========\nSyntax:\n    list groups [name, expression, series] [where <cexpr>]\nShows saved groups with their regular expression and member count.",
    "list users" ->
      "list users\n==========\nSyntax:\n    list users [name, access] [where <cexpr>]\nShows database users and their access profile string.",
    "list pools" ->
      "list pools\n==========\nSyntax:\n    list pools [pool, servers, series] [where <cexpr>]\nShows pools with the number of servers and series per pool.",
    "list shards" ->
      "list shards\n===========\nSyntax:\n    list shards [sid, pool, size, start, end] [where <cexpr>]\nShows the time-bucketed shards holding the points.",
    "count" ->
      """count
        |=====
        |Syntax:
        |    count series [match] [where ...]       — number of series
        |    count series length [match] [where ...] — total points
        |    count groups|tags|users|pools|servers|shards [where ...]
        |    count shards size                       — bytes in shards
        |    count servers received_points|selected_points
        |Returns a single number.""".stripMargin,
    "count series" ->
      "count series\n============\nSyntax:\n    count series [match] [where <cexpr>]\nCounts matched series; 'count series length' sums their point counts\nstraight from the catalog, never scanning point data.",
    "count groups" ->
      "count groups\n============\nSyntax:\n    count groups [where <cexpr>]\nCounts saved groups.",
    "count pools" ->
      "count pools\n===========\nSyntax:\n    count pools\nCounts pools in use.",
    "count servers" ->
      "count servers\n=============\nSyntax:\n    count servers [received_points | selected_points]\nCounts servers, or sums their point counters.",
    "count shards" ->
      "count shards\n============\nSyntax:\n    count shards [size] [where <cexpr>]\nCounts shards, or their total size with 'size'.",
    "count users" ->
      "count users\n===========\nSyntax:\n    count users [where <cexpr>]\nCounts database users.",
    "create" ->
      """create
        |======
        |Syntax:
        |    create group `name` for /regex/
        |    create user 'name' set password 'secret'
        |Groups auto-track every series matching their expression; users
        |start with no access until granted.""".stripMargin,
    "create group" ->
      "create group\n============\nSyntax:\n    create group `name` for /regex/\nThe group continuously contains every series whose name matches the\nexpression, including series created later.",
    "create user" ->
      "create user\n===========\nSyntax:\n    create user 'name' set password 'secret'\nNew users have no access; see 'help grant'.",
    "drop" ->
      """drop
        |====
        |Syntax:
        |    drop series [match] [where ...] [set ignore_threshold true]
        |    drop shards [where ...] [set ignore_threshold true]
        |    drop group `name` | drop tag `name` | drop user 'name'
        |    drop server <uuid | 'name'>
        |Dropping series/shards is guarded by the database drop_threshold
        |fraction unless ignore_threshold is set.""".stripMargin,
    "drop series" ->
      "drop series\n===========\nSyntax:\n    drop series [match] [where <cexpr>] [set ignore_threshold true]\nRemoves matched series everywhere. Refused when the match exceeds the\ndrop_threshold fraction of the database unless ignore_threshold true.",
    "drop shards" ->
      "drop shards\n===========\nSyntax:\n    drop shards [where sid|start|end <op> <t>] [set ignore_threshold true]\nRemoves whole time buckets of points — the efficient bulk-expiry path.",
    "drop server" ->
      "drop server\n===========\nSyntax:\n    drop server <uuid | 'name'>\nRemoves an offline server from the cluster. The only server of a pool\ncannot be removed.",
    "drop group" ->
      "drop group\n==========\nSyntax:\n    drop group `name`\nRemoves the group; member series are unaffected.",
    "drop user" ->
      "drop user\n=========\nSyntax:\n    drop user 'name'\nRemoves the user.",
    "alter" ->
      """alter
        |=====
        |Syntax:
        |    alter series <match> [where ...] tag|untag `t`
        |    alter user 'name' set password '...'
        |    alter group `name` set expression /regex/
        |    alter tag `name` set name "new"
        |    alter server [<ref>] set log_level|backup_mode|address|port ...
        |    alter servers [where ...] set log_level ...
        |    alter database set <property> <value>
        |See the per-entity help topics for details.""".stripMargin,
    "alter database" ->
      """alter database
        |==============
        |Syntax:
        |    alter database set drop_threshold <0.0 .. 1.0>
        |    alter database set list_limit <n>
        |    alter database set select_points_limit <n>
        |    alter database set expiration_num|expiration_log <time>
        |    alter database set timezone '<zone>'
        |    alter database set tee '<target>' | false
        |The timezone changes how ISO8601 date strings parse (see
        |'help timezones'); expiration drops shards past the retention
        |window.""".stripMargin,
    "alter server" ->
      "alter server\n============\nSyntax:\n    alter server [<uuid | 'name'>] set log_level debug|info|warning|error|critical\n    alter server [...] set backup_mode true|false\n    alter server [...] set address '<host>' | set port <n>\nAddress and port can only change while the server is not connected.",
    "alter servers" ->
      "alter servers\n=============\nSyntax:\n    alter servers [where <cexpr>] set log_level <level>\nApplies the change to every server matching the where clause.",
    "alter group" ->
      "alter group\n===========\nSyntax:\n    alter group `name` set expression /regex/\nReplaces the group's expression; membership re-evaluates immediately.",
    "alter user" ->
      "alter user\n==========\nSyntax:\n    alter user 'name' set password 'new'\nChanges the user's password.",
    "grant" ->
      """grant
        |=====
        |Syntax:
        |    grant <access list> to user 'name' [set password '...']
        |Access keywords: show, count, list, select, insert, create,
        |alter, drop, grant, revoke — or the profiles read (show+count+
        |list+select), write (read+insert+create), modify (write+alter+
        |drop) and full (modify+grant+revoke).""".stripMargin,
    "revoke" ->
      "revoke\n======\nSyntax:\n    revoke <access list> from user 'name'\nRemoves the named access bits (profiles expand to their bit set).",
    "access" ->
      "access\n======\nAccess bits: show count list select insert create alter drop grant\nrevoke. Profiles: read < write < modify < full, each containing the\nprevious. 'list users' shows the folded profile string.",
    "show" ->
      "show\n====\nSyntax:\n    show [prop, ...]\nShows server/database properties (all of them without arguments):\nversion, uptime, mem_usage, received_points, selected_points,\ntimezone, time_precision, duration_num, log_level and more.",
    "timeit" ->
      "timeit\n======\nSyntax:\n    timeit <any query>\nRuns the query and adds a __timeit__ section with the measured\nserver-side time.",
    "timezones" ->
      "timezones\n=========\nThe special zone NAIVE (the creation default) reads date strings as\nserver-local time. Any IANA zone name (e.g. Europe/Amsterdam, UTC,\nAmerica/New_York) applies that zone's rules including DST; an explicit\noffset inside the date string always wins.",
    "noaccess" ->
      "no access\n=========\nYour user is missing the access bit for the attempted statement. An\nadministrator can add it with: grant <access> to user '<you>'. See\n'help access' for the bit and profile list.")

  /** Topic listing for bare `help`. */
  def index: Seq[String] = topics.keys.toSeq.sorted
}
