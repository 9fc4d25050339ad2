package graft.meta

/** The reference's series→pool assignment table
  * (src/siri/db/lookup.c, include/siri/db/lookup.h): 8192 slots,
  * built incrementally pool by pool. Growing from m-1 to m pools
  * walks the table with one counter per existing pool and reassigns
  * exactly the slots whose counter hits an m-th tick — ~1/m of the
  * keyspace, the minimum a balanced expansion can move. That property
  * is what makes live re-index (reindex.c) affordable: adding pool n
  * relocates only the series whose slot newly maps to n, and nothing
  * else changes owner (pinned in PoolSpec).
  *
  * A series hashes to a slot by the uint32 sum of its name bytes
  * (signed chars, like C) mod 8192 (siridb_lookup_sn, lookup.c:13-20).
  */
final class Lookup private (table: Array[Int], val numPools: Int) {

  def poolOf(series: String): Int = table(Lookup.slotOf(series))

  def poolOfSlot(slot: Int): Int = table(slot)

  def slots: IndexedSeq[Int] = table.toIndexedSeq

  /** (slot, pool) rows for a distributed broadcast join — the Spark
    * way to apply the table to a billion-series frame (8192 rows
    * broadcast beat an 8192-ary literal array expression). */
  def toRows: Seq[(Int, Int)] = table.toIndexedSeq.zipWithIndex
    .map { case (pool, slot) => (slot, pool) }
}

object Lookup {
  /** SIRIDB_LOOKUP_SZ (include/siri/siri.h via lookup.h). */
  val Size = 8192

  /** Slot of a series name: uint32 sum of the name's code points mod
    * Size. For ASCII names (the overwhelming case) this is exactly
    * the reference's signed-char byte sum (siridb_lookup_sn); for
    * non-ASCII names it intentionally diverges from C in favor of
    * agreeing bit-for-bit with the distributed [[slotSql]] expression
    * — routing (driver-side, here) and re-index (executor-side SQL)
    * MUST assign every name identically, or an expansion could move a
    * series while later inserts still target its old pool. */
  def slotOf(series: String): Int = {
    var n = 0
    series.codePoints().forEach(cp => n += cp)
    ((n.toLong & 0xFFFFFFFFL) % Size).toInt
  }

  /** Spark SQL expression computing the same slot over a series-name
    * column: ascii(one-char substring) is the code point, so this is
    * [[slotOf]] exactly (and the C byte sum for ASCII names). */
  def slotSql(colName: String): String =
    s"CAST(aggregate(transform(sequence(1, length($colName)), " +
      s"i -> ascii(substring($colName, i, 1))), 0L, (a, x) -> a + x) " +
      s"% $Size AS INT)"

  /** Build the table for `numPools` pools (siridb_lookup_new,
    * lookup.c:37-71). */
  def apply(numPools: Int): Lookup = {
    require(numPools >= 1, s"numPools must be >= 1, got $numPools")
    val table = new Array[Int](Size)
    var n = 1
    var m = 2
    while (n < numPools) {
      val counters = Array.tabulate(n)(identity)
      var i = 0
      while (i < Size) {
        counters(table(i)) += 1
        if (counters(table(i)) % m == 0) table(i) = n
        i += 1
      }
      n += 1
      m += 1
    }
    new Lookup(table, numPools)
  }
}
