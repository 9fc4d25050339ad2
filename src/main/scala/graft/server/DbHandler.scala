package graft.server

import com.fasterxml.jackson.databind.JsonNode

/** The per-database handler surface every transport binds to — either
  * a standalone single-store server ([[ApiCore]]) or a
  * pool-distributed cluster ([[PoolCluster]]). Transports cannot tell
  * the difference, exactly like the reference's client front end
  * (clserver.c) serves a clustered and a single-server siridb through
  * the same handlers. */
trait DbHandler {
  def dbName: String
  def meta: graft.meta.MetaStore
  def authenticate(user: String, password: String): Boolean
  def runQuery(q: String, tsFactor: Long, user: String): JsonNode
  def runInsert(req: JsonNode, user: String): JsonNode
}
