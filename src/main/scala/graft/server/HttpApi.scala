package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.Base64

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.parser.{AccessError, QueryError}

/** Thin HTTP façade over the engine — the Spark analog of the
  * reference's HTTP API (src/siri/api.c:233-292):
  *
  *   POST /query/<db>   {"q": "<siridb query>"}
  *   POST /insert/<db>  {"name": [[ts,val],...], ...}        (map form)
  *                      [{"name": "x", "points": [[ts,v]..]}] (array form)
  *
  * Credentials ride an HTTP basic Authorization header like the
  * reference (api.c authentication); a request without one runs as the
  * seeded default user 'iris' (users.c:70-85) so local tooling works
  * out of the box. Access bits are enforced per statement either way.
  *
  * Handlers and encodings live in [[ApiCore]], shared with the
  * TCP/qpack transport ([[TcpApi]]).
  */
final class HttpApi(spark: SparkSession, storeDir: String, port: Int = 0,
    sharedCore: Option[ApiCore] = None) {

  private val core = sharedCore.getOrElse(new ApiCore(spark, storeDir))
  private val mapper = new ObjectMapper()

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/query/", exchange(handleQuery))
  server.createContext("/insert/", exchange(handleInsert))

  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = server.stop(0)

  /** Metastore shared with the core (exposed for specs). */
  def meta: graft.meta.MetaStore = core.meta

  // ---- handlers ----

  private final case class HttpError(code: Int, msg: String)
    extends RuntimeException(msg)

  /** Basic-auth credentials when present; default user otherwise. */
  private def userOf(ex: HttpExchange): String = {
    Option(ex.getRequestHeaders.getFirst("Authorization")) match {
      case Some(h) if h.startsWith("Basic ") =>
        val dec = new String(Base64.getDecoder.decode(h.stripPrefix("Basic ")),
          StandardCharsets.UTF_8)
        dec.split(":", 2) match {
          case Array(u, p) if core.authenticate(u, p) => u
          case _ => throw HttpError(401, "Invalid credentials")
        }
      case Some(_) => throw HttpError(401, "Invalid authorization header")
      case None => "iris"
    }
  }

  private def exchange(h: (HttpExchange, JsonNode, Map[String, String]) => (Int, JsonNode))(ex: HttpExchange): Unit = {
    val (code, body) =
      try {
        if (ex.getRequestMethod != "POST")
          (405, errNode("only POST is supported"))
        else {
          val in = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val params = Option(ex.getRequestURI.getQuery).toSeq
            .flatMap(_.split("&").toSeq)
            .flatMap(_.split("=", 2) match {
              case Array(k, v) => Some(k -> v)
              case _ => None
            }).toMap
          h(ex, mapper.readTree(in), params)
        }
      } catch {
        case e: HttpError => (e.code, errNode(e.msg))
        case e: AccessError => (403, errNode(e.msg))
        case e: QueryError => (400, errNode(e.msg))
        case e: Exception =>
          val m = Option(e.getMessage).getOrElse(e.toString).linesIterator.next()
          (500, errNode(m))
      }
    val bytes = mapper.writeValueAsBytes(body)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def errNode(m: String): JsonNode =
    mapper.createObjectNode().put("error_msg", m)

  /** Output timestamp precision correction: the client may ask for
    * another precision via ?t=s|ms|us|ns and output ts values are
    * scaled by the factor ratio (clserver.c:480-505,
    * siridb_points_ts_correction points.c:291). */
  private val outFactors = Map("s" -> 1L, "ms" -> 1000L,
    "us" -> 1000000L, "ns" -> 1000000000L)

  private def handleQuery(ex: HttpExchange, req: JsonNode, params: Map[String, String]): (Int, JsonNode) = {
    val user = userOf(ex)
    val q = Option(req.get("q")).map(_.asText())
      .getOrElse(throw QueryError("expecting a 'q' field with the query"))
    val tsFactor = params.get("t")
      .map(t => outFactors.getOrElse(t,
        throw QueryError(s"unknown time precision '$t' (use s, ms, us or ns)")))
      .getOrElse(1L)
    (200, core.runQuery(q, tsFactor, user))
  }

  private def handleInsert(ex: HttpExchange, req: JsonNode, params: Map[String, String]): (Int, JsonNode) =
    (200, core.runInsert(req, userOf(ex)))
}
