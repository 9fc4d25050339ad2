package graft.server

/** Live tee — mirrors every accepted insert package to an external TCP
  * endpoint as a CPROTO REQ_INSERT frame, the analog of
  * src/siri/db/tee.c (insert.c:350,1080 writes the raw package to the
  * tee connection). One lazily-opened connection per server,
  * reconnected on demand; a tee outage is logged and NEVER fails the
  * insert (tee.c logs and drops). Configured per insert from the
  * alterable `tee` database setting: `ADDRESS[:PORT]` (default port
  * 9104, include/siri/db/tee.h:9) or `false` to disable.
  */
final class Tee {
  @volatile private var spec: String = "false"
  private var sock: java.net.Socket = null
  private var pid = 0

  /** Parse ADDRESS[:PORT] (sirinet_extract_addr_port). */
  private def addr(s: String): (String, Int) = s.lastIndexOf(':') match {
    case -1 => (s, 9104)
    case i => (s.substring(0, i), s.substring(i + 1).toInt)
  }

  /** Mirror one insert body (already qpack-encoded) if the tee is
    * enabled; `configured` is the live database setting. */
  def write(configured: String, data: Array[Byte]): Unit = synchronized {
    if (configured != spec) { close(); spec = configured }
    if (spec == "false" || spec.isEmpty) return
    val (h, p) = addr(spec)
    try {
      if (sock == null || sock.isClosed) sock = new java.net.Socket(h, p)
      pid += 1
      Cproto.sendPkg(sock.getOutputStream, pid, 1, data) // REQ_INSERT
    } catch {
      case e: Exception =>
        System.err.println(s"tee write to '$spec' failed: ${e.getMessage}")
        close()
    }
  }

  private def close(): Unit = {
    if (sock != null) { try sock.close() catch { case _: Exception => () } }
    sock = null
  }
}
