package graft.server

/** Live tee — mirrors every accepted insert package to an external TCP
  * endpoint as a CPROTO REQ_INSERT frame, the analog of
  * src/siri/db/tee.c (insert.c:350,1080 writes the raw package to the
  * tee connection). Configured per insert from the alterable `tee`
  * database setting: `ADDRESS[:PORT]` (default port 9104,
  * include/siri/db/tee.h:9) or `false` to disable.
  *
  * The reference tee is asynchronous (libuv) and drops data on outage
  * without ever delaying an insert; this mirrors that contract: the
  * insert path only evaluates the payload when the tee is enabled and
  * enqueues it on a small bounded queue — a slow or dead endpoint can
  * at worst fill the queue (then mirrors are logged and DROPPED, never
  * blocking an insert), and the connect (bounded by a timeout) plus
  * any TCP-backpressure stall is paid by the single writer thread,
  * never by the caller. Frames for one endpoint go out in insert
  * order (single writer, FIFO queue).
  */
final class Tee {
  private val ConnectTimeoutMs = 3000
  @volatile private var spec: String = "false"
  private val queue = new java.util.concurrent.ArrayBlockingQueue[Array[Byte]](256)
  // writer-thread state
  private var sock: java.net.Socket = null
  private var sockSpec: String = "false"
  private var pid = 0

  /** Parse ADDRESS[:PORT] (sirinet_extract_addr_port). */
  private def addr(s: String): (String, Int) = s.lastIndexOf(':') match {
    case -1 => (s, 9104)
    case i => (s.substring(0, i), s.substring(i + 1).toInt)
  }

  /** Mirror one insert body if the tee is enabled; `configured` is the
    * live database setting. `data` is by-name: the qpack encoding is
    * only paid when a tee is actually configured (the default is
    * disabled — re-serializing every insert for nothing). */
  def write(configured: String, data: => Array[Byte]): Unit = {
    spec = configured
    if (configured == "false" || configured.isEmpty) return
    if (!queue.offer(data))
      System.err.println(
        s"tee to '$configured' backlogged; dropping insert mirror")
  }

  private val writer = new Thread(() => loop(), "graft-tee")
  writer.setDaemon(true)
  writer.start()

  private def loop(): Unit = while (true) {
    val data = queue.poll(1, java.util.concurrent.TimeUnit.SECONDS)
    val s = spec
    if (data == null) {
      // idle: honor a spec change (disable/redirect closes the old
      // connection like tee.c does on reconfigure)
      if (s != sockSpec) { close(); sockSpec = s }
    } else if (s == "false" || s.isEmpty) {
      close(); sockSpec = s // drained a message enqueued before disable
    } else {
      try {
        if (s != sockSpec || sock == null || sock.isClosed) {
          close()
          val (h, p) = addr(s)
          val sk = new java.net.Socket()
          sk.connect(new java.net.InetSocketAddress(h, p), ConnectTimeoutMs)
          sock = sk; sockSpec = s; pid = 0
        }
        pid += 1
        Cproto.sendPkg(sock.getOutputStream, pid, 1, data) // REQ_INSERT
      } catch {
        case e: Exception =>
          System.err.println(s"tee write to '$s' failed: ${e.getMessage}")
          close()
      }
    }
  }

  private def close(): Unit = {
    if (sock != null) { try sock.close() catch { case _: Exception => () } }
    sock = null
  }
}
