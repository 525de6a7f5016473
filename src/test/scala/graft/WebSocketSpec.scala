package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.functions._

import graft.functions.Sbe
import graft.sources.{WebSocketCapture, WsClient}

/** RFC 6455 transport under the SBE ingest (`binance_sbe.py:140-191`): a
  * real handshake + frame server drives [[WsClient]]/[[WebSocketCapture]]
  * through fragmentation, control frames, masking, and the close handshake,
  * ending in the journal → `sbe-frames` → decode pipeline.
  */
class WebSocketSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal RFC 6455 server: one connection, handshake, scripted frames.
    * Records protocol facts the client side cannot self-certify: that its
    * frames arrived MASKED, and that the ping was answered with the same
    * payload.
    */
  private final class TestWsServer(
      messages: Seq[(Int, Array[Byte])], // (opcode, payload) data messages
      fragmentFirstInto: Int = 0,
      pingAfter: Int = -1,
      badAccept: Boolean = false,
      serverSocketFactory: Option[javax.net.ServerSocketFactory] = None)
    extends AutoCloseable {
    private val server = serverSocketFactory
      .map(_.createServerSocket(0)).getOrElse(new ServerSocket(0))
    def port: Int = server.getLocalPort
    @volatile var unmaskedClientFrames = 0
    @volatile var pongPayload: Option[String] = None
    @volatile var gotCloseEcho = false
    val done = new CountDownLatch(1)

    private val t = new Thread(() => {
      val sock = server.accept()
      try {
        val in = new DataInputStream(new java.io.BufferedInputStream(sock.getInputStream))
        val out = new DataOutputStream(new java.io.BufferedOutputStream(sock.getOutputStream))
        // --- handshake ---
        def readLine(): String = {
          val sb = new StringBuilder
          var c = in.read()
          while (c != -1 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
          sb.toString
        }
        val lines = Iterator.continually(readLine()).takeWhile(_.nonEmpty).toSeq
        val key = lines.collectFirst {
          case l if l.toLowerCase.startsWith("sec-websocket-key:") => l.split(":", 2)(1).trim
        }.getOrElse("")
        val accept = if (badAccept) "bogus+accept+key" else WsClient.acceptKeyFor(key)
        out.write(
          ("HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n" +
            s"Connection: Upgrade\r\nSec-WebSocket-Accept: $accept\r\n\r\n")
            .getBytes("ISO-8859-1"))
        out.flush()
        if (!badAccept) serve(in, out)
      } catch { case _: Throwable => () } finally {
        sock.close(); server.close(); done.countDown()
      }

      def serve(in: DataInputStream, out: DataOutputStream): Unit = {
        // --- scripted frames (server frames are unmasked per the RFC) ---
        def frame(fin: Boolean, opcode: Int, p: Array[Byte]): Unit = {
          out.write((if (fin) 0x80 else 0) | opcode)
          if (p.length <= 125) out.write(p.length)
          else if (p.length <= 0xffff) { out.write(126); out.writeShort(p.length) }
          else { out.write(127); out.writeLong(p.length.toLong) }
          out.write(p); out.flush()
        }
        def readClientFrame(): (Int, Array[Byte]) = {
          val b0 = in.readUnsignedByte(); val b1 = in.readUnsignedByte()
          val masked = (b1 & 0x80) != 0
          if (!masked) unmaskedClientFrames += 1
          val len7 = b1 & 0x7f
          val len =
            if (len7 <= 125) len7
            else if (len7 == 126) (in.readUnsignedByte() << 8) | in.readUnsignedByte()
            else in.readLong().toInt
          val mask = if (masked) { val m = new Array[Byte](4); in.readFully(m); m }
            else Array[Byte](0, 0, 0, 0)
          val p = new Array[Byte](len); in.readFully(p)
          var i = 0
          while (i < p.length) { p(i) = (p(i) ^ mask(i & 3)).toByte; i += 1 }
          (b0 & 0x0f, p)
        }
        messages.zipWithIndex.foreach { case ((opcode, payload), idx) =>
          if (idx == 0 && fragmentFirstInto > 1) {
            // genuine continuation frames: opcode only on the first fragment
            val parts = payload.grouped(
              math.max(1, (payload.length + fragmentFirstInto - 1) / fragmentFirstInto)).toSeq
            parts.zipWithIndex.foreach { case (part, i) =>
              frame(fin = i == parts.length - 1, if (i == 0) opcode else 0, part)
            }
          } else frame(fin = true, opcode, payload)
          if (idx + 1 == pingAfter) {
            frame(fin = true, 9, "hb".getBytes("ISO-8859-1"))
            // the pong must come back BEFORE we send more (liveness check)
            val (op, p) = readClientFrame()
            if (op == 10) pongPayload = Some(new String(p, "ISO-8859-1"))
          }
        }
        frame(fin = true, 8, Array.emptyByteArray) // server-initiated close
        // drain client frames until the close echo
        var echoed = false
        while (!echoed) {
          val (op, _) = readClientFrame()
          if (op == 8) { echoed = true; gotCloseEcho = true }
        }
      }
    }, "test-ws-server")
    t.setDaemon(true)
    t.start()

    override def close(): Unit = { server.close() }
  }

  private def sbeFrames(n: Int): Seq[Array[Byte]] =
    Tables.trades(spark, sf).filter(col("trade_id") < n)
      .select(Sbe.encodeTrade(
        col("ts_ms") * 1000L, col("trade_id"),
        round(col("price") * 100).cast("long"), lit(-2),
        col("qty") > 50, upper(col("symbol"))).as("frame"))
      .orderBy("trade_id").collect().map(_.getAs[Array[Byte]]("frame")).toSeq

  test("ws feed -> journal -> sbe-frames -> decode, with fragmentation, ping, text noise") {
    val frames = sbeFrames(60)
    val script: Seq[(Int, Array[Byte])] =
      Seq((2, frames.head)) ++ // fragmented into 3 continuation frames below
        Seq((1, """{"stream":"metadata"}""".getBytes("ISO-8859-1"))) ++ // text: not journaled
        frames.tail.map(f => (2, f))
    val srv = new TestWsServer(script, fragmentFirstInto = 3, pingAfter = 20)
    val dir = java.nio.file.Files.createTempDirectory("graft_ws_cap_").toFile
    val cap = new WebSocketCapture("localhost", srv.port, "/stream", dir.toString)
    try {
      cap.awaitCompletion()
      srv.done.await()
      // every binary message journaled exactly once; text skipped
      assert(cap.journaledCount === 60)
      // protocol facts only the server can certify
      assert(srv.pongPayload === Some("hb"), "ping not answered in-stream")
      assert(srv.unmaskedClientFrames === 0, "client sent unmasked frames (RFC violation)")
      assert(srv.gotCloseEcho, "close handshake not completed")
      // the journal is a first-class sbe-frames feed: decode and check
      val ids = spark.read.format("sbe-frames").load(dir.toString)
        .select(Sbe.decodeTrade(col("frame")).getField("trade_id").as("id"))
        .as[Long].collect().sorted
      assert(ids.toSeq === (0L until 60L), "frames lost, torn, or re-fragmented")
    } finally { cap.close(); srv.close() }
  }

  test("wss: the identical protocol over TLS (test-generated certificate)") {
    // JSSE is the TLS layer — generate a keypair with the JDK's own
    // keytool, serve over an SSLServerSocket, and hand the client a
    // trust-pinned SSLSocketFactory; every protocol byte above the socket
    // is unchanged.
    val dir = java.nio.file.Files.createTempDirectory("graft_wss_pki")
    val ks = s"$dir/ks.p12"; val ts = s"$dir/ts.p12"; val cert = s"$dir/ws.cer"
    def keytool(args: String*): Unit = {
      val p = new ProcessBuilder(("keytool" +: args): _*).redirectErrorStream(true).start()
      assert(p.waitFor() === 0, s"keytool ${args.mkString(" ")}")
    }
    keytool("-genkeypair", "-alias", "ws", "-keyalg", "RSA", "-keysize", "2048",
      "-storetype", "PKCS12", "-keystore", ks, "-storepass", "changeit",
      "-dname", "CN=localhost", "-validity", "1")
    keytool("-exportcert", "-alias", "ws", "-keystore", ks,
      "-storepass", "changeit", "-file", cert)
    keytool("-importcert", "-alias", "ws", "-file", cert, "-keystore", ts,
      "-storepass", "changeit", "-storetype", "PKCS12", "-noprompt")
    def sslCtx(storePath: String, asKey: Boolean): javax.net.ssl.SSLContext = {
      val store = java.security.KeyStore.getInstance("PKCS12")
      val in = new java.io.FileInputStream(storePath)
      try store.load(in, "changeit".toCharArray) finally in.close()
      val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
      if (asKey) {
        val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
          javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
        kmf.init(store, "changeit".toCharArray)
        ctx.init(kmf.getKeyManagers, null, null)
      } else {
        val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
          javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
        tmf.init(store)
        ctx.init(null, tmf.getTrustManagers, null)
      }
      ctx
    }
    val frames = sbeFrames(20)
    val srv = new TestWsServer(
      frames.map(f => (2, f)),
      serverSocketFactory = Some(sslCtx(ks, asKey = true).getServerSocketFactory))
    val capDir = java.nio.file.Files.createTempDirectory("graft_wss_cap_").toFile
    val cap = new graft.sources.WebSocketCapture(
      "localhost", srv.port, "/tls", capDir.toString,
      socketFactory = sslCtx(ts, asKey = false).getSocketFactory)
    try {
      cap.awaitCompletion()
      srv.done.await()
      assert(cap.journaledCount === 20)
      assert(srv.unmaskedClientFrames === 0 && srv.gotCloseEcho)
      val ids = spark.read.format("sbe-frames").load(capDir.toString)
        .select(Sbe.decodeTrade(col("frame")).getField("trade_id").as("id"))
        .as[Long].collect().sorted
      assert(ids.toSeq === (0L until 20L))
    } finally { cap.close(); srv.close() }
  }

  test("extended payload lengths: 126 (16-bit) and 127 (64-bit) frames round-trip") {
    // RFC 6455 §5.2 has three length encodings; the basic tests only ever
    // exercise <=125. A 300-byte and a 70,000-byte message force the 16-bit
    // and 64-bit paths through BOTH the server writer and the client reader,
    // and journal byte-identically.
    val mid = Array.tabulate[Byte](300)(i => (i % 251).toByte)
    val big = Array.tabulate[Byte](70000)(i => ((i * 31) % 251).toByte)
    val srv = new TestWsServer(Seq((2, mid), (2, big)))
    val dir = java.nio.file.Files.createTempDirectory("graft_ws_big_").toFile
    val cap = new graft.sources.WebSocketCapture("localhost", srv.port, "/big", dir.toString)
    try {
      cap.awaitCompletion()
      srv.done.await()
      assert(cap.journaledCount === 2)
      val frames = spark.read.format("sbe-frames").load(dir.toString)
        .select(col("frame")).collect().map(_.getAs[Array[Byte]](0))
        .sortBy(_.length)
      assert(frames.length === 2)
      assert(java.util.Arrays.equals(frames(0), mid), "16-bit-length frame corrupted")
      assert(java.util.Arrays.equals(frames(1), big), "64-bit-length frame corrupted")
    } finally { cap.close(); srv.close() }
  }

  test("a wrong Sec-WebSocket-Accept aborts the handshake loudly") {
    val srv = new TestWsServer(Seq.empty, badAccept = true)
    try {
      val e = intercept[java.io.IOException] {
        new WsClient("localhost", srv.port).close()
      }
      assert(e.getMessage.contains("Sec-WebSocket-Accept mismatch"))
    } finally srv.close()
  }

  test("reassembled continuation total above maxMessageBytes aborts (per-frame cap is not enough)") {
    // each fragment is small enough to pass the per-FRAME length guard; the
    // cap must bite on the REASSEMBLED total or a malicious server could
    // stream non-FIN continuations until the heap dies
    val big = Array.tabulate[Byte](3000)(i => (i % 113).toByte)
    val srv = new TestWsServer(Seq((2, big)), fragmentFirstInto = 10) // 10 × 300-byte frames
    try {
      val c = new WsClient("localhost", srv.port, "/frag", maxMessageBytes = 1000)
      try {
        val e = intercept[java.io.StreamCorruptedException](c.readMessage())
        assert(e.getMessage.contains("reassembled message exceeds 1000 bytes"))
      } finally c.close()
    } finally srv.close()
  }

  test("accept-key derivation matches the RFC 6455 §1.3 worked example") {
    // the spec's own test vector: key "dGhlIHNhbXBsZSBub25jZQ==" →
    // accept "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="
    assert(WsClient.acceptKeyFor("dGhlIHNhbXBsZSBub25jZQ==") ===
      "s3pPLMBiTxaQ9kYGzzhZRbK+xOo=")
  }
}
