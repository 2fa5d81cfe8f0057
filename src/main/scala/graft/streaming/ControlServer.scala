package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.SparkSession

/**
 * HTTP facade binding the control-plane verbs ([[JobControl]], C2–C5)
 * and the auth guard ([[Auth]], C1) to a real listener — end-to-end
 * parity with the reference's Flask service (reference app/app.py:55-116:
 * routes `/`, `/start`, `/stop`, `/check`; auth decorator app.py:31-52).
 * Built on the JDK's `com.sun.net.httpserver` so it adds no dependency.
 *
 * THE response contract — every verb × every state, pinned so spec
 * authors read it instead of guessing (each cell is enumerated by
 * ControlServerSpec's table-driven contract test):
 *
 * {{{
 * verb         | unauthorized       | empty body            | no job_name           | job RUNNING                          | job NOT running / unknown
 * -------------+--------------------+-----------------------+-----------------------+--------------------------------------+---------------------------------------------
 * GET  /       | (no auth required) | n/a                   | n/a                   | 200 "Server up and running"          | same (503 only after session stop)
 * POST /start  | 401 Auth.*Msg      | 400 "Must provide     | 400 "Must provide     | 200 "Job <n> already running: ..."   | launcher true  → 200 "Job <n> started"
 *              |                    |  arguments in payload"|  job_name"            | (idempotent echo, never a 2nd launch)| launcher false → 400 "Unknown job <n>"
 * POST /stop   | 401 Auth.*Msg      | 400 (as /start)       | 400 (as /start)       | 200 "Job <n> ended"                  | 404 "No active job <n>"
 * POST /check  | 401 Auth.*Msg      | 400 (as /start)       | 400 (as /start)       | 200 {"current_status": {...}}        | 200 {"current_status": null}
 * }}}
 *
 * The /check not-running cell mirrors the reference exactly: a
 * `ps | grep` that finds nothing still answers
 * `200 {"current_status": []}` (app.py:109-114) — not a 404, not an
 * error. Our `null` is that same "known verb, no live status" answer;
 * the server deliberately does NOT distinguish "name the launcher
 * knows but inactive" from "name nobody ever heard of" on /check or
 * /stop, because the reference's process-table grep can't either.
 *
 * The job launcher is injected (`name → started?`) so the facade stays
 * decoupled from which pipeline a deployment runs — the reference had
 * the same indirection via `Popen(f"{job_name}.py")`.
 *
 * Scale note: the control plane runs ON THE DRIVER and serves O(1)
 * metadata (job names, progress counters) — no data-plane traffic ever
 * flows through it, so one listener thread is enough at any cluster
 * size.
 */
final class ControlServer private (
    server: HttpServer,
    spark: SparkSession) {

  /** The bound port (useful with port=0 ephemeral binds in tests). */
  def port: Int = server.getAddress.getPort

  def stop(): Unit = server.stop(0)
}

object ControlServer {

  /**
   * Start the facade. `apiKey` plays the reference's `API_KEY` env var;
   * `launcher` maps a job name to a start attempt (true = launched).
   */
  def start(
      spark: SparkSession,
      apiKey: String,
      launcher: String => Boolean,
      port: Int = 0): ControlServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

    def handler(f: HttpExchange => (Int, String)): HttpHandler =
      new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          val (status, body) = try f(ex) catch {
            case e: Exception => (500, jsonMsg(s"internal error: ${e.getMessage}"))
          }
          val bytes = body.getBytes(UTF_8)
          ex.getResponseHeaders.set("Content-Type", "application/json")
          ex.sendResponseBody(status, bytes)
        }
        private implicit class RichExchange(ex: HttpExchange) {
          def sendResponseBody(status: Int, bytes: Array[Byte]): Unit = {
            ex.sendResponseHeaders(status, bytes.length)
            val os = ex.getResponseBody
            try os.write(bytes) finally os.close()
          }
        }
      }

    /** Run `action` behind the C1 guard, translating [[Auth.AuthResult]]
      * to the wire exactly as the reference decorator did. */
    def authed(ex: HttpExchange)(action: => (Int, String)): (Int, String) = {
      import scala.jdk.CollectionConverters._
      val headers: Map[String, String] = ex.getRequestHeaders.asScala.collect {
        case (k, vs) if !vs.isEmpty => k -> vs.get(0)
      }.toMap
      Auth.authorize(headers, apiKey)(action) match {
        case Auth.Authorized(result) => result
        case r @ Auth.Rejected(msg)  => (r.status, jsonMsg(msg))
      }
    }

    server.createContext("/", handler { ex =>
      if (ex.getRequestURI.getPath != "/") (404, jsonMsg("not found"))
      else if (JobControl.healthy(spark)) (200, jsonMsg("Server up and running"))
      else (503, jsonMsg("Spark session stopped"))
    })

    // Serializes the check-then-launch on /start: without it, two
    // concurrent requests for the same job can BOTH observe the query
    // as inactive and invoke the launcher twice — the second named
    // StreamingQuery start then throws instead of echoing the
    // documented 200. Control traffic is O(1) metadata, so one global
    // lock (not per-name striping) is the right-sized fix; the
    // already-active catch below additionally covers launches that
    // race with starts from OUTSIDE this facade.
    val startLock = new Object

    server.createContext("/start", handler { ex =>
      authed(ex) {
        withJobName(ex) { name =>
          // already-running path (reference app.py:70-78): /start on a
          // live job is NOT an error there — the handler re-greps `ps`
          // and echoes the existing process line with a 200. Mirror
          // that: echo the running job's own status instead of
          // double-launching (the reference's Popen would actually
          // fork a second poller; a named StreamingQuery can't run
          // twice, so the echo is the faithful non-broken semantics).
          startLock.synchronized {
            JobControl.status(spark, name) match {
              case Some(s) if s.isActive =>
                (200, jsonMsg(s"Job $name already running: ${s.message}"))
              case _ =>
                try {
                  if (launcher(name)) (200, jsonMsg(s"Job $name started"))
                  else (400, jsonMsg(s"Unknown job $name"))
                } catch {
                  // a start that lost a race to an out-of-band launch:
                  // Spark rejects the duplicate name ("... is already
                  // active ...") — same idempotent echo, not a 500
                  case e: IllegalArgumentException
                      if e.getMessage != null &&
                        e.getMessage.contains("already active") =>
                    (200, jsonMsg(s"Job $name already running"))
                }
            }
          }
        }
      }
    })

    server.createContext("/stop", handler { ex =>
      authed(ex) {
        withJobName(ex) { name =>
          if (JobControl.stop(spark, name)) (200, jsonMsg(s"Job $name ended"))
          else (404, jsonMsg(s"No active job $name"))
        }
      }
    })

    server.createContext("/check", handler { ex =>
      authed(ex) {
        withJobName(ex) { name =>
          JobControl.status(spark, name) match {
            case Some(s) =>
              // source metrics ride the check payload (round-14 #6):
              // shardsBehindLatest / recordsBehindLatest belong on the
              // reference's status verb, not in Spark internals
              val sources = s.sources.map { src =>
                val ms = src.metrics.toSeq.sortBy(_._1)
                  .map { case (k, v) => s"${quote(k)}: ${quote(v)}" }
                  .mkString(", ")
                s"""{"description": ${quote(src.description)}, """ +
                  s""""metrics": {$ms}}"""
              }.mkString("[", ", ", "]")
              (200, s"""{"current_status": {"name": ${quote(s.name)}, """ +
                s""""id": ${quote(s.id)}, "isActive": ${s.isActive}, """ +
                s""""batchesCompleted": ${s.batchesCompleted}, """ +
                s""""message": ${quote(s.message)}, """ +
                s""""sources": $sources}}""")
            case None => (200, """{"current_status": null}""")
          }
        }
      }
    })

    server.setExecutor(null) // control traffic is O(1); one thread suffices
    server.start()
    new ControlServer(server, spark)
  }

  /** Reference payload contract (app.py:66-83): a JSON object with
    * `job_name`; absent body → 400 "Must provide arguments in payload",
    * present but no job_name → 400 "Must provide job_name". */
  private def withJobName(ex: HttpExchange)(
      f: String => (Int, String)): (Int, String) = {
    val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    if (body.trim.isEmpty) (400, jsonMsg("Must provide arguments in payload"))
    else jobNameOf(body) match {
      case Some(name) => f(name)
      case None       => (400, jsonMsg("Must provide job_name"))
    }
  }

  /** Minimal extractor for the control plane's only payload shape — a
    * flat `{"job_name": "..."}` object (no nesting, no escapes in job
    * names, which are StreamingQuery names). Not a general JSON parser
    * by design: the control plane is not a data path. */
  private[streaming] def jobNameOf(body: String): Option[String] =
    """"job_name"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(body).map(_.group(1))
      .filter(_.nonEmpty)

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def jsonMsg(m: String): String = s"""{"message": ${quote(m)}}"""
}
