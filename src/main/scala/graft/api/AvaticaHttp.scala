package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.{Row, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Avatica-shaped JSON-over-HTTP binding for [[JdbcApi]] — the wire layer
  * the reference serves from `sql/.../avatica/DruidAvaticaJsonHandler.java`
  * (Calcite Avatica remote JSON service: one POST endpoint, a `request`
  * discriminator per RPC, `response`-tagged bodies). The
  * connection/statement/prepare/frame model underneath is JdbcApi's; this
  * file only translates HTTP+JSON to those calls, so protocol tests drive
  * the same state machine as the in-process JDBC tests.
  *
  * Implemented request types (the subset a SELECT-driving client uses):
  * openConnection, closeConnection, createStatement, closeStatement,
  * prepare, prepareAndExecute, execute, fetch, connectionSync (no-op ack),
  * commit/rollback (no-op acks — queries are read-only or auto-committed
  * ingest, like the reference).
  */
object AvaticaHttp {

  /** Start a loopback server on `port` (0 = ephemeral); returns the bound
    * server — `stop(0)` to shut down. Single POST endpoint at `/druid/v2/
    * sql/avatica/` like the reference's default `avatica.path`.
    */
  def start(spark: SparkSession, dir: String, port: Int = 0): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/druid/v2/sql/avatica/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        // Avatica's remote JSON handler replies 500 with the error body on
        // a failed dispatch (AbstractAvaticaHandler) — status-code-driven
        // clients must not read a failure as success
        var status = 200
        val out =
          try JsonMethods.compact(JsonMethods.render(
            dispatch(spark, dir, JsonMethods.parse(body))))
          catch { case e: Throwable =>
            status = 500
            JsonMethods.compact(JsonMethods.render(JObject(
              "response" -> JString("error"),
              "errorMessage" -> JString(
                Option(e.getMessage).getOrElse(e.getClass.getName)),
              "errorCode" -> JInt(-1),
              "sqlState" -> JString("00000"))))
          }
        val bytes = out.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    server
  }

  private def str(j: JValue): String = j match {
    case JString(s) => s
    case other => throw new IllegalArgumentException(s"expected string, got $other")
  }

  private def intOf(j: JValue, default: Int): Int = j match {
    case JInt(n)  => n.toInt
    case JLong(n) => n.toInt
    case _        => default
  }

  private def longOf(j: JValue, default: Long): Long = j match {
    case JInt(n)  => n.toLong
    case JLong(n) => n
    case _        => default
  }

  /** Decode an Avatica TypedValue ({"type": "...", "value": ...}) or a bare
    * JSON scalar into the (typeName, value) pair JdbcApi's execute expects.
    */
  private def param(j: JValue): Any = j match {
    case JObject(fields) =>
      val m = fields.toMap
      val t = m.get("type").collect { case JString(s) => s.toUpperCase }
        .getOrElse("OTHER")
      (t, scalar(m.getOrElse("value", JNull)))
    case other => scalar(other)
  }

  private def scalar(j: JValue): Any = j match {
    case JNull | JNothing => null
    case JString(s)       => s
    case JBool(b)         => b
    case JInt(n)          => n.toLong
    case JLong(n)         => n
    case JDouble(d)       => d
    case JDecimal(d)      => d.toDouble
    case other            => JsonMethods.compact(JsonMethods.render(other))
  }

  private def cell(v: Any): JValue = v match {
    case null                  => JNull
    case s: String             => JString(s)
    case b: Boolean            => JBool(b)
    case i: Int                => JLong(i.toLong)
    case l: Long               => JLong(l)
    case s: Short              => JLong(s.toLong)
    case b: Byte               => JLong(b.toLong)
    case d: Double             => JDouble(d)
    case f: Float              => JDouble(f.toDouble)
    case d: java.math.BigDecimal => JString(d.toPlainString)
    case t: java.sql.Timestamp => JLong(t.getTime) // Avatica: epoch millis
    case d: java.sql.Date      => JString(d.toString)
    case other                 => JString(other.toString)
  }

  private def rowJson(r: Row): JValue =
    JArray((0 until r.length).map(i => cell(r.get(i))).toList)

  private def frameJson(f: JdbcApi.Frame): JValue = JObject(
    "offset" -> JLong(f.offset),
    "done" -> JBool(f.done),
    "rows" -> JArray(f.rows.map(rowJson).toList))

  private def signatureJson(sig: JdbcApi.Signature): JValue = JObject(
    "columns" -> JArray(sig.columns.map(c => JObject(
      "columnName" -> JString(c.name),
      "type" -> JObject("name" -> JString(c.sqlType)),
      "nullable" -> JInt(if (c.nullable) 1 else 0))).toList),
    "parameters" -> JArray(sig.parameterTypes.map(t => JObject(
      "typeName" -> JString(t))).toList),
    "cursorFactory" -> JObject("style" -> JString("LIST")))

  private def resultSetJson(connectionId: String, statementId: Int,
      sig: Option[JdbcApi.Signature], first: JdbcApi.Frame): JValue = JObject(
    "response" -> JString("resultSet"),
    "connectionId" -> JString(connectionId),
    "statementId" -> JInt(statementId),
    "ownStatement" -> JBool(true),
    "signature" -> sig.map(signatureJson).getOrElse(JNull),
    "firstFrame" -> frameJson(first),
    "updateCount" -> JLong(-1L))

  /** Post-execute signature derived from the statement's result schema —
    * plain (non-prepared) statements have no prepare-time signature.
    */
  private def executedSignature(connectionId: String,
      statementId: Int): JdbcApi.Signature = {
    val schema = JdbcApi.resultSchema(connectionId, statementId)
    JdbcApi.Signature(schema.fields.toSeq.map(f =>
      JdbcApi.ColumnMeta(f.name, f.dataType.sql, f.nullable)), 0)
  }

  private def dispatch(spark: SparkSession, dir: String, j: JValue): JValue = {
    val req = str(j \ "request")
    val connId = j \ "connectionId" match {
      case JString(s) => s; case _ => ""
    }
    req match {
      case "openConnection" =>
        val info = j \ "info" match {
          case JObject(fs) => fs.collect {
            case (k, JString(v)) => k -> v
          }.toMap
          case _ => Map.empty[String, String]
        }
        JdbcApi.openConnection(connId, info)
        JObject("response" -> JString("openConnection"),
          "connectionId" -> JString(connId))
      case "closeConnection" =>
        JdbcApi.closeConnection(connId)
        JObject("response" -> JString("closeConnection"),
          "connectionId" -> JString(connId))
      case "createStatement" =>
        val sid = JdbcApi.createStatement(connId)
        JObject("response" -> JString("createStatement"),
          "connectionId" -> JString(connId), "statementId" -> JInt(sid))
      case "closeStatement" =>
        JdbcApi.closeStatement(connId, intOf(j \ "statementId", -1))
        JObject("response" -> JString("closeStatement"),
          "connectionId" -> JString(connId))
      case "prepare" =>
        val (sid, sig) = JdbcApi.prepareStatement(spark, dir, connId,
          str(j \ "sql"))
        JObject("response" -> JString("prepare"),
          "statement" -> JObject(
            "connectionId" -> JString(connId),
            "id" -> JInt(sid),
            "signature" -> signatureJson(sig)))
      case "prepareAndExecute" =>
        val sid = intOf(j \ "statementId", JdbcApi.createStatement(connId))
        val maxInFrame = intOf(j \ "maxRowsInFirstFrame",
          intOf(j \ "maxRowCount", JdbcApi.MaxRowsPerFrame))
        val frame = JdbcApi.executeQuery(spark, dir, connId, sid,
          str(j \ "sql"), Nil, maxInFrame)
        JObject("response" -> JString("executeResults"),
          "missingStatement" -> JBool(false),
          "results" -> JArray(List(resultSetJson(connId, sid,
            Some(executedSignature(connId, sid)), frame))))
      case "execute" =>
        val sid = intOf(j \ "statementHandle" \ "id",
          intOf(j \ "statementId", -1))
        val params = j \ "parameterValues" match {
          case JArray(xs) => xs.map(param); case _ => Nil
        }
        val maxInFrame = intOf(j \ "maxRowsInFirstFrame",
          JdbcApi.MaxRowsPerFrame)
        val frame = JdbcApi.execute(spark, dir, connId, sid, params,
          maxInFrame)
        JObject("response" -> JString("executeResults"),
          "missingStatement" -> JBool(false),
          "results" -> JArray(List(resultSetJson(connId, sid,
            Some(JdbcApi.signature(connId, sid)), frame))))
      case "fetch" =>
        val frame = JdbcApi.nextFrame(connId, intOf(j \ "statementId", -1),
          longOf(j \ "offset", 0L), intOf(j \ "fetchMaxRowCount", -1))
        JObject("response" -> JString("fetch"),
          "connectionId" -> JString(connId),
          "statementId" -> JInt(intOf(j \ "statementId", -1)),
          "missingStatement" -> JBool(false),
          "frame" -> frameJson(frame))
      case "connectionSync" | "commit" | "rollback" =>
        JObject("response" -> JString(req),
          "connectionId" -> JString(connId))
      case other =>
        throw new IllegalArgumentException(s"unsupported request: $other")
    }
  }
}
