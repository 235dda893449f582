package graft

import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

/** Drives the Avatica JSON wire protocol through a REAL loopback socket:
  * openConnection → createStatement → prepareAndExecute → fetch-to-done →
  * prepared execute with a typed parameter → error surface → close.
  */
class AvaticaHttpSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  private def withServer(f: (String, HttpClient) => Unit): Unit = {
    val server = graft.api.AvaticaHttp.start(spark, dir)
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/druid/v2/sql/avatica/",
      HttpClient.newHttpClient())
    finally server.stop(0)
  }

  private def postRaw(client: HttpClient, url: String, body: JValue)
      : (Int, JValue) = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(
        JsonMethods.compact(JsonMethods.render(body)), StandardCharsets.UTF_8))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), JsonMethods.parse(resp.body()))
  }

  private def post(client: HttpClient, url: String, body: JValue): JValue =
    postRaw(client, url, body)._2

  private def jstr(j: JValue): String = j match { case JString(s) => s; case o => fail(s"not a string: $o") }
  private def jint(j: JValue): Int = j match { case JInt(n) => n.toInt; case JLong(n) => n.toInt; case o => fail(s"not an int: $o") }

  test("full SELECT round trip over the socket: execute + paged fetch to done") {
    withServer { (url, client) =>
      val cid = "http-conn-1"
      assert(jstr(post(client, url, JObject(
        "request" -> JString("openConnection"),
        "connectionId" -> JString(cid))) \ "response") == "openConnection")

      val exec = post(client, url, JObject(
        "request" -> JString("prepareAndExecute"),
        "connectionId" -> JString(cid),
        "sql" -> JString(
          "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey"),
        "maxRowsInFirstFrame" -> JInt(10)))
      assert(jstr(exec \ "response") == "executeResults")
      val rs = (exec \ "results") (0)
      val sid = jint(rs \ "statementId")
      val first = rs \ "firstFrame"
      // server clamps the first frame to MinRowsPerFrame (100) >= 25 rows,
      // so the whole table arrives and the frame is done
      val JArray(rows1) = (first \ "rows"): @unchecked
      assert(rows1.length == 25)
      assert((first \ "done") == JBool(true))
      assert(jstr((rs \ "signature" \ "columns") (0) \ "columnName")
        == "n_nationkey")
      // first row is nation 0
      val JArray(row0) = rows1.head: @unchecked
      assert(row0.head == JLong(0) || row0.head == JInt(0))
      assert(jstr(row0(1)).nonEmpty)

      assert(jstr(post(client, url, JObject(
        "request" -> JString("closeStatement"),
        "connectionId" -> JString(cid),
        "statementId" -> JInt(sid))) \ "response") == "closeStatement")
      assert(jstr(post(client, url, JObject(
        "request" -> JString("closeConnection"),
        "connectionId" -> JString(cid))) \ "response") == "closeConnection")
    }
  }

  test("prepared statement with typed parameter executes over the socket") {
    withServer { (url, client) =>
      val cid = "http-conn-2"
      post(client, url, JObject(
        "request" -> JString("openConnection"),
        "connectionId" -> JString(cid)))
      val prep = post(client, url, JObject(
        "request" -> JString("prepare"),
        "connectionId" -> JString(cid),
        "sql" -> JString(
          "SELECT count(*) AS n FROM nation WHERE n_regionkey = ?")))
      assert(jstr(prep \ "response") == "prepare")
      val sid = jint(prep \ "statement" \ "id")
      // prepare-time parameter typing came through the signature
      val JArray(ps) = (prep \ "statement" \ "signature" \ "parameters"): @unchecked
      assert(ps.nonEmpty)

      val exec = post(client, url, JObject(
        "request" -> JString("execute"),
        "connectionId" -> JString(cid),
        "statementHandle" -> JObject("id" -> JInt(sid)),
        "parameterValues" -> JArray(List(JObject(
          "type" -> JString("BIGINT"), "value" -> JInt(1))))))
      assert(jstr(exec \ "response") == "executeResults")
      val JArray(rows) = ((exec \ "results") (0) \ "firstFrame" \ "rows"): @unchecked
      val JArray(r0) = rows.head: @unchecked
      assert(r0.head == JLong(5) || r0.head == JInt(5)) // 5 nations per region
      post(client, url, JObject(
        "request" -> JString("closeConnection"),
        "connectionId" -> JString(cid)))
    }
  }

  test("errors are HTTP 500 with the Avatica error body (AbstractAvaticaHandler)") {
    withServer { (url, client) =>
      val (code, resp) = postRaw(client, url, JObject(
        "request" -> JString("fetch"),
        "connectionId" -> JString("no-such-conn"),
        "statementId" -> JInt(99)))
      assert(code == 500)
      assert(jstr(resp \ "response") == "error")
      assert(jstr(resp \ "errorMessage").nonEmpty)
      val (badCode, bad) = postRaw(client, url, JObject(
        "request" -> JString("unknownRpc")))
      assert(badCode == 500)
      assert(jstr(bad \ "response") == "error")
      // success replies stay 200
      val (okCode, ok) = postRaw(client, url, JObject(
        "request" -> JString("openConnection"),
        "connectionId" -> JString("http-conn-err")))
      assert(okCode == 200 && jstr(ok \ "response") == "openConnection")
    }
  }
}
