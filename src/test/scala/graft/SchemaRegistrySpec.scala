package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.contract.{SchemaRegistryClient, Schemas}

/** The Schema Registry HTTP adapter against an in-JVM stub serving the
  * public Confluent REST surface — fetch-latest, id lookup, register,
  * compatibility check, and the offline fallback path.
  */
class SchemaRegistrySpec extends AnyFunSuite {

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c => c.toString
    }

  private def withStub(f: (String, () => Seq[String]) => Unit): Unit = {
    val posts = scala.collection.mutable.ArrayBuffer.empty[String]
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", "application/vnd.schemaregistry.v1+json")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    val schemaField = s""""schema": "${jsonEscape(Schemas.SensorEventAvro)}""""
    server.createContext("/subjects/sensor-events-value/versions/latest",
      (ex: HttpExchange) => respond(ex, 200, s"""{"id": 7, "version": 3, $schemaField}"""))
    server.createContext("/schemas/ids/7",
      (ex: HttpExchange) => respond(ex, 200, s"""{$schemaField}"""))
    server.createContext("/subjects/sensor-events-value/versions",
      (ex: HttpExchange) => {
        if (ex.getRequestURI.getPath.endsWith("/latest")) {
          respond(ex, 200, s"""{"id": 7, "version": 3, $schemaField}""")
        } else {
          posts += new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          respond(ex, 200, """{"id": 8}""")
        }
      })
    server.createContext("/compatibility/subjects/sensor-events-value/versions/latest",
      (ex: HttpExchange) => {
        posts += new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        // stub policy: compatible iff the posted schema still has a
        // device_id field (good enough to see the request go through)
        val ok = posts.last.contains("device_id")
        respond(ex, 200, s"""{"is_compatible": $ok}""")
      })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", () => posts.toSeq)
    finally server.stop(0)
  }

  test("fetchLatest / fetchById return the registered contract") {
    withStub { (url, _) =>
      val client = new SchemaRegistryClient(url)
      val latest = client.fetchLatest("sensor-events-value")
      assert(latest.id == 7 && latest.version == 3)
      assert(latest.schema.getField("device_id") != null)
      assert(client.fetchById(7).getFields.size() ==
        Schemas.parse(Schemas.SensorEventAvro).getFields.size())
    }
  }

  test("register POSTs the schema and returns the wire id") {
    withStub { (url, posts) =>
      val client = new SchemaRegistryClient(url)
      val id = client.register("sensor-events-value", Schemas.HourlyAggregateAvro)
      assert(id == 8)
      assert(posts().exists(_.contains("HourlyAggregate")))
    }
  }

  test("isCompatible posts to the compatibility endpoint and reads the verdict") {
    withStub { (url, _) =>
      val client = new SchemaRegistryClient(url)
      assert(client.isCompatible("sensor-events-value", Schemas.SensorEventAvro))
      assert(!client.isCompatible("sensor-events-value",
        """{"type":"record","name":"X","fields":[{"name":"other","type":"string"}]}"""))
    }
  }

  test("compatibleOrLocal falls back to the structural check when unreachable") {
    // a port with nothing listening
    val client = new SchemaRegistryClient("http://127.0.0.1:1",
      timeout = java.time.Duration.ofMillis(200))
    // identical schema: locally compatible
    assert(client.compatibleOrLocal("sensor-events-value",
      Schemas.SensorEventAvro, Schemas.SensorEventAvro))
    // reader that requires a field the writer never wrote: rejected locally
    val incompatible =
      """{"type":"record","name":"SensorEvent","namespace":"graft.iot","fields":[
        |  {"name": "device_id", "type": "string"},
        |  {"name": "mandatory_new", "type": "string"}
        |]}""".stripMargin
    assert(!client.compatibleOrLocal("sensor-events-value",
      incompatible, Schemas.SensorEventAvro))
  }
}
