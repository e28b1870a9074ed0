package graft.contract

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.avro.Schema

/** Confluent-compatible Schema Registry HTTP client — the runtime
  * counterpart of the reference's registry integration: the consumer
  * fetches the latest value schema before building the decode plan
  * (`src/spark_consumer.py:39-57`), the producer registers its schema
  * and the contract workflow POSTs a compatibility check before deploy
  * (`src/producer.py:60-70`, `docs/data-contracts.md:252-275`).
  *
  * Wire surface (public Confluent REST API, v1 content type):
  *   GET  /subjects/{subject}/versions/latest -> {id, version, schema}
  *   GET  /schemas/ids/{id}                   -> {schema}
  *   POST /subjects/{subject}/versions        -> {id}
  *   POST /compatibility/subjects/{subject}/versions/latest -> {is_compatible}
  *
  * Built on java.net.http + the Jackson core already on the Spark
  * classpath — compiles and unit-tests offline against an in-JVM stub
  * server (SchemaRegistrySpec); no extra dependency. The pure
  * [[SchemaCompat]] gate stays the offline fallback: `compatibleOrLocal`
  * prefers the registry's verdict and falls back to the local checker
  * when the registry is unreachable, so batch jobs keep their
  * schema-evolution gate even without the service.
  */
final class SchemaRegistryClient(
    baseUrl: String,
    timeout: Duration = Duration.ofSeconds(10)) {

  private val http = HttpClient.newBuilder().connectTimeout(timeout).build()
  private val mapper = new ObjectMapper()
  private val ContentType = "application/vnd.schemaregistry.v1+json"

  final case class Registered(id: Int, version: Int, schema: Schema)

  private def get(path: String): com.fasterxml.jackson.databind.JsonNode = {
    val req = HttpRequest.newBuilder(URI.create(s"$baseUrl$path"))
      .timeout(timeout).header("Accept", ContentType).GET().build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() / 100 == 2,
      s"registry GET $path -> HTTP ${resp.statusCode()}: ${resp.body()}")
    mapper.readTree(resp.body())
  }

  private def post(path: String, schemaJson: String): com.fasterxml.jackson.databind.JsonNode = {
    val body = mapper.createObjectNode()
    body.put("schema", schemaJson)
    val req = HttpRequest.newBuilder(URI.create(s"$baseUrl$path"))
      .timeout(timeout)
      .header("Content-Type", ContentType)
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(body)))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() / 100 == 2,
      s"registry POST $path -> HTTP ${resp.statusCode()}: ${resp.body()}")
    mapper.readTree(resp.body())
  }

  /** The consumer's pre-plan fetch: latest registered schema for a
    * subject (e.g. "sensor-events-value"). */
  def fetchLatest(subject: String): Registered = {
    val n = get(s"/subjects/$subject/versions/latest")
    Registered(n.get("id").asInt(), n.get("version").asInt(),
      Schemas.parse(n.get("schema").asText()))
  }

  /** Wire-id lookup — the decode path for the 4-byte header id. */
  def fetchById(id: Int): Schema =
    Schemas.parse(get(s"/schemas/ids/$id").get("schema").asText())

  /** The producer's registration; returns the global schema id that
    * goes into the Confluent wire header. */
  def register(subject: String, schemaJson: String): Int =
    post(s"/subjects/$subject/versions", schemaJson).get("id").asInt()

  /** The contract workflow's pre-deploy gate. */
  def isCompatible(subject: String, schemaJson: String): Boolean =
    post(s"/compatibility/subjects/$subject/versions/latest", schemaJson)
      .get("is_compatible").asBoolean()

  /** Registry verdict when reachable; otherwise the pure
    * [[SchemaCompat]] structural check of `readerJson` against the
    * CHECKED-IN writer contract (`localWriterJson`, e.g.
    * `Schemas.SensorEventAvro`) — an offline cluster keeps its
    * schema-evolution gate against the last contract it shipped with. */
  def compatibleOrLocal(subject: String, readerJson: String,
                        localWriterJson: String): Boolean =
    try isCompatible(subject, readerJson)
    catch {
      case _: java.io.IOException =>
        SchemaCompat.isBackwardCompatible(
          writer = Schemas.parse(localWriterJson),
          reader = Schemas.parse(readerJson))
    }
}
