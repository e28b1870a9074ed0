package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.contract.{SchemaCompat, Schemas}

/** Backward-compat matrix from `docs/data-contracts.md:172-180,252-275`:
  * optional-with-default adds allowed, required adds rejected. */
class SchemaCompatSpec extends AnyFunSuite {

  private val base = Schemas.parse(Schemas.SensorEventAvro)

  private def variant(fieldsJson: String) = Schemas.parse(
    s"""{"type":"record","name":"SensorEvent","namespace":"graft.iot",
       |"fields":[
       |  {"name":"device_id","type":"string"},
       |  {"name":"device_name","type":["null","string"],"default":null},
       |  {"name":"timestamp","type":"long"},
       |  {"name":"temperature","type":"float"},
       |  {"name":"humidity","type":"float"},
       |  {"name":"location","type":["null","string"],"default":null}
       |  $fieldsJson
       |]}""".stripMargin)

  test("identical schema is compatible") {
    assert(SchemaCompat.isBackwardCompatible(base, base))
  }

  test("adding an optional field with default is allowed") {
    val reader = variant(""",{"name":"battery","type":["null","float"],"default":null}""")
    assert(SchemaCompat.isBackwardCompatible(base, reader))
  }

  test("adding a required field is rejected") {
    val reader = variant(""",{"name":"firmware","type":"string"}""")
    val issues = SchemaCompat.check(base, reader)
    assert(issues.exists(i => i.field == "firmware" && i.reason.contains("without default")))
  }

  test("removing a field is allowed (reader ignores writer extras)") {
    val reader = Schemas.parse(
      """{"type":"record","name":"SensorEvent","namespace":"graft.iot",
        |"fields":[
        |  {"name":"device_id","type":"string"},
        |  {"name":"timestamp","type":"long"}
        |]}""".stripMargin)
    assert(SchemaCompat.isBackwardCompatible(base, reader))
  }

  test("numeric promotions allowed, narrowing rejected") {
    val widened = Schemas.parse(
      """{"type":"record","name":"SensorEvent","namespace":"graft.iot",
        |"fields":[{"name":"temperature","type":"double"}]}""".stripMargin)
    assert(SchemaCompat.isBackwardCompatible(base, widened))

    val narrowed = Schemas.parse(
      """{"type":"record","name":"SensorEvent","namespace":"graft.iot",
        |"fields":[{"name":"timestamp","type":"int"}]}""".stripMargin)
    assert(!SchemaCompat.isBackwardCompatible(base, narrowed))
  }

  test("nullable writer cannot be read as required") {
    val reader = Schemas.parse(
      """{"type":"record","name":"SensorEvent","namespace":"graft.iot",
        |"fields":[{"name":"device_name","type":"string"}]}""".stripMargin)
    assert(!SchemaCompat.isBackwardCompatible(base, reader))
  }
}
