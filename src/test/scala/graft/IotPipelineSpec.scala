package graft

import org.apache.spark.sql.functions._
import graft.operators.IotPipeline
import java.nio.file.{Files, Paths}

/** Pins the reference semantics frozen in SURVEY.md §1.2 / FIXTURES.md. */
class IotPipelineSpec extends SparkSuite {
  import spark.implicits._

  private def writeJsonl(name: String, lines: Seq[String]): String = {
    val dir = Paths.get("target", "test-fixtures")
    Files.createDirectories(dir)
    val f = dir.resolve(name)
    Files.writeString(f, lines.mkString("\n") + "\n")
    f.toAbsolutePath.toString
  }

  test("malformed JSON line is dropped to the bad side output, not an error") {
    val raw = IotPipeline.readSensors(spark, writeJsonl("b.jsonl", IotPipeline.fixtureB))
    val (good, bad) = IotPipeline.splitCorrupt(raw)
    assert(good.count() === 4) // 3 good + sensor-004 (missing temperature)
    assert(bad.count() === 1)
    assert(bad.as[String].collect().head.contains("bad line"))
  }

  test("non-object JSON top-level values are dropped (app.py:43-45 semantics)") {
    val lines = Seq("""[1, 2]""", "\"just a string\"", "42", "null",
      """{"device_id": "s", "temperature": 25}""")
    val raw = IotPipeline.readSensors(spark, writeJsonl("nonobj.jsonl", lines))
    val (good, bad) = IotPipeline.splitCorrupt(raw)
    assert(good.count() === 1)
    assert(bad.count() === 4)
  }

  test("missing temperature keeps the record without temp_fahrenheit (app.py:51)") {
    val raw = IotPipeline.readSensors(spark, writeJsonl("b2.jsonl", IotPipeline.fixtureB))
    val (good, _) = IotPipeline.splitCorrupt(raw)
    val out = IotPipeline.transform(good)
    val s4 = out.filter($"device_id" === "sensor-004").collect()
    assert(s4.length === 1)
    assert(s4.head.isNullAt(s4.head.fieldIndex("temp_fahrenheit")))
    // and the three good records convert exactly (FIXTURES.md §B)
    val f = out.filter($"temp_fahrenheit".isNotNull)
      .orderBy($"device_id").select($"temp_fahrenheit").as[Double].collect()
    assert(f.toSeq === Seq(77.9, 86.0, 68.18))
  }

  test("°F conversion matches the reference formula on fixture A (FIXTURES.md §A)") {
    val raw = IotPipeline.readSensors(spark, writeJsonl("a.jsonl", IotPipeline.fixtureA))
    val (good, bad) = IotPipeline.splitCorrupt(raw)
    assert(bad.count() === 0)
    val out = IotPipeline.transform(good)
      .orderBy($"timestamp").select($"temp_fahrenheit").as[Double].collect()
    assert(out.toSeq === Seq(68.0, 82.58, 72.5, 65.66, 80.42))
  }

  test("threshold filter drops records at/below 10°C and null temperatures (README.md:15)") {
    val lines = Seq(
      """{"device_id": "cold", "temperature": 5.0}""",
      """{"device_id": "edge", "temperature": 10.0}""",
      """{"device_id": "warm", "temperature": 10.1}""",
      """{"device_id": "none"}""")
    val raw = IotPipeline.readSensors(spark, writeJsonl("th.jsonl", lines))
    val (good, _) = IotPipeline.splitCorrupt(raw)
    val kept = IotPipeline.thresholdFilter(IotPipeline.transform(good))
      .select($"device_id").as[String].collect()
    assert(kept.toSeq === Seq("warm"))
  }

  test("output column order: original keys, processed_timestamp, temp_fahrenheit (§1.2 quirk 6)") {
    val raw = IotPipeline.readSensors(spark, writeJsonl("order.jsonl", IotPipeline.fixtureA))
    val (good, _) = IotPipeline.splitCorrupt(raw)
    val cols = IotPipeline.transform(good).columns.toSeq
    val base = IotPipeline.sensorSchema.fieldNames.toSeq
    assert(cols.take(base.size) === base)
    assert(cols.drop(base.size).take(2) === Seq("processed_timestamp", "temp_fahrenheit"))
  }

  test("boolean temperature: declared divergence — kept with null temp (§1.2 quirk 5)") {
    // reference converts JSON true (bool ⊂ int in CPython) to 33.8 °F; the
    // rebuild nulls it under DoubleType but MUST keep the record
    val lines = Seq("""{"device_id": "s", "temperature": true, "humidity": 40}""")
    val raw = IotPipeline.readSensors(spark, writeJsonl("booltemp.jsonl", lines))
    val (good, bad) = IotPipeline.splitCorrupt(raw)
    assert(bad.count() === 0, "boolean-temperature record must not be dropped")
    val r = IotPipeline.transform(good).collect().head
    assert(r.getAs[String]("device_id") === "s")
    assert(r.isNullAt(r.fieldIndex("temperature")))
    assert(r.isNullAt(r.fieldIndex("temp_fahrenheit")))
  }

  test("non-numeric temperature keeps the record, nulls the field (app.py:57-58)") {
    val lines = Seq("""{"device_id": "s", "temperature": "hot", "humidity": 50}""")
    val raw = IotPipeline.readSensors(spark, writeJsonl("badtemp.jsonl", lines))
    val (good, bad) = IotPipeline.splitCorrupt(raw)
    assert(bad.count() === 0)
    val r = IotPipeline.transform(good).collect().head
    assert(r.getAs[String]("device_id") === "s")
    assert(r.isNullAt(r.fieldIndex("temperature")))
    assert(r.isNullAt(r.fieldIndex("temp_fahrenheit")))
    assert(r.getAs[Double]("humidity") === 50.0)
  }

  test("empty input still writes an (empty) output — app.py:69-80 parity") {
    val in = writeJsonl("empty.jsonl", Seq(""))
    val raw = IotPipeline.readSensors(spark, in)
    val (good, _) = IotPipeline.splitCorrupt(raw)
    val outDir = Files.createTempDirectory("iot-empty-out").toString
    IotPipeline.writeJsonl(IotPipeline.transform(good), outDir)
    assert(Files.exists(Paths.get(outDir, "_SUCCESS")))
    assert(spark.read.schema(IotPipeline.sensorSchema).json(outDir).count() === 0)
  }

  test("humidity validation flags out-of-range but keeps records (README.md:9)") {
    val lines = Seq(
      """{"device_id": "ok", "temperature": 20, "humidity": 55}""",
      """{"device_id": "hi", "temperature": 20, "humidity": 130}""",
      """{"device_id": "no", "temperature": 20}""")
    val raw = IotPipeline.readSensors(spark, writeJsonl("hum.jsonl", lines))
    val (good, _) = IotPipeline.splitCorrupt(raw)
    val out = IotPipeline.transform(good)
    assert(out.count() === 3) // nothing dropped
    // sorted by device_id: hi (130 → invalid), no (missing → invalid), ok
    val flags = out.orderBy($"device_id").select($"humidity_valid").as[Boolean].collect()
    assert(flags.toSeq === Seq(false, false, true))
  }
}
