package graft

import org.apache.spark.sql.functions._

import graft.alto.{Alto, AltoModule}
import graft.operators.Catalog
import graft.sinks.{JdbcRecorder, Sinks}
import graft.sources.WatermarkStore

/** The reference's `main_flow` (`flows/main_flow.py:113-153`) end to
  * end, library-side: incremental catalog work-list → per-URL fetch →
  * ALTO simplify + transcript → one JSON object per document → batched
  * JDBC upsert — all inside a watermark-guarded run that only advances
  * the mark on success. One distributed plan instead of a per-row
  * task chain. */
class ReferenceFlowSpec extends SparkSpec {

  test("main_flow equivalent: worklist → fetch → simplify → S3-style sink + upsert → watermark") {
    val markPath = java.nio.file.Files.createTempDirectory("graft-flow-wm").toString + "/last_run"
    val objDir = java.nio.file.Files.createTempDirectory("graft-flow-objs").toString
    WatermarkStore.write(markPath, "1999-01-01")
    val runId = "reference-flow"

    val byUrl = AltoModule.fixtureDf(spark).collect()
      .map(r => r.getString(1) -> r.getString(2)).toMap
    val urls = byUrl.keys.toSeq.sorted

    val nDocs = WatermarkStore.incrementalRun(markPath, "1999-06-01") { since =>
      // 1. catalog work-list, incremental from the persisted mark
      val worklist = Catalog.worklistSince(spark, sf("sf0.001"), since)
        .limit(urls.length)
        .withColumn("rid", monotonically_increasing_id())
      // 2. attach this run's document URLs (stand-in for premis_stored_at)
      import spark.implicits._
      val withUrls = worklist.join(
        urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("rid", "url"), "rid")
      // 3. fetch + simplify + transcript (the subprocess chain, dissolved)
      val out = Alto.pipeline(
        Alto.fetchXml(withUrls, byUrl.apply),
        idCol = "representation_id")
      // 4. both sinks: object-per-row JSON (reference-parity pretty
      // bytes, JSON.stringify(obj, null, 2)) + transactional upsert
      Sinks.writeObjectPerRow(out, "s3_key", "json_pretty", objDir)
      Sinks.jdbcUpsert(
        out.select(col("representation_id"), col("transcript"),
          concat(lit("https://objects.test/bucket/"), col("s3_key")).as("transcript_url"))
          .coalesce(1),
        Sinks.transcriptUpsertSpec, () => JdbcRecorder.connection(runId))
      out.count()
    }

    assert(nDocs == urls.length.toLong)
    // every document landed as exactly one JSON object named by its key
    val files = new java.io.File(objDir).listFiles().filterNot(_.getName.startsWith("."))
    assert(files.length == urls.length)
    assert(files.forall(_.getName.endsWith(".xml.json")))
    // object bytes are the reference's pretty JSON (2-space indent,
    // node's JSON.stringify layout), not the compact Spark form
    val v2obj = files.find(_.getName == "alto_v2_basic.xml.json")
    v2obj.foreach { f =>
      val bytes = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      assert(bytes.startsWith("{\n  \"description\": {\n    \"fileName\": \"page_001.tif\","))
      assert(bytes.endsWith("\n}"))
    }
    // the upsert ran both DMLs per row inside one committed transaction
    val calls = JdbcRecorder.calls(runId)
    assert(calls.count(_.startsWith("addBatch:UPDATE")) == urls.length)
    assert(calls.count(_.startsWith("addBatch:INSERT")) == urls.length)
    assert(calls.contains("commit"))
    // success advanced the watermark for the next incremental run
    assert(WatermarkStore.read(markPath).contains("1999-06-01"))
  }

  test("poison document: malformed XML yields the all-null record, not a failed job") {
    import spark.implicits._
    val out = Alto.pipeline(Seq(
      (1L, "https://x.test/broken.xml", "<alto xmlns=\"oops"),
      (2L, "https://x.test/notxml.xml", "just text, no markup"))
      .toDF("representation_id", "url", "xml"))
      .select(col("representation_id"), col("simplified")("description")("softwareName"),
        col("transcript"))
      .collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.isNullAt(1))
      assert(r.isNullAt(2) || r.getString(2).isEmpty)
    }
  }
}
