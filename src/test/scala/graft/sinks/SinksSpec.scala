package graft.sinks

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, PreparedStatement}

import scala.collection.mutable

import graft.SparkSpec

/** Records every JDBC call made by the upsert writer, keyed by runId —
  * suites run in parallel in one JVM, so each test records into its
  * own bucket. local[*] keeps executors in this JVM, so the shared
  * object buffer observes executor-side calls. */
object JdbcRecorder {
  private val buckets =
    new java.util.concurrent.ConcurrentHashMap[String, mutable.Buffer[String]]()
  def calls(runId: String): List[String] =
    Option(buckets.get(runId)) match {
      case Some(b) => b.synchronized { b.toList }
      case None => Nil
    }
  def add(runId: String, s: String): Unit = {
    val b = buckets.computeIfAbsent(runId, _ => mutable.Buffer.empty[String])
    b.synchronized { b += s }
  }

  private def statementProxy(runId: String, sql: String): PreparedStatement = {
    val params = mutable.Map.empty[Int, Any]
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[PreparedStatement]),
      new InvocationHandler {
        def invoke(proxy: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "setObject" =>
              params(args(0).asInstanceOf[Int]) = args(1); null
            case "addBatch" =>
              add(runId, s"addBatch:$sql:" + params.toSeq.sortBy(_._1).map(_._2).mkString(","))
              null
            case "executeBatch" => add(runId, s"executeBatch:$sql"); Array.empty[Int]
            case "close" => null
            case _ => null
          }
      }).asInstanceOf[PreparedStatement]
  }

  def connection(runId: String): Connection = connectionImpl(runId, failInserts = false)

  /** A connection whose INSERT statement fails at executeBatch —
    * exercises the rollback path. */
  def failingConnection(runId: String): Connection = connectionImpl(runId, failInserts = true)

  private def connectionImpl(runId: String, failInserts: Boolean): Connection =
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
      new InvocationHandler {
        def invoke(proxy: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "setAutoCommit" => add(runId, s"setAutoCommit:${args(0)}"); null
            case "prepareStatement" =>
              val sql = args(0).asInstanceOf[String]
              if (failInserts && sql.startsWith("INSERT")) failingStatement()
              else statementProxy(runId, sql)
            case "commit" => add(runId, "commit"); null
            case "rollback" => add(runId, "rollback"); null
            case "close" => add(runId, "close"); null
            case "hashCode" => Int.box(System.identityHashCode(proxy))
            case "equals" => java.lang.Boolean.valueOf(proxy eq args(0))
            case "toString" => "recorder-connection"
            case _ => null
          }
      }).asInstanceOf[Connection]

  private def failingStatement(): PreparedStatement =
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[PreparedStatement]),
      new InvocationHandler {
        def invoke(proxy: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "executeBatch" => throw new java.sql.SQLException("constraint violation")
            case _ => null
          }
      }).asInstanceOf[PreparedStatement]
}

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("writeObjectPerRow: one named object per row, content intact, null rows skipped") {
    val dir = java.nio.file.Files.createTempDirectory("graft-objs").toString
    val df = Seq(
      ("a.json", """{"v":1}"""),
      ("b.json", """{"v":2}"""),
      (null.asInstanceOf[String], "dropped")
    ).toDF("s3_key", "payload")
    Sinks.writeObjectPerRow(df, "s3_key", "payload", dir)
    val files = new java.io.File(dir).listFiles().filterNot(_.getName.startsWith("."))
      .map(f => f.getName -> new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")).toMap
    assert(files == Map("a.json" -> """{"v":1}""", "b.json" -> """{"v":2}"""))
    // idempotent replay: same keys overwritten, not duplicated
    Sinks.writeObjectPerRow(df, "s3_key", "payload", dir)
    assert(new java.io.File(dir).listFiles().count(!_.getName.startsWith(".")) == 2)
  }

  test("writePartitioned lays out hive-style partition directories") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString + "/out"
    val df = Seq((1L, "en", "x"), (2L, "de", "y"), (3L, "en", "z"))
      .toDF("id", "lang", "text")
    Sinks.writePartitioned(df, Seq("lang"), dir)
    val parts = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("lang="))
    assert(parts.toSet == Set("lang=en", "lang=de"))
    val back = spark.read.parquet(dir)
    assert(back.where($"lang" === "en").count() == 2)
  }

  test("hive partition layout prunes at scan time (PartitionFilters, not data filters)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prune").toString + "/out"
    val df = Seq((1L, "en", "x"), (2L, "de", "y"), (3L, "en", "z"), (4L, "fr", "w"))
      .toDF("id", "lang", "text")
    Sinks.writePartitioned(df, Seq("lang"), dir)
    val q = spark.read.parquet(dir).filter($"lang" === "en")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan.take(800))
    assert(scan.contains("lang"), scan.take(800))
    assert(q.count() == 2)
    // the pruned read touches only the lang=en directory's files
    val plan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!plan.contains("lang=de"))
  }

  test("end-to-end reference parity: ALTO pipeline lands one JSON object per document") {
    import org.apache.spark.sql.functions.{col, to_json}
    val dir = java.nio.file.Files.createTempDirectory("graft-alto-sink").toString
    val out = graft.alto.Alto.pipeline(graft.alto.AltoModule.fixtureDf(spark))
      .select(col("s3_key"), to_json(col("simplified")).as("payload"))
    Sinks.writeObjectPerRow(out, "s3_key", "payload", dir)
    val files = new java.io.File(dir).listFiles().filterNot(_.getName.startsWith("."))
    assert(files.length == 5)
    assert(files.forall(_.getName.endsWith(".xml.json")))
    files.foreach { f =>
      val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      assert(txt.startsWith("{"), s"${f.getName} is not JSON: $txt")
    }
  }

  test("jdbcUpsert rolls back the open transaction when a batch fails") {
    val runId = "rollback-test"
    val df = Seq((1L, "t", "u")).toDF("representation_id", "transcript", "transcript_url")
      .coalesce(1)
    intercept[org.apache.spark.SparkException] {
      Sinks.jdbcUpsert(df, Sinks.transcriptUpsertSpec,
        () => JdbcRecorder.failingConnection(runId))
    }
    val calls = JdbcRecorder.calls(runId)
    assert(calls.contains("rollback"))
    assert(!calls.contains("commit"))
    assert(calls.last == "close")
  }

  test("jdbcUpsert: batched UPDATE+INSERT per partition, transactional, idempotent SQL") {
    val runId = "upsert-test"
    val df = Seq((1L, "t one", "u/1.json"), (2L, "t two", "u/2.json"))
      .toDF("representation_id", "transcript", "transcript_url")
      .coalesce(1)
    Sinks.jdbcUpsert(df, Sinks.transcriptUpsertSpec, () => JdbcRecorder.connection(runId))
    val calls = JdbcRecorder.calls(runId)
    assert(calls.head == "setAutoCommit:false")
    assert(calls.count(_.startsWith("addBatch:UPDATE")) == 2)
    assert(calls.count(_.startsWith("addBatch:INSERT")) == 2)
    // UPDATE binds (transcript, id); INSERT binds (id, url)
    assert(calls.exists(_ == "addBatch:" + Sinks.transcriptUpsertSpec.updateSql + ":t one,1"))
    assert(calls.exists(_ == "addBatch:" + Sinks.transcriptUpsertSpec.insertSql + ":1,u/1.json"))
    assert(calls.count(_ == "commit") == 1)   // one txn for the whole small batch
    assert(calls.last == "close")
    assert(Sinks.transcriptUpsertSpec.insertSql.contains("ON CONFLICT"))
  }

  test("JDBC upsert under exactlyOnceBatch: committed batchId issues zero JDBC calls") {
    val runId = "eo-jdbc-test"
    val markerDir = java.nio.file.Files.createTempDirectory("graft-eo-jdbc").toString
    val df = Seq((1L, "t one", "u/1.json"))
      .toDF("representation_id", "transcript", "transcript_url").coalesce(1)
    val land = Sinks.exactlyOnceBatch(markerDir) { (batch, _) =>
      Sinks.jdbcUpsert(batch, Sinks.transcriptUpsertSpec,
        () => JdbcRecorder.connection(runId))
    }
    land(df, 7L)
    val afterFirst = JdbcRecorder.calls(runId).size
    assert(afterFirst > 0 && new java.io.File(s"$markerDir/batch-7").exists())
    // at-least-once redelivery of the SAME batch id: the marker short-
    // circuits before any connection is opened — exactly-once effects
    // on a sink whose writes are merely idempotent
    land(df, 7L)
    assert(JdbcRecorder.calls(runId).size == afterFirst,
      "a committed batchId must not touch the database again")
    // a NEW batch id writes normally
    land(df, 8L)
    assert(JdbcRecorder.calls(runId).size > afterFirst)
  }
}
