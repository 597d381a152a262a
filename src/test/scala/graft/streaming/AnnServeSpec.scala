package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ANN serving parity: streamed top-k ≡ the batch kernel on
  * the same query vectors; a corpus-identical query finds itself at
  * cosine 1; zero-norm queries are dropped, not crashed. */
case class QVec(ts: Timestamp, query_id: Long, embedding: Seq[Float])

class AnnServeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def withQuery[T](q: StreamingQuery)(body: => T): T =
    try body finally q.stop()

  private lazy val corpusDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-annserve").toString
    val rnd = new scala.util.Random(11)
    (0 until 40).map(i => (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat), i % 4))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("streamed top-k equals the batch kernel; corpus-identical query self-matches at cos 1") {
    implicit val sq = spark.sqlContext
    val corpusVec7 = spark.read.parquet(s"$corpusDir/embeddings.parquet")
      .filter("vec_id = 7").select("embedding").as[Seq[Float]].collect()(0)
    val rnd = new scala.util.Random(99)
    val novel = Seq.fill(16)(rnd.nextGaussian().toFloat)
    val queryRows = Seq(
      QVec(ts("2024-01-01 10:00:00"), 1001L, corpusVec7),
      QVec(ts("2024-01-01 10:00:01"), 1002L, novel),
      QVec(ts("2024-01-01 10:00:02"), 1003L, Seq.fill(16)(0f))) // zero-norm
    val batchExpected = Similarity.annServeBatch(spark, corpusDir,
        queryRows.toDF().select("query_id", "embedding"), k = 3, radius = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val collected = scala.collection.mutable.Set.empty[(Long, Long, Double, Int)]
    val input = MemoryStream[QVec]
    val q = AnnServe.annServeIngest(input.toDF(), spark, corpusDir,
      k = 3, radius = 2) { served =>
      collected ++= served.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    }
    withQuery(q) {
      input.addData(queryRows: _*)
      q.processAllAvailable()
    }
    assert(collected.toSet === batchExpected, "stream/batch divergence")
    // the corpus-identical query finds vec 7 as its top neighbor, cos 1
    val top1001 = collected.filter(t => t._1 == 1001L && t._4 == 1)
    assert(top1001.map(t => (t._2, t._3)) === Set((7L, 1.0)),
      s"self-match failed: $top1001")
    // the novel query got SOME ranked neighbors (bucket probe radius 2)
    assert(collected.exists(_._1 == 1002L), s"novel query unanswered: $collected")
    // the zero-norm query is silently dropped (not rankable), no crash
    assert(!collected.exists(_._1 == 1003L))
  }
}
