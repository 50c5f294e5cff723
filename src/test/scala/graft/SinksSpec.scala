package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sinks.Sinks

/** Sink-side operator semantics (out_file formats, kafka topic selection,
  * ES serializer transforms, counter/flowcounter aggregates).
  */
class SinksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def df = Seq(
    ("app.a", 1L, 3, "x"),
    ("app.a", 2L, 5, "y"),
    ("db.b", 3L, 7, null)
  ).toDF("sink", "id", "n_tok", "topic")

  test("counter: per-sink count + sum(n_tok) (out_counter.c:58-84)") {
    val got = Sinks.counter(df).as[(String, Long, Long)].collect().toSet
    assert(got == Set(("app.a", 2L, 8L), ("db.b", 1L, 7L)))
  }

  test("flowcounter: tumbling unit buckets (out_flowcounter.c:106-130)") {
    val ev = Seq(
      (java.sql.Timestamp.valueOf("2017-07-17 20:05:00"), 10.0),
      (java.sql.Timestamp.valueOf("2017-07-17 20:59:59"), 20.0),
      (java.sql.Timestamp.valueOf("2017-07-17 21:00:00"), 30.0)
    ).toDF("ts", "bytes")
    val got = Sinks.flowCounter(ev, "ts", "hour", Some("bytes"))
      .orderBy("wstart").collect()
    assert(got.length == 2)
    assert(got(0).getLong(1) == 2 && got(0).getDouble(2) == 30.0)
    assert(got(1).getLong(1) == 1 && got(1).getDouble(2) == 30.0)
  }

  test("file sink writes json/csv/ltsv partitioned by sink (out_file formats)") {
    Seq("json", "csv", "ltsv").foreach { fmt =>
      val dir = Files.createTempDirectory(s"graft-sink-$fmt").toString
      Sinks.writeFiles(df.drop("topic"), dir, fmt)
      val sub = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("sink="))
      assert(sub.toSet == Set("sink=app.a", "sink=db.b"), fmt)
      if (fmt == "ltsv") {
        val lines = spark.read.text(s"$dir/sink=app.a").as[String].collect()
        assert(lines.forall(l => l.matches("id:\\d+\tn_tok:\\d+")), lines.mkString("|"))
      }
    }
  }

  test("kafka topic selection: Topic_Key value else default (kafka.c:104-133)") {
    val got = df.select(col("id"), Sinks.kafkaTopic(col("topic"), "logs").as("t"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "x", 2L -> "y", 3L -> "logs"))
  }

  test("ES transforms: dot→underscore key sanitize + logstash daily index (es.c:40-110,245-266)") {
    val m = Seq(1).toDF("id")
      .withColumn("rec", map(lit("a.b.c"), lit("1"), lit("plain"), lit("2")))
    val keys = m.select(map_keys(Sinks.esSanitizeKeys(col("rec")))).collect()(0)
      .getSeq[String](0).toSet
    assert(keys == Set("a_b_c", "plain"))
    val idx = Seq(java.sql.Timestamp.valueOf("2017-07-17 20:17:03")).toDF("ts")
      .select(Sinks.esLogstashIndex(col("ts"), "logstash")).as[String].collect()(0)
    assert(idx == "logstash-2017.07.17")
    val tk = Seq(java.sql.Timestamp.valueOf("2017-07-17 20:17:03.123")).toDF("ts")
      .select(Sinks.esTimeKey(col("ts"))).as[String].collect()(0)
    assert(tk == "2017-07-17T20:17:03.123") // ms precision (es.c:208-241)
  }
}
