package graft.sinks

import graft.TestSpark

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class JsonlSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("writes reference-shaped nested JSONL {col: {table: value}}") {
    val df = Seq((1L, "ann", 9.5)).toDF("users__uid", "users__name", "orders__amount")
    val dir = Files.createTempDirectory("jsonl").toString + "/out"
    val n = JsonlSink.write(df, dir)
    assert(n == 1)
    val line = spark.read.text(dir).collect().map(_.getString(0)).mkString
    // tuple-key analog: column → {table → value} (file_utils.py:36-48)
    assert(line.contains(""""uid":{"users":1}"""))
    assert(line.contains(""""name":{"users":"ann"}"""))
    assert(line.contains(""""amount":{"orders":9.5}"""))
  }

  test("appendSingleFile appends reference-shaped lines across calls") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("t__id", "t__v")
    val file = Files.createTempDirectory("jsonl1f").toString + "/results/out.txt"
    assert(JsonlSink.appendSingleFile(df, file) == 2)
    assert(JsonlSink.appendSingleFile(df.filter($"t__id" === 1), file) == 1)
    val lines = scala.io.Source.fromFile(file).getLines().toSeq
    assert(lines.size == 3, "append mode must accumulate across calls")
    assert(lines.head.contains(""""id":{"t":1}"""))
    // single file parses back as JSONL
    assert(spark.read.json(file).count() == 3)
  }

  test("round-trips through spark.read.json and print() does not throw") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("t__id", "t__v")
    val dir = Files.createTempDirectory("jsonl2").toString + "/out"
    JsonlSink.write(df, dir)
    val back = spark.read.json(dir)
    assert(back.count() == 2)
    JsonlSink.print(spark, dir, maxRows = 2)
  }
}
