package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("innerJoin equals the plain join (long keys, negatives and misses included)") {
    val rnd = new scala.util.Random(11)
    val fact = Seq.fill(500)((rnd.nextLong() % 100L, rnd.nextInt(1000)))
      .toDF("fk", "v")
    val dim = (-20L to 20L by 4L).map(k => (k, s"d$k")).toDF("dk", "name")
    val got = BloomJoin.innerJoin(fact, "fk", dim, "dk", expectedItems = 100)
      .select("fk", "v", "name").as[(Long, Int, String)].collect().sorted.toSeq
    val want = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "v", "name").as[(Long, Int, String)].collect().sorted.toSeq
    assert(got == want)
  }

  test("string keys route through the xxhash64 path and still join exactly") {
    val fact = Seq("a", "b", "c", "zz", "a").toDF("fk")
    val dim = Seq(("a", 1), ("c", 2), ("nope", 3)).toDF("dk", "n")
    val got = BloomJoin.innerJoin(fact, "fk", dim, "dk", expectedItems = 10)
      .select("fk", "n").as[(String, Int)].collect().sorted.toSeq
    assert(got == Seq(("a", 1), ("a", 1), ("c", 2)))
  }

  test("prefilter keeps every true match and drops almost all of a disjoint fact side") {
    val fact = (1000L to 3000L).toDF("fk") // disjoint from dim
    val dim = (1L to 100L).toDF("dk")
    val survivors = BloomJoin.prefilter(fact, "fk", dim, "dk",
      expectedItems = 100, fpp = 0.01).count()
    // 2001 disjoint keys at fpp=0.01 → expect ~20 false positives; 10×
    // headroom keeps the assertion noise-proof while still proving the
    // filter actually filters
    assert(survivors <= 200, s"bloom let $survivors of 2001 impostors through")

    val matches = (50L to 150L).toDF("fk")
    val kept = BloomJoin.prefilter(matches, "fk", dim, "dk", expectedItems = 100)
      .as[Long].collect().toSet
    assert((50L to 100L).forall(kept), "bloom dropped a true match")
  }

  test("an empty dimension prefilters to zero survivors instead of NPEing") {
    // stat.bloomFilter merges from a null buffer on zero rows; the guard
    // must short-circuit to the correct "nothing matches" answer
    val fact = Seq(1L, 2L, 3L).toDF("fk")
    val dim = Seq.empty[Long].toDF("dk")
    assert(BloomJoin.prefilter(fact, "fk", dim, "dk", expectedItems = 10)
      .count() == 0)
    assert(BloomJoin.innerJoin(fact, "fk", dim, "dk", expectedItems = 10)
      .count() == 0)
  }

  test("mixed numeric key types are rejected loudly (silent match loss otherwise)") {
    // double 5.0 equals int 5 under SQL coercion, but no common long
    // representation exists for the sketch — must throw, not drop matches
    val fact = Seq(5.0).toDF("fk")
    val dim = Seq(5).toDF("dk")
    val e = intercept[IllegalArgumentException] {
      BloomJoin.prefilter(fact, "fk", dim, "dk", expectedItems = 10)
    }
    assert(e.getMessage.contains("common type"))
    // mixed integral widths remain fine (both cast to long)
    val ok = BloomJoin.innerJoin(Seq(5L).toDF("fk"), "fk",
      Seq(5).toDF("dk"), "dk", expectedItems = 10).count()
    assert(ok == 1)
  }

  test("sketchBytes round-trip: byte-probed survivors are identical to the DataFrame path") {
    val rnd = new scala.util.Random(7)
    val fact = Seq.fill(2000)(rnd.nextLong() % 500L).toDF("fk")
    val dim = (1L to 100L).toDF("dk")
    val direct = BloomJoin.prefilter(fact, "fk", dim, "dk", expectedItems = 100)
      .as[Long].collect().sorted.toSeq
    // persist the artifact through a real file and probe the bytes
    val f = java.nio.file.Files.createTempFile("bloomsketch", ".bin")
    java.nio.file.Files.write(f, BloomJoin.sketchBytes(dim, "dk", expectedItems = 100))
    val viaBytes = BloomJoin.prefilter(fact, "fk", java.nio.file.Files.readAllBytes(f))
      .as[Long].collect().sorted.toSeq
    assert(viaBytes == direct && direct.nonEmpty)
    // string keys round-trip through the xxhash64 representation too
    val sdim = Seq("a", "c").toDF("dk")
    val sfact = Seq("a", "b", "c", "zz").toDF("fk")
    val sGot = BloomJoin.prefilter(sfact, "fk",
      BloomJoin.sketchBytes(sdim, "dk", expectedItems = 10))
      .as[String].collect().sorted.toSeq
    val sDirect = BloomJoin.prefilter(sfact, "fk", sdim, "dk", expectedItems = 10)
      .as[String].collect().sorted.toSeq
    assert(sGot == sDirect && sGot.contains("a") && sGot.contains("c"))
  }

  test("an empty dimension serializes to a legal artifact that probes to zero survivors") {
    val sketch = BloomJoin.sketchBytes(Seq.empty[Long].toDF("dk"), "dk",
      expectedItems = 10)
    assert(sketch.length < 64, "empty artifact should be a few header bytes")
    assert(BloomJoin.prefilter(Seq(1L, 2L).toDF("fk"), "fk", sketch).count() == 0)
  }

  test("a foreign blob that mimics the old empty-dim shape is rejected, not probed") {
    // pre-magic format: [tag 0][UTF type ddl] — a corrupted artifact
    // starting with a 0 byte and parseable UTF would have been accepted
    // as 'empty dimension' and silently filtered out EVERY fact row
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeByte(0); out.writeUTF("bigint"); out.flush()
    val e = intercept[IllegalArgumentException] {
      BloomJoin.prefilter(Seq(1L).toDF("fk"), "fk", bos.toByteArray)
    }
    assert(e.getMessage.contains("graft-bloomsketch:v1"))
    // and a versioned-but-wrong magic is rejected the same way
    val bos2 = new java.io.ByteArrayOutputStream()
    val out2 = new java.io.DataOutputStream(bos2)
    out2.writeUTF("graft-bloomsketch:v999"); out2.writeByte(0)
    out2.writeUTF("bigint"); out2.flush()
    intercept[IllegalArgumentException] {
      BloomJoin.prefilter(Seq(1L).toDF("fk"), "fk", bos2.toByteArray)
    }
  }

  test("a serialized sketch still rejects mixed numeric probes loudly") {
    // the artifact records the dim key type, so the probe-side check is
    // as loud as the one-shot path — even against an EMPTY sketch
    val full = BloomJoin.sketchBytes(Seq(5).toDF("dk"), "dk", expectedItems = 10)
    val e1 = intercept[IllegalArgumentException] {
      BloomJoin.prefilter(Seq(5.0).toDF("fk"), "fk", full)
    }
    assert(e1.getMessage.contains("common type"))
    val empty = BloomJoin.sketchBytes(Seq.empty[Int].toDF("dk"), "dk",
      expectedItems = 10)
    val e2 = intercept[IllegalArgumentException] {
      BloomJoin.prefilter(Seq(5.0).toDF("fk"), "fk", empty)
    }
    assert(e2.getMessage.contains("common type"))
    // garbage bytes are not silently probed
    intercept[Exception] {
      BloomJoin.prefilter(Seq(1L).toDF("fk"), "fk", Array[Byte](9, 9, 9)).count()
    }
  }

  test("probe is a codegen'd might_contain predicate, not a UDF") {
    // a real file scan keeps the predicate in the executed plan — over a
    // LocalRelation the optimizer evaluates it at plan time (even through
    // a repartition) and leaves nothing to assert on
    val dir = java.nio.file.Files.createTempDirectory("bloomspec").toString
    Seq(1L, 2L).toDF("fk").write.mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = Seq(1L).toDF("dk")
    val plan = BloomJoin.prefilter(fact, "fk", dim, "dk", expectedItems = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("UDF"), plan)
  }
}
