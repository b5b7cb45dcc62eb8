package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev instrument (VERDICT r16 task 4): name d18_fuzzy_clusters' sf10
  * heap holder. BASELINE §15c records THAT a fresh JVM needs 16 GB at
  * sf10 (8 GB dies with a fatal executor error) but not WHICH stage
  * holds the memory. This main materializes d18's pipeline one stage at
  * a time — run it per-stage in its own JVM at a chosen -Xmx (the sweep
  * runner's SPARK_DRIVER_MEM) and the smallest heap each stage survives,
  * together with its row count, is the memory model.
  *
  * Stages (each builds on the previous logically but is recomputed from
  * source, so a run measures exactly one stage's footprint):
  *   sigs   — posSigs explode, materialized (Σ len posting rows)
  *   cand   — signature self-join, PRE-distinct candidate stream
  *   dist   — candidates after distinct
  *   pairs  — + string fetch + levenshtein residual (= selfJoin output)
  *   full   — + clusterPairs (= the d18 query)
  *
  * Usage: runMain graft.D18Profile <sfDir> <stage>
  */
object D18Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/tmp/sf10")
    val stage = if (args.length > 1) args(1) else "full"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "320"))
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "zstd"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    val strs = customer.select(col("c_custkey").as("fid"),
      col("c_name").as("fs")).filter(col("fs").isNotNull)
    // replicas of FuzzyJoin's private internals, kept in lockstep with
    // posSigs/selfJoin (this is a measurement harness for THAT code;
    // divergence here just mis-measures, it cannot affect the operator)
    val orig = struct(graft.functions.TextFunctions.polyHash(col("fs"))
      .as("sig"), lit(0).as("pos"))
    val entries =
      when(length(col("fs")) === 0, array(orig))
        .otherwise(concat(array(orig),
          transform(sequence(lit(1), length(col("fs"))), i =>
            struct(graft.functions.TextFunctions.polyHash(concat(
              col("fs").substr(lit(1), i - 1),
              col("fs").substr(i + 1, length(col("fs"))))).as("sig"),
              i.cast("int").as("pos")))))
    val sigs = strs.select(col("fid"), explode(entries).as("e"))
      .select(col("fid"), col("e.sig").as("sig"), col("e.pos").as("pos"))
    val posCompatible =
      col("a.pos") === 0 || col("b.pos") === 0 || col("a.pos") === col("b.pos")
    val cand = sigs.as("a")
      .join(sigs.as("b"),
        col("a.sig") === col("b.sig") && col("a.fid") < col("b.fid") &&
          posCompatible)
      .select(col("a.fid").as("id_a"), col("b.fid").as("id_b"))

    def heapPeakMb(): Long =
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans()
        .toArray.map(_.asInstanceOf[java.lang.management.MemoryPoolMXBean])
        .filter(_.getType == java.lang.management.MemoryType.HEAP)
        .map(p => Option(p.getPeakUsage).map(_.getUsed).getOrElse(0L))
        .sum / (1024 * 1024)

    val t0 = System.nanoTime()
    val n: Long = stage match {
      case "sigs" => sigs.write.mode("overwrite").format("noop").save(); sigs.count()
      case "cand" => cand.select(count(lit(1))).collect()(0).getLong(0)
      case "dist" => cand.distinct().select(count(lit(1))).collect()(0).getLong(0)
      case "pairs" =>
        graft.operators.FuzzyJoin.selfJoin(customer,
          col("c_custkey"), col("c_name"))
          .select(count(lit(1))).collect()(0).getLong(0)
      case "full" =>
        val df = graft.operators.Dedup.clusterPairs(
          graft.operators.FuzzyJoin.selfJoin(customer,
            col("c_custkey"), col("c_name"))
            .select(col("id_a").as("doc_a"), col("id_b").as("doc_b")))
        df.write.mode("overwrite").format("noop").save()
        -1L
      case other => sys.error(s"unknown stage: $other")
    }
    val wall = (System.nanoTime() - t0) / 1e9
    val xmx = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    println(f"D18PROFILE stage=$stage rows=$n wall=$wall%.1f s " +
      f"heapPeakMb=${heapPeakMb()} xmxMb=$xmx")
    spark.stop()
  }
}
