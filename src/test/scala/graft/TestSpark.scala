package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole forked test JVM (never
  * stopped — the JVM exit cleans up; stopping it mid-run would break the
  * other suites sharing it).
  */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
