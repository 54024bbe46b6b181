package graft

import org.apache.spark.sql.SparkSession

/** Smoke main mirroring the driver's t1 check: SparkEntry.entry must
  * return >0 rows on sf0.001.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      // legacy annotated INT64 TIMESTAMP(NANOS) testdata encodings scan-fail
      // without this flag; set once at session build (never in accessors)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the extension-injected surface must be live without any register()
    val d = spark.sql("SELECT dot_l(array(1L, 2L), array(3L, 4L)) AS d")
      .collect()(0).getLong(0)
    assert(d == 11L, s"extensions not injected: dot_l gave $d")
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n ${if (n > 0) "OK" else "EMPTY"}")
    spark.stop()
  }
}
