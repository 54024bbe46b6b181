package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (sessions are expensive;
  * specs must not stop() it).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  val Sf0001 = "/root/testdata/sf0.001"

  def corpusDir: String =
    getClass.getResource("/tiny_corpus").getPath
}
