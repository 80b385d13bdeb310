package graft
import org.apache.spark.sql.SparkSession
/** Scratch probe for environment quirks (nanos timestamps etc). Deleted later. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      e.printSchema()
      e.show(3, false)
    } catch { case t: Throwable => println("EVENTS READ FAILED: " + t) }
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      e.printSchema(); e.show(3, false)
    } catch { case t: Throwable => println("NANOS-AS-LONG FAILED: " + t) }
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    em.printSchema(); em.show(2)
    spark.stop()
  }
}
