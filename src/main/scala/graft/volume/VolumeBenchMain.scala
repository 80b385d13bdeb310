package graft.volume

import org.apache.spark.sql.SparkSession

/** Standalone runner for the volume benchmark (iteration aid; the driver
  * uses graft.Bench which embeds the same flow).
  */
object VolumeBenchMain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    VolumeBench.run(spark).foreach { case (k, v) => println(f"$k: $v%.2f s") }
    spark.stop()
  }
}
