package graft
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val raw = { spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true"); spark.read.parquet(dir + "/events.parquet") }
    raw.printSchema()
    val ev = Tables.events(spark, dir)
    ev.printSchema()
    ev.selectExpr("min(ts)", "max(ts)").show(false)
    spark.stop()
  }
}
