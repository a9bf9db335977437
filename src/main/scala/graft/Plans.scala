package graft
import org.apache.spark.sql.SparkSession
/** Dump physical plans of selected queries for scale review.
  * Usage: sbt "runMain graft.Plans q01 q11 ..." (no args = entry+flagships).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val wanted = if (args.nonEmpty) args.toSeq else Seq("entry")
    if (wanted.contains("entry")) {
      println("===== entry ====="); SparkEntry.entry(spark).explain("formatted")
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (wanted.exists(w => w != "entry" && name.startsWith(w))) {
        println(s"===== $name =====")
        fn(spark, dir).explain("formatted")
      }
    }
    spark.stop()
  }
}
