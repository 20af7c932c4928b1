// plan-audit main (r14): BatchExplain <outDir> <q1,q2,...> [suffix]
// writes one formatted-physical-plan file per named query in a single
// JVM session (ExplainOne's format, without the per-query JVM spinup).
// Data dir comes from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01),
// the Verify/Bench contract (r14 ADVICE #4). Pinned-query caveat: see
// PlanAudit's header — localCheckpoint is eager, so plans of pinned
// queries render the pinned subtree as `Scan ExistingRDD`.
package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

object BatchExplain {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names = args(1).split(",")
    val suffix = if (args.length > 2) args(2) else ""
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.Graft.register(spark)
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark,
          sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
        val plan =
          df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/$name$suffix.txt"),
          plan.getBytes("UTF-8"))
      } catch {
        case e: Throwable =>
          System.err.println(s"[explain] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
