package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.SemDedup
object SemDebug {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val CopyOffset = 1L << 40
    val n = 200000L
    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $tag ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    val base = spark.range(0, n).select(col("id").as("vec_id"),
      expr("""transform(sequence(0, 63), j ->
               CAST(xxhash64(vec_id, j) % 1000 AS DOUBLE) / 1000.0)""").as("emb"))
    val copies = base.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + CopyOffset).as("vec_id"), expr(
        "transform(emb, (x, j) -> x * (1.0 + ((((vec_id + 1) * (j + 7)) % 13 - 6) * 0.0002)))")
        .as("emb"))
    val c = t("gen")(base.unionByName(copies).localCheckpoint(true))
    val cents = c.filter(col("vec_id") % 100 === 0 && col("vec_id") < CopyOffset)
      .select(col("vec_id").as("cid"), col("emb").as("cvec"))
    val assigned = t("assign")(
      SemDedup.assignBroadcast(c, "vec_id", "emb", cents).localCheckpoint(true))
    assigned.queryExecution.executedPlan.toString.split("\n").take(12)
      .foreach(l => println("PLAN " + l))
    val pruned = t("prune")(
      SemDedup.prune(assigned, "vec_id", "emb", 0.97).localCheckpoint(true))
    println("rows=" + pruned.count())
  }
}
