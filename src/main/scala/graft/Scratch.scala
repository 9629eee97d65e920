package graft
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Engine.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.1")
    docs.write.format("noop").mode("overwrite").save()
    def time(n: String)(f: => Unit) = { val t=System.nanoTime(); f; println(f"TIME $n ${(System.nanoTime()-t)/1e9}%.2f") }
    val sigs = operators.Dedup.minhashSignatures(docs)
    time("sigs")(sigs.write.format("noop").mode("overwrite").save())
    time("full")(operators.Dedup.minhashLsh(docs).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
