package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import Q._

/** q112: Structured Streaming under the SAME correctness gate as the
  * batch operators — the stream/batch parity promise made concrete.
  *
  * The orders table is consumed through the file-source as a stream
  * (`readStream.parquet`), aggregated statefully per calendar month,
  * and run to completion with `Trigger.AvailableNow`; the final state
  * of the memory sink is the query result, which must hash-match the
  * batch answer DuckDB computes over the same file. Totals are summed
  * as exact integer cents — a double sum's partial-order differences
  * across engines would make the last ulp nondeterministic.
  *
  * The memory sink is the harness: a real deployment writes each
  * micro-batch through `foreachBatch` into the statement store (see
  * streaming/StatementStream.scala); the aggregation state and
  * trigger semantics exercised here are the same.
  */
object StreamingQueries {

  val decls: Seq[Decl] = Seq(
    decl("q112_streaming_monthly_orders",
      (s, d) => {
        // the file source streams a DIRECTORY of drops — stage the
        // orders file into a scratch landing dir (the deployment shape:
        // a crawler lands files, the stream picks them up)
        val landing = new org.apache.hadoop.fs.Path(
          "/tmp/graft_q112_landing_" + d.replaceAll("[^a-zA-Z0-9]", "_"))
        val fs = landing.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(landing, true)
        fs.mkdirs(landing)
        org.apache.hadoop.fs.FileUtil.copy(
          fs, new org.apache.hadoop.fs.Path(s"$d/orders.parquet"),
          fs, new org.apache.hadoop.fs.Path(landing, "orders.parquet"),
          false, s.sparkContext.hadoopConfiguration)
        val schema = s.read.parquet(s"$d/orders.parquet").schema
        val stream = s.readStream.schema(schema).parquet(landing.toString)
        val agg = stream
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
          .agg(count(lit(1)).as("n_orders"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
        val qname = "q112_mem_" + java.lang.Math.abs(d.hashCode.toLong).toString
        // a rerun in the same session must not collide with a leftover
        // active query of the same name
        s.streams.active.filter(q => q.name == qname).foreach(_.stop())
        val q = agg.writeStream.format("memory").queryName(qname)
          .outputMode("complete").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table(qname).select(col("month"), col("n_orders"), col("total_cents"))
      },
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n_orders,
        |  SUM(round(o_totalprice * 100)::BIGINT)::BIGINT AS total_cents
        |FROM orders GROUP BY 1""".stripMargin)
  )
}
