package graft

import org.apache.spark.sql.functions._

/** Scale-evidence data generator (r11 verdict "Next round" #3): builds
  * an R×-scaled slice of the three pipeline tables so the heavy-tail
  * queries get ONE measured point above sf0.1 — converting the 100-TB
  * plan-shape argument into an observed scaling exponent.
  *
  *   runMain graft.ScaleProbe <srcSfDir> <outDir> <R>
  *
  * Replication is DETERMINISTIC (id-offset replicas of the driver's
  * seeded fixtures — no RNG, same time horizon) and workload-honest:
  *
  *  - events: R user populations (user/event ids offset per replica,
  *    timestamps unchanged) — per-user behavior constant, calendar and
  *    value-grid domains fixed, exactly how a warehouse grows.
  *  - documents: replica r>0 tags every 3rd token with `_r`, so every
  *    3-shingle differs from the original's — near-dup FAMILIES stay
  *    per-replica and true LSH work scales ×R instead of the ×R²
  *    collision blow-up that byte-identical copies would fake.
  *  - embeddings: replica vectors get a tiny id-hashed jitter (±5e-3
  *    per dim) — cells/buckets keep their geometry without creating
  *    exact-duplicate cosine ties; replica-0 ids stay the lowest, so
  *    seed blocks (Similarity.seedIds) pick the SAME training vectors
  *    at every R.
  *
  * The TPC-H tables copy through unscaled (the probe set reads only
  * events/documents/embeddings; the copies keep every `queries` entry
  * runnable against the probe dir). Timing uses graft.Bench verbatim:
  * SPARK_GRAFT_SF_DIR=<outDir> SPARK_GRAFT_BENCH_ONLY=<names>
  * SPARK_GRAFT_BENCH_OUT=<json>.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleProbe <srcSfDir> <outDir> <R>")
    val (src, out, r) = (args(0), args(1), args(2).toInt)
    require(r >= 1 && r <= 64, s"R=$r out of range")
    val spark = GraftSession.get("graft-scaleprobe")
    import spark.implicits._
    val reps = broadcast((0 until r).toDF("rep"))
    val off = col("rep").cast("long") * 1000000000L

    Tables.events(spark, src).crossJoin(reps)
      .select((col("event_id") + off).as("event_id"), col("ts"),
        (col("user_id") + col("rep").cast("long") * 1000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    spark.read.parquet(s"$src/documents.parquet").crossJoin(reps)
      .select((col("doc_id") + off).as("doc_id"),
        when(col("rep") === 0, col("text")).otherwise(
          array_join(zip_with(
            split(col("text"), " "),
            sequence(lit(0), greatest(size(split(col("text"), " ")) - 1, lit(0))),
            (w, i) => when(i % 3 === 0, concat(w, lit("_"), col("rep"))).otherwise(w)),
            " ")).as("text"),
        col("lang"), col("source"), col("n_chars"), col("rep"))
      // replica-0 rows keep the SOURCE n_chars verbatim (the fixture may
      // deliberately carry n_chars <> length(text) — q_doc_health counts
      // exactly that mismatch, and the probe must not repair it); new
      // replicas recompute over their retagged text, BIGINT like the
      // fixture schema (r12 ADVICE)
      .withColumn("n_chars", when(col("rep") === 0, col("n_chars"))
        .otherwise(length(col("text")).cast("long")))
      .drop("rep")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    spark.read.parquet(s"$src/embeddings.parquet").crossJoin(reps)
      .select((col("vec_id") + off).as("vec_id"),
        when(col("rep") === 0, col("embedding")).otherwise(
          zip_with(col("embedding"),
            sequence(lit(0), size(col("embedding")) - 1),
            (x, i) => (x + (pmod(xxhash64((col("vec_id") + off) * 131L + i.cast("long")),
              lit(997L)).cast("double") - 498.0) / 1e5).cast("float")))
          .cast("array<float>").as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
      }
    println(s"""{"scaleprobe":"ok","src":"$src","out":"$out","r":$r}""")
    spark.stop()
  }
}
