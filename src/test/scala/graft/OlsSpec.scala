package graft

import org.apache.spark.sql.functions._

/** Ground-truth check for the normal-equations OLS (q_evt_ols): on a
  * synthetic corpus whose value IS an exact linear function of the
  * features, the closed form must recover the coefficients exactly and
  * report R² = 1 — the property a DuckDB replay alone can't pin (both
  * engines could share a wrong formula).
  */
class OlsSpec extends SparkSpec {

  test("Cramer solve recovers an exact linear signal with R² = 1") {
    import spark.implicits._
    val dir = "/tmp/graft-ols-fixture"
    // value = 3 + 2·hour − 1·isodow, exact in milli-units
    val rows = (0 until 2000).map { i =>
      val ts = java.sql.Timestamp.valueOf(
        f"2024-01-${1 + i % 28}%02d ${i % 24}%02d:15:00")
      val hour = i % 24
      val isodow = java.time.LocalDate.of(2024, 1, 1 + i % 28).getDayOfWeek.getValue
      (i.toLong, ts, (i % 50).toLong, "click", 3.0 + 2.0 * hour - 1.0 * isodow, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.queries.AnalyticsQueries.evtOls(spark, dir).head()
    assert(r.getAs[Double]("intercept") === 3.0)
    assert(r.getAs[Double]("beta_hour") === 2.0)
    assert(r.getAs[Double]("beta_dow") === -1.0)
    assert(r.getAs[Double]("r2") === 1.0)
  }
}
