package graft.streaming

import java.sql.Timestamp

/** Typed view of the `events` table (FIXTURES.md) used by the stateful
  * streaming operators and CEP. `tsUs` helpers keep ordering at the full
  * microsecond precision of the parquet data.
  */
final case class Event(
    event_id: Long,
    ts: Timestamp,
    user_id: Long,
    event_type: String,
    value: Double
) {
  def tsUs: Long = ts.getTime * 1000L + (ts.getNanos / 1000) % 1000
}
