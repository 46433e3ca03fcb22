package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RowKind-aware changelog streams — the reference's biggest semantic
  * gap vs Spark (SURVEY §2 "changelog streams" / §7 hard part #1; ref:
  * flink-core RowKind.java:32-55 `+I -U +U -D`, ChangelogMode, and the
  * StreamTableEnvironment fromChangelogStream/toChangelogStream pair).
  * Spark's output modes confine updates to the sink; this layer gives
  * the two reference surfaces an explicit, oracle-checkable form:
  *
  *  - [[foldCdc]]: the `fromChangelogStream` direction — fold a batch
  *    of kind-tagged rows into the keyed materialized table it
  *    describes (upsert on `+I`/`+U`, delete on `-D`; `-U` is the
  *    retraction half of an update and never survives a fold);
  *  - [[retractDiff]]: the `toChangelogStream`/`toRetractStream`
  *    direction — diff two consecutive materialized snapshots of an
  *    update-mode aggregate and emit the kind-tagged delta rows the
  *    reference's GroupAggFunction would have emitted (`+I` first
  *    value, `-U`+`+U` pair on change, `-D` on disappearance).
  *
  * Both are plain keyed joins/aggregates — one shuffle each on the
  * primary key, no driver-side state — so the changelog surface scales
  * exactly like the aggregates it wraps. Fold order within a batch is
  * by an explicit sequence column (CDC logs always carry one: binlog
  * offset, LSN, kafka offset); the LAST operation per key wins, which
  * makes per-batch folding + cross-batch merge equal to the one-shot
  * fold of the whole log (associativity the q_stream_cdc oracle pins).
  */
object Changelog {

  val Insert = "+I"
  val UpdateBefore = "-U"
  val UpdateAfter = "+U"
  val Delete = "-D"

  /** Fold one changelog batch into the materialized table.
    *
    * @param prior   keyed table left by the previous batch: (keyCol, payload…)
    * @param batch   kind-tagged rows: (kindCol, seqCol, keyCol, payload…)
    *                where payload columns match `prior`'s
    * @param keyCol  primary key column
    * @param seqCol  total order within the batch (log offset)
    * @param kindCol RowKind column (`+I -U +U -D`)
    */
  def foldCdc(prior: DataFrame, batch: DataFrame, keyCol: String,
      seqCol: String, kindCol: String): DataFrame = {
    val payload = prior.columns.filterNot(_ == keyCol)
    // last operation per key decides: max_by over the log offset —
    // one map-side-combinable aggregate, never a per-key sort
    val last = batch
      .groupBy(col(keyCol))
      .agg(max_by(struct(col(kindCol) +: payload.map(col): _*), col(seqCol)).as("op"))
      .select(col(keyCol) +: (col(s"op.$kindCol").as("__kind") +:
        payload.map(c => col(s"op.$c").as(c))): _*)
    // keys untouched by the batch carry over; touched keys survive iff
    // their last op asserts presence (+I / +U)
    prior.join(last.select(keyCol), Seq(keyCol), "left_anti")
      .unionByName(last.filter(col("__kind").isin(Insert, UpdateAfter)).drop("__kind"))
  }

  /** Kind-tagged delta between two materialized snapshots of a keyed
    * table — the retract stream a reference update-mode aggregate
    * emits. Output: (kind, keyCol, payload…) with `-U` carrying the OLD
    * payload and `+U` the new, both emitted for a changed key.
    */
  def retractDiff(prior: DataFrame, current: DataFrame, keyCol: String): DataFrame =
    retractDiff(prior, current, Seq(keyCol))

  /** Composite-key variant — the key is any column subset. */
  def retractDiff(prior: DataFrame, current: DataFrame, keyCols: Seq[String]): DataFrame = {
    val payload = prior.columns.filterNot(keyCols.contains).toSeq
    val p = prior.select(keyCols.map(col) :+ struct(payload.map(col): _*).as("__old"): _*)
    val c = current.select(keyCols.map(col) :+ struct(payload.map(col): _*).as("__new"): _*)
    val joined = p.join(c, keyCols, "full_outer")
    def emit(kind: String, src: String) =
      joined.filter(kind match {
        case Insert       => col("__old").isNull && col("__new").isNotNull
        case Delete       => col("__old").isNotNull && col("__new").isNull
        case _            => col("__old").isNotNull && col("__new").isNotNull &&
          col("__old") =!= col("__new")
      }).select(lit(kind).as("kind") +: keyCols.map(col) ++:
        payload.map(f => col(s"$src.$f").as(f)): _*)
    emit(Insert, "__new")
      .unionByName(emit(Delete, "__old"))
      .unionByName(emit(UpdateBefore, "__old"))
      .unionByName(emit(UpdateAfter, "__new"))
  }
}
