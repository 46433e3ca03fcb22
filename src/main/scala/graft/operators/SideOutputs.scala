package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Side outputs (ref: ProcessFunction OutputTag / ctx.output, SURVEY
  * §2.2 "no direct equivalent — tagged union column"): classify each row
  * into the FIRST matching tag (or the default), either as one tagged
  * DataFrame or split into per-tag frames. One pass, no shuffle; the
  * split form filters the tagged frame, so Catalyst collapses each
  * branch to scan+filter.
  */
object SideOutputs {

  val TagCol = "__tag"

  def tag(df: DataFrame, tags: Seq[(String, Column)], default: String = "main"): DataFrame = {
    val expr = tags.foldRight(lit(default): Column) { case ((name, cond), els) =>
      when(cond, name).otherwise(els)
    }
    df.withColumn(TagCol, expr)
  }

  /** OutputTag-style accessors: main output + one DataFrame per tag. */
  def split(df: DataFrame, tags: Seq[(String, Column)], default: String = "main")
      : Map[String, DataFrame] = {
    val tagged = tag(df, tags, default)
    (tags.map(_._1) :+ default).map(t => t -> tagged.filter(col(TagCol) === t).drop(TagCol)).toMap
  }
}
