package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CosineSimFloat, DotProductFloat, JavaHashCode}

/** Session-extension hook (the standard deployment path for SQL-only
  * users — `spark-sql --conf spark.sql.extensions=graft.GraftExtensions`
  * or `.withExtensions(new GraftExtensions)`): injects the graft custom
  * expressions into the session's function registry at build time, so
  * `SELECT hash_code(x), cosine_sim(a, b)` resolves without any Scala
  * entry point. Programmatic sessions get the same registrations from
  * `GraftFunctions.register` (GraftSession calls it); both paths are
  * idempotent.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("hash_code"),
      new ExpressionInfo(classOf[JavaHashCode].getName, "hash_code"),
      es => JavaHashCode(es.head)))
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimFloat].getName, "cosine_sim"),
      es => CosineSimFloat(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("dot_f"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "dot_f"),
      es => DotProductFloat(es.head, es(1))))
  }
}
