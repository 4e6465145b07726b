package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. Spark 4 gates these conversions
  * behind private[sql]; exposing them from a subpackage of
  * org.apache.spark.sql is the sanctioned pattern for libraries that ship
  * native Expressions. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Whether `key` was EXPLICITLY set on this session (session-conf
    * settings map — not a registered default). `RuntimeConfig.getOption`
    * can't answer this: it falls back to the conf's default value. */
  def sessionConfContains(session: org.apache.spark.sql.SparkSession, key: String): Boolean =
    session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.conf.contains(key)
}
