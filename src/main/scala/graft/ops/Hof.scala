package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Helpers for higher-order-function Columns. */
private[graft] object Hof {

  /** Let-binding for expression trees: evaluates `v` ONCE per row and
    * hands the bound value to `body` as a lambda variable.
    *
    * Spark evaluates HOF lambda bodies interpreted, re-evaluating
    * every embedded subtree at every element — an O(L) subexpression
    * (a `split`, a norm, an array fold) referenced inside a
    * `transform` over L elements turns the column into O(L²) per row.
    * Binding the subexpression through a single-element array makes
    * later references a lambda-variable read. Nested binds compose
    * (inner bodies may reference outer bound variables). */
  def bind(v: Column, body: Column => Column): Column =
    element_at(transform(array(v), body), 1)
}
