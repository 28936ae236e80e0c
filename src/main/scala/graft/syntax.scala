package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Session-free `$"col"` interpolator (same syntax as
  * `spark.implicits._` but usable in objects with no SparkSession in
  * scope — purely syntactic, resolves to `functions.col`). */
object syntax {
  implicit class ColumnInterpolator(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
