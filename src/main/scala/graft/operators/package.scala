package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

package object operators {
  /** `$"name"` Column shorthand without a SparkSession-bound
    * `spark.implicits._` import (operators are session-agnostic).
    */
  implicit class ColInterp(val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
