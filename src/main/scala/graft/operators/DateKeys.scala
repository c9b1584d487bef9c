package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** The warehouse `yyyyMMdd` integer date key as pure integer
  * arithmetic (r21, guide §1.2 step 2 / §4.1): `date_format(c,
  * "yyyyMMdd").cast(int)` routes every row through a DateTimeFormatter
  * and a string allocation just to re-parse the digits back into an
  * int — ~1.4 s of the q05 serving run at sf0.1, doubled by the range
  * sort's sampling pass. `year*10000 + month*100 + day` is the same
  * integer for every date (both forms are session-TZ field
  * extractions; year ≤ 9999 keeps the arithmetic collision-free and
  * the pipeline never sees negative years), all codegen'd integer ops
  * with zero allocation. NULL in → NULL out on both forms.
  */
object DateKeys {
  def dateKeyInt(c: Column): Column =
    (year(c) * lit(10000) + month(c) * lit(100) + dayofmonth(c))
      .cast(IntegerType)
}
