package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Input type validation for the SQL-registered kernel expressions.
  *
  * The kernels read Catalyst values through unchecked casts
  * (`ArrayData.toLongArray`, `getDouble` slots, `UTF8String`), so a
  * mistyped SQL argument — `graft_jaccard_long(array('a'), ...)`,
  * `graft_lsh_buckets(array<int>, ...)` — would not fail: on unsafe
  * rows the raw bytes reinterpret as the expected width and the
  * expression returns a PLAUSIBLE-LOOKING garbage value (or an opaque
  * mid-query ClassCastException on safe rows). `checkInputDataTypes`
  * turns that into an analysis-time error naming the argument. */
private[plans] object TypeChecks {

  def isLongArray(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  def isStringArray(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  /** The vector kernels accept float or double element arrays
    * (VecUtil.isFloatArr switches the read width). */
  def isVecArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Each (name, actual, ok) triple names one argument; the first
    * mismatch fails with the expected/actual pair. */
  def expect(fn: String,
             args: Seq[(String, DataType, DataType => Boolean, String)])
      : TypeCheckResult =
    args.collectFirst {
      case (name, dt, ok, want) if !ok(dt) =>
        TypeCheckResult.TypeCheckFailure(
          s"$fn: argument '$name' requires $want, got ${dt.catalogString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  def string(name: String, dt: DataType): (String, DataType, DataType => Boolean, String) =
    (name, dt, _ == StringType, "STRING")

  def longArray(name: String, dt: DataType): (String, DataType, DataType => Boolean, String) =
    (name, dt, isLongArray, "ARRAY<BIGINT>")

  def stringArray(name: String, dt: DataType): (String, DataType, DataType => Boolean, String) =
    (name, dt, isStringArray, "ARRAY<STRING>")

  def vecArray(name: String, dt: DataType): (String, DataType, DataType => Boolean, String) =
    (name, dt, isVecArray, "ARRAY<FLOAT> or ARRAY<DOUBLE>")

  def isIntArray(dt: DataType): Boolean = dt match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }

  def intArray(name: String, dt: DataType): (String, DataType, DataType => Boolean, String) =
    (name, dt, isIntArray, "ARRAY<INT>")

  def integer(name: String, dt: DataType): (String, DataType, DataType => Boolean, String) =
    (name, dt, _ == IntegerType, "INT")
}
