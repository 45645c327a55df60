package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Shared input-type guard for the float-vector kernels.
  *
  * NOTE: `ExpectsInputTypes.inputTypes` is not implementable for these
  * expressions — `AbstractDataType` is private[sql] in the Spark 4.1.2
  * scala signatures — so the guard lives in each expression's
  * `checkInputDataTypes()`, sharing THIS one formula (a change to the
  * accepted types — e.g. admitting array<double> — happens once, not
  * once per expression).
  */
private[plans] object TypeChecks {

  def floatArrayPair(fn: String, left: DataType,
      right: DataType): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn expects (array<float>, array<float>), " +
        s"got (${left.simpleString}, ${right.simpleString})")
  }
}
