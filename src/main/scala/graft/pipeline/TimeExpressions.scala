package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/**
 * Timestamp-type-agnostic time expressions.
 *
 * Parquet in the wild carries BOTH timestamp flavours: `timestamp[us,
 * tz=UTC]` → Spark `TimestampType` and plain `timestamp[us]` (the
 * pandas/pyarrow default) → Spark `TimestampNTZType`. Spark's built-in
 * `unix_micros` rejects NTZ with DATATYPE_MISMATCH, so every event-time
 * operator that hard-codes it breaks on half of real-world corpora.
 *
 * Both Spark timestamp types store the SAME physical value — a long of
 * microseconds since the epoch (for NTZ, of the wall-clock instant as if
 * UTC). Interpreting an NTZ wall clock as a UTC instant is therefore a
 * reinterpretation of the long, not a conversion: these expressions are
 * identity at runtime, cost nothing, stay in whole-stage codegen, and —
 * unlike `cast(ts AS TIMESTAMP)` — do not depend on
 * `spark.sql.session.timeZone`.
 */

/** ts_micros(ts) → BIGINT µs-since-epoch; accepts TIMESTAMP or
  * TIMESTAMP_NTZ (NTZ wall clock read as UTC). For TIMESTAMP input this
  * is exactly `unix_micros`. */
case class TsMicros(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case TimestampType | TimestampNTZType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ts_micros requires TIMESTAMP or TIMESTAMP_NTZ, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "ts_micros"
  override protected def nullSafeEval(v: Any): Any = v
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ntz_to_utc(ts) → TIMESTAMP; reinterprets a TIMESTAMP_NTZ wall clock as
  * a UTC instant (session-timezone-independent). TIMESTAMP input passes
  * through unchanged, so it can be applied unconditionally to normalize a
  * column of either flavour. */
case class NtzToUtc(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case TimestampType | TimestampNTZType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ntz_to_utc requires TIMESTAMP or TIMESTAMP_NTZ, got ${other.sql}")
  }
  override def dataType: DataType = TimestampType
  override def prettyName: String = "ntz_to_utc"
  override protected def nullSafeEval(v: Any): Any = v
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** utc_to_ntz(ts) → TIMESTAMP_NTZ; reinterprets a TIMESTAMP instant as
  * its UTC wall clock (session-timezone-independent — the inverse
  * reinterpretation of [[NtzToUtc]]). TIMESTAMP_NTZ input passes through
  * unchanged, so it can be applied unconditionally to normalize a column
  * of either flavour to the NTZ the harness tables ship today. */
case class UtcToNtz(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case TimestampType | TimestampNTZType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"utc_to_ntz requires TIMESTAMP or TIMESTAMP_NTZ, got ${other.sql}")
  }
  override def dataType: DataType = TimestampNTZType
  override def prettyName: String = "utc_to_ntz"
  override protected def nullSafeEval(v: Any): Any = v
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-level helpers for the library operators (Sessions, AsOf,
  * Materialize, …): use these instead of `unix_micros`/`cast` so every
  * event-time operator accepts either timestamp flavour. */
object Time {
  import org.apache.spark.sql.GraftShim.{column => toCol, expression => toExpr}

  /** µs since epoch as BIGINT from TIMESTAMP or TIMESTAMP_NTZ. */
  def tsMicros(c: Column): Column = toCol(TsMicros(toExpr(c)))

  /** Normalize TIMESTAMP_NTZ → TIMESTAMP (wall clock read as UTC);
    * TIMESTAMP passes through. */
  def ntzToUtc(c: Column): Column = toCol(NtzToUtc(toExpr(c)))

  /** Normalize TIMESTAMP → TIMESTAMP_NTZ (instant read as its UTC wall
    * clock); TIMESTAMP_NTZ passes through. */
  def utcToNtz(c: Column): Column = toCol(UtcToNtz(toExpr(c)))
}
