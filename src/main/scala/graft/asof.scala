package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (J9): for every left row, attach the latest right row with
  * the same key and right.ts <= left.ts — the "most recent preceding
  * observation" join of time-series analytics (kdb aj, DuckDB ASOF JOIN;
  * the oracle runs DuckDB's native one against this).
  *
  * Spark has no ASOF operator, and the naive encodings die at scale: a
  * range join explodes to O(|L|·|R|) within key, and a per-key
  * mapGroups sort abandons codegen. This is the union-sort encoding
  * instead: tag both sides, union, and carry the latest right payload
  * forward with last_value(ignoreNulls) over ONE (key, ts)-sorted
  * window. Cost = one shuffle of |L|+|R| rows on the key + a per-key
  * sort — the same shape as any keyed aggregation, so it survives the
  * 100 TB regime (skewed keys salt the same way any window op does;
  * running state is a single payload struct, O(1) per row).
  *
  * Tie rule: right rows sort BEFORE left rows at equal ts (side 0 < 1),
  * so `<=` is inclusive; among right rows sharing (key, ts) the one
  * largest by `rightTie` wins deterministically.
  */
object AsOf {

  /** @param right payload columns of `right` (beyond key/ts) are carried
    *              onto matches as `asof_<name>`; unmatched left rows get
    *              nulls (LEFT-join semantics).
    * @param rightTie deterministic tiebreak column on the right side for
    *                 rows sharing (key, ts).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightPayload: Seq[String], rightTie: String): DataFrame = {
    // fail fast on a tiebreak whose cast to the sort column is lossy or
    // nulling: cast("long") on e.g. a UUID string silently nulls EVERY
    // tie value, collapsing the documented deterministic tie rule into
    // physical-order selection. Any NUMERIC type is accepted (a double
    // sequence or decimal rank is a legitimate tiebreak — it sorts on
    // its own type); only string/binary/complex types are rejected.
    val tieIsNumeric = right.schema(rightTie).dataType match {
      case _: org.apache.spark.sql.types.NumericType => true
      case _ => false
    }
    require(tieIsNumeric,
      s"rightTie must be a numeric column, got " +
        s"${right.schema(rightTie).dataType.typeName} for $rightTie")
    val tieType = right.schema(rightTie).dataType
    val pay = struct((ts +: rightPayload).map(col): _*)
    val payType = right.select(pay.as("p")).schema("p").dataType
    val leftCols = left.columns.toSeq
    // left rows never compete on __tie (side 1 sorts after every side-0
    // row at equal ts), so the left side carries a typed null and the
    // right side keeps its NATIVE numeric type — no lossy cast anywhere
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast(tieType))
      .withColumn("__pay", lit(null).cast(payType))
    // a null-ts right row can never satisfy right.ts <= left.ts, but
    // Spark's nulls-first ascending sort would place it BEFORE every
    // row in the partition and its payload would be carried onto left
    // rows that have no true preceding observation
    val rightValid = right.where(col(ts).isNotNull)
    val r = rightValid.select(
      Seq(col(key), col(ts), lit(0).as("__side"),
        col(rightTie).as("__tie"), pay.as("__pay")) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__m", last("__pay", ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++
        (ts +: rightPayload).map(c => col("__m").getField(c).as(s"asof_$c")): _*)
  }
}
