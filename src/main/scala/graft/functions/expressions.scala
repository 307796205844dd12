package graft.functions

import graft.Hashing
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the signature hot path (SURVEY.md §2.10).
  *
  * These beat Scala UDFs because they (a) read/write Catalyst's internal
  * representations (`UTF8String`, `ArrayData`) with no encoder round-trip,
  * and (b) implement `doGenCode` as a static call into [[graft.Hashing]],
  * so they stay inside whole-stage codegen instead of breaking the
  * generated pipeline at a UDF boundary.
  */

/** normalized caption string → distinct hashed char k-gram set
  * (array<long>). BASELINE.json:L6 "caption shingling into k-gram sets".
  */
case class ShinglesExpr(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  // UnsafeArrayData, not GenericArrayData: the signature relation is
  // immediately shuffled/persisted, so every array is re-written into an
  // UnsafeRow — from UnsafeArrayData that is one memcpy, from
  // GenericArrayData a per-element loop with an Object[] detour.
  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      Hashing.shingles(input.asInstanceOf[UTF8String].toString, k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray(graft.Hashing.shingles($c.toString(), $k));")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

/** shingle set (array<long>) → batched MinHash signature (array<int>,
  * numPerms lanes, one pass). BASELINE.json:L6 "batched MinHash signatures
  * (128 perms)".
  */
case class MinHashExpr(child: Expression, numPerms: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      Hashing.minHash(input.asInstanceOf[ArrayData].toLongArray(), numPerms))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray(graft.Hashing.minHash($c.toLongArray(), $numPerms));")

  override protected def withNewChildInternal(newChild: Expression): MinHashExpr =
    copy(child = newChild)
}

/** (normalized caption, phash) → 64-bit SimHash over whitespace-token
  * hashes + folded pHash bytes. BASELINE.json:L6 "64-bit SimHash over
  * pHash+caption tokens".
  */
case class SimHashExpr(left: Expression, right: Expression, phashWeight: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(cap: Any, ph: Any): Any = {
    val tokens = SimHashExpr.tokenHashes(cap.asInstanceOf[UTF8String].toString)
    Hashing.simHash(tokens, ph.asInstanceOf[Long], phashWeight)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, p) =>
      s"${ev.value} = graft.Hashing.simHash(" +
        s"graft.functions.SimHashExpr.tokenHashes($c.toString()), $p, $phashWeight);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SimHashExpr =
    copy(left = l, right = r)
}

/** normalized caption → robust-winnowing fingerprint set (array<long>;
  * Schleimer/Wilkerson/Aiken 2003). The suffix-pass routing stage runs
  * this on EVERY caption (the span path's corpus-wide row-local work),
  * so it must not break whole-stage codegen the way the earlier Scala
  * UDF did — same static-call pattern as [[ShinglesExpr]].
  */
case class WinnowExpr(child: Expression, k: Int, minSpan: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      graft.SuffixPass.winnowFingerprints(
        input.asInstanceOf[UTF8String].toString, k, minSpan))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray(graft.SuffixPass.winnowFingerprints($c.toString(), $k, $minSpan));")

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

/** shingle set (array<long>) → densified One-Permutation-Hashing sketch
  * (array<long>, numBins entries). ONE hash per shingle instead of
  * numPerms — the 100 TB signature-stage cost reduction
  * ([[graft.Hashing.ophMinHash]]; Li/Owen/Zhang NIPS 2012, Shrivastava/Li
  * ICML 2014).
  */
case class OphMinHashExpr(child: Expression, numBins: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_oph_minhash"

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      Hashing.ophMinHash(input.asInstanceOf[ArrayData].toLongArray(), numBins))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray(graft.Hashing.ophMinHash($c.toLongArray(), $numBins));")

  override protected def withNewChildInternal(newChild: Expression): OphMinHashExpr =
    copy(child = newChild)
}

/** 64-bit splitmix64 finalizer over a long — the engine's id-space mixer
  * ([[graft.Hashing.mix64]]) exposed as a column. Powers the deterministic
  * sampling/split family (SURVEY.md §2.11 T19/T20): reproducible
  * train/val/test assignment and per-group caps must hash the CONTENT KEY,
  * not row position, or the split changes under repartitioning — and the
  * same kernel has a byte-exact DuckDB SQL twin (mix64Ctes), so the split
  * is oracle-checkable end-to-end.
  */
case class Mix64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_mix64"

  override def nullSafeEval(input: Any): Any =
    Hashing.mix64(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.Hashing.mix64($c);")

  override protected def withNewChildInternal(newChild: Expression): Mix64Expr =
    copy(child = newChild)
}

/** (string, string) → Jaro-Winkler similarity (double) — the fuzzy-ratio
  * pair feature of the reference's scoring stage ([[graft.StringSim]]).
  * Runs per candidate pair inside the record-linkage feature projection,
  * so it follows the same static-call codegen pattern as the signature
  * expressions instead of a UDF boundary.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    graft.StringSim.jaroWinkler(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.StringSim.jaroWinkler($a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerExpr =
    copy(left = l, right = r)
}

object SimHashExpr {
  /** whitespace-token 64-bit hashes of a normalized caption. */
  def tokenHashes(s: String): Array[Long] = {
    if (s == null || s.isEmpty) return Array.emptyLongArray
    val out = new scala.collection.mutable.ArrayBuffer[Long](16)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      val start = i
      while (i < n && s.charAt(i) != ' ') i += 1
      if (i > start) out += Hashing.hashWindow(s, start, i - start)
    }
    out.toArray
  }
}

/** Registration + typed Column helpers. Uses the function registry +
  * `call_function` (Spark 4 removed the public Column-from-Expression
  * constructor).
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_shingles",
      es => ShinglesExpr(es.head, litInt(es(1))),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_minhash",
      es => MinHashExpr(es.head, litInt(es(1))),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_simhash",
      es => SimHashExpr(es.head, es(1), litInt(es(2))),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_winnow",
      es => WinnowExpr(es.head, litInt(es(1)), litInt(es(2))),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_mix64",
      es => Mix64Expr(es.head),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_oph_minhash",
      es => OphMinHashExpr(es.head, litInt(es(1))),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_jaro_winkler",
      es => JaroWinklerExpr(es.head, es(1)),
      "built-in")
  }

  private def litInt(e: Expression): Int = e.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"expected int literal, got $other")
  }

  def shinglesCol(normCaption: Column, k: Int): Column =
    call_function("graft_shingles", normCaption, lit(k))
  def minhashCol(shingles: Column, numPerms: Int): Column =
    call_function("graft_minhash", shingles, lit(numPerms))
  def simhashCol(normCaption: Column, phash: Column, phashWeight: Int = 2): Column =
    call_function("graft_simhash", normCaption, phash, lit(phashWeight))
  def winnowCol(normCaption: Column, k: Int, minSpan: Int): Column =
    call_function("graft_winnow", normCaption, lit(k), lit(minSpan))
  def mix64Col(id: Column): Column =
    call_function("graft_mix64", id)
  def ophMinhashCol(shingles: Column, numBins: Int): Column =
    call_function("graft_oph_minhash", shingles, lit(numBins))
  def jaroWinklerCol(a: Column, b: Column): Column =
    call_function("graft_jaro_winkler", a, b)
}
