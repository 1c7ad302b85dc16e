package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector math over `array<float>` embedding columns.
  *
  * Re-expresses the reference's NumPy cosine kernel (reference:
  * src/core/embeddings/processor.py:408 `_cosine_similarity` — dot /
  * (norm*norm), zero-norm guard returning 0) as native Catalyst
  * expressions: single pass over the two arrays, no boxing, no UDF,
  * inlined into whole-stage codegen. This is the hot inner loop of
  * every D-family query, so it must stay on the codegen path.
  *
  * Parity note (SURVEY.md §4): elements are widened float→double
  * (exact), accumulated sequentially; query results round to 6 dp on
  * both engines before any ordering/threshold so Spark and DuckDB
  * select identical rows.
  */
object VectorFunctions {

  /** cosine(a, b) ∈ [-1, 1]; 0 when either norm is 0 (reference
    * processor.py:431). */
  def cosineSim(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimilarity(expr(a), expr(b)))

  /** Sequential-fold dot product of two float vectors. */
  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(expr(a), expr(b)))

  /** L2 norm of one float vector. */
  def l2Norm(a: Column): Column =
    GraftColumnBridge.column(L2Norm(expr(a)))

  /** Feature-hash vote vector over a token array —
    * [[graft.operators.HashingEncoder]]'s row-local kernel. */
  def hashVotes(tokens: Column, dim: Int): Column =
    GraftColumnBridge.column(HashVotes(expr(tokens), dim))

  /** 64-bit SimHash over a token array — E3's row-local kernel. */
  def simHash64(tokens: Column): Column =
    GraftColumnBridge.column(SimHash64(expr(tokens)))

  /** Nearest-cell argmax over an ascending-key candidate array — the
    * bounded-k assignment kernel ([[NearestCell]]). */
  def nearestCell(emb: Column, candidates: Column): Column =
    GraftColumnBridge.column(NearestCell(expr(emb), expr(candidates)))

  private def expr(c: Column): Expression =
    org.apache.spark.sql.GraftColumnBridge.expression(c)
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  // null on dimension mismatch (see checkInputDataTypes)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.twoNumericArrays(prettyName, left, right)

  /** Dimension mismatch (corrupt row, wrong-model embedding) yields
    * NULL — visible and skippable — instead of a plausible score over
    * the truncated prefix (the reference's NumPy dot raises on shape
    * mismatch; an engine must not kill the job for one bad row). */
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val getA = VectorTypeCheck.getter(left.dataType)
    val getB = VectorTypeCheck.getter(right.dataType)
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = getA(a, i)
      val y = getB(b, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val gA = VectorTypeCheck.genGetter(left.dataType, a, i)
      val gB = VectorTypeCheck.genGetter(right.dataType, b, i)
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $x = $gA;
         |    final double $y = $gB;
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  ${ev.value} = ($na == 0.0 || $nb == 0.0)
         |    ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.twoNumericArrays(prettyName, left, right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val getA = VectorTypeCheck.getter(left.dataType)
    val getB = VectorTypeCheck.getter(right.dataType)
    val n = a.numElements()
    var dot = 0.0; var i = 0
    while (i < n) { dot += getA(a, i) * getB(b, i); i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val gA = VectorTypeCheck.genGetter(left.dataType, a, i)
      val gB = VectorTypeCheck.genGetter(right.dataType, b, i)
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $gA * $gB;
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class L2Norm(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_norm"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.numericArray(prettyName, child)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val get = VectorTypeCheck.getter(child.dataType)
    var s = 0.0; var i = 0
    while (i < a.numElements()) {
      val x = get(a, i); s += x * x; i += 1
    }
    math.sqrt(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val g = VectorTypeCheck.genGetter(child.dataType, a, i)
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  final double $x = $g;
         |  $s += $x * $x;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Row-local feature-hash VOTE VECTOR — the hashing encoder's kernel:
  * array<string> tokens → array<double>[dim] where every token votes
  * ±1 into its md5-addressed bucket (bucket = the first 6 hex digits
  * of md5(token) mod dim, sign = the 7th hex digit ≤ '7', computed
  * here from the raw digest bytes — bit-identical to the SQL
  * `conv(substring(md5(w),1,6),16,10) % dim` /
  * `substring(md5(w),7,1) <= '7'` rule). Vote sums are small-integer
  * ±1 accumulations: EXACT in double under any order, so this one
  * projection replaces the explode + two shuffled aggregations +
  * map-rebuild pipeline with zero exchange and the identical vector
  * (guide §2.4 — remove shuffles outright). */
case class HashVotes(child: Expression, dim: Int) extends UnaryExpression {

  require(dim > 0, "hash_votes needs a positive dimension")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "hash_votes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    HashVoteKernel.votes(v.asInstanceOf[ArrayData], dim)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashVoteKernel.votes($a, $dim);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Row-local NEAREST-CELL argmax — the assignment kernel behind
  * [[graft.operators.EmbeddingStore]]'s two-level quantizer on the
  * bounded-k path: `candidates` is an array of (key int,
  * centroid array<float>, cnorm double) structs in ASCENDING key
  * order; the result is the key with the highest
  * `round(dot/(enorm·cnorm), 6)` score (0.0 when either norm is 0 —
  * cosineSim's zero guard), ties to the LOWEST key. Bit-parity with
  * the join + `max(struct(score, −key))` aggregate it replaces: the
  * embedding norm accumulates the same widened elements in the same
  * order as [[L2Norm]], the dot matches [[DotProduct]], and the 6dp
  * round is the BigDecimal HALF_UP recipe Spark's `round` lowers to.
  * A dimension-mismatched candidate scores SQL-null (sorts below
  * everything, lowest key among all-null — the struct-ordering
  * behavior of the old aggregate). Replacing the fan-out join kills
  * the corpus-wide `groupBy(doc_id)` exchange per level (guide §2.4). */
case class NearestCell(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_cell"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      right.dataType match {
        case ArrayType(StructType(fields), _) if fields.length == 3 &&
          fields(0).dataType == IntegerType &&
          (fields(1).dataType match {
            case ArrayType(FloatType, _) => true
            case _ => false
          }) && fields(2).dataType == DoubleType =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName candidates must be array<struct<int, array<float>, " +
            s"double>>, got ${other.catalogString}")
      }
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> embedding, got " +
        other.catalogString)
  }

  private def embIsDouble: Boolean = left.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(e: Any, c: Any): Any =
    CellArgmaxKernel.nearest(e.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], embIsDouble)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, c) =>
      s"${ev.value} = graft.functions.CellArgmaxKernel.nearest($e, $c, $embIsDouble);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The interpreted/codegen-shared argmax loop ([[NearestCell]]). */
object CellArgmaxKernel {

  /** Spark's `round(x, 6)` for doubles: decimal HALF_UP through the
    * canonical string representation (BigDecimal.valueOf). The same
    * recipe rebuildIfDrifted already relies on for engine parity. */
  def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def nearest(emb: ArrayData, cands: ArrayData, embIsDouble: Boolean): Int = {
    val n = emb.numElements()
    val v = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (embIsDouble) emb.getDouble(i) else emb.getFloat(i).toDouble
      v(i) = x; s += x * x; i += 1
    }
    val ne = math.sqrt(s)
    var bestKey = -1
    var bestScore = 0.0
    var bestNull = true
    var first = true
    val m = cands.numElements()
    var j = 0
    while (j < m) {
      val cand = cands.getStruct(j, 3)
      val key = cand.getInt(0)
      val cent = cand.getArray(1)
      val cn = cand.getDouble(2)
      // SQL-null score on dimension mismatch (DotProduct's contract)
      val isNull = cent.numElements() != n
      val score =
        if (isNull) 0.0
        else if (ne == 0.0 || cn == 0.0) 0.0
        else {
          var dot = 0.0
          var t = 0
          while (t < n) { dot += v(t) * cent.getFloat(t).toDouble; t += 1 }
          round6(dot / (ne * cn))
        }
      // ascending-key iteration + strict improvement == the struct
      // ordering of max(struct(score, -key)): null < any value,
      // equal scores keep the lower key
      val better =
        if (first) true
        else if (isNull) false
        else if (bestNull) true
        else score > bestScore
      if (better) { bestKey = key; bestScore = score; bestNull = isNull }
      first = false
      j += 1
    }
    bestKey
  }
}

/** Row-local 64-bit SIMHASH over a token array — E3's fingerprint
  * kernel: every token contributes one ±1 vote per bit, bit k's vote
  * read from hex digit k of md5("a:"+w) (bits 0–31) / md5("b:"+w)
  * (bits 32–63) — digit ≤ '7' votes +1 (here: the nibble's high bit
  * is 0, computed from the raw digest bytes); bit k of the output
  * sets when its vote sum ≥ 0. Bit-identical to the explode +
  * 64-sum-expression aggregation it replaces (integer votes, same
  * per-digit rule) with ZERO exchange and no hex-string
  * materialization. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    HashVoteKernel.simhash(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashVoteKernel.simhash($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The interpreted/codegen-shared vote loop ([[HashVotes]]). A plain
  * top-level object so generated Java reaches it through the static
  * forwarder `graft.functions.HashVoteKernel.votes`. */
object HashVoteKernel {

  // one digest instance per task thread, reset per token — Spark's
  // md5() builds a fresh MessageDigest per call
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def votes(tokens: ArrayData, dim: Int): ArrayData = {
    val v = new Array[Double](dim)
    val md = md5Local.get()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        md.reset()
        val h = md.digest(tokens.getUTF8String(i).getBytes)
        // first 3 digest bytes == first 6 hex digits (0..16777215, so
        // % dim is the non-negative remainder conv+cast produced)
        val bucket =
          (((h(0) & 0xff) << 16) | ((h(1) & 0xff) << 8) | (h(2) & 0xff)) % dim
        // 7th hex digit == high nibble of the 4th byte; '0'..'7' ≤ '7'
        v(bucket) += (if (((h(3) >> 4) & 0xf) <= 7) 1.0 else -1.0)
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(v)
  }

  private val SaltA = "a:".getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private val SaltB = "b:".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Hex digit k of a digest = nibble k (byte k/2, high nibble when k
    * is even); digit ≤ '7' ⇔ the nibble's high bit is 0. */
  private def nibbleVote(h: Array[Byte], k: Int): Int = {
    val nib = if ((k & 1) == 0) (h(k >> 1) >> 4) & 0xf else h(k >> 1) & 0xf
    if ((nib & 0x8) == 0) 1 else -1
  }

  def simhash(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val md = md5Local.get()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val w = tokens.getUTF8String(i).getBytes
        md.reset(); md.update(SaltA); md.update(w)
        val ha = md.digest()
        md.reset(); md.update(SaltB); md.update(w)
        val hb = md.digest()
        var k = 0
        while (k < 32) {
          votes(k) += nibbleVote(ha, k)
          votes(k + 32) += nibbleVote(hb, k)
          k += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < 64) {
      if (votes(k) >= 0) fp |= 1L << k
      k += 1
    }
    fp
  }
}

/** Analysis-time input validation + element accessors for the vector
  * expressions. These are registered as public SQL functions, so they
  * must fail ANALYSIS on non-vector inputs (instead of mis-reading
  * UnsafeArrayData at the wrong stride) and must accept both
  * array<float> and array<double> embeddings — double arrays are the
  * common storage type outside this repo. */
object VectorTypeCheck {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  def numericArray(fn: String, e: Expression): TypeCheckResult =
    if (ok(e.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn requires array<float> or array<double>, got ${e.dataType.catalogString}")

  def twoNumericArrays(fn: String, l: Expression, r: Expression): TypeCheckResult =
    if (!ok(l.dataType)) numericArray(fn, l)
    else numericArray(fn, r)

  /** Interpreted-path element accessor widened to double. */
  def getter(dt: DataType): (ArrayData, Int) => Double = dt match {
    case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
    case _ => (a, i) => a.getFloat(i).toDouble
  }

  /** Codegen element accessor widened to double. */
  def genGetter(dt: DataType, arr: String, i: String): String = dt match {
    case ArrayType(DoubleType, _) => s"$arr.getDouble($i)"
    case _ => s"(double) $arr.getFloat($i)"
  }
}
