package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{Block, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the md5-derived hash recipes
  * (SURVEY.md §2.11 discipline: custom surface = codegen'd expressions,
  * zero row UDFs).
  *
  * The engine's cross-engine-portable randomness convention is "hex
  * substring of md5, parsed as an integer" (`conv(substring(md5(x), a, b),
  * 16, 10)` ≡ DuckDB `('0x'||hex)::BIGINT`). The built-in formulation pays,
  * per row: a string concat, the md5 HEX STRING materialization (digest →
  * 32-char UTF8), one `substring` + one `conv` (hex→decimal string→cast)
  * per derived value, and — for the replica fan-outs — nested higher-order
  * `transform`/`flatten` lambdas whose dispatch is interpreted per element.
  * At B replicas per row (bootstrap/permutation) or k permutations per
  * shingle (MinHash) that chain IS the workload.
  *
  * These expressions compute the identical values from the raw digest
  * bytes in one tight kernel: hex chars [8c, 8c+8) of the md5 hex string
  * are exactly digest bytes [4c, 4c+4) read big-endian unsigned, so
  * `conv(substring(md5(s), 8c+1, 8), 16, 10)` == `(d[4c]&0xff)<<24 | ... |
  * d[4c+3]&0xff` — bit-identical, pinned by differential property tests
  * (HashExpressionsSpec) against the built-in formulation, so every DuckDB
  * oracle is unaffected.
  */
object HashExpressions {

  private val Two32 = 4294967296.0 // 2^32

  /** Kernel bounds, SHARED with the call sites (r16 advice: Stats.
    * permutationTest's `replicas <= 4096` mapped to `groups = 1024`
    * exactly at the [[Md5ChunkUniforms]] boundary — an implicit coupling
    * that could silently drift). One md5 digest yields 4 independent
    * 32-bit values, so `MaxPerms = 4 * MaxGroups` by construction.
    */
  val MaxGroups: Int = 1024
  val MaxPerms: Int = 4 * MaxGroups

  /** Column form of [[Md5HexLong]]:
    * ≡ `conv(substring(md5(s), start, len), 16, 10).cast("long")`.
    */
  def md5HexLong(s: org.apache.spark.sql.Column, start: Int,
                 len: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.CatalystBridge.column(Md5HexLong(
      org.apache.spark.sql.graft.CatalystBridge.expression(s), start, len))

  private def digestInto(md: java.security.MessageDigest,
                         prefix: Array[Byte], sep: Byte,
                         suffix: Array[Byte]): Array[Byte] = {
    md.reset()
    md.update(prefix)
    md.update(sep)
    md.update(suffix)
    md.digest()
  }

  private def ascii(i: Int): Array[Byte] =
    String.valueOf(i).getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Kernel for [[Md5ChunkUniforms]]: element 4g+c =
    * unsignedBigEndianInt(md5(key ++ ":" ++ decimal(g)) bytes [4c,4c+4)) / 2³².
    */
  def chunkUniforms(key: UTF8String, groups: Int): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val keyBytes = key.getBytes
    val out = new Array[Double](groups * 4)
    var g = 0
    while (g < groups) {
      val d = digestInto(md, keyBytes, ':'.toByte, ascii(g))
      var c = 0
      while (c < 4) {
        val v = ((d(4 * c) & 0xffL) << 24) | ((d(4 * c + 1) & 0xffL) << 16) |
          ((d(4 * c + 2) & 0xffL) << 8) | (d(4 * c + 3) & 0xffL)
        out(4 * g + c) = v.toDouble / Two32
        c += 1
      }
      g += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** `md5_chunk_uniforms(key string, groups int) → array<double>` of length
    * `4·groups`: element `4g+c` is the [0,1) uniform the engine's replica
    * recipe derives as `conv(substring(md5(concat(key, ':', g)), 8c+1, 8),
    * 16, 10) / 4294967296.0` ([[graft.ops.Stats.bootstrapMeanCi]] /
    * [[graft.ops.Stats.permutationTest]]). A NULL key yields an array of
    * `4·groups` NULL elements — exactly what the built-in chain produces
    * (concat(null,…) → null md5 → null conv), so a downstream
    * `posexplode` keeps the same rows and CASE layers take the same
    * branches. `groups` must be a foldable positive int.
    */
  case class Md5ChunkUniforms(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
    override def nullable: Boolean = false
    override def prettyName: String = "md5_chunk_uniforms"

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (StringType, IntegerType) if right.foldable =>
          // Validate the folded VALUE here too, so a bad bound surfaces as
          // an analysis-time TypeCheckFailure instead of a raw
          // IllegalArgumentException at codegen/execution (r16 advice).
          val g = right.eval(null).asInstanceOf[Int]
          if (g > 0 && g <= MaxGroups) TypeCheckResult.TypeCheckSuccess
          else TypeCheckResult.TypeCheckFailure(
            s"$prettyName: groups must be in [1, $MaxGroups], got $g")
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (string, foldable int), got " +
            s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
      }

    private lazy val groups: Int = {
      val g = right.eval(null).asInstanceOf[Int]
      require(g > 0 && g <= MaxGroups,
        s"$prettyName: groups in [1, $MaxGroups], got $g")
      g
    }

    /** Null key → array of null elements (same rows survive posexplode). */
    def nullArray: ArrayData = new GenericArrayData(new Array[Any](groups * 4))

    override def eval(input: InternalRow): Any = {
      val k = left.eval(input)
      if (k == null) nullArray
      else chunkUniforms(k.asInstanceOf[UTF8String], groups)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val kE = left.genCode(ctx)
      val self = ctx.addReferenceObj("md5ChunkUniforms", this,
        classOf[Md5ChunkUniforms].getName)
      val code =
        s"""
           |${kE.code}
           |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value};
           |if (${kE.isNull}) {
           |  ${ev.value} = $self.nullArray();
           |} else {
           |  ${ev.value} = graft.functions.HashExpressions.chunkUniforms(
           |    ${kE.value}, $groups);
           |}
         """.stripMargin
      ev.copy(code = Block.BlockHelper(new StringContext(code)).code(),
        isNull = FalseLiteral)
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Md5ChunkUniforms = copy(left = l, right = r)
  }

  /** Kernel for [[Md5PermHexes]]: element p (0-based) = hex chars
    * [8·(p mod 4), 8·(p mod 4)+8) of md5(decimal(p div 4) ++ ":" ++ s) —
    * the chunked MinHash permutation hash ([[graft.ops.Dedup]]): one md5
    * per group of four permutations, emitted as the LOWERCASE 8-char hex
    * string the relational formulation min-aggregates.
    */
  def permHexes(s: UTF8String, k: Int): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val sBytes = s.getBytes
    val hexd = "0123456789abcdef".getBytes
    val nGroups = (k + 3) / 4
    val out = new Array[Any](k)
    var g = 0
    while (g < nGroups) {
      val d = digestInto(md, ascii(g), ':'.toByte, sBytes)
      var c = 0
      while (c < 4 && g * 4 + c < k) {
        val hex = new Array[Byte](8)
        var i = 0
        while (i < 4) {
          val b = d(4 * c + i) & 0xff
          hex(2 * i) = hexd(b >>> 4)
          hex(2 * i + 1) = hexd(b & 0xf)
          i += 1
        }
        out(g * 4 + c) = UTF8String.fromBytes(hex)
        c += 1
      }
      g += 1
    }
    new GenericArrayData(out)
  }

  /** `md5_perm_hexes(shingle string, k int) → array<string>` of k 8-char
    * hex strings: element p is `substring(md5(concat(p div 4, ':', s)),
    * 1 + 8·(p mod 4), 8)` — the [[graft.ops.Dedup.permMinima]] permutation
    * hash for shingle `s`, all k permutations in one call (⌈k/4⌉ digests,
    * no hex-string round-trip, no double explode). NULL shingle → array of
    * k NULL elements (posexplode row survival matches the built-in chain).
    */
  case class Md5PermHexes(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = ArrayType(StringType, containsNull = true)
    override def nullable: Boolean = false
    override def prettyName: String = "md5_perm_hexes"

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (StringType, IntegerType) if right.foldable =>
          // Analysis-time value validation (r16 advice) — see
          // Md5ChunkUniforms.
          val v = right.eval(null).asInstanceOf[Int]
          if (v > 0 && v <= MaxPerms) TypeCheckResult.TypeCheckSuccess
          else TypeCheckResult.TypeCheckFailure(
            s"$prettyName: k must be in [1, $MaxPerms], got $v")
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (string, foldable int), got " +
            s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
      }

    private lazy val k: Int = {
      val v = right.eval(null).asInstanceOf[Int]
      require(v > 0 && v <= MaxPerms, s"$prettyName: k in [1, $MaxPerms], got $v")
      v
    }

    def nullArray: ArrayData = new GenericArrayData(new Array[Any](k))

    override def eval(input: InternalRow): Any = {
      val s = left.eval(input)
      if (s == null) nullArray
      else permHexes(s.asInstanceOf[UTF8String], k)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val sE = left.genCode(ctx)
      val self = ctx.addReferenceObj("md5PermHexes", this,
        classOf[Md5PermHexes].getName)
      val code =
        s"""
           |${sE.code}
           |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value};
           |if (${sE.isNull}) {
           |  ${ev.value} = $self.nullArray();
           |} else {
           |  ${ev.value} = graft.functions.HashExpressions.permHexes(
           |    ${sE.value}, $k);
           |}
         """.stripMargin
      ev.copy(code = Block.BlockHelper(new StringContext(code)).code(),
        isNull = FalseLiteral)
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Md5PermHexes = copy(left = l, right = r)
  }

  /** `md5_hex_long(s, start, len)` ≡ `conv(substring(md5(s), start, len),
    * 16, 10) cast long` for a constant 1-based `start` and `len ≤ 15`
    * (≤ 60 bits, no Long overflow — the engine's recipes use ≤ 12):
    * the single-value form of the kernel family, for the word/id hash
    * call sites ([[TextFunctions.wordCode24]], sampling, packing). NULL
    * in → NULL out, matching the built-in chain.
    */
  case class Md5HexLong(child: Expression, startHex: Int, lenHex: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

    require(startHex >= 1 && lenHex >= 1 && startHex + lenHex <= 33 &&
      lenHex <= 15, s"md5_hex_long: need 1 ≤ start, start+len ≤ 33, len ≤ 15")

    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "md5_hex_long"

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects string, got ${t.simpleString}")
      }

    override protected def nullSafeEval(input: Any): Any =
      HashExpressions.hexLong(input.asInstanceOf[UTF8String], startHex, lenHex)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = graft.functions.HashExpressions.hexLong($s, $startHex, $lenHex);")

    override protected def withNewChildInternal(c: Expression): Md5HexLong =
      copy(child = c)
  }

  /** Kernel for [[Md5HexLong]]: value of md5-hex chars [start, start+len)
    * (1-based start) as an unsigned Long — nibble `i` of the digest is hex
    * char `i` of the hex string.
    */
  def hexLong(s: UTF8String, startHex: Int, lenHex: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.reset()
    md.update(s.getBytes)
    val d = md.digest()
    var v = 0L
    var i = startHex - 1
    val end = startHex - 1 + lenHex
    while (i < end) {
      val b = d(i >>> 1) & 0xff
      val nib = if ((i & 1) == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }
}
