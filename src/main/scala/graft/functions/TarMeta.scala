package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Typed metadata extraction for TAR archive columns: walk the ustar
  * 512-byte header blocks of a payload into `struct<format string,
  * n_members int, n_files int, data_bytes bigint, first_name string>`,
  * or null for unrecognized or malformed bytes.
  *
  * Why TAR: web-scale multimodal training data ships as TAR shards
  * (the WebDataset convention — one shard holds thousands of
  * (sample.jpg, sample.json, …) member pairs), and the FIRST thing an
  * ingest pipeline does with a shard is list members without
  * extracting — exactly a header walk. Same posture as [[AudioMeta]]
  * (the §2.6 multimodal contract): no archive library, codegen'd per
  * row, and the typed metadata is what a pipeline partitions/filters
  * on (drop truncated or undersized shards before any member decode).
  *
  * Strictness: a payload either walks CLEANLY to the end-of-archive
  * marker (or payload end) or returns null — a lying size field, a
  * checksum mismatch, or a non-octal size makes the whole payload
  * unrecognized rather than half-parsed (drop-beats-corrupt, the
  * streaming twins' tradeoff applied to ingest).
  */
case class TarMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("n_members", IntegerType, nullable = false),
    StructField("n_files", IntegerType, nullable = false),
    StructField("data_bytes", LongType, nullable = false),
    StructField("first_name", StringType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tar_meta"

  override protected def nullSafeEval(input: Any): Any =
    TarMeta.parse(input.asInstanceOf[Array[Byte]])

  // nullSafeCodeGen (not defineCodeGen): the helper may return null for
  // unrecognized payloads, which must flip isNull.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.TarMeta.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): TarMeta =
    copy(child = newChild)
}

/** Per-member listing of a TAR payload: `array<struct<name string,
  * offset bigint, size bigint>>` with `offset` pointing at the member's
  * DATA (not its header) — the random-access index a WebDataset-style
  * serving layer builds once so a trainer can range-read single samples
  * out of a multi-GB shard without streaming it. Same strictness
  * contract as [[TarMeta]]: malformed input ⇒ null, never a partial
  * index (an index with a wrong offset corrupts silently at read time —
  * the worst failure mode a serving path has). */
case class TarMembers(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("size", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tar_members"

  override protected def nullSafeEval(input: Any): Any =
    TarMeta.members(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.TarMeta.members($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): TarMembers =
    copy(child = newChild)
}

object TarMeta {

  /** Build a valid ustar archive from (name, bytes) members — the
    * WRITE side of the shard lifecycle ([[parse]] is the read side):
    * POSIX headers with correct octal size fields and the
    * spaces-for-checksum unsigned sum, 512-padded member data, and the
    * two-zero-block end marker. Member order is the caller's (sort for
    * determinism). Used by mm_shard_roundtrip; MultimodalSpec pins
    * [[parse]] against its own INDEPENDENT handcrafted bytes so the
    * pair cannot co-drift. */
  def write(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { case (name, data) =>
      val nameBytes = name.getBytes("UTF-8")
      // The classic ustar name field is 100 bytes; silently truncating
      // (what a naive copy does) can collide two members' names and
      // corrupt every index built over the shard — fail loudly instead
      // (the prefix-field extension is deliberately not implemented;
      // shard member names are writer-controlled and short).
      require(nameBytes.length <= 100,
        s"tar member name exceeds 100 bytes: $name")
      val h = new Array[Byte](512)
      nameBytes.copyToArray(h, 0)
      "0000644\u0000".getBytes.copyToArray(h, 100)
      "0000000\u0000".getBytes.copyToArray(h, 108)
      "0000000\u0000".getBytes.copyToArray(h, 116)
      ("%011o".format(data.length) + "\u0000").getBytes.copyToArray(h, 124)
      "00000000000\u0000".getBytes.copyToArray(h, 136)
      h(156) = '0'.toByte
      "ustar\u000000".getBytes.copyToArray(h, 257)
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      val sum = h.map(_ & 0xff).sum
      ("%06o".format(sum) + "\u0000 ").getBytes.copyToArray(h, 148)
      out.write(h)
      out.write(data)
      val pad = (512 - data.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  /** Octal ASCII field at [i, i+len): digits until NUL or space.
    * Returns -1 for empty or non-octal content (malformed header). */
  private def octal(b: Array[Byte], i: Int, len: Int): Long = {
    var v = 0L
    var j = i
    var seen = false
    // leading spaces are legal padding in some writers
    while (j < i + len && b(j) == ' '.toByte) j += 1
    while (j < i + len && b(j) != 0 && b(j) != ' '.toByte) {
      val c = b(j) - '0'.toByte
      if (c < 0 || c > 7) return -1L
      v = (v << 3) | c
      seen = true
      j += 1
    }
    if (seen) v else -1L
  }

  private def isZeroBlock(b: Array[Byte], i: Int): Boolean = {
    var j = i
    while (j < i + 512) { if (b(j) != 0) return false; j += 1 }
    true
  }

  /** Header checksum: unsigned byte sum with the checksum field
    * (148..156) counted as eight spaces. */
  private def checksumOk(b: Array[Byte], i: Int): Boolean = {
    val stored = octal(b, i + 148, 8)
    if (stored < 0) return false
    var s = 0L
    var j = 0
    while (j < 512) {
      s += (if (j >= 148 && j < 156) 32 else b(i + j) & 0xff)
      j += 1
    }
    s == stored
  }

  /** ustar magic at 257: "ustar" then NUL (POSIX) or space (old GNU). */
  private def magicOk(b: Array[Byte], i: Int): Boolean =
    b(i + 257) == 'u'.toByte && b(i + 258) == 's'.toByte &&
      b(i + 259) == 't'.toByte && b(i + 260) == 'a'.toByte &&
      b(i + 261) == 'r'.toByte &&
      (b(i + 262) == 0 || b(i + 262) == ' '.toByte)

  /** Member index (regular files only): (name, data offset, size) per
    * member, or null for payloads that are not a clean tar archive —
    * the [[TarMembers]] walker, sharing [[parse]]'s validation. */
  def members(b: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (b.length < 512 || !magicOk(b, 0) || !checksumOk(b, 0)) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0L
    var ended = false
    while (!ended && i + 512 <= b.length) {
      val h = i.toInt
      if (isZeroBlock(b, h)) { ended = true }
      else {
        if (!magicOk(b, h) || !checksumOk(b, h)) return null
        val size = octal(b, h + 124, 12)
        if (size < 0) return null
        val tf = b(h + 156)
        if (tf == 0 || tf == '0'.toByte) {
          var e = h
          while (e < h + 100 && b(e) != 0) e += 1
          out += new GenericInternalRow(Array[Any](
            UTF8String.fromString(new String(b, h, e - h, "UTF-8")),
            i + 512L, size))
        }
        i = i + 512L + ((size + 511L) / 512L) * 512L
        if (i > b.length) return null
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Returns null for payloads that are not a clean tar archive. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b.length < 512 || !magicOk(b, 0) || !checksumOk(b, 0)) return null
    var i = 0L
    var members = 0
    var files = 0
    var dataBytes = 0L
    var firstName: String = null
    var ended = false
    while (!ended && i + 512 <= b.length) {
      val h = i.toInt
      if (isZeroBlock(b, h)) { ended = true }
      else {
        if (!magicOk(b, h) || !checksumOk(b, h)) return null
        val size = octal(b, h + 124, 12)
        if (size < 0) return null
        if (firstName == null) {
          var e = h
          while (e < h + 100 && b(e) != 0) e += 1
          firstName = new String(b, h, e - h, "UTF-8")
        }
        members += 1
        val tf = b(h + 156)
        if (tf == 0 || tf == '0'.toByte) { files += 1; dataBytes += size }
        // advance in LONG: a lying 11-digit octal size (up to 8 GiB-1)
        // times a chain of members overflows Int, which would wrap the
        // index negative and re-read below the walk (the AudioMeta
        // RIFF-walk overflow class)
        i = i + 512L + ((size + 511L) / 512L) * 512L
        if (i > b.length) return null // truncated member data
      }
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString("tar"), members, files, dataBytes,
      if (firstName == null) null else UTF8String.fromString(firstName)))
  }
}
