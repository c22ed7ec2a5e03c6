package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC / NFD / NFKC / NFKD) as a native codegen
  * expression — Spark ships no normalization builtin, yet it is the
  * FIRST text-canonicalization step a dedup pipeline needs: the same
  * visible text arrives precomposed ("é", U+00E9) from one crawler and
  * decomposed ("e"+U+0301) from another, and every downstream
  * fingerprint/minhash/containment gate sees them as different
  * documents unless the bytes are canonicalized first. NFKC
  * additionally folds compatibility forms (fullwidth ASCII, ligatures
  * — the CJK-corpus cleanup case).
  *
  * Wraps `java.text.Normalizer` (ICU-equivalent, part of the JVM — no
  * dependency) behind a whole-row compiled call; the form argument is
  * a foldable literal resolved once. Composition of Latin combining
  * sequences is stable across Unicode versions, which is what makes
  * the DuckDB `nfc_normalize` oracle byte-exact.
  */
case class UnicodeNormalize(text: Expression, form: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(text, form)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): UnicodeNormalize =
    copy(text = newChildren(0), form = newChildren(1))

  override def nullable: Boolean = true
  override def foldable: Boolean = text.foldable
  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = text.dataType == StringType &&
      form.dataType == StringType && form.foldable
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "graft_unicode_normalize expects (string text, constant string form " +
        "in {NFC, NFD, NFKC, NFKD}), got (" +
        Seq(text, form).map(_.dataType.simpleString).mkString(", ") + ")")
  }

  @transient private lazy val formVal: java.text.Normalizer.Form = {
    val s = String.valueOf(form.eval())
    try java.text.Normalizer.Form.valueOf(s)
    catch { case _: IllegalArgumentException =>
      throw new IllegalArgumentException(
        s"graft_unicode_normalize: unknown form '$s' " +
          "(expected NFC, NFD, NFKC, or NFKD)")
    }
  }

  /** Whole-row normalize — public so generated code can call it. */
  def doNormalize(u: UTF8String): UTF8String = {
    val s = u.toString
    // fast path: pure ASCII is normalized under every form
    var ascii = true
    var i = 0
    while (ascii && i < s.length) { ascii = s.charAt(i) < 0x80; i += 1 }
    if (ascii) u
    else UTF8String.fromString(java.text.Normalizer.normalize(s, formVal))
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val t = text.eval(input)
    if (t == null) null else doNormalize(t.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("unorm", this, classOf[UnicodeNormalize].getName)
    val childGen = text.genCode(ctx)
    val code =
      code"""
         |${childGen.code}
         |boolean ${ev.isNull} = ${childGen.isNull};
         |UTF8String ${ev.value} = null;
         |if (!${ev.isNull}) {
         |  ${ev.value} = $self.doNormalize(${childGen.value});
         |}
       """
    ev.copy(code = code)
  }
}
