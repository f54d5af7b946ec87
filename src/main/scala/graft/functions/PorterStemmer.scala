package graft.functions

/** Porter stemming algorithm (Porter 1980, "An algorithm for suffix
  * stripping", Program 14(3) pp 130-137).
  *
  * Behavioral contract: matches the reference engine's vendored stemmer
  * (reference `util/Stemmer.java`, tartarus release 4) including its two
  * published bug fixes (the `k == 0` guards in steps 3/5 and the `j >= 0`
  * guard on `-ion`). Words of length <= 2 are returned unchanged, exactly
  * as the reference's `stem()` only runs when `k > 1`.
  *
  * Used at index build time (reference `code/inverted/InvertedIndexMapred
  * .java:78-80`) and on query terms (reference `code/query/QueryMapred
  * .java:73-75`, `util/QueryParser.java:362-365`).
  */
object PorterStemmer {

  def stem(word: String): String = {
    if (word.length < 3) return word
    val st = new State(word.toCharArray)
    st.run()
    new String(st.b, 0, st.k + 1)
  }

  /** Mutable working state over the word buffer. `k` is the index of the
    * last live character; `j` marks the end of the stem once a suffix has
    * been matched by `ends`.
    */
  private final class State(val b: Array[Char]) {
    var k: Int = b.length - 1
    var j: Int = 0

    def run(): Unit = { step1(); step2(); step3(); step4(); step5(); step6() }

    /** True when b(i) is a consonant; 'y' is a consonant only when it is
      * word-initial or follows a vowel.
      */
    private def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y'                         => if (i == 0) true else !cons(i - 1)
      case _                           => true
    }

    /** Measure: the number of vowel->consonant transitions in b(0..j),
      * i.e. m such that the stem has the form C?(VC){m}V?.
      */
    private def m(): Int = {
      var n = 0
      var i = 0
      while (i <= j && cons(i)) i += 1 // optional leading C run
      if (i > j) return n
      i += 1
      while (true) {
        while (i <= j && !cons(i)) i += 1 // rest of the V run
        if (i > j) return n
        i += 1
        n += 1
        while (i <= j && cons(i)) i += 1 // rest of the C run
        if (i > j) return n
        i += 1
      }
      n
    }

    private def vowelInStem(): Boolean = {
      var i = 0
      while (i <= j) { if (!cons(i)) return true; i += 1 }
      false
    }

    /** b(i-1) and b(i) are the same consonant. */
    private def doubleC(i: Int): Boolean =
      i >= 1 && b(i) == b(i - 1) && cons(i)

    /** b(i-2..i) is consonant-vowel-consonant and the final consonant is
      * not w, x, or y — the "short word" test used to restore a final e.
      */
    private def cvc(i: Int): Boolean = {
      if (i < 2 || !cons(i) || cons(i - 1) || !cons(i - 2)) return false
      val ch = b(i)
      ch != 'w' && ch != 'x' && ch != 'y'
    }

    /** True when the live word ends with s; on success j := k - s.length. */
    private def ends(s: String): Boolean = {
      val l = s.length
      val o = k - l + 1
      if (o < 0) return false
      var i = 0
      while (i < l) {
        if (b(o + i) != s.charAt(i)) return false
        i += 1
      }
      j = k - l
      true
    }

    /** Replace the matched suffix (b(j+1..k)) with s. */
    private def setTo(s: String): Unit = {
      var i = 0
      while (i < s.length) { b(j + 1 + i) = s.charAt(i); i += 1 }
      k = j + s.length
    }

    private def replaceIfMeasure(s: String): Unit = if (m() > 0) setTo(s)

    /** Plurals and -ed / -ing. */
    private def step1(): Unit = {
      if (b(k) == 's') {
        if (ends("sses")) k -= 2
        else if (ends("ies")) setTo("i")
        else if (b(k - 1) != 's') k -= 1
      }
      if (ends("eed")) {
        if (m() > 0) k -= 1
      } else if ((ends("ed") || ends("ing")) && vowelInStem()) {
        k = j
        if (ends("at")) setTo("ate")
        else if (ends("bl")) setTo("ble")
        else if (ends("iz")) setTo("ize")
        else if (doubleC(k)) {
          k -= 1
          val ch = b(k)
          if (ch == 'l' || ch == 's' || ch == 'z') k += 1
        } else if (m() == 1 && cvc(k)) setTo("e")
      }
    }

    /** Terminal y -> i when the stem contains another vowel. */
    private def step2(): Unit =
      if (ends("y") && vowelInStem()) b(k) = 'i'

    /** Double suffixes to single ones (-ization -> -ize, ...); the stem
      * before the suffix must have m() > 0.
      */
    private def step3(): Unit = {
      if (k == 0) return
      b(k - 1) match {
        case 'a' =>
          if (ends("ational")) replaceIfMeasure("ate")
          else if (ends("tional")) replaceIfMeasure("tion")
        case 'c' =>
          if (ends("enci")) replaceIfMeasure("ence")
          else if (ends("anci")) replaceIfMeasure("ance")
        case 'e' =>
          if (ends("izer")) replaceIfMeasure("ize")
        case 'l' =>
          if (ends("bli")) replaceIfMeasure("ble")
          else if (ends("alli")) replaceIfMeasure("al")
          else if (ends("entli")) replaceIfMeasure("ent")
          else if (ends("eli")) replaceIfMeasure("e")
          else if (ends("ousli")) replaceIfMeasure("ous")
        case 'o' =>
          if (ends("ization")) replaceIfMeasure("ize")
          else if (ends("ation")) replaceIfMeasure("ate")
          else if (ends("ator")) replaceIfMeasure("ate")
        case 's' =>
          if (ends("alism")) replaceIfMeasure("al")
          else if (ends("iveness")) replaceIfMeasure("ive")
          else if (ends("fulness")) replaceIfMeasure("ful")
          else if (ends("ousness")) replaceIfMeasure("ous")
        case 't' =>
          if (ends("aliti")) replaceIfMeasure("al")
          else if (ends("iviti")) replaceIfMeasure("ive")
          else if (ends("biliti")) replaceIfMeasure("ble")
        case 'g' =>
          if (ends("logi")) replaceIfMeasure("log")
        case _ => ()
      }
    }

    /** -icate, -ful, -ness, ... */
    private def step4(): Unit = b(k) match {
      case 'e' =>
        if (ends("icate")) replaceIfMeasure("ic")
        else if (ends("ative")) replaceIfMeasure("")
        else if (ends("alize")) replaceIfMeasure("al")
      case 'i' =>
        if (ends("iciti")) replaceIfMeasure("ic")
      case 'l' =>
        if (ends("ical")) replaceIfMeasure("ic")
        else if (ends("ful")) replaceIfMeasure("")
      case 's' =>
        if (ends("ness")) replaceIfMeasure("")
      case _ => ()
    }

    /** -ant, -ence, ... stripped when the stem has m() > 1. */
    private def step5(): Unit = {
      if (k == 0) return
      val matched = b(k - 1) match {
        case 'a' => ends("al")
        case 'c' => ends("ance") || ends("ence")
        case 'e' => ends("er")
        case 'i' => ends("ic")
        case 'l' => ends("able") || ends("ible")
        case 'n' => ends("ant") || ends("ement") || ends("ment") || ends("ent")
        case 'o' => (ends("ion") && j >= 0 && (b(j) == 's' || b(j) == 't')) || ends("ou")
        case 's' => ends("ism")
        case 't' => ends("ate") || ends("iti")
        case 'u' => ends("ous")
        case 'v' => ends("ive")
        case 'z' => ends("ize")
        case _   => false
      }
      if (matched && m() > 1) k = j
    }

    /** Remove a final -e when m() > 1 (or m() == 1 and not cvc), and map
      * a final -ll to -l when m() > 1.
      */
    private def step6(): Unit = {
      j = k
      if (b(k) == 'e') {
        val a = m()
        if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
      }
      if (b(k) == 'l' && doubleC(k) && m() > 1) k -= 1
    }
  }
}

/** The stemming kernel behind [[PorterStem]], shipped to executors as
  * a codegen reference object (the [[NfcKernel]] pattern). Fast path:
  * when stemming changes nothing (short tokens, already-stemmed words,
  * numbers) the ORIGINAL UTF8String is returned — no re-encode.
  */
final class PorterStemKernel extends Serializable {
  def stem(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    val out = PorterStemmer.stem(str)
    if (out == str) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(out)
  }
}

/** `STRING -> STRING` Porter stemming as a native Catalyst expression.
  * The stemmer runs once per TOKEN of the whole corpus in the postings
  * build — the hottest scalar call in the engine — so it must live
  * INSIDE whole-stage codegen rather than behind a `ScalaUDF` (which
  * pays a UTF8String→String→UTF8String conversion plus the null-
  * wrapper closure per row and blocks expression-level optimizations).
  * Also registered as `graft_stem` in SQL via [[graft.GraftExtensions]].
  */
case class PorterStem(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{DataType, NullType, StringType}

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType] || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_stem requires a STRING argument, got ${child.dataType.sql}")

  @transient private lazy val kernel = new PorterStemKernel

  override def nullSafeEval(v: Any): Any =
    kernel.stem(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val k = ctx.addReferenceObj("stemKernel", kernel,
        classOf[PorterStemKernel].getName)
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $k.stem($c);"
    })

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)
}

object PorterStem {
  /** Column-API entry point. */
  def stemCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      PorterStem(org.apache.spark.sql.GraftSqlBridge.expression(c)))
}
