package graft

import scala.io.Source

import graft.search.{PostingAlgebra, QueryParser}

/** Differential-test runner: speaks the same stdin protocol as the
  * reference-evaluator driver used in development (S stopword / T term
  * postingList / Q query / R reset) and prints `= type`, `docId score`
  * lines, `---` per query — so outputs diff directly against the
  * reference `util.QueryParser` evaluator compiled from
  * /root/reference. Pure JVM, no Spark session.
  */
object DiffHarness {
  def main(args: Array[String]): Unit = {
    var stop = Set.empty[String]
    var terms = Map.empty[String, Vector[PostingAlgebra.Posting]]
    val out = new StringBuilder
    for (line <- Source.stdin.getLines() if line.nonEmpty) {
      val rest = if (line.length > 2) line.substring(2) else ""
      line.charAt(0) match {
        case 'R' => stop = Set.empty; terms = Map.empty
        case 'S' => stop += rest
        case 'T' =>
          val sp = rest.indexOf(' ')
          terms += rest.substring(0, sp) ->
            PostingAlgebra.parsePostingList(rest.substring(sp + 1))
        case 'Q' =>
          try {
            val ast = new QueryParser(stop).parse(rest)
            val w = PostingAlgebra.evaluate(ast, terms)
            out.append("= ").append(w.tpe).append('\n')
            PostingAlgebra.rank(w).foreach(p =>
              out.append(p.docId).append(' ')
                .append(f"${p.score}%.6f").append('\n'))
          } catch {
            case t: Throwable =>
              out.append("= CRASH ").append(t.getClass.getSimpleName).append('\n')
          }
          out.append("---\n")
        case _ => ()
      }
    }
    print(out)
  }
}
