#!/usr/bin/env bash
# Differential test: graft's query algebra vs the COMPILED reference
# evaluator, over random CNF queries. One command:
#
#   sbt -batch compile && bash tools/run_diff_harness.sh
#
# Stages the reference's QueryParser/PostingList/Stemmer into /tmp
# (compiled for TESTING only — never linked into the library), wraps
# them in a protocol driver, runs 3 seeds x 200 cases through both
# sides, and classifies every difference. Expected result: zero
# structural diffs; the only diffs are proximity scores (the reference's
# skip-walk returns non-minimal distances — see README "deviations")
# and the order flips those score changes cause.
set -euo pipefail
cd "$(dirname "$0")/.."
WORK=/tmp/refdiff
mkdir -p "$WORK/util"
cp /root/reference/hadoop_wiki_search/util/{QueryParser,PostingList,Stemmer}.java "$WORK/util/"

cat > "$WORK/RefDriver.java" <<'EOF'
import java.io.BufferedReader;
import java.io.InputStreamReader;
import java.util.HashMap;
import java.util.Map;
import util.PostingList;
import util.PostingList.Posting;
import util.QueryParser;

/** Protocol driver around the reference evaluator: R reset /
 * S stopword / T term postingList / Q query -> "= type", "docId score"
 * (score-desc stable sort), "---". */
public class RefDriver {
  public static void main(String[] args) throws Exception {
    BufferedReader in = new BufferedReader(new InputStreamReader(System.in));
    Map<String, PostingList> terms = new HashMap<>();
    StringBuilder out = new StringBuilder();
    String line;
    while ((line = in.readLine()) != null) {
      if (line.isEmpty()) continue;
      String rest = line.length() > 2 ? line.substring(2) : "";
      switch (line.charAt(0)) {
        case 'R': QueryParser.STOP_WORD_SET.clear(); terms.clear(); break;
        case 'S': QueryParser.STOP_WORD_SET.add(rest); break;
        case 'T': {
          int sp = rest.indexOf(' ');
          terms.put(rest.substring(0, sp), new PostingList(rest.substring(sp + 1)));
          break;
        }
        case 'Q':
          try {
            QueryParser parser = new QueryParser();
            QueryParser.Query q = parser.parseQuery(rest);
            QueryParser.PostingListWrapper w = q.evaluate(terms);
            w.list.sortPostingByScore();
            out.append("= ").append(typeOf(w)).append('\n');
            for (Posting p : w.list.getPosting())
              out.append(p.getDocId()).append(' ')
                 .append(String.format("%.6f", p.getScore())).append('\n');
          } catch (Throwable t) {
            out.append("= CRASH ").append(t.getClass().getSimpleName()).append('\n');
          }
          out.append("---\n");
          break;
        default: break;
      }
    }
    System.out.print(out);
  }

  // PostingListWrapper.type is package-private; reflect so the
  // reference source stays byte-identical
  private static int typeOf(QueryParser.PostingListWrapper w) throws Exception {
    java.lang.reflect.Field f =
        QueryParser.PostingListWrapper.class.getDeclaredField("type");
    f.setAccessible(true);
    return f.getInt(w);
  }
}
EOF

(cd "$WORK" && javac -cp "/opt/spark/jars/*" util/*.java RefDriver.java)

for seed in 7 101 4242; do
  python3 tools/gen_diff_cases.py "$seed" 200 > "$WORK/cases_$seed.txt"
  java --add-opens=java.base/java.lang=ALL-UNNAMED -cp "$WORK:/opt/spark/jars/*" \
    RefDriver < "$WORK/cases_$seed.txt" 2>/dev/null \
    | grep -E '^(= |---$|-?[0-9]+ (-?[0-9.]+|-?Infinity|NaN)$)' > "$WORK/ref_$seed.out"
  java -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.DiffHarness \
    < "$WORK/cases_$seed.txt" > "$WORK/mine_$seed.out"
done

python3 - "$WORK" <<'EOF'
import sys
work = sys.argv[1]
total_q = 0; score_only = 0; order_flips = 0; structural = 0
for seed in (7, 101, 4242):
    ref = open(f'{work}/ref_{seed}.out').read().strip().split('---')
    mine = open(f'{work}/mine_{seed}.out').read().strip().split('---')
    assert len(ref) == len(mine), (seed, len(ref), len(mine))
    for rb, mb in zip(ref, mine):
        rl = [l for l in rb.strip().split('\n') if l]
        ml = [l for l in mb.strip().split('\n') if l]
        if not rl and not ml: continue
        total_q += 1
        if rl == ml: continue
        if len(rl) != len(ml) or rl[0] != ml[0]:
            structural += 1; continue
        rdocs = [l.split()[0] for l in rl[1:]]
        mdocs = [l.split()[0] for l in ml[1:]]
        if rdocs == mdocs:
            score_only += sum(1 for a, b in zip(rl[1:], ml[1:]) if a != b)
        elif sorted(rdocs) == sorted(mdocs):
            order_flips += 1
        else:
            structural += 1
print(f"queries={total_q} structural={structural} "
      f"order_flips={order_flips} proximity_score_diffs={score_only}")
assert structural == 0, "STRUCTURAL DIFFS FOUND"
print("PARITY OK (modulo the documented proximity-walk deviation)")
EOF
