#!/usr/bin/env python3
"""Generate random differential-test cases for the query evaluator.

Protocol: R / S word / T term list / Q query. Each case resets state,
defines a random index (term -> docId:score:deltaPositions posting
list), optional stop words, and several random CNF queries. Shapes that
crash the reference (queries that are ONLY connectives) are not
generated; everything else — phrases, not-words, not-phrases inside OR
(the EXCEPT_WORD quirk), negated parenthesised clauses, stop words,
missing terms — is fair game.
"""
import random
import sys

random.seed(int(sys.argv[1]) if len(sys.argv) > 1 else 7)
N_CASES = int(sys.argv[2]) if len(sys.argv) > 2 else 120

# surface form -> stemmed form (Porter); index is keyed by stems
WORDS = {
    "spark": "spark", "data": "data", "running": "run", "cakes": "cake",
    "merges": "merg", "query": "queri", "strawberry": "strawberri",
    "joined": "join", "vanilla": "vanilla", "meetings": "meet",
}
SURFACE = list(WORDS)


def posting_list(n_docs):
    ids = sorted(random.sample(range(1, 40), n_docs))
    parts = []
    for d in ids:
        score = round(random.uniform(0.5, 4.0), 2)
        if random.random() < 0.8:
            # delta-encoded positions, 1..4 of them
            gaps = [random.randint(1, 9) for _ in range(random.randint(1, 4))]
            parts.append(f"{d:03d}:{score}:{','.join(map(str, gaps))}")
        else:
            parts.append(f"{d:03d}:{score}")
    return "|".join(parts)


def literal(allow_phrase=True):
    r = random.random()
    if r < 0.25:
        return "not " + random.choice(SURFACE)
    if r < 0.45 and allow_phrase:
        k = random.randint(2, 3)
        return " ".join(random.sample(SURFACE, k))
    return random.choice(SURFACE)


def clause():
    r = random.random()
    if r < 0.3:
        lits = [literal() for _ in range(random.randint(2, 3))]
        c = "(" + " or ".join(lits) + ")"
        return ("not " + c) if random.random() < 0.3 else c
    return literal()


def query():
    return " and ".join(clause() for _ in range(random.randint(1, 3)))


for _ in range(N_CASES):
    print("R")
    stems = set(WORDS.values())
    # index a random subset so some query terms are missing
    for s in random.sample(sorted(stems), random.randint(4, len(stems))):
        print(f"T {s} {posting_list(random.randint(1, 8))}")
    if random.random() < 0.4:
        for s in random.sample(SURFACE, random.randint(1, 2)):
            # reference loads stop words stemmed (QueryMapred:111-116)
            print(f"S {WORDS[s]}")
    for _ in range(random.randint(2, 4)):
        print(f"Q {query()}")
