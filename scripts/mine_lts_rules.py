"""Automated LTS rule mining against the vendored ARPAbet dictionary.

Method (the "tuned against the vendored dictionary" process referenced by
``llm_bci_tpu/data/lts.py`` — both the hand-written table and the
``_MINED_RULES_SRC`` block were produced this way):

1. Run the current engine over every dictionary entry; collect misses.
2. Propose candidates: every word-final letter pattern (len 2-7) whose
   dictionary words share one reference phone tail (len 1-6) with >=
   ``CONSISTENCY`` agreement, and symmetrically word-initial patterns with
   a shared phone head. A candidate must currently be wrong for >=
   ``MIN_WRONG`` of its words.
3. Greedy accept: add a candidate (prepended, so it wins within its
   leading letter), keep it only if whole-word exact agreement strictly
   rises (phoneme error rate as tiebreak), else revert.
4. Repeat from 1 until a round accepts nothing.

Usage: ``python scripts/mine_lts_rules.py`` (run from the repo root; CPU
only, a few minutes per round). Accepted rules are printed and written to
``mined_rules.json``; paste them into ``_MINED_RULES_SRC`` in
``llm_bci_tpu/data/lts.py`` (the list is prepended to the rule table).
"""
import json
import os
import re
import sys
from collections import Counter, defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import llm_bci_tpu.data.lts as L

MIN_GROUP = 4          # min dictionary words sharing the pattern
CONSISTENCY = 0.75     # fraction of the group sharing one phone tail/head
MIN_WRONG = 2          # candidate must fix at least this many current misses
MAX_CANDS = 800        # per round, ranked by current miss count
ROUNDS = 10

DICT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "llm_bci_tpu", "data", "arpabet_dict.txt",
)
entries = {}
for line in open(DICT):
    line = line.strip()
    if not line or line.startswith("#"):
        continue
    w, *p = line.split()
    entries[w.lower()] = [re.sub(r"\d", "", x) for x in p]
WORDS = list(entries)


def edit(a, b):
    la, lb = len(a), len(b)
    D = np.zeros((la + 1, lb + 1), int)
    D[:, 0] = range(la + 1)
    D[0, :] = range(lb + 1)
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            D[i, j] = min(D[i - 1, j] + 1, D[i, j - 1] + 1,
                          D[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
    return int(D[-1, -1])


def measure(ret_miss=False):
    lts = L.RuleLTS()
    exact, err, ref_len = 0, 0, 0
    miss = {}
    for w, ref in entries.items():
        hyp = lts(w)
        if hyp == ref:
            exact += 1
        else:
            err += edit(hyp, ref)
            if ret_miss:
                miss[w] = hyp
        ref_len += len(ref)
    per = err / ref_len
    return (exact, per, miss) if ret_miss else (exact, per)


base = list(L._RULES_SRC)
accepted = []


def apply_rules():
    L._RULES_SRC[:] = accepted + base


apply_rules()
e_cur, per_cur, miss = measure(ret_miss=True)
print(f"start exact {e_cur} PER {per_cur:.4f} misses {len(miss)}", flush=True)

for rnd in range(ROUNDS):
    sufwords = defaultdict(list)
    prewords = defaultdict(list)
    for w in WORDS:
        for k in range(2, 8):
            if len(w) > k:
                sufwords[w[-k:]].append(w)
                prewords[w[:k]].append(w)
    cands = []
    for table, is_suf in ((sufwords, True), (prewords, False)):
        for s, words in table.items():
            if len(words) < MIN_GROUP:
                continue
            for m in range(1, 7):
                if is_suf:
                    tails = Counter(tuple(entries[w][-m:]) for w in words
                                    if len(entries[w]) > m)
                else:
                    tails = Counter(tuple(entries[w][:m]) for w in words
                                    if len(entries[w]) > m)
                if not tails:
                    continue
                for tail, n in tails.most_common(2):
                    if n / len(words) < CONSISTENCY or n < MIN_GROUP:
                        continue
                    if is_suf:
                        wrong = sum(1 for w in words
                                    if w in miss and tuple(miss[w][-m:]) != tail)
                    else:
                        wrong = sum(1 for w in words
                                    if w in miss and tuple(miss[w][:m]) != tail)
                    if wrong >= MIN_WRONG:
                        cands.append((wrong, s, m, tail, is_suf))
    cands.sort(key=lambda t: -t[0])
    cands = cands[:MAX_CANDS]
    print(f"round {rnd}: {len(cands)} candidates", flush=True)
    gained = 0
    for wrong, s, m, tail, is_suf in cands:
        # try the plain rule first, then (suffixes only) with a vowel /
        # consonant left guard — guards rescue patterns the unguarded rule
        # loses to exceptions (e.g. word-initial collisions).
        variants = [("", s, " ")] if is_suf else [(" ", s, "")]
        if is_suf:
            variants += [("#", s, " "), ("^", s, " ")]
        kept = False
        for lt, tg, rt in variants:
            if kept:
                break
            rule = (lt, tg, rt, tail)
            accepted.append(rule)
            apply_rules()
            e, per = measure()
            if e > e_cur or (e == e_cur and per < per_cur - 0.0002):
                print(f"  KEEP {rule}: exact {e} ({e - e_cur:+d}) PER {per:.4f}",
                      flush=True)
                e_cur, per_cur = e, per
                gained += 1
                kept = True
            else:
                accepted.pop()
    apply_rules()
    e_cur, per_cur, miss = measure(ret_miss=True)
    print(f"round {rnd} done: exact {e_cur} PER {per_cur:.4f} "
          f"(+{gained} rules, total {len(accepted)})", flush=True)
    json.dump([[r[0], r[1], r[2], list(r[3])] for r in accepted],
              open("mined_rules.json", "w"))
    if gained == 0:
        break
print(f"FINAL exact {e_cur} PER {per_cur:.4f} rules {len(accepted)}")
