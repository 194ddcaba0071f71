#!/usr/bin/env python3
"""Out-of-band stemmer cross-check (ADVICE r8): the q_stemmed_wordcount gate
is a golden VALUES snapshot of the engine's own output, so a latent
tokenizer/stemmer bug could be enshrined as 'correct'. This script is an
INDEPENDENT clean-room implementation of the same published algorithm
(M.F. Porter, "An algorithm for suffix stripping", Program 14(3) 1980 —
the exact 1980 rule set, e.g. ABLI->ABLE, no LOGI rule) in a different
language, sharing zero code with the Scala engine. It reproduces the whole
q_stemmed_wordcount pipeline (lowercase -> split on single spaces, drop
empties -> Porter stem -> count -> n >= 5) from the raw parquet and diffs
against the engine's Verify dump.

Usage: tools/stemmer_check.py <sfDir> <verifyOutDir>
  e.g. tools/stemmer_check.py /root/testdata/sf0.01 /tmp/verify_out
Exit 0 = every (stem, count) row identical; nonzero = diff printed.
Driver-side only (needs duckdb, like tools/check_oracle.py).
"""
import sys
from collections import Counter

import duckdb

VOWELS = set("aeiou")


def is_cons(w, i):
    c = w[i]
    if c in VOWELS:
        return False
    if c == "y":
        return i == 0 or not is_cons(w, i - 1)
    return True


def measure(w):
    m, i, n = 0, 0, len(w)
    while i < n and is_cons(w, i):
        i += 1
    while i < n:
        while i < n and not is_cons(w, i):
            i += 1
        if i < n:
            m += 1
            while i < n and is_cons(w, i):
                i += 1
    return m


def has_vowel(w):
    return any(not is_cons(w, i) for i in range(len(w)))


def double_cons(w):
    return len(w) >= 2 and w[-1] == w[-2] and is_cons(w, len(w) - 1)


def cvc(w):
    if len(w) < 3:
        return False
    if not (is_cons(w, len(w) - 3) and not is_cons(w, len(w) - 2)
            and is_cons(w, len(w) - 1)):
        return False
    return w[-1] not in "wxy"


STEP2 = [("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
         ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
         ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
         ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
         ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
         ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
         ("biliti", "ble")]
STEP3 = [("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
         ("ical", "ic"), ("ful", ""), ("ness", "")]
STEP4 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
         "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize"]


def rules(w, table):
    for suf, rep in table:
        if w.endswith(suf):
            stem = w[:-len(suf)]
            if measure(stem) > 0:
                return stem + rep
            return w
    return w


def porter(word):
    if len(word) <= 2:
        return word
    w = word
    # 1a
    if w.endswith("s"):
        if w.endswith("sses"):
            w = w[:-2]
        elif w.endswith("ies"):
            w = w[:-2]
        elif w.endswith("ss"):
            pass
        else:
            w = w[:-1]
    # 1b
    if w.endswith("eed"):
        if measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        fired = False
        if w.endswith("ed"):
            if has_vowel(w[:-2]):
                w = w[:-2]
                fired = True
        elif w.endswith("ing"):
            if has_vowel(w[:-3]):
                w = w[:-3]
                fired = True
        if fired:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif measure(w) == 1 and cvc(w):
                w += "e"
    # 1c
    if w and w[-1] == "y" and has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # 2, 3
    w = rules(w, STEP2)
    w = rules(w, STEP3)
    # 4
    for suf in STEP4:
        if w.endswith(suf):
            stem = w[:-len(suf)]
            if measure(stem) > 1 and (suf != "ion"
                                      or (stem and stem[-1] in "st")):
                w = stem
            break
    # 5a
    if w and w[-1] == "e":
        m = measure(w[:-1])
        if m > 1 or (m == 1 and not cvc(w[:-1])):
            w = w[:-1]
    # 5b
    if len(w) > 1 and w[-1] == "l" and double_cons(w) and measure(w[:-1]) > 1:
        w = w[:-1]
    return w


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    texts = con.execute(
        f"SELECT text FROM '{sf_dir}/documents.parquet'").fetchall()
    counts = Counter()
    for (text,) in texts:
        for tok in text.lower().split(" "):
            if tok:
                counts[porter(tok)] += 1
    mine = sorted((s, n) for s, n in counts.items() if n >= 5)
    engine = con.execute(
        f"SELECT stem, n FROM '{out_dir}/q_stemmed_wordcount/*.parquet' "
        "ORDER BY stem").fetchall()
    engine = [(s, int(n)) for s, n in engine]
    if mine == engine:
        print(f"OK: {len(mine)} (stem, count) rows identical "
              "(independent Python Porter == engine)")
        return 0
    mine_d, eng_d = dict(mine), dict(engine)
    for k in sorted(set(mine_d) | set(eng_d)):
        if mine_d.get(k) != eng_d.get(k):
            print(f"DIFF {k!r}: python={mine_d.get(k)} engine={eng_d.get(k)}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
