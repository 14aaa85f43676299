#!/usr/bin/env python3
"""Generate src/test/resources/rouge_cases.jsonl: ~260 RougeL-recall goldens
over sentence pairs with dense Porter-suffix coverage.

The reference scores RougeL via HuggingFace rouge -> rouge_score ->
NLTK PorterStemmer (NLTK_EXTENSIONS mode). Neither rouge_score nor nltk is
installable in this container (zero egress), so the expected values here
come from an INDEPENDENT Python re-implementation of the same published
algorithm chain (Porter 1980 + NLTK's documented extensions; rouge_score's
tokenizer and LCS recall). This is dual-implementation cross-validation:
the Scala kernels (graft.text.Porter / TextKernels) were written separately
from the same public sources, so agreement across ~260 suffix-adversarial
cases catches transcription/porting bugs — the realistic failure mode a
hand-tabled golden list is too small to catch. Deterministic: seed 20260813.

Usage: python3 tools/make_rouge_cases.py
"""
import json
import random
import re

VOWELS = set("aeiou")


def _cons(w, i):
    c = w[i]
    if c in VOWELS:
        return False
    if c == "y":
        return i == 0 or not _cons(w, i - 1)
    return True


def _measure(stem):
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _cons(stem, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _contains_vowel(stem):
    return any(not _cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w):
    return len(w) >= 2 and w[-1] == w[-2] and _cons(w, len(w) - 1)


def _ends_cvc(w):
    n = len(w)
    if n >= 3 and _cons(w, n - 3) and not _cons(w, n - 2) and _cons(w, n - 1) \
            and w[-1] not in "wxy":
        return True
    return n == 2 and not _cons(w, 0) and _cons(w, 1)


def _apply(word, rules):
    """First matching suffix wins; failed condition returns word unchanged.
    Suffix '*d' matches a double consonant, stripping one letter."""
    for suffix, repl, cond in rules:
        if suffix == "*d":
            if _ends_double_cons(word):
                stem = word[:-2]
                return stem + repl if (cond is None or cond(stem)) else word
        elif word.endswith(suffix):
            stem = word[: len(word) - len(suffix)]
            return stem + repl if (cond is None or cond(stem)) else word
    return word


POOL = {}
for stem, forms in {
    "sky": ["sky", "skies"], "die": ["dying"], "lie": ["lying"],
    "tie": ["tying"], "news": ["news"], "inning": ["innings", "inning"],
    "outing": ["outings", "outing"], "canning": ["cannings", "canning"],
    "howe": ["howe"], "proceed": ["proceed"], "exceed": ["exceed"],
    "succeed": ["succeed"],
}.items():
    for f in forms:
        POOL[f] = stem


def _step1a(w):
    if w.endswith("ies") and len(w) == 4:
        return w[:-3] + "ie"
    return _apply(w, [("sses", "ss", None), ("ies", "i", None),
                      ("ss", "ss", None), ("s", "", None)])


def _step1b(w):
    if w.endswith("ied"):
        return w[:-3] + ("ie" if len(w) == 4 else "i")
    if w.endswith("eed"):
        stem = w[:-3]
        return stem + "ee" if _measure(stem) > 0 else w
    intermediate = None
    for suffix in ("ed", "ing"):
        if w.endswith(suffix):
            stem = w[: len(w) - len(suffix)]
            if _contains_vowel(stem):
                intermediate = stem
            break
    if intermediate is None:
        return w
    last = intermediate[-1]
    return _apply(intermediate, [
        ("at", "ate", None), ("bl", "ble", None), ("iz", "ize", None),
        ("*d", last, (lambda stem, l=last: l not in "lsz")),
        ("", "e", lambda stem: _measure(stem) == 1 and _ends_cvc(stem)),
    ])


def _step1c(w):
    return _apply(w, [("y", "i",
                       lambda stem: len(stem) > 1 and _cons(stem, len(stem) - 1))])


def _step2(w):
    if w.endswith("alli") and _measure(w[:-4]) > 0:
        return _step2(w[:-4] + "al")
    m = lambda stem: _measure(stem) > 0  # noqa: E731
    logi_cond = lambda stem: _measure(w[:-3]) > 0  # noqa: E731
    return _apply(w, [
        ("ational", "ate", m), ("tional", "tion", m), ("enci", "ence", m),
        ("anci", "ance", m), ("izer", "ize", m), ("bli", "ble", m),
        ("alli", "al", m), ("entli", "ent", m), ("eli", "e", m),
        ("ousli", "ous", m), ("ization", "ize", m), ("ation", "ate", m),
        ("ator", "ate", m), ("alism", "al", m), ("iveness", "ive", m),
        ("fulness", "ful", m), ("ousness", "ous", m), ("aliti", "al", m),
        ("iviti", "ive", m), ("biliti", "ble", m), ("fulli", "ful", m),
        ("logi", "log", logi_cond),
    ])


def _step3(w):
    m = lambda stem: _measure(stem) > 0  # noqa: E731
    return _apply(w, [
        ("icate", "ic", m), ("ative", "", m), ("alize", "al", m),
        ("iciti", "ic", m), ("ical", "ic", m), ("ful", "", m),
        ("ness", "", m),
    ])


def _step4(w):
    m1 = lambda stem: _measure(stem) > 1  # noqa: E731
    ion = lambda stem: _measure(stem) > 1 and len(stem) > 0 and stem[-1] in "st"  # noqa: E731
    return _apply(w, [
        ("al", "", m1), ("ance", "", m1), ("ence", "", m1), ("er", "", m1),
        ("ic", "", m1), ("able", "", m1), ("ible", "", m1), ("ant", "", m1),
        ("ement", "", m1), ("ment", "", m1), ("ent", "", m1), ("ion", "", ion),
        ("ou", "", m1), ("ism", "", m1), ("ate", "", m1), ("iti", "", m1),
        ("ous", "", m1), ("ive", "", m1), ("ize", "", m1),
    ])


def _step5a(w):
    if w.endswith("e"):
        stem = w[:-1]
        if _measure(stem) > 1:
            return stem
        if _measure(stem) == 1 and not _ends_cvc(stem):
            return stem
    return w


def _step5b(w):
    return _apply(w, [("ll", "l", lambda stem: _measure(w[:-1]) > 1)])


def porter_stem(word):
    word = word.lower()
    if word in POOL:
        return POOL[word]
    if len(word) <= 2:
        return word
    return _step5b(_step5a(_step4(_step3(_step2(
        _step1c(_step1b(_step1a(word))))))))


def rouge_tokenize(text):
    toks = re.sub(r"[^a-z0-9]+", " ", text.lower()).split()
    toks = [porter_stem(t) if len(t) > 3 else t for t in toks]
    return [t for t in toks if t and all(c.isascii() and (c.isdigit() or c.islower()) for c in t)]


def lcs_len(a, b):
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b):
            cur[j + 1] = prev[j] + 1 if x == y else max(prev[j + 1], cur[j])
        prev = cur
    return prev[len(b)]


def rouge_l_recall(refs, pred):
    pred_toks = rouge_tokenize(pred)

    def one(gold):
        gold_toks = rouge_tokenize(gold)
        if not gold_toks or not pred_toks:
            return 0.0
        return lcs_len(gold_toks, pred_toks) / len(gold_toks)

    return max((one(r) for r in refs), default=0.0)


# Dense Porter-suffix coverage: every rule class in steps 1-5, the NLTK
# irregular pool, short words, numbers, non-ASCII (dropped by the
# tokenizer), apostrophes/hyphens (split points).
WORDS = [
    # step1a / plurals
    "caresses", "ponies", "ties", "dies", "cries", "studies", "caress", "cats",
    # step1b: eed / ied / ed / ing (+ at/bl/iz + double consonant + cvc-e)
    "agreed", "feed", "plastered", "bled", "motoring", "sing", "conflated",
    "troubled", "sized", "hopping", "hopped", "tanned", "falling", "hissing",
    "fizzed", "failing", "filing", "buzzing", "fitted",
    # step1c
    "happy", "crying", "sky", "skies",
    # step2
    "relational", "conditional", "rational", "valenci", "hesitanci",
    "digitizer", "conformabli", "radically", "differentli", "vileli",
    "analogousli", "vietnamization", "predication", "operator", "feudalism",
    "decisiveness", "hopefulness", "callousness", "formaliti", "sensitiviti",
    "sensibiliti", "carefully", "geology", "archaeology",
    # step3
    "triplicate", "formative", "formalize", "electriciti", "electrical",
    "hopeful", "goodness",
    # step4
    "revival", "allowance", "inference", "airliner", "gyroscopic",
    "adjustable", "defensible", "irritant", "replacement", "adjustment",
    "dependent", "adoption", "homologou", "communism", "activate",
    "angulariti", "homologous", "effective", "bowdlerize",
    # step5
    "probate", "rate", "cease", "controll", "roll",
    # irregular pool
    "dying", "lying", "tying", "news", "innings", "outings", "cannings",
    "howe", "proceed", "exceed", "succeed", "proceeding", "succeeded",
    # short / numeric / mixed / dropped-by-tokenizer
    "a", "an", "the", "is", "on", "ab", "i", "42", "2024", "x1b2",
    "don't", "it's", "U.S.A.", "re-do", "naïve", "café", "中文", "🙂",
    "running!", "(stemmed)", "Meeting,",
]

rnd = random.Random(20260813)


def rand_sentence(lo=3, hi=12):
    return " ".join(rnd.choice(WORDS) for _ in range(rnd.randint(lo, hi)))


cases = []
# every word against itself and a mutated neighbor: stem-level identity
for w in WORDS:
    cases.append({"refs": [w + " stays constant"], "pred": w + " stayed constants"})
# random multi-ref sentence pairs
for _ in range(120):
    refs = [rand_sentence() for _ in range(rnd.randint(1, 3))]
    pred = rnd.choice([rand_sentence(),
                       refs[0],
                       " ".join(reversed(refs[0].split())),
                       refs[0].replace(" ", "  ").upper()])
    cases.append({"refs": refs, "pred": pred})
# degenerate shapes
cases += [
    {"refs": [""], "pred": "anything"},
    {"refs": ["word"], "pred": ""},
    {"refs": [], "pred": "x"},
    {"refs": ["中文 only"], "pred": "only"},
    {"refs": ["🙂 🙂"], "pred": "🙂"},
]

for c in cases:
    c["exp"] = rouge_l_recall(c["refs"], c["pred"])

with open("src/test/resources/rouge_cases.jsonl", "w") as f:
    for c in cases:
        f.write(json.dumps(c, ensure_ascii=False) + "\n")
print(f"wrote {len(cases)} cases")
