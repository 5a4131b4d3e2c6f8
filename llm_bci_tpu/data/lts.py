"""Rule-based English letter-to-sound (grapheme→ARPAbet) engine.

Offline fallback for out-of-dictionary words in the phoneme CTC pipeline
(reference labels via ``g2p_en``, ``data_utils/speechbci_dataset.py:142-168``
— a CMUdict lookup plus a learned model; neither ships in this image, so
arbitrary sentences must still be labelable self-contained).

The rule *formalism* is the classic public-domain NRL letter-to-sound
system (Elovitz et al., NRL Report 7948, 1976): ordered per-letter rules
``left[target]right → phones`` with context classes

====  =========================================================
`#`   one or more vowel letters (a e i o u y)
`:`   zero or more consonant letters
`^`   exactly one consonant letter
`.`   one voiced consonant (b d v g j l m n r w z)
`+`   one front vowel letter (e i y)
`&`   one sibilant spelling (s c g z x j, ch, sh)
`@`   one dental-ish spelling (t s r d l z n j, th, ch, sh)
`%`   a suffix (e, er, es, ed, ely, ing; optional plural s)
` `   word boundary
====  =========================================================

The rule *table* below is our own, tuned against the vendored ARPAbet
dictionary (see ``tests/test_lts.py`` for the measured agreement floor).
First matching rule wins; scanning is left to right. Output phones carry
no stress digits (the CTC vocab strips them anyway).
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

_VOWEL = "aeiouy"
_CONS = "bcdfghjklmnpqrstvwxz"

_CLASS_RE = {
    "#": f"[{_VOWEL}]+",
    ":": f"[{_CONS}]*",
    "^": f"[{_CONS}]",
    ".": "[bdvgjlmnrwz]",
    "+": "[eiy]",
    "&": "(?:ch|sh|[scgzxj])",
    "@": "(?:th|ch|sh|[tsrdlznj])",
    "%": "(?:ing|ely|ed|es|ery|er|e)(?=s? )",
    " ": "[ ]",
}


def _compile_context(pattern: str) -> str:
    out = []
    for ch in pattern:
        out.append(_CLASS_RE.get(ch) or re.escape(ch))
    return "".join(out)


class _Rule:
    __slots__ = ("target", "left", "right", "phones")

    def __init__(self, left: str, target: str, right: str, phones: Sequence[str]):
        self.target = target
        self.left = re.compile(_compile_context(left) + "$") if left else None
        self.right = re.compile(_compile_context(right)) if right else None
        self.phones = list(phones)


def _r(left: str, target: str, right: str, *phones: str) -> Tuple[str, str, str, Tuple[str, ...]]:
    return (left, target, right, phones)


# Ordered rule table: within each leading letter, first match wins.
_RULES_SRC = [
    # ---- a
    _r(" ", "a", " ", "AH"),
    _r(" ", "are", " ", "AA", "R"),
    _r(" ", "ar", "o", "AH", "R"),
    _r("", "ar", "#", "EH", "R"),
    _r("^", "as", "#", "EY", "S"),
    _r("", "a", "wa", "AH"),
    _r("", "aw", "", "AO"),
    _r(" :", "any", "", "EH", "N", "IY"),
    _r("", "a", "^+#", "EY"),
    _r("#:", "ally", " ", "AH", "L", "IY"),
    _r(" ", "al", "#", "AH", "L"),
    _r("", "again", "", "AH", "G", "EH", "N"),
    _r("#:", "ag", "e", "IH", "JH"),
    _r(" :", "able", "", "EY", "B", "AH", "L"),
    _r("", "able", "", "AH", "B", "AH", "L"),
    _r("", "a", "^+:#", "AE"),
    _r(" :", "a", "^+ ", "EY"),
    _r(" ", "a", "nn", "AH"),
    _r(" ", "a", "cce", "AH"),
    _r(" ", "a", "ccu", "AH"),
    _r(" ", "a", "pp", "AH"),
    _r(" ", "a", "dd", "AH"),
    _r(" ", "a", "gg", "AH"),
    _r(" ", "a", "cco", "AH"),
    _r(" ", "a", "^r", "AH"),
    _r(" ", "a", "^l", "AH"),
    _r(" ", "a", "ss", "AH"),
    _r(" ", "a", "tt", "AH"),
    _r(" ", "arr", "", "AH", "R"),
    _r("", "arr", "", "AE", "R"),
    _r(" :", "ar", " ", "AA", "R"),
    _r("", "ar", " ", "ER"),
    _r("", "ar", "", "AA", "R"),
    _r("", "air", "", "EH", "R"),
    _r("", "ai", "", "EY"),
    _r("", "ay", "", "EY"),
    _r("", "au", "", "AO"),
    _r("", "at", "or", "EY", "T"),
    _r("#:", "al", " ", "AH", "L"),
    _r("", "al", "f ", "AE"),
    _r("^", "alm", "", "AA", "M"),
    _r("", "alk", "", "AO", "K"),
    _r("", "al", "c", "AE", "L"),
    _r("", "al", "^", "AO", "L"),
    _r("", "ang", "+", "EY", "N", "JH"),
    _r("", "a", "^en", "EY"),
    _r(" ", "a", "^#", "AH"),
    _r("#:^", "ance", " ", "AH", "N", "S"),
    _r("#:^", "ancy", " ", "AH", "N", "S", "IY"),
    _r("#:^", "ant", " ", "AH", "N", "T"),
    _r("#:^", "ant", "s ", "AH", "N", "T"),
    _r("", "a", "^e ", "EY"),
    _r("", "a", "^es ", "EY"),
    _r("#:^", "a", "^#", "AH"),
    _r("", "a", "^%", "EY"),
    _r("#:^", "a", "d ", "AH"),
    _r("#:^", "a", " ", "AH"),
    _r("", "a", "", "AE"),
    # ---- b
    _r(" ", "been", " ", "B", "IH", "N"),
    _r(" ", "be", "tw", "B", "IH"),
    _r(" ", "be", "^#", "B", "IH"),
    _r("", "being", "", "B", "IY", "IH", "NG"),
    _r(" ", "both", " ", "B", "OW", "TH"),
    _r("", "buil", "", "B", "IH", "L"),
    _r("b", "b", "", ),
    _r("", "bt", "", "T"),
    _r("m", "b", " ", ),
    _r("b", "urger", "", "ER", "G", "ER"),
    _r("", "b", "", "B"),
    # ---- c
    _r(" ", "ch", "^", "K"),
    _r("^e", "ch", "", "K"),
    _r("", "ch", "", "CH"),
    _r(" s", "ci", "#", "S", "AY"),
    _r("", "ci", "a", "SH"),
    _r("", "ci", "o", "SH"),
    _r("", "ci", "en", "SH"),
    _r("x", "c", "+", ),
    _r("", "c", "+", "S"),
    _r("", "ck", "", "K"),
    _r("", "com", "%", "K", "AH", "M"),
    _r("", "cc", "+", "K", "S"),
    _r("", "c", "c", ),  # double c: first silent ("account")
    _r("", "c", "", "K"),
    # ---- d
    _r("#:", "ded", " ", "D", "AH", "D"),
    _r("", "dia", "", "D", "AY", "AH"),
    _r(".e", "d", " ", "D"),
    _r("#e", "d", " ", "D"),
    _r("#:^e", "d", " ", "T"),
    _r(" ", "de", "s^", "D", "IH"),
    _r(" ", "de", "^#", "D", "IH"),
    _r(" ", "do", " ", "D", "UW"),
    _r(" ", "does", "", "D", "AH", "Z"),
    _r(" ", "doing", "", "D", "UW", "IH", "NG"),
    _r(" ", "dow", "", "D", "AW"),
    _r("", "du", "a", "JH", "UW"),
    _r("d", "d", "", ),
    _r("", "d", "", "D"),
    # ---- e
    _r("#:", "e", " ", ),
    _r("':^", "e", " ", ),
    _r(" :", "e", " ", "IY"),
    # unstressed suffixes: a later syllable after the (stressed) first vowel
    # reduces to AH (left context "#:^" requires an earlier vowel, so
    # one-syllable words like "went"/"sense" keep their full vowel)
    _r("i", "e", "n", "AH"),
    _r("#:^", "ence", " ", "AH", "N", "S"),
    _r("#:^", "ency", " ", "AH", "N", "S", "IY"),
    _r("#:^", "ent", " ", "AH", "N", "T"),
    _r("#:^", "ent", "s ", "AH", "N", "T"),
    _r("#:^", "ently", " ", "AH", "N", "T", "L", "IY"),
    _r(" ", "ex", "^", "IH", "K", "S"),
    _r(" ", "emb", "", "IH", "M", "B"),
    _r(" ", "e", "^^", "EH"),
    _r(" ", "e", "lec", "IH"),
    _r(" ", "ex", "h#", "IH", "G", "Z"),
    _r(" ", "ex", "#", "IH", "G", "Z"),
    _r("#", "ed", " ", "D"),
    _r("#:", "e", "d ", ),
    _r("", "ev", "er", "EH", "V"),
    _r("", "eri", "#", "IY", "R", "IY"),
    _r("", "eri", "", "EH", "R", "IH"),
    _r("#:", "er", "#", "ER"),
    _r("", "err", "y", "EH", "R"),
    _r("", "er", "#", "EH", "R"),
    _r("", "er", "", "ER"),
    _r(" ", "even", "", "IY", "V", "EH", "N"),
    _r("#:", "e", "w", ),
    _r("@", "ew", "", "UW"),
    _r("", "ew", "", "Y", "UW"),
    _r("g", "eo", "n", "AH"),
    _r("", "e", "o", "IY"),
    _r("#:&", "es", " ", "AH", "Z"),
    _r("#:", "e", "s ", ),
    _r("#:", "ely", " ", "L", "IY"),
    _r("#:", "ement", "", "M", "AH", "N", "T"),
    _r("#:^", "e", "t ", "AH"),
    _r("#:^", "est", " ", "AH", "S", "T"),
    _r("#:^", "en", "s ", "AH", "N"),
    _r("#:^", "e", "l ", "AH"),
    _r("#:^", "e", "m ", "AH"),
    _r("#:^", "en", " ", "AH", "N"),
    _r("", "eful", "", "F", "AH", "L"),
    _r("", "eer", "", "IH", "R"),
    _r("", "ee", "", "IY"),
    _r("", "earn", "", "ER", "N"),
    _r(" ", "ear", "^", "ER"),
    _r("h", "ear", "d", "ER"),
    _r("", "ear", "ch", "ER"),
    _r("", "ead", "", "EH", "D"),
    _r("#:", "ea", " ", "IY", "AH"),
    _r("cr", "ea", "ti", "IY", "EY"),
    _r("cr", "ea", "te", "IY", "EY"),
    _r("", "ea", "ven", "EH"),
    _r("", "ea", "vy", "EH"),
    _r("", "ea", "lth", "EH"),
    _r("", "ea", "th", "EH"),
    _r("", "ea", "san", "EH"),
    _r("", "ea", "su", "EH"),
    _r("", "ea", "", "IY"),
    _r("", "eigh", "", "EY"),
    _r("", "ei", "", "IY"),
    _r(" ", "eye", "", "AY"),
    _r("", "ey", "", "IY"),
    _r("", "eu", "", "Y", "UW"),
    _r("", "e", "^e ", "IY"),
    _r("qu", "e", "n", "AH"),
    _r("#:^", "e", "^#", "AH"),
    _r("", "e", "^%", "IY"),
    _r("", "e", "", "EH"),
    # ---- f
    _r("", "full", "", "F", "UH", "L"),
    _r("", "front", "", "F", "R", "AH", "N", "T"),
    _r("#:", "fy", " ", "F", "AY"),
    _r("", "ful", "", "F", "AH", "L"),
    _r("f", "f", "", ),
    _r("", "f", "", "F"),
    # ---- g
    _r("", "giv", "", "G", "IH", "V"),
    _r(" ", "g", "i^", "G"),
    _r("", "ge", "t", "G", "EH"),
    _r("su", "gges", "", "G", "JH", "EH", "S"),
    _r("", "gg", "", "G"),
    _r(" b#", "g", "", "G"),
    _r("", "g", "+", "JH"),
    _r("", "great", "", "G", "R", "EY", "T"),
    _r("#", "gh", "", ),
    _r(" ", "gh", "", "G"),
    _r("", "g", "", "G"),
    # ---- h
    _r(" ", "hav", "", "HH", "AE", "V"),
    _r(" ", "here", "", "HH", "IY", "R"),
    _r(" ", "hour", "", "AW", "ER"),
    _r("", "how", "", "HH", "AW"),
    _r(" ", "hi", " ", "HH", "AY"),
    _r("", "h", "#", "HH"),
    _r("", "h", "", ),
    # ---- i
    _r(" ", "in", " ", "IH", "N"),
    _r(" ", "i", " ", "AY"),
    _r(" ", "i", "'", "AY"),
    _r("", "in", "d", "AY", "N"),
    _r("", "ier", "", "IY", "ER"),
    _r("#:r", "ied", "", "IY", "D"),
    _r("", "ied", " ", "AY", "D"),
    _r(" :^", "i", "en", "AY"),
    _r("qu", "i", "e", "AY"),
    _r("", "ien", "", "IY", "AH", "N"),
    _r("r", "ive", " ", "AY", "V"),
    _r(" a", "live", " ", "L", "AY", "V"),
    _r("#:^", "ive", " ", "IH", "V"),
    _r("#:^", "ive", "s ", "IH", "V"),
    _r("#:^", "ively", " ", "IH", "V", "L", "IY"),
    _r("#:^", "ity", " ", "AH", "T", "IY"),
    _r("#:^", "ities", " ", "AH", "T", "IY", "Z"),
    _r("", "i", "zation", "AH"),
    _r("", "ically", "", "IH", "K", "L", "IY"),
    _r("", "ie", "t", "AY", "EH"),
    _r("#:^", "i", "ble", "AH"),
    _r(" :", "i", "%", "AY"),
    _r("", "i", "%", "IY"),
    _r("", "ie", "", "IY"),
    _r("", "igh", "", "AY"),
    _r("", "ild", "", "AY", "L", "D"),
    _r("", "ign", " ", "AY", "N"),
    _r("", "ign", "^", "AY", "N"),
    _r("", "ign", "%", "AY", "N"),
    _r("", "ique", "", "IY", "K"),
    _r("", "ire", "", "AY", "ER"),
    _r("", "ir", "#", "AY", "R"),
    _r("", "ir", "", "ER"),
    _r("", "i", "^e ", "AY"),
    _r("", "i", "^es ", "AY"),
    _r("", "i", "^+:#", "IH"),
    _r("+^", "i", "^+", "IH"),
    _r("#:^", "i", "st ", "AH"),
    _r("#:^", "i", "l ", "AH"),
    _r("#:^", "i", "n ", "AH"),
    _r("#:^", "i", "^#", "AH"),
    _r("", "i", "^+", "AY"),
    _r("m", "i", "t ", "IH"),
    _r("#:^", "i", "t ", "AH"),
    _r("mp", "i", "o", "IY"),
    _r("ll", "ia", "", "Y", "AH"),
    _r("ll", "i", "o", "Y"),
    _r("n", "i", "o", "Y"),
    _r("r", "i", "a", "IY"),
    _r("r", "i", "o", "IY"),
    _r("#:^", "i", "#", "IY"),
    _r("", "ism", " ", "IH", "Z", "AH", "M"),
    _r("#:^", "i", " ", "IY"),
    _r("", "i", "o", "AY"),
    _r("", "i", "", "IH"),
    # ---- j
    _r("", "j", "", "JH"),
    # ---- k
    _r(" ", "k", "n", ),
    _r("", "k", "", "K"),
    # ---- l
    _r(" ", "louis", " ", "L", "UW", "IH", "S"),
    _r("l", "l", "", ),
    _r("ow", "l", "", "L"),
    _r("r", "l", "%", "L"),
    _r("#:^", "l", "% ", "AH", "L"),
    _r("", "logue", "", "L", "AO", "G"),
    _r("#:^", "less", " ", "L", "AH", "S"),
    _r("", "lead", "", "L", "IY", "D"),
    _r("", "l", "", "L"),
    # ---- m
    _r(" ", "maybe", " ", "M", "EY", "B", "IY"),
    _r("#:^", "ment", "s ", "M", "AH", "N", "T"),
    _r("#:^", "ment", " ", "M", "AH", "N", "T"),
    _r("", "mov", "", "M", "UW", "V"),
    _r("m", "m", "", ),
    _r("", "m", "", "M"),
    # ---- n
    _r("e", "ng", "+", "N", "JH"),
    _r("", "ng", "r", "NG", "G"),
    _r("", "ng", "#", "NG", "G"),
    _r("", "ngl", "%", "NG", "G", "AH", "L"),
    _r("", "ng", "", "NG"),
    _r("", "nc", "t", "NG", "K"),
    _r("", "nk", "", "NG", "K"),
    _r("", "ness", " ", "N", "AH", "S"),
    _r("", "ness", "es ", "N", "AH", "S"),
    _r(" ", "now", " ", "N", "AW"),
    _r("n", "n", "", ),
    _r("", "n", "", "N"),
    # ---- o
    _r(" pr", "o", "^#", "AH"),
    _r(" ", "o", "pp", "AH"),
    _r(" ", "oh", " ", "OW"),
    _r(" ", "of", " ", "AH", "V"),
    _r(" ", "one", "", "W", "AH", "N"),
    _r(" ", "once", "", "W", "AH", "N", "S"),
    _r(" ", "only", "", "OW", "N", "L", "IY"),
    _r(" ", "over", "", "OW", "V", "ER"),
    _r("", "other", "", "AH", "DH", "ER"),
    _r("", "ov", "", "AH", "V"),
    _r("", "ought", "", "AO", "T"),
    _r("", "ough", " ", "OW"),
    _r("", "ough", "", "AH", "F"),
    _r("", "ould", "", "UH", "D"),
    _r("", "oup", "", "UW", "P"),
    _r("", "ous", "", "AH", "S"),
    _r("", "our", "", "AO", "R"),
    _r("#:^", "or", "ies", "ER"),
    _r("#:^", "or", "y", "ER"),
    _r("", "or", "ney", "ER"),
    _r("#:^", "or", "ar", "ER"),
    _r("#:^", "or", "s ", "ER"),
    _r("#:^", "or", " ", "ER"),
    _r("", "or", "", "AO", "R"),
    _r("^", "ou", "^l", "AH"),
    _r(" ", "ou", "", "AW"),
    _r("h", "ou", "s#", "AW"),
    _r("", "ow", " ", "OW"),
    _r("", "ow", "n", "AW"),
    _r("", "ow", "d", "AW"),
    _r("", "oll", "%", "OW", "L"),
    _r("", "ow", "", "OW"),
    _r("", "ou", "", "AW"),
    _r("", "oy", "", "OY"),
    _r("", "oing", "", "OW", "IH", "NG"),
    _r("", "oi", "", "OY"),
    _r("", "oor", "", "AO", "R"),
    _r("w", "oo", "l", "UH"),
    _r("", "ook", "", "UH", "K"),
    _r("", "ood", "", "UH", "D"),
    _r("", "oo", "", "UW"),
    _r("", "on't", "", "OW", "N", "T"),
    _r("", "o", "^en", "OW"),
    _r("", "olk", "", "OW", "K"),
    _r("", "ol", "t", "OW", "L"),
    _r("", "ol", "d", "OW", "L"),
    _r("", "o", "st ", "OW"),
    _r("", "of", "^", "AO", "F"),
    _r("", "oss", " ", "AO", "S"),
    _r("p", "o", "e", "OW"),
    _r("t", "o", "tal", "OW"),
    _r("c", "o", "n", "AH"),
    _r("c", "o", "m^", "AH"),
    _r("", "o", "ng", "AO"),
    _r("i", "on", "", "AH", "N"),
    _r("#:", "on", " ", "AH", "N"),
    _r("#:^", "o", "l ", "AH"),
    _r("#:^", "o", "t ", "AH"),
    _r("#:^", "o", "p ", "AH"),
    _r("#:^", "om", "", "AH", "M"),
    _r("", "o", "x", "AA"),
    _r("#:^", "o", "^y ", "AH"),
    _r("", "o", "^e ", "OW"),
    _r("", "o", "^es ", "OW"),
    _r("", "o", "^%", "OW"),
    _r("", "o", "^i#", "OW"),
    _r("", "o", "es ", "OW"),
    _r("", "o", "e ", "OW"),
    _r("br", "oa", "d", "AO"),
    _r("", "oar", "", "AO", "R"),
    _r("", "oa", "", "OW"),
    _r("", "o", " ", "OW"),
    _r("", "o", "", "AA"),
    # ---- p
    _r("", "pretty", "", "P", "R", "IH", "T", "IY"),
    _r("", "ph", "", "F"),
    _r("", "peop", "", "P", "IY", "P"),
    _r("", "pow", "", "P", "AW"),
    _r("", "put", " ", "P", "UH", "T"),
    _r("p", "p", "", ),
    _r("", "p", "", "P"),
    # ---- q
    _r("", "quar", "", "K", "W", "AO", "R"),
    _r("", "qu", "", "K", "W"),
    _r("", "q", "", "K"),
    # ---- r
    _r(" ", "re", "s^", "R", "IH"),
    _r(" p", "re", "^#", "R", "IH"),
    _r(" ", "re", "^#", "R", "IH"),
    _r("r", "r", "", ),
    _r("", "r", "", "R"),
    # ---- s
    _r("", "ssion", "", "SH", "AH", "N"),
    _r("", "sh", "", "SH"),
    _r("#", "sion", "", "ZH", "AH", "N"),
    _r("^", "sion", "", "SH", "AH", "N"),
    _r("", "some", "", "S", "AH", "M"),
    _r("#", "sur", "#", "ZH", "ER"),
    _r("", "sur", "e ", "SH", "UH", "R"),
    _r("", "sur", "#", "SH", "ER"),
    _r("#", "su", "#", "ZH", "UW"),
    _r("#", "ssu", "#", "SH", "UW"),
    _r("#", "sed", " ", "Z", "D"),
    _r(" ", "says", " ", "S", "EH", "Z"),
    _r("", "said", "", "S", "EH", "D"),
    _r("", "sch", "", "S", "K"),
    _r("", "s", "c+", ),
    _r("y", "s", " ", "Z"),
    _r("m", "s", "+", "Z"),
    _r("s", "s", "", ),
    _r("#", "s", "#", "Z"),
    _r(".e", "s", " ", "Z"),
    _r("#e", "s", " ", "Z"),
    _r(".", "s", " ", "Z"),
    _r("#:.e", "s", " ", "Z"),
    _r("", "s", "", "S"),
    # ---- t
    _r("", "tch", "", "CH"),
    _r(" ", "the", " ", "DH", "AH"),
    _r(" ", "to", "day", "T", "AH"),
    _r(" ", "to", " ", "T", "UW"),
    _r(" ", "that", " ", "DH", "AE", "T"),
    _r(" ", "this", " ", "DH", "IH", "S"),
    _r(" ", "they", "", "DH", "EY"),
    _r(" ", "there", "", "DH", "EH", "R"),
    _r("", "their", "", "DH", "EH", "R"),
    _r(" ", "than", " ", "DH", "AE", "N"),
    _r(" ", "them", " ", "DH", "EH", "M"),
    _r("", "these", " ", "DH", "IY", "Z"),
    _r(" ", "then", " ", "DH", "EH", "N"),
    _r("", "ther", "", "DH", "ER"),
    _r("", "through", "", "TH", "R", "UW"),
    _r("", "those", "", "DH", "OW", "Z"),
    _r("", "though", " ", "DH", "OW"),
    _r(" ", "thus", "", "DH", "AH", "S"),
    _r("", "th", "", "TH"),
    _r("#:", "ted", " ", "T", "AH", "D"),
    _r("s", "ti", "#n", "CH"),
    _r("", "ti", "o", "SH"),
    _r("", "ti", "a", "SH"),
    _r("", "tien", "", "SH", "AH", "N"),
    _r("", "ture", " ", "CH", "ER"),
    _r("", "tur", "#", "CH", "ER"),
    _r("", "tu", "a", "CH", "UW"),
    _r(" ", "two", "", "T", "UW"),
    _r("t", "t", "", ),
    _r("", "t", "", "T"),
    # ---- u
    _r("g", "u", "+", ),
    _r("", "uy", "", "AY"),
    _r("", "ui", "", "UW"),
    _r("u", "e", "sd", ),
    _r(" ", "un", "i", "Y", "UW", "N"),
    _r(" ", "un", "", "AH", "N"),
    _r(" ", "upon", "", "AH", "P", "AO", "N"),
    _r("@", "ur", "#", "UH", "R"),
    _r("", "ur", "#", "Y", "UH", "R"),
    _r("", "ur", "", "ER"),
    _r("", "u", "^ ", "AH"),
    _r("", "u", "^^", "AH"),
    _r("@", "u", "", "UW"),
    _r("", "u", "l#", "Y", "AH"),
    _r("", "u", "^e ", "Y", "UW"),
    _r("", "u", "", "Y", "UW"),
    # ---- v
    _r("", "view", "", "V", "Y", "UW"),
    _r("", "v", "", "V"),
    # ---- w
    _r(" ", "were", "", "W", "ER"),
    _r("", "wa", "sh", "W", "AA"),
    _r("", "wa", "st", "W", "EY"),
    _r("s", "wa", "m", "W", "AA"),
    _r("", "wa", "s", "W", "AH"),
    _r("", "wat", "e", "W", "AO", "T"),
    _r("", "wa", "t", "W", "AA"),
    _r("", "where", "", "W", "EH", "R"),
    _r("", "what", "", "W", "AH", "T"),
    _r("", "whol", "", "HH", "OW", "L"),
    _r("", "who", "", "HH", "UW"),
    _r("", "wh", "", "W"),
    _r("^", "ward", " ", "W", "ER", "D"),
    _r("", "war", "", "W", "AO", "R"),
    _r("", "wor", "^", "W", "ER"),
    _r("", "wr", "", "R"),
    _r("", "w", "", "W"),
    # ---- x
    _r(" ", "x", "", "Z"),
    _r("", "x", "", "K", "S"),
    # ---- y
    _r("", "young", "", "Y", "AH", "NG"),
    _r(" ", "you", "", "Y", "UW"),
    _r(" ", "yes", "", "Y", "EH", "S"),
    _r(" ", "y", "", "Y"),
    _r("#:^", "y", " ", "IY"),
    _r("#:^", "y", "i", "IY"),
    _r("", "y", "z", "AY"),
    _r(" :", "y", " ", "AY"),
    _r(" :", "y", "#", "AY"),
    _r(" :", "y", "^+:#", "IH"),
    _r(" :", "y", "^#", "AY"),
    _r("", "y", "", "IH"),
    # ---- z
    _r("z", "z", "", ),
    _r("", "z", "", "Z"),
    # ---- apostrophe
    _r(".", "'s", " ", "Z"),
    _r("#", "'s", " ", "Z"),
    _r("", "'s", " ", "S"),
    _r("", "'", "", ),
]

_DIGITS = {
    "0": ["Z", "IH", "R", "OW"], "1": ["W", "AH", "N"], "2": ["T", "UW"],
    "3": ["TH", "R", "IY"], "4": ["F", "AO", "R"], "5": ["F", "AY", "V"],
    "6": ["S", "IH", "K", "S"], "7": ["S", "EH", "V", "AH", "N"],
    "8": ["EY", "T"], "9": ["N", "AY", "N"],
}


class RuleLTS:
    """Compiled NRL-style rule engine; call with one word, get ARPAbet."""

    def __init__(self) -> None:
        self._rules: Dict[str, List[_Rule]] = {}
        for left, target, right, phones in _RULES_SRC:
            self._rules.setdefault(target[0], []).append(
                _Rule(left, target, right, phones)
            )

    def __call__(self, word: str) -> List[str]:
        s = " " + word.lower() + " "
        out: List[str] = []
        i = 1
        while i < len(s) - 1:
            ch = s[i]
            if ch in _DIGITS:
                out.extend(_DIGITS[ch])
                i += 1
                continue
            matched = False
            for rule in self._rules.get(ch, ()):
                j = i + len(rule.target)
                if s[i:j] != rule.target:
                    continue
                if rule.left is not None and not rule.left.search(s[:i]):
                    continue
                if rule.right is not None and not rule.right.match(s[j:]):
                    continue
                out.extend(rule.phones)
                i = j
                matched = True
                break
            if not matched:
                i += 1  # unknown character: skip
        return out
