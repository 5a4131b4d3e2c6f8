"""Rule-based letter-to-sound engine: quality floor + pipeline integration."""
import json
import os
import re

import numpy as np
import pytest

from llm_bci_tpu.data.lts import RuleLTS

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DICT = os.path.join(REPO, "llm_bci_tpu", "data", "arpabet_dict.txt")


def _dict_entries():
    entries = {}
    for line in open(DICT):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        w, *p = line.split()
        entries[w.lower()] = [re.sub(r"\d", "", x) for x in p]
    return entries


def _edit(a, b):
    D = np.zeros((len(a) + 1, len(b) + 1), int)
    D[:, 0] = range(len(a) + 1)
    D[0, :] = range(len(b) + 1)
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            D[i, j] = min(
                D[i - 1, j] + 1, D[i, j - 1] + 1, D[i - 1, j - 1] + (a[i - 1] != b[j - 1])
            )
    return int(D[-1, -1])


def test_lts_agreement_floor_vs_dictionary():
    """The rule engine must stay close to the vendored dictionary: these
    floors pin the measured quality so rule edits can't silently regress.

    Measured at r5 commit time: 66.9% exact / 0.0848 PER against the
    12,022-entry r5 dictionary (and 71.5% / 0.0751 against the
    7,078-entry r4 dictionary the previous floors, 0.60 / 0.115, were
    set on) — the r5 targets (>=0.65 exact, PER <=0.10, VERDICT r4 #5)
    are met on BOTH yardsticks, although the dictionary grew 70% with
    intrinsically harder content (1,100+ proper nouns, long Latinate
    vocabulary). The r4->r5 lift came from ~490 automatically mined
    suffix/prefix rules (scripts/mine_lts_rules.py: greedy accept on
    whole-word exact agreement, left-guard variants, iterated to
    convergence) plus hand batches (psych-/ps-, -xious,
    -ical/-itive/-ative, -ize, de-/be- prefix reduction, tz, word rules
    for is/as/has/was). Residual error remains full-vowel-vs-schwa and
    stress placement in long Latinate words, which a stress-blind rule
    engine cannot fully resolve."""
    lts = RuleLTS()
    entries = _dict_entries()
    exact, err, ref_len = 0, 0, 0
    for w, ref in entries.items():
        hyp = lts(w)
        e = _edit(hyp, ref)
        exact += e == 0
        err += e
        ref_len += len(ref)
    assert len(entries) >= 12000          # VERDICT r5: dictionary >= 12k
    assert exact / len(entries) >= 0.65, f"exact {exact}/{len(entries)}"
    assert err / ref_len <= 0.09, f"PER {err / ref_len:.3f}"


def test_frequency_weighted_coverage_without_lts():
    """VERDICT r5 'done' criterion (bar moved 0.97 → 0.985): >=98.5% of a
    frequency-weighted general English sample
    (tests/data/english_frequency_sample.txt, weight of the rank-r word =
    1/r) resolves through the dictionary or morphological derivation — the
    rule engine is reserved for the genuinely rare tail. Measured 100%
    weighted and raw at r5 commit time (the r5 dictionary growth to ~11.8k
    closed the residual tail)."""
    from llm_bci_tpu.data.speechbci import DictionaryG2P

    g = DictionaryG2P(oov="lts")
    path = os.path.join(REPO, "tests", "data", "english_frequency_sample.txt")
    words = [
        w.strip() for w in open(path) if w.strip() and not w.startswith("#")
    ]
    assert len(words) > 2000
    tot = cov = 0.0
    raw = 0
    for r, w in enumerate(words, 1):
        key = w.upper().strip(".,!?;:\"")
        wt = 1.0 / r
        tot += wt
        if g.entries.get(key) is not None or g._derive(key) is not None:
            cov += wt
            raw += 1
    assert cov / tot >= 0.985, f"weighted {cov / tot:.4f}"
    assert raw / len(words) >= 0.97, f"raw {raw}/{len(words)}"


def test_competition_style_stress_coverage():
    """The word classes competition transcripts land in the OOV tail —
    given names, contractions/clitics, numbers-as-words, US place names —
    must resolve through the dictionary or derivation, NOT the rule-based
    LTS tier (VERDICT r4 #5: names and rare words hit exactly the
    lowest-quality tier). Reference labels these via g2p_en's CMUdict
    (/root/reference/data_utils/speechbci_dataset.py:142-168)."""
    from llm_bci_tpu.data.speechbci import DictionaryG2P

    g = DictionaryG2P(oov="lts")
    stress = """
    i'll don't can't won't she's he's we're they've couldn't shouldn't
    wouldn't isn't aren't wasn't weren't hasn't haven't hadn't doesn't
    didn't it's that's there's what's who's let's i'm i've i'd you're
    you've you'd we'll we'd they're they'll she'd he'd o'clock ma'am y'all
    one two three four five six seven eight nine ten eleven twelve
    thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty
    thirty forty fifty sixty seventy eighty ninety hundred thousand
    million billion first second third fourth fifth sixth seventh eighth
    ninth tenth twentieth
    michael jennifer sarah william elizabeth david christopher jessica
    matthew ashley daniel amanda james emily robert melissa john nicole
    joseph stephanie andrew rebecca brian laura kevin rachel thomas amber
    steven heather anthony danielle charles brittany mark samantha paul
    katherine donald christina george michelle kenneth kimberly edward amy
    ronald angela timothy tiffany jason anna jeffrey maria gary susan ryan
    margaret nicholas dorothy eric lisa jonathan nancy stephen karen larry
    betty justin helen scott sandra brandon donna benjamin carol samuel
    ruth gregory sharon alexander cynthia patrick kathleen jack shirley
    dennis deborah jerry tyler cheryl aaron katie jose janet adam
    catherine nathan frances henry ann douglas joyce zachary diane peter
    alice kyle julie walter
    phoenix seattle dallas boston chicago denver atlanta houston miami
    portland utah texas ohio maine iowa idaho kansas nevada oregon georgia
    florida virginia montana arizona alabama michigan missouri colorado
    kentucky
    """
    words = [w for w in stress.split() if w.strip()]
    assert len(words) > 200
    uncovered = [
        w for w in words
        if g.entries.get(w.upper()) is None and g._derive(w.upper()) is None
    ]
    assert not uncovered, f"stress words fell to the LTS tier: {uncovered}"


def test_tier_provenance_counts(tmp_path):
    """DictionaryG2P tracks per-occurrence label provenance, and
    create_phonemes_ctc_labels reports it per split (VERDICT r3 #4c)."""
    import json as _json

    from llm_bci_tpu.data.speechbci import (
        DictionaryG2P,
        create_phonemes_ctc_labels,
    )

    g = DictionaryG2P(oov="lts")
    g("the cat unlocked zyzzyva")  # dict, dict, derived, lts
    assert g.tier_counts["dict"] >= 2
    assert g.tier_counts["derived"] >= 1
    assert g.tier_counts["lts"] >= 1

    vocab_file = os.path.join(REPO, "vocab.json")
    ds = {"train": [{"sentence": "the dog reapplied quizzotic"}]}
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        out = create_phonemes_ctc_labels(ds, vocab_file, oov="lts")
    assert "phoneme labels [train]" in buf.getvalue()
    assert "dict" in buf.getvalue() and "lts" in buf.getvalue()
    vocab = _json.load(open(vocab_file))
    assert all(0 <= i < len(vocab) for i in out["train"][0]["phonemes_idx"])


def test_prefix_and_compound_derivation():
    """Prefixes and closed compounds resolve through dictionary bases;
    short words never mis-split through a prefix."""
    import re as _re

    from llm_bci_tpu.data.speechbci import DictionaryG2P

    g = DictionaryG2P(oov="raise")
    s = lambda ph: " ".join(_re.sub(r"\d", "", x) for x in ph)
    assert s(g._derive("UNEASY")) == "AH N IY Z IY"
    assert s(g._derive("REAPPLY")) == "R IY AH P L AY"
    assert s(g._derive("MISREAD")) == "M IH S R IY D"
    assert s(g._derive("UNLOCKED")) == "AH N L AA K T"
    assert s(g._derive("FIREWORKS")) == "F AY ER W ER K S"
    assert s(g._derive("SNOWSTORM")) == "S N OW S T AO R M"
    assert s(g._derive("MOONBEAMS")) == "M UW N B IY M Z"
    # r5: compound halves must be >= 4 letters — 3-letter halves mostly
    # manufactured false splits (STEP+HEN, BAR+RAGE, CAME+RON); short true
    # compounds like CATFISH are dictionary entries, so only genuinely-OOV
    # short compounds pay the rule-engine fallback.
    assert g._derive("CATFISH") is None
    # balanced-split preference: HORSE+SHOE (5+4), not HORSES+HOE (6+3)
    assert s(g._derive("HORSESHOE")) == "HH AO R S SH UW"
    # REACHED must stay REACH+ED even though ACHE is a dictionary base
    assert s(g._derive("REACHED")) == "R IY CH T"
    # direct entries always win over affix splits (READ is not RE+AD)
    for w in ("READ", "UNIT", "UNION", "COAT", "MISS"):
        assert w in g.entries


def test_lts_emits_only_vocab_phones():
    """Every phone the rules can produce maps into the 41-token CTC vocab."""
    vocab = set(json.load(open(os.path.join(REPO, "vocab.json"))))
    from llm_bci_tpu.data.lts import _DIGITS, _RULES_SRC

    phones = {p for _, _, _, ps in _RULES_SRC for p in ps}
    phones |= {p for ps in _DIGITS.values() for p in ps}
    assert phones <= vocab


def test_ctc_labels_arbitrary_paragraph(tmp_path):
    """The VERDICT 'done' criterion: a paragraph full of words not in the
    vendored dictionary labels end to end without hard failure, producing
    valid vocab indices (OOV words are reported, not fatal)."""
    from llm_bci_tpu.data.speechbci import create_phonemes_ctc_labels

    paragraph = (
        "the quixotic ornithologist meticulously catalogued iridescent "
        "hummingbirds near the sprawling observatory while volcanic "
        "turbulence rumbled beneath the astonished villagers"
    )
    dataset = {"train": [{"sentence": paragraph}]}
    vocab_file = os.path.join(REPO, "vocab.json")
    out = create_phonemes_ctc_labels(dataset, vocab_file)  # default oov="warn"
    row = out["train"][0]
    vocab = json.load(open(vocab_file))
    assert len(row["phonemes"]) > 50
    assert row["phonemes"][-1] == "SIL"
    assert all(0 <= i < len(vocab) for i in row["phonemes_idx"])


def test_ctc_labels_oov_raise_mode():
    from llm_bci_tpu.data.speechbci import create_phonemes_ctc_labels

    dataset = {"train": [{"sentence": "the zyzzyva flew"}]}
    vocab_file = os.path.join(REPO, "vocab.json")
    with pytest.raises(ValueError, match="zyzzyva"):
        create_phonemes_ctc_labels(dataset, vocab_file, oov="raise")


def test_dictionary_g2p_merges_user_cmudict(tmp_path, monkeypatch):
    """A full CMUdict dropped at $LLM_BCI_CMUDICT merges over the vendored
    subset (cmudict.dict format: variants skipped, comments stripped)."""
    from llm_bci_tpu.data.speechbci import DictionaryG2P

    cmu = tmp_path / "cmudict.dict"
    cmu.write_text(
        ";;; comment line\n"
        "zyzzyva Z IH2 Z IH0 V AH0\n"
        "zyzzyva(2) Z AY2 Z IH0 V AH0\n"
        "tomato T AH0 M EY1 T OW2 # vegetable\n"
    )
    monkeypatch.setenv("LLM_BCI_CMUDICT", str(cmu))
    g2p = DictionaryG2P()
    assert g2p("zyzzyva") == ["Z", "IH2", "Z", "IH0", "V", "AH0"]
    assert g2p("tomato") == ["T", "AH0", "M", "EY1", "T", "OW2"]
    # vendored entries still present
    assert g2p("hello")


def test_morphological_derivation_from_dictionary_bases():
    """Inflected forms not listed in the dictionary derive from a dictionary
    BASE word + English suffix phonology (voicing assimilation for -s/-ed,
    syllabic IH0-Z/IH0-D after sibilants/homorganic codas, Y->I stem
    spellings, doubled consonants, drop-e, clitics)."""
    from llm_bci_tpu.data.speechbci import DictionaryG2P

    g = DictionaryG2P(oov="raise")
    # Remove forms so each case exercises derivation, not a dictionary hit.
    for w in ("BUSES", "HAPPIER", "HAPPIEST", "HAPPILY", "WALKED", "PLAYERS",
              "MAKING", "RUNNING", "CITIES", "KINDNESS", "REALLY", "LOVED",
              "SHOULDN'T"):
        g.entries.pop(w, None)
    cases = {
        "walked": "W AO1 K T",            # voiceless stem -> T
        "loved": "L AH1 V D",             # voiced stem -> D
        "buses": "B AH1 S IH0 Z",         # sibilant stem -> IH0 Z
        "cities": "S IH1 T IY0 Z",        # Y->IES spelling
        "running": "R AH1 N IH0 NG",      # doubled consonant
        "making": "M EY1 K IH0 NG",       # drop-e
        "happier": "HH AE1 P IY0 ER0",    # Y->IER
        "happiest": "HH AE1 P IY0 AH0 S T",
        "happily": "HH AE1 P AH0 L IY0",  # Y->ILY with IY->AH0 reduction
        "really": "R IY1 L IY0",          # -LLY: double L is one phone
        "players": "P L EY1 ER0 Z",       # two-level: (PLAY+ER)+S
        "kindness": "K AY1 N D N AH0 S",
        "shouldn't": "SH UH1 D AH0 N T",  # clitic N'T
    }
    for word, want in cases.items():
        assert " ".join(g(word)) == want, word
        assert word.upper() in g.derived_words
    assert not g.oov_words


def test_morphology_prefers_silent_e_base():
    """When BOTH the bare stem and the silent-e base are dictionary words,
    the e-base is the right parse for -ED/-ING/-EST/-ER (a bare CVC stem
    would have doubled its final consonant: RATTED vs RATED), so the
    derivation must not label RATED with RAT's vowel."""
    from llm_bci_tpu.data.speechbci import DictionaryG2P

    g = DictionaryG2P(oov="raise")
    cases = {
        "rated": "R EY1 T IH0 D",     # RATE, not RAT
        "rating": "R EY1 T IH0 NG",
        "staring": "S T EH1 R IH0 NG",  # STARE, not STAR
        "cutest": "K Y UW1 T AH0 S T",  # CUTE, not CUT
        "rider": "R AY1 D ER0",         # RIDE, not RID
        "taped": "T EY1 P T",           # TAPE, not TAP
        # and the bare-stem parses must still win when the spelling says so
        "pinned": "P IH1 N D",          # doubled consonant -> PIN
        "visited": "V IH1 Z AH0 T IH0 D",  # VISITE is not a word -> VISIT
    }
    for word, want in cases.items():
        g.entries.pop(word.upper(), None)
        assert " ".join(g(word)) == want, word


def test_morphology_no_false_decompositions():
    """Words that merely END in a suffix string must not mis-derive: short
    stems, -EER nouns, and -SS words are excluded; unknown-stem words stay
    OOV for the raise policy."""
    from llm_bci_tpu.data.speechbci import DictionaryG2P

    g = DictionaryG2P(oov="raise")
    g.entries.pop("THING", None)
    assert g._derive("THING") is None  # not THE+ING
    for w in ("beer", "career", "engineer"):
        g.entries.pop(w.upper(), None)
        with pytest.raises(ValueError):
            g(w)  # -EER never parses as agent noun; stays OOV
        g.oov_words.clear()
    with pytest.raises(ValueError):
        g("zyzzyvas")  # unknown stem: the -S rule alone cannot invent one


def _morphology_sweep():
    """For every dictionary word that the engine can derive with its own
    entry removed, edit distance between derivation and listing
    (stress-stripped). Returns (total, exact, within1)."""
    from llm_bci_tpu.data.speechbci import DictionaryG2P

    g = DictionaryG2P(oov="raise")
    strip = lambda ph: [re.sub(r"\d", "", x) for x in ph]
    total = exact = within1 = 0
    for word, phones in list(g.entries.items()):
        saved = g.entries.pop(word)
        derived = g._derive(word)
        g.entries[word] = saved
        if derived is None:
            continue
        total += 1
        dist = _edit(strip(derived), strip(phones))
        exact += dist == 0
        within1 += dist <= 1
    return total, exact, within1


def test_morphology_agreement_with_dictionary_inflections():
    """Self-validating floor: every dictionary word the engine can derive
    (entry removed) must match its own listing — measured 83.5% exact /
    96.2% within one phone edit for the suffix tiers alone, 81.9% / 95.4%
    with the prefix+compound tiers on (r4). The full engine trades a
    little precision for recall: prefix/compound splits also fire on
    NON-compositional dictionary words (RECORD -> RE+CORD, STEPHEN ->
    STEP+HEN) that in real use are direct entries and never reach
    derivation, so the sweep overstates their cost. Floors pin both so
    rule edits can't silently regress either tier."""
    from llm_bci_tpu.data import speechbci as sb

    total, exact, within1 = _morphology_sweep()
    assert total > 1000  # the sweep is meaningful
    assert exact / total >= 0.80, f"{exact}/{total}"
    assert within1 / total >= 0.94, f"{within1}/{total}"

    saved = sb._PREFIXES
    sb._PREFIXES = ()
    try:
        total, exact, within1 = _morphology_sweep()
    finally:
        sb._PREFIXES = saved
    assert exact / total >= 0.83, f"suffix tier {exact}/{total}"
    assert within1 / total >= 0.96, f"suffix tier {within1}/{total}"
