"""Text frontend tests: symbol table, cleaners, number verbalization,
curly-brace ARPAbet escapes, round-trips."""

from wavernn_tpu.text import sequence_to_text, text_to_sequence
from wavernn_tpu.text.cleaners import english_cleaners
from wavernn_tpu.text.numbers import (
    normalize_numbers,
    number_to_words,
    ordinal_to_words,
)
from wavernn_tpu.text.symbols import symbols
from wavernn_tpu.text.translit import transliterate


def test_symbol_table_shape():
    # pad + special + punctuation + 52 letters + 84 arpabet
    assert symbols[0] == "_"
    assert len(symbols) == 1 + 1 + 10 + 52 + 84
    assert len(set(symbols)) == len(symbols)  # unique
    assert "@AA1" in symbols and "@ZH" in symbols


def test_number_to_words_basic():
    assert number_to_words(0) == "zero"
    assert number_to_words(7) == "seven"
    assert number_to_words(19) == "nineteen"
    assert number_to_words(42) == "forty-two"
    assert number_to_words(100) == "one hundred"
    assert number_to_words(345) == "three hundred and forty-five"
    assert number_to_words(345, andword="") == "three hundred forty-five"
    assert number_to_words(1_000_001) == "one million, one"


def test_number_to_words_year_grouping():
    assert number_to_words(1999, zero="oh", group=2) == "nineteen, ninety-nine"
    assert number_to_words(1905, zero="oh", group=2) == "nineteen, oh five"


def test_ordinals():
    assert ordinal_to_words(1) == "first"
    assert ordinal_to_words(2) == "second"
    assert ordinal_to_words(3) == "third"
    assert ordinal_to_words(4) == "fourth"
    assert ordinal_to_words(12) == "twelfth"
    assert ordinal_to_words(20) == "twentieth"
    assert ordinal_to_words(23) == "twenty-third"
    assert ordinal_to_words(100) == "one hundredth"


def test_normalize_numbers_pipeline():
    assert normalize_numbers("I have 3 cats") == "I have three cats"
    assert "nineteen ninety-nine" in normalize_numbers("in 1999 it")
    assert "two thousand five" in normalize_numbers("in 2005 it")
    # the full pipeline expands currency digits with the trailing number pass,
    # and 4-digit numbers in (1000,3000) verbalize year-style — both matching
    # the reference pipeline's observable behavior (ref: utils/text/numbers.py)
    assert normalize_numbers("$1.50") == "one dollar, fifty cents"
    assert normalize_numbers("$2") == "two dollars"
    assert normalize_numbers("£100") == "one hundred pounds"
    assert normalize_numbers("3.14") == "three point fourteen"
    assert normalize_numbers("23rd") == "twenty-third"
    assert normalize_numbers("1,234") == "twelve thirty-four"
    assert normalize_numbers("5,000") == "five thousand"
    # comma-grouped ordinals: the reference strips commas before the ordinal
    # pass, so '1,021st' reads as the ordinal of 1021, not a cardinal + 'st'
    assert normalize_numbers("1,021st") == "one thousand, twenty-first"
    assert normalize_numbers("2,500th") == "two thousand, five hundredth"


def test_english_cleaners():
    out = english_cleaners("Dr. Smith   bought 2 apples for $1.50!")
    assert out == "doctor smith bought two apples for one dollar, fifty cents!"


def test_transliterate():
    assert transliterate("café") == "cafe"
    assert transliterate("naïve") == "naive"
    assert transliterate("Ångström") == "Angstrom"
    assert transliterate("œuvre") == "oeuvre"
    assert transliterate("“hello—world”") == '"hello-world"'


def test_text_to_sequence_basic():
    seq = text_to_sequence("hi!", ["basic_cleaners"])
    text = sequence_to_text(seq)
    assert text == "hi!"
    assert all(isinstance(i, int) for i in seq)


def test_text_to_sequence_arpabet():
    seq = text_to_sequence("Turn {HH AW1 S} now", ["english_cleaners"])
    text = sequence_to_text(seq)
    assert "{HH AW1 S}" in text
    assert text.startswith("turn ")


def test_pad_symbol_never_emitted():
    seq = text_to_sequence("_a_", ["basic_cleaners"])
    assert 0 not in seq  # '_' (pad, id 0) is filtered


def test_ljspeech_recipe(tmp_path):
    from wavernn_tpu.text.recipes import ljspeech

    (tmp_path / "metadata.csv").write_text(
        "LJ001-0001|Printing, in the only sense|Printing, in the only sense\n"
        "LJ001-0002|has two|has two\n",
        encoding="utf-8",
    )
    d = ljspeech(tmp_path)
    assert d["LJ001-0001"].strip() == "Printing, in the only sense"
    assert len(d) == 2


# -- behavior pins for the frontend rewrite (checkpoint-compat contracts) -----


def test_text_to_sequence_ids_pinned():
    """Symbol IDs are a checkpoint contract: pin a concrete encoding."""
    from wavernn_tpu.text.symbols import symbols

    ids = {s: i for i, s in enumerate(symbols)}
    seq = text_to_sequence("ab c", ["basic_cleaners"])
    assert seq == [ids["a"], ids["b"], ids[" "], ids["c"]]


def test_multiple_curly_segments():
    seq = text_to_sequence("{AA1} and {B IY0}?", ["basic_cleaners"])
    assert sequence_to_text(seq) == "{AA1} and {B IY0}?"


def test_adjacent_arpabet_rejoined_with_space():
    # "}{"  between two phoneme spans renders as a single space
    seq = text_to_sequence("{HH}{AW1}", ["basic_cleaners"])
    assert sequence_to_text(seq) == "{HH AW1}".replace("HH AW1", "HH} {AW1").replace("} {", " ")


def test_unmatched_brace_passes_through():
    seq = text_to_sequence("oops {AA1 unclosed", ["basic_cleaners"])
    # '{' and the digit are not in the symbol table and are dropped;
    # the rest is passed through as cleaned plain text
    assert sequence_to_text(seq) == "oops aa unclosed"


def test_unknown_cleaner_raises():
    import pytest

    with pytest.raises(ValueError):
        text_to_sequence("x", ["not_a_cleaner"])


def test_unknown_symbols_dropped():
    seq = text_to_sequence("aÆb", ["basic_cleaners"])  # Æ not in table
    assert sequence_to_text(seq) == "ab"


CMUDICT_FIXTURE = """\
;;; comment header line
'BOUT  B AW1 T
READ  R EH1 D
READ(1)  R IY1 D
lowercase  IH0 G N AO1 R D
BADSYM  Q Q1 X
NUMBER  N AH1 M B ER0
"""


def test_cmudict_parsing():
    import io

    from wavernn_tpu.text.cmudict import CMUDict

    d = CMUDict(io.StringIO(CMUDICT_FIXTURE))
    assert len(d) == 3  # 'BOUT, READ, NUMBER (comment/lowercase/badsym skipped)
    assert d.lookup("read") == ["R EH1 D", "R IY1 D"]  # alternates merged
    assert d.lookup("'bout") == ["B AW1 T"]
    assert d.lookup("badsym") is None  # invalid phones rejected
    assert d.lookup("missing") is None


def test_cmudict_drop_ambiguous():
    import io

    from wavernn_tpu.text.cmudict import CMUDict

    d = CMUDict(io.StringIO(CMUDICT_FIXTURE), keep_ambiguous=False)
    assert d.lookup("read") is None
    assert d.lookup("number") == ["N AH1 M B ER0"]


def test_ljspeech_recipe_pipe_fields(tmp_path):
    from wavernn_tpu.text.recipes import ljspeech

    (tmp_path / "metadata.csv").write_text(
        "id1|raw one|normalized one\nid2|only-two-fields\n", encoding="utf-8"
    )
    d = ljspeech(tmp_path)
    # last field wins; trailing newline preserved (reference behavior)
    assert d["id1"] == "normalized one\n"
    assert d["id2"] == "only-two-fields\n"
