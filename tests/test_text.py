"""Text frontend tests: golden ID sequences and cleaner behavior.

Golden expectations derive from the reference pipeline's documented behavior
(reference: text/__init__.py:15-53, text/cleaners.py:83-90,
text/numbers.py:49-71, text/symbols.py:18).
"""

from gantron_tpu.text import sequence_to_text, text_to_sequence
from gantron_tpu.text.cleaners import english_cleaners
from gantron_tpu.text.numbers import normalize_numbers, number_to_words
from gantron_tpu.text.symbols import symbols


def test_symbol_table_layout():
    # 1 pad + 1 special + 10 punctuation + 52 letters + 84 arpabet = 148
    assert len(symbols) == 148
    assert symbols[0] == "_"
    assert symbols[1] == "-"
    assert symbols[2] == "!"
    assert symbols[11] == " "
    assert symbols[12] == "A"
    assert symbols[37] == "Z"
    assert symbols[38] == "a"
    assert symbols[63] == "z"
    assert symbols[64] == "@AA"
    assert symbols[-1] == "@ZH"
    assert len(set(symbols)) == len(symbols)


def test_text_to_sequence_golden():
    # 'a' is at index 38, space at 11, 'b' at 39.
    assert text_to_sequence("a b", ["basic_cleaners"]) == [38, 11, 39]
    # "Hello!" -> english_cleaners lowercases.
    seq = text_to_sequence("Hello!", ["english_cleaners"])
    assert sequence_to_text(seq) == "hello!"


def test_arpabet_curly_syntax():
    seq = text_to_sequence("{HH AW1 S}", ["english_cleaners"])
    assert seq == [symbols.index("@HH"), symbols.index("@AW1"),
                   symbols.index("@S")]
    assert sequence_to_text(seq) == "{HH AW1 S}"
    mixed = text_to_sequence("go {HH OW1 M} now", ["english_cleaners"])
    assert sequence_to_text(mixed) == "go {HH OW1 M} now"


def test_roundtrip_keeps_unknown_out():
    # '~' and '_' must never appear in sequences.
    seq = text_to_sequence("a_b~c", ["basic_cleaners"])
    assert symbols.index("_") not in seq


def test_number_to_words_cardinals():
    assert number_to_words(0, andword="") == "zero"
    assert number_to_words(7, andword="") == "seven"
    assert number_to_words(13, andword="") == "thirteen"
    assert number_to_words(42, andword="") == "forty-two"
    assert number_to_words(100, andword="") == "one hundred"
    assert number_to_words(105, andword="") == "one hundred five"
    assert number_to_words(105) == "one hundred and five"
    assert number_to_words(1000, andword="") == "one thousand"
    assert number_to_words(45000, andword="") == "forty-five thousand"
    assert (number_to_words(1234567, andword="")
            == "one million, two hundred thirty-four thousand, "
               "five hundred sixty-seven")


def test_number_to_words_ordinals():
    assert number_to_words("1st") == "first"
    assert number_to_words("2nd") == "second"
    assert number_to_words("3rd") == "third"
    assert number_to_words("4th") == "fourth"
    assert number_to_words("5th") == "fifth"
    assert number_to_words("9th") == "ninth"
    assert number_to_words("12th") == "twelfth"
    assert number_to_words("20th") == "twentieth"
    assert number_to_words("22nd") == "twenty-second"
    assert number_to_words("101st") == "one hundred and first"
    assert number_to_words("100th") == "one hundredth"


def test_normalize_numbers_years():
    assert normalize_numbers("in 1999") == "in nineteen ninety-nine"
    assert normalize_numbers("in 2000") == "in two thousand"
    assert normalize_numbers("in 2005") == "in two thousand five"
    assert normalize_numbers("in 2047") == "in twenty forty-seven"
    assert normalize_numbers("in 1904") == "in nineteen oh four"
    assert normalize_numbers("in 1900") == "in nineteen hundred"
    assert normalize_numbers("in 1835") == "in eighteen thirty-five"


def test_normalize_numbers_currency():
    # The digit output of the dollar expander is itself verbalized by the
    # trailing number pass, matching the reference pipeline order.
    assert normalize_numbers("$1") == "one dollar"
    assert normalize_numbers("$2.50") == "two dollars, fifty cents"
    assert normalize_numbers("$0.01") == "one cent"
    assert normalize_numbers("£5") == "five pounds"
    assert normalize_numbers("1,234 things") == (
        normalize_numbers("1234 things"))


def test_normalize_numbers_decimal():
    assert normalize_numbers("3.14") == "three point one four" or (
        "point" in normalize_numbers("3.14"))


def test_english_cleaners_pipeline():
    assert english_cleaners("Mr. Smith") == "mister smith"
    assert english_cleaners("Dr.  Jones\n") == "doctor jones "
    assert english_cleaners("Héllo") == "hello"
    assert english_cleaners("A  B\tC") == "a b c"
    assert english_cleaners("It cost $5.") == "it cost five dollars."


def test_ljspeech_sample_line():
    text = ("The overwhelming majority of people in this country know how to "
            "sift the wheat from the chaff in what they hear and what they "
            "read.")
    seq = text_to_sequence(text, ["english_cleaners"])
    assert sequence_to_text(seq) == text.lower()


def test_cmudict_parsing():
    import io

    from gantron_tpu.text.cmudict import CMUDict

    data = io.StringIO(
        ";;; comment line\n"
        "HELLO  HH AH0 L OW1\n"
        "HELLO(1)  HH EH0 L OW1\n"
        "WORLD  W ER1 L D\n"
        "BADSYM  QQ XX\n")
    d = CMUDict(data)
    assert len(d) == 2
    assert d.lookup("hello") == ["HH AH0 L OW1", "HH EH0 L OW1"]
    assert d.lookup("WORLD") == ["W ER1 L D"]
    assert d.lookup("missing") is None
