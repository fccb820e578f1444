"""Number verbalization for English text normalization.

Native replacement for the reference's inflect dependency
(ref: utils/text/numbers.py): cardinals with optional 'and', ordinals,
2-digit year grouping with 'oh', currency, and decimal expansion.
"""

from __future__ import annotations

import re

_ONES = [
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
    "sixteen", "seventeen", "eighteen", "nineteen",
]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety"]
_SCALES = ["", " thousand", " million", " billion", " trillion",
           " quadrillion", " quintillion", " sextillion", " septillion",
           " octillion", " nonillion", " decillion"]

_ORDINAL_IRREGULAR = {
    "one": "first", "two": "second", "three": "third", "five": "fifth",
    "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
}


def _two_digits(n: int) -> str:
    if n < 20:
        return _ONES[n]
    tens, ones = divmod(n, 10)
    return _TENS[tens] + ("-" + _ONES[ones] if ones else "")


def _three_digits(n: int, andword: str = "and") -> str:
    hundreds, rest = divmod(n, 100)
    if hundreds == 0:
        return _two_digits(rest)
    out = _ONES[hundreds] + " hundred"
    if rest:
        joiner = f" {andword} " if andword else " "
        out += joiner + _two_digits(rest)
    return out


def number_to_words(num, andword: str = "and", zero: str = "zero",
                    group: int = 0) -> str:
    """English words for an integer.

    ``group=2`` renders digit pairs left-to-right (year style: 1905 →
    'nineteen, oh five'), matching how the reference uses inflect.
    """
    s = str(num).strip()
    negative = s.startswith("-")
    if negative:
        s = s[1:]
    s = s.lstrip("+")

    if group == 2:
        if len(s) % 2 == 1:
            s = "0" + s
        parts = []
        for i in range(0, len(s), 2):
            pair = s[i: i + 2]
            v = int(pair)
            if v == 0:
                parts.append(f"{zero} {zero}")
            elif v < 10:
                parts.append(f"{zero} {_ONES[v]}" if pair[0] == "0" else _ONES[v])
            else:
                parts.append(_two_digits(v))
        words = ", ".join(parts)
        return ("minus " + words) if negative else words

    n = int(s)
    if n == 0:
        return zero
    if n >= 1000 ** len(_SCALES):
        # beyond named scales: read the digits individually (robust fallback;
        # such tokens are ids/serials, not quantities)
        words = " ".join(zero if d == "0" else _ONES[int(d)] for d in s)
        return ("minus " + words) if negative else words
    groups = []
    scale = 0
    while n > 0:
        n, chunk = divmod(n, 1000)
        if chunk:
            groups.append(_three_digits(chunk, andword) + _SCALES[scale])
        scale += 1
    words = ", ".join(reversed(groups))
    return ("minus " + words) if negative else words


def ordinal_to_words(num) -> str:
    """English ordinal words: 23 → 'twenty-third'."""
    words = number_to_words(num)
    tokens = words.replace("-", " - ").split()
    final = tokens[-1]
    if final in _ORDINAL_IRREGULAR:
        repl = _ORDINAL_IRREGULAR[final]
    elif final.endswith("ty"):
        repl = final[:-1] + "ieth"
    else:
        repl = final + "th"
    tokens[-1] = repl
    return " ".join(tokens).replace(" - ", "-")


# -- regex pipeline (API parity with ref utils/text/numbers.py:13-79) ---------

_comma_number_re = re.compile(r"([0-9][0-9\,]+[0-9])")
_decimal_number_re = re.compile(r"([0-9]+\.[0-9]+)")
_pounds_re = re.compile(r"£([0-9\,]*[0-9]+)")
_dollars_re = re.compile(r"\$([0-9\.\,]*[0-9]+)")
_ordinal_re = re.compile(r"[0-9]+(st|nd|rd|th)")
_number_re = re.compile(r"[0-9]+")


def _remove_commas(m):
    return m.group(1).replace(",", "")


def _expand_decimal_point(m):
    return m.group(1).replace(".", " point ")


def _expand_dollars(m):
    match = m.group(1)
    parts = match.split(".")
    if len(parts) > 2:
        return match + " dollars"  # unexpected format
    dollars = int(parts[0]) if parts[0] else 0
    cents = int(parts[1]) if len(parts) > 1 and parts[1] else 0
    if dollars and cents:
        dollar_unit = "dollar" if dollars == 1 else "dollars"
        cent_unit = "cent" if cents == 1 else "cents"
        return f"{dollars} {dollar_unit}, {cents} {cent_unit}"
    if dollars:
        return f"{dollars} {'dollar' if dollars == 1 else 'dollars'}"
    if cents:
        return f"{cents} {'cent' if cents == 1 else 'cents'}"
    return "zero dollars"


def _expand_ordinal(m):
    return ordinal_to_words(m.group(0)[:-2])


def _expand_number(m):
    num = int(m.group(0))
    if 1000 < num < 3000:
        if num == 2000:
            return "two thousand"
        if 2000 < num < 2010:
            return "two thousand " + number_to_words(num % 100)
        if num % 100 == 0:
            return number_to_words(num // 100) + " hundred"
        return number_to_words(num, andword="", zero="oh", group=2).replace(", ", " ")
    return number_to_words(num, andword="")


def normalize_numbers(text: str) -> str:
    text = re.sub(_comma_number_re, _remove_commas, text)
    text = re.sub(_pounds_re, r"\1 pounds", text)
    text = re.sub(_dollars_re, _expand_dollars, text)
    text = re.sub(_decimal_number_re, _expand_decimal_point, text)
    text = re.sub(_ordinal_re, _expand_ordinal, text)
    text = re.sub(_number_re, _expand_number, text)
    return text
