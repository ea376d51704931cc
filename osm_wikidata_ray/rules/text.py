"""Low-level text utilities: ASCII transliteration and number↔word conversion.

The reference engine (EdwardBetts/osm-wikidata) relies on the third-party
``unidecode`` and ``num2words`` packages (matcher/match.py:10-11).  Neither is
available in this environment, so this module provides deterministic,
dependency-free equivalents covering the scripts and number ranges the
matching rules actually exercise: Latin (full diacritic folding via NFKD),
Cyrillic (incl. Ukrainian), Greek, Armenian, and English cardinals/ordinals.

Pure functions, no I/O — safe to call from Ray Data batch UDFs.
"""

from __future__ import annotations

import re
import unicodedata

# Single-character transliterations that NFKD cannot decompose.
_CHAR_MAP = {
    # Latin specials
    "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE", "ß": "ss",
    "ð": "d", "Ð": "D", "þ": "th", "Þ": "Th",
    "ø": "o", "Ø": "O", "đ": "d", "Đ": "D", "ł": "l", "Ł": "L",
    "ı": "i", "ħ": "h", "Ħ": "H", "ŧ": "t", "Ŧ": "T",
    "ĸ": "k", "ŋ": "ng", "Ŋ": "Ng",
    # Cyrillic (Russian + Ukrainian/Belarusian extras), unidecode-style
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e", "ё": "e",
    "ж": "zh", "з": "z", "и": "i", "й": "i", "к": "k", "л": "l", "м": "m",
    "н": "n", "о": "o", "п": "p", "р": "r", "с": "s", "т": "t", "у": "u",
    "ф": "f", "х": "kh", "ц": "ts", "ч": "ch", "ш": "sh", "щ": "shch",
    "ъ": "", "ы": "y", "ь": "'", "э": "e", "ю": "iu", "я": "ia",
    "і": "i", "ї": "i", "є": "ie", "ґ": "g", "ў": "u", "ђ": "dj", "ј": "j",
    "љ": "lj", "њ": "nj", "ћ": "c", "џ": "dz", "ѐ": "e", "ѝ": "i",
    # Greek
    "α": "a", "β": "b", "γ": "g", "δ": "d", "ε": "e", "ζ": "z", "η": "e",
    "θ": "th", "ι": "i", "κ": "k", "λ": "l", "μ": "m", "ν": "n", "ξ": "x",
    "ο": "o", "π": "p", "ρ": "r", "σ": "s", "ς": "s", "τ": "t", "υ": "u",
    "φ": "ph", "χ": "ch", "ψ": "ps", "ω": "o",
    # Armenian (lowercase; uppercase handled by .lower() fallback below)
    "ա": "a", "բ": "b", "գ": "g", "դ": "d", "ե": "e", "զ": "z", "է": "e",
    "ը": "e", "թ": "t'", "ժ": "zh", "ի": "i", "լ": "l", "խ": "kh", "ծ": "ts",
    "կ": "k", "հ": "h", "ձ": "dz", "ղ": "gh", "ճ": "ch", "մ": "m", "յ": "y",
    "ն": "n", "շ": "sh", "ո": "o", "չ": "ch'", "պ": "p", "ջ": "j", "ռ": "r",
    "ս": "s", "վ": "v", "տ": "t", "ր": "r", "ց": "ts'", "ւ": "w", "փ": "p'",
    "ք": "k'", "օ": "o", "ֆ": "f",
    # punctuation commonly folded by unidecode
    "’": "'", "‘": "'", "“": '"', "”": '"', "–": "-", "—": "-", "·": " ",
    "«": '"', "»": '"', "№": "No",
}

# add uppercase variants for the case-mapped scripts
for _src, _dst in list(_CHAR_MAP.items()):
    _up = _src.upper()
    if _up != _src and _up not in _CHAR_MAP:
        _CHAR_MAP[_up] = _dst.capitalize()


def fold_to_ascii(s: str) -> str:
    """Transliterate a Unicode string to ASCII (unidecode-lite).

    Latin diacritics fold via NFKD; Cyrillic/Greek/Armenian use an explicit
    table; anything else unmappable is dropped.
    """
    out: list[str] = []
    for ch in s:
        if ord(ch) < 128:
            out.append(ch)
            continue
        mapped = _CHAR_MAP.get(ch)
        if mapped is not None:
            out.append(mapped)
            continue
        decomp = unicodedata.normalize("NFKD", ch)
        kept = "".join(c for c in decomp if ord(c) < 128)
        if kept:
            out.append(kept)
            continue
        # try table again after case-folding (covers uppercase non-Latin)
        mapped = _CHAR_MAP.get(ch.lower())
        if mapped is not None:
            out.append(mapped.capitalize() if ch.isupper() else mapped)
    return "".join(out)


_UNITS = [
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
    "sixteen", "seventeen", "eighteen", "nineteen",
]
_TENS = [
    "", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
    "eighty", "ninety",
]
_SCALES = [(10 ** 9, "billion"), (10 ** 6, "million"), (10 ** 3, "thousand")]

_ORDINAL_SPECIAL = {
    "one": "first", "two": "second", "three": "third", "five": "fifth",
    "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
}


def number_to_words(n: int) -> str:
    """English cardinal words for an integer (num2words-compatible style).

    e.g. 42 -> "forty-two", 110 -> "one hundred and ten".
    """
    if n < 0:
        return "minus " + number_to_words(-n)
    if n < 20:
        return _UNITS[n]
    if n < 100:
        tens, unit = divmod(n, 10)
        return _TENS[tens] + ("-" + _UNITS[unit] if unit else "")
    for scale, scale_word in _SCALES:
        if n >= scale:
            head, rest = divmod(n, scale)
            out = number_to_words(head) + " " + scale_word
            if rest:
                sep = " and " if rest < 100 else " "
                out += sep + number_to_words(rest)
            return out
    hundreds, rest = divmod(n, 100)
    out = _UNITS[hundreds] + " hundred"
    if rest:
        out += " and " + number_to_words(rest)
    return out


def number_to_ordinal_words(n: int) -> str:
    """English ordinal words: 3 -> "third", 149 -> "one hundred and forty-ninth"."""
    words = number_to_words(n)
    head, _, last = words.rpartition(" ") if " " in words else ("", "", words)
    hy_head, _, hy_last = last.rpartition("-") if "-" in last else ("", "", last)
    if hy_last in _ORDINAL_SPECIAL:
        ordinal_last = _ORDINAL_SPECIAL[hy_last]
    elif hy_last.endswith("y"):
        ordinal_last = hy_last[:-1] + "ieth"
    else:
        ordinal_last = hy_last + "th"
    last = (hy_head + "-" if hy_head else "") + ordinal_last
    return (head + " " if head else "") + last


re_ordinal_suffix = re.compile(r"(\d+) ?(?:st|nd|rd|th)\b", re.I)


def ordinals_to_words(name: str) -> str:
    """Rewrite digit ordinals in a string: "3rd Avenue" -> "third Avenue".

    Mirrors matcher/match.py:733-738 (ordinal_number_to_word).
    """
    return re_ordinal_suffix.sub(
        lambda m: number_to_ordinal_words(int(m.group(1))), name
    )
