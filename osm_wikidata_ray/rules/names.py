"""Pairwise name-comparison rules.

Semantics-faithful reimplementation of the reference scorer's name cascade
(EdwardBetts/osm-wikidata matcher/match.py).  Every public function cites the
reference location whose behavior it reproduces; ordering of the cascade rules
is load-bearing for F1 parity and is preserved exactly.

All functions are pure (no I/O, no globals mutated except caller-supplied
``endings`` sets, whose in-place mutation at the " at " rule mirrors
match.py:451-456).  They are called per candidate pair from batched Ray Data
UDFs; scalar-level caching happens one level up in the scorer actor.
"""

from __future__ import annotations

import re
from collections import defaultdict
from functools import lru_cache
from typing import Any, Collection, Iterator, NamedTuple

from .text import fold_to_ascii, number_to_words, ordinals_to_words

# match kinds, mirroring the MatchType enum at match.py:29-40
GOOD = "good"
WIKIDATA_TRIMMED = "wikidata_trimmed"
BOTH_TRIMMED = "both_trimmed"
TRIM = "trim"
ADDRESS = "address"
INITIALS = "initials"
INITIALS_TRIM = "initials_trim"
PREFIX = "prefix"


class Match(NamedTuple):
    """A name-match result (reference NameMatch, match.py:90-100)."""

    kind: str
    debug: str | None = None


# regexes, mirroring match.py:17-27
re_keep_dash = re.compile(r"[^-@\w]", re.U)  # re_strip_non_chars
re_strip_dash_too = re.compile(r"[^@\w]", re.U)  # re_strip_non_chars_and_dash
re_non_letter_start = re.compile(r"^[^A-Z]+", re.I | re.U)
re_number_start = re.compile(r"^(?:House at )?(?:(?:Number|No)s?\.? )?(\d[-\d]*,? .*$)")
re_uk_postcode_start = re.compile(r"^[a-z][a-z]\d+[a-z]?$", re.I)
re_digits = re.compile(r"\d+")
re_ss = re.compile(r"\bss\b")
re_st = re.compile(r"\bst\b")
re_ss_or_st = re.compile(r"\bs[st]\b")
re_ordinal_number = re.compile(r"(\d+) ?(?:st|nd|rd|th)\b", re.I)
re_plural = re.compile(r"(?<=.)e?s+\b")
re_article = re.compile(r"^(\W*)(the|le|la|les)[- ]")
re_stop_words = re.compile(r"([ -])(?:the|and|a|an|at|of|de|di|le|la|les|von|pw\.)(?=\1)")
re_dsc_image = re.compile(r"\bdsc \d+")
re_keep_commas = re.compile(r"[^@\w, ]", re.U)
re_non_char_start = re.compile(r"^[^@\w]*", re.U)

# road / direction abbreviations, match.py:42-72
ROAD_ABBR = {
    "avenue": "ave", "street": "st", "road": "rd", "boulevard": "blvd",
    "drive": "dr", "lane": "ln", "square": "sq",
}
DIRECTION_ABBR = {
    "north": "n", "south": "s", "east": "e", "west": "w",
    "northwest": "nw", "northeast": "ne", "southwest": "sw", "southeast": "se",
}
ABBR = {**ROAD_ABBR, **DIRECTION_ABBR}
re_abbr = re.compile(r"\b(" + "|".join(ABBR) + r")\b", re.I)
re_address_common_end = re.compile("^(.+)(" + "|".join(ABBR) + "|plaza)$", re.I)
re_road_end = re.compile(
    "^(.+)(" + "|".join(list(ROAD_ABBR) + list(ROAD_ABBR.values())) + ") *$", re.I
)

# OSM keys that contain "name" but are not usable names, match.py:74-82
BAD_NAME_FIELDS = {
    "tiger:name_base", "name:right", "name:left", "gnis:county_name",
    "openGeoDB:name", "addr:street:name", "name:source",
}

# literal rewrite table applied by tidy_name, match.py:107-165 (data, ordered)
_TIDY_REWRITES = (
    (" no. ", " number "), (" nr ", " number "), (" hosp ", " hospital "),
    (" rgnl ", " regional "), ("saint ", "st "), ("mount ", "mt "),
    (" mountain", " mtn"), (" county", " co"),
    (" church of england ", " ce "), (" cofe ", " ce "), (" c of e ", " ce "),
    (" @ ", " at "), (" roman catholic ", " rc "), (" catholic ", " rc "),
    (" helena", " helen"), (" laurence", " lawrence"),
    (" holy ascension", "ascension"), (" most holy trinity", "holy trinity"),
    (" nicolas", " nicholas"), (" anne", " ann"), (" ethelreda", " etheldreda"),
    (" mary magdalene", " mary magdalen"), (" mary magdelene", " mary magdalen"),
    (" mary the virgin", " mary"), (" blessed virgin mary", " st mary"),
    (" nativity of the blessed virgin mary", " st mary"),
    (" margaret the queen", " margaret"), (" john the baptist", " john"),
    (" john the evangelist", " john"), (" john, the evangelist", " john"),
    (" john, apostle and evangelist", " john"), (" john the divine", " john"),
    (" michael the archangel", " michael"), (" luke the evangelist,", " luke"),
    (" giles the abbot", " giles"), (" andrew the apostle", " andrew"),
    (" peter the apostle", " peter"), (" thomas the apostle", " thomas"),
    (" lawrence the martyr", " lawrence"), (" alban the martyr", " alban"),
    (" egelwin the martyr", " egelwin"), (" nicholas the confessor", " nicholas"),
    (" edward the confessor", " edward"), (" edward the martyr", " edward"),
    (" edmund king and martyr", " edmund"), (" gregory the great", " gregory"),
    (" james the great", " james"), (" james the less", " james"),
    (" james the apostle", " james"), (" bartholemew", " bartholomew"),
    (" preparatory school", " prep school"), (" incorporated", " inc"),
    (" cooperative", " coop"), (" co-operative", " coop"),
    (" hotel and country club", " hotel"), (" hotel and spa", " hotel"),
    (" missionary baptist", " baptist"), (" thomas a becket", " thomas becket"),
    (" thomas of canterbury", " thomas becket"),
)


def no_alpha(s: str) -> bool:
    """True if the string has no alphabetic characters (match.py:85-87)."""
    return all(not c.isalpha() for c in s)


def any_upper(s: str) -> bool:
    """True if any character is uppercase (utils.py:105-107)."""
    return any(c.isupper() for c in s)


@lru_cache(maxsize=65536)
def tidy_name(n: str) -> str:
    """Normalise a lowercase name (match.py:103-177).

    ASCII-fold, strip, synonym rewrites, possessive strip, plural strip,
    ss->s, center->centre / theater->theatre.  Pure str→str with a
    per-process memo — the cascade retries the same names across rules and
    real corpora repeat names heavily (the scorer's hottest single helper).
    """
    n = fold_to_ascii(n).strip().rstrip("'")
    for old, new in _TIDY_REWRITES:
        n = n.replace(old, new)
    if n.endswith("'s"):
        n = n[:-2]
    if any(c.isalpha() and c != "s" for c in n):
        n = re_plural.sub("", n)
    n = n.replace("ss", "s")
    return n.replace("center", "centre").replace("theater", "theatre")


def drop_article(n: str) -> str:
    """Strip a leading article the/le/la/les (match.py:180-186)."""
    m = re_article.match(n)
    return m.group(1) + n[m.end():] if m else n


def strip_words(n: str) -> str:
    """Drop separator-bounded stop words (match.py:189-195)."""
    return re_stop_words.sub(lambda m: m.group(1), n)


def strip_to_chars(s: str, strip_dash: bool = False) -> str:
    """Remove everything except word chars, @ and (optionally) dashes."""
    return (re_strip_dash_too if strip_dash else re_keep_dash).sub("", s)


def strip_non_chars_match(osm: str, wd: str, strip_dash: bool = False) -> bool:
    """Equality after char-stripping, guarded by digit-sequence equality
    (match.py:261-272) — prevents "Board 1" == "Board 11"."""
    wd_s = strip_to_chars(wd, strip_dash)
    osm_s = strip_to_chars(osm, strip_dash)
    return bool(
        wd_s and osm_s and wd_s == osm_s
        and re_digits.findall(osm) == re_digits.findall(wd)
    )


def initials_match(
    n1: str, n2: str, endings: Collection[str] | None = None
) -> Match | None:
    """n1 is the initials of n2's terms (match.py:198-230)."""
    n1_lc = n1.lower()
    terms = [t for t in n2.split() if t[0].isalnum()]
    initials = "".join(t[0] for t in terms).upper()
    if len(initials) < 3 or len(n1) < 3:
        return None
    if initials == n1:
        return Match(INITIALS)
    if initials == "".join(c for c in n1 if c.isalnum()):
        return Match(INITIALS)
    if any(
        initials == n1[: -len(end)].strip()
        for end in endings or []
        if n1_lc.endswith(end.lower())
    ):
        return Match(INITIALS_TRIM)

    lc_terms = {t.lower() for t in terms}
    for word in ("of", "de", "di", "at", "i"):
        if word not in lc_terms:
            continue
        ret = initials_match(n1, " ".join(t for t in terms if t.lower() != word))
        if ret:
            return ret
    return None


def match_with_words_removed(
    osm: str, wd: str, words: Collection[str] | None
) -> Match | None:
    """Compare char-only forms with each listed word removed (match.py:233-258)."""
    if not words:
        return None
    wd_chars = strip_to_chars(wd, strip_dash=True)
    osm_chars = strip_to_chars(osm, strip_dash=True)
    clean_words = [strip_to_chars(w).lower() for w in words]
    osm_versions = {osm_chars.replace(w, "") for w in clean_words} | {osm_chars}
    wd_versions = {wd_chars.replace(w, "") for w in clean_words} | {wd_chars}

    best: Match | None = None
    for osm_v in osm_versions:
        if not osm_v:
            continue
        for wd_v in wd_versions:
            if not wd_v or osm_v != wd_v:
                continue
            if wd_v == wd_chars:
                return Match(GOOD, "match with words removed")
            kind = BOTH_TRIMMED if osm_v != osm_chars else WIKIDATA_TRIMMED
            best = Match(kind, "match with words removed")
    return best


def prefix_name_match(osm: str, wd: str) -> str | None:
    """If osm starts with wd, return the leftover tail (match.py:275-287)."""
    wd_lc, osm_lc = wd.lower(), osm.lower()
    if osm_lc.startswith(wd_lc):
        return osm[len(wd):].strip()
    space = osm.find(" ")
    while space != -1:
        if strip_non_chars_match(osm_lc[:space], wd_lc):
            return osm[space:].strip()
        space = osm.find(" ", space + 1)
    return None


def _is_initials_block(initials: str, name: str) -> bool:
    """check_for_intials_match (match.py:290-296)."""
    if any(c.islower() for c in initials):
        return False
    if len([c for c in initials if c.isupper()]) < 2:
        return False
    return bool(initials_match(initials, name))


def strip_non_char_start(s: str) -> str:
    """Strip non word chars from the start (match.py:299-302)."""
    return re_non_char_start.sub("", s)


def strip_non_letter_start(s: str) -> str:
    """Strip leading non-letters (match.py:305-306)."""
    return re_non_letter_start.sub("", s)


def drop_initials(name: str) -> str | None:
    """Remove a leading/trailing initials block that matches the rest
    (match.py:309-324): "RGC – Rainbow Grocery Coop" -> "Rainbow Grocery Coop".
    """
    first_space = name.find(" ")
    if first_space == -1:
        return None
    tail = strip_non_char_start(name[first_space:])
    if _is_initials_block(name[:first_space], tail):
        return tail
    last_space = name.rfind(" ")
    if last_space == first_space:
        return None
    head = strip_non_char_start(name[:last_space])
    if _is_initials_block(name[last_space:], head):
        return head
    return None


def split_on_upper(name: str) -> Iterator[str]:
    """Split a string at uppercase letters (match.py:327-338)."""
    xpos = 0
    for pos, char in enumerate(name):
        if not char.isupper():
            continue
        text = name[xpos:pos].rstrip()
        if text:
            yield text
        xpos = pos
    text = name[xpos:].rstrip()
    if text:
        yield text


def _split_on_upper_and_tidy(name: str) -> list[str]:
    parts = (strip_to_chars(p) for p in split_on_upper(name))
    return [p for p in parts if p]


def name_containing_initials(n1: str, n2: str) -> bool:
    """Part-wise match allowing single letters vs initials (match.py:346-382)."""
    if re_digits.findall(n1) != re_digits.findall(n2):
        return False
    if not any_upper(n1) or not any_upper(n2):
        return False
    s1 = _split_on_upper_and_tidy(n1)
    s2 = _split_on_upper_and_tidy(n2)

    if len(s1) != len(s2) or len(s1) < 3:
        endings = (" centre", " center")
        for end in endings:
            if n1.lower().endswith(end) and name_containing_initials(n1[: -len(end)], n2):
                return True
        for end in endings:
            if n2.lower().endswith(end) and name_containing_initials(n1, n2[: -len(end)]):
                return True
        return False

    for p1, p2 in zip(s1, s2):
        if p1 == p2:
            continue
        if p1.isdigit() or p2.isdigit():
            return False
        if len(p1) == 1 and p2[0] == p1:
            continue
        if len(p2) == 1 and p1[0] == p2:
            continue
        return False
    return True


def plural_word_name_in_other_name(n1: str, n2: str) -> bool:
    """Single plural word contained depluralized in the other name
    (match.py:385-392): blocks "Boots" matching "The Boot Inn"."""
    return (
        " " not in n1 and " " in n2
        and n1.endswith("s") and n1 not in n2 and n1[:-1] in n2
    )


def two_saints(n1: str, n2: str) -> bool:
    """Both names are two-saint dedications, one using Ss (match.py:395-403)."""
    return bool(
        all(" and " in n or " & " in n for n in (n1, n2))
        and (
            (re_ss.search(n1) and re_st.search(n2))
            or (re_st.search(n1) and re_ss.search(n2))
        )
    )


def _number_to_words_match(n1: str, n2: str) -> bool:
    """Digit-sequence substitution equality (match.py:475-480)."""
    if not any(c.isdigit() for c in n1):
        return False
    n1_words = re_digits.sub(lambda m: number_to_words(int(m.group(0))), n1)
    return n1_words.replace("-", " ") == n2.replace("-", " ")


def name_match_main(
    osm: str,
    wd: str,
    endings: set[str] | None = None,
    debug: bool | None = False,
) -> Match | None:
    """The ordered name-match cascade (match.py:406-572).

    Rule order is preserved exactly; see SURVEY.md §2.2 for the rule list.
    """
    if not wd or not osm:
        return None
    wd, osm = wd.strip(), osm.strip()

    if wd == osm:
        return Match(GOOD, "identical")

    if re_ordinal_number.search(osm):
        osm = ordinals_to_words(osm)
    if re_ordinal_number.search(wd):
        wd = ordinals_to_words(wd)

    osm_lc, wd_lc = osm.lower(), wd.lower()

    if "dsc" in wd_lc:  # strip camera image names like "DSC 8243"
        wd_lc = re_dsc_image.sub("", wd_lc)

    if two_saints(osm_lc, wd_lc):
        osm_lc = re_ss_or_st.sub("", osm_lc)
        wd_lc = re_ss_or_st.sub("", wd_lc)

    historic = " (historic)"
    if osm_lc.endswith(historic):
        osm = osm[: -len(historic)]
        osm_lc = osm_lc[: -len(historic)]

    if wd_lc == osm_lc:
        return Match(GOOD, "identical except case")

    if set(osm_lc.split()) == set(wd_lc.split()):
        return Match(GOOD, "matching term sets")

    if strip_non_chars_match(osm_lc, wd_lc, strip_dash=True):
        return Match(GOOD, "strip non chars and dash")

    if name_containing_initials(osm, wd):
        return Match(GOOD, "name containing initials")

    if endings:
        # mutation of the caller's set mirrors match.py:451-456
        at_pos = wd_lc.find(" at ")
        if at_pos != -1 and wd_lc[:at_pos] in endings:
            endings.remove(wd_lc[:at_pos])

    m = initials_match(osm, wd, endings) or initials_match(wd, osm, endings)
    if m:
        return m

    if strip_non_chars_match(osm_lc, wd_lc):
        return Match(GOOD, "strip non chars")

    wd_tidy1, osm_tidy1 = tidy_name(wd_lc), tidy_name(osm_lc)
    if not wd_tidy1 or not osm_tidy1:
        return None

    if wd_tidy1 == osm_tidy1:
        return Match(GOOD, "tidy")

    if _number_to_words_match(wd_tidy1, osm_tidy1) or _number_to_words_match(
        osm_tidy1, wd_tidy1
    ):
        return Match(GOOD, "number to words")

    wd_tidy2, osm_tidy2 = strip_words(wd_tidy1), strip_words(osm_tidy1)
    if wd_tidy2 == osm_tidy2:
        return Match(GOOD, "strip words")

    if endings:
        if set(osm_tidy2.split()) - set(endings) == set(wd_tidy2.split()) - set(endings):
            return Match(GOOD, "matching term sets")

    wd_tidy, osm_tidy = drop_article(wd_tidy2), drop_article(osm_tidy2)
    wd_names = {wd_tidy, wd_tidy1, wd_tidy2}
    osm_names = {osm_tidy, osm_tidy1, osm_tidy2}

    if wd_tidy == osm_tidy:
        return Match(GOOD, "drop article")

    m = match_with_words_removed(osm_lc, wd_lc, endings)
    if m:
        if "church" in osm_lc and "church" in wd_lc:
            return Match(GOOD, "words removed church")
        return m

    plural_in_other = plural_word_name_in_other_name(
        osm_lc, wd_lc
    ) or plural_word_name_in_other_name(wd_lc, osm_lc)

    if endings:
        m = match_with_words_removed(osm_tidy, wd_tidy, [tidy_name(e) for e in endings])
        if m and not plural_in_other:
            return m

    for osm_name in osm_names:
        for wd_name in wd_names:
            if strip_non_chars_match(osm_name, wd_name, strip_dash=True):
                return Match(GOOD, "strip non chars and dash after tidy")

    if "washington, d" in wd_tidy:  # special case for Washington, D.C.
        wd_tidy = wd_tidy.replace("washington, d", "washington d")

    for wd_name in wd_names:
        comma = wd_name.rfind(", ")
        for osm_name in osm_names:
            osm_chars = strip_to_chars(osm_name)
            if comma != -1 and not osm_chars.isdigit():
                wd_head = wd_name[:comma]
                if wd_head == osm_name or strip_non_chars_match(osm_name, wd_head):
                    return Match(GOOD, "comma strip 1")

    if wd_tidy.split() == list(reversed(osm_tidy.split())):
        return Match(GOOD, "tidy name terms reversed")

    wd_tidy = re_keep_commas.sub("", wd_tidy)
    osm_tidy = re_keep_commas.sub("", osm_tidy)

    comma = wd_tidy.rfind(", ")
    if comma != -1 and not osm_tidy.isdigit() and wd_tidy[:comma] == osm_tidy:
        return Match(GOOD, "comma strip 2")

    wd_tidy = re_keep_dash.sub("", wd_tidy)
    osm_tidy = re_keep_dash.sub("", osm_tidy)

    if plural_in_other:
        return None

    generic = ["companybuilding", "building", "complex", "office"]
    for end in generic + list(endings or []):
        if wd_tidy.endswith(end) and wd_tidy[: -len(end)] == osm_tidy:
            return Match(TRIM)
        if wd_tidy.startswith(end) and wd_tidy[len(end):] == osm_tidy:
            return Match(TRIM)
        if osm_tidy.endswith(end) and osm_tidy[: -len(end)] == wd_tidy:
            return Match(TRIM)
        if osm_tidy.startswith(end) and osm_tidy[len(end):] == wd_tidy:
            return Match(TRIM)
    return None


def strip_place_name(name: str, place_name: str) -> str:
    """Remove a place name with its connective (match.py:575-584)."""
    for word in ("of", "de", "di", "at", "i"):
        search = f" {word} {place_name}"
        if search in name:
            return name.replace(search, "")
    if place_name + "s " in name:
        return name.replace(place_name + "s ", "")
    return name.replace(place_name, "")


def more_place_name_variants(place_names: Collection[str]) -> set[str]:
    """Add "X" for "X City"/"X County" (match.py:587-594)."""
    names = set(place_names)
    for n in set(names):
        for e in ("city", "county"):
            if n.lower().endswith(" " + e) and len(n) > len(e) + 1:
                names.add(n[: -(len(e) + 1)])
    return names


def match_two_streets(
    osm: str, wd: str, endings: Collection[str] | None = None, **kwargs: Any
) -> Match | None:
    """Pairwise "A & B" street-corner match (match.py:597-630)."""
    endings = set(endings or [])
    osm_seps = [s for s in ("&", " and ", " And ") if s in osm]
    if len(osm_seps) != 1:
        return None
    wd_seps = [s for s in ("&", " and ", " And ") if s in wd]
    if len(wd_seps) != 1:
        return None

    osm_p1, _, osm_p2 = (p.strip() for p in osm.partition(osm_seps[0]))
    wd_p1, _, wd_p2 = (p.strip() for p in wd.partition(wd_seps[0]))

    def part_endings(a: str, b: str) -> set[str]:
        ends = set(endings)
        for n in (a, b):
            m = re_road_end.match(n)
            if m:
                ends.add(m.group(2).lower())
        return ends

    part1 = name_match_main(osm_p1, wd_p1, endings=part_endings(osm_p1, wd_p1), **kwargs)
    if not part1:
        return None
    part2 = name_match_main(osm_p2, wd_p2, endings=part_endings(osm_p2, wd_p2), **kwargs)
    return part1 if part2 else None


def name_road_end_match(osm: str, wd: str, **kwargs: Any) -> Match | None:
    """Number-prefixed road-ending match (match.py:633-646)."""
    osm, wd = osm.strip(), wd.strip()
    if not (osm and osm[0].isdigit() and wd and wd[0].isdigit()):
        return None
    m_osm = re_road_end.match(osm)
    m_wd = re_road_end.match(wd)
    if not m_osm and not m_wd:
        return None
    return name_match_main(
        m_osm.group(1) if m_osm else osm, m_wd.group(1) if m_wd else wd, **kwargs
    )


def name_match(
    osm: str,
    wd: str,
    endings: set[str] | None = None,
    debug: bool | None = False,
    place_names: Collection[str] | None = None,
) -> Match | None:
    """Full name comparison with retry variants (match.py:649-730)."""
    m = name_match_main(osm, wd, endings, debug)
    if m:
        return m

    for osm_prefix in ("old ", "the old ", "former ", "disused ", "alte "):
        if osm.lower().startswith(osm_prefix):
            m = name_match_main(osm[len(osm_prefix):], wd, endings, debug)
            if m:
                return m

    m = match_two_streets(osm, wd, endings=endings, debug=debug)
    if m:
        return m

    m = name_road_end_match(osm, wd, endings=endings, debug=debug)
    if m:
        return m

    # OSM may carry a building number Wikidata lacks: "1-3 Rectory Cottages"
    if osm and osm[0].isdigit() and any(
        t in wd.lower() for t in ("cottages", "buildings", "houses")
    ):
        m = name_match_main(strip_non_letter_start(osm), wd, endings, debug)
        if m:
            return Match(m.kind, ((m.debug + " ") if m.debug else "") + "+ strip non letter start")

    osm_no_initials = drop_initials(osm)
    if osm_no_initials:
        m = name_match_main(osm_no_initials, wd, endings, debug)
        if m:
            return Match(m.kind, ((m.debug + " ") if m.debug else "") + "+ drop initials")

    for start in ("Tomb of ", "Statue of ", "Memorial to "):
        if wd.startswith(start) and name_match_main(osm, wd[len(start):], endings):
            return Match(TRIM, start.lower().strip())

    start = "site of"
    if osm.lower().startswith(start) and name_match_main(osm[len(start):], wd, endings):
        return Match(TRIM, "site of")

    end = " and attached railings"
    if wd.lower().endswith(end) and name_match_main(osm, wd[: -len(end)], endings):
        return Match(TRIM, "and attached railings")

    if place_names:
        for place_name in more_place_name_variants(place_names):
            if place_name not in osm and place_name not in wd:
                continue
            m = name_match_main(
                strip_place_name(osm, place_name),
                strip_place_name(wd, place_name),
                endings,
                debug,
            )
            if m:
                return m

    if ";" not in osm:
        return None
    for osm_name in osm.split(";"):
        m = name_match(
            osm_name.strip(), wd, endings=endings, debug=debug, place_names=place_names
        )
        if m:
            return m
    return None


def normalize_name(name: str) -> str:
    """Ordinals to words, drop Dutch " bij ", strip to chars, lowercase
    (match.py:741-745).  Also the blocking key normalizer."""
    name = ordinals_to_words(name)
    name = name.replace(" bij ", "")
    return re_keep_dash.sub("", name.lower())


def normalized_name_match(name1: str, name2: str) -> bool:
    """Normalized equality with digit-sequence guard (match.py:748-753)."""
    return (
        re_digits.findall(name1) == re_digits.findall(name2)
        and normalize_name(name1) == normalize_name(name2)
    )


def normalized_name_startswith(name: str, prefix: str) -> bool:
    """Normalized prefix with digit-sequence guard (match.py:756-762)."""
    prefix_digits = re_digits.findall(prefix)
    return (
        re_digits.findall(name)[: len(prefix_digits)] == prefix_digits
        and normalize_name(name).startswith(normalize_name(prefix))
    )


def get_osm_names(osm_tags: dict[str, str]) -> dict[str, str]:
    """Name-ish OSM tags plus operator (match.py:956-962)."""
    return {
        k: v
        for k, v in osm_tags.items()
        if ("name" in k and k not in BAD_NAME_FIELDS) or k == "operator"
    }


def _initials_matches_other_wd_name(initials: str, wd_names: dict[str, Any]) -> bool:
    """match.py:965-970."""
    return any(w != initials and initials_match(initials, w) for w in wd_names)


def strip_operator(name: str, operator: str) -> str:
    """Remove the operator substring from a name (match.py:973-976)."""
    start = name.lower().find(operator.lower())
    return name[:start] + name[start + len(operator):]


# osm_key -> list of (match_kind, wikidata_name, source)
NameMatchDict = dict[str, list[tuple[str, str, Any]]]

# endings added per addr:city in 9 languages, match.py:1013-1026
_CITY_CONNECTIVES = ("in", "w", "à", "en", "em", "v", "i", "a")


def check_for_match(
    osm_tags: dict[str, str],
    wikidata_names: dict[str, Any],
    endings: Collection[str] | None = None,
    place_names: Collection[str] | None = None,
    trim_house: bool = True,
) -> NameMatchDict:
    """Per-pair name-match driver (match.py:982-1077).

    Returns {osm_key: [(match_kind, wikidata_name, source), ...]}.
    """
    endings = set(endings or [])
    if trim_house:
        endings.add("house")

    names = get_osm_names(osm_tags)
    operator = names["operator"].lower() if "operator" in names else None
    if not names or not wikidata_names:
        return {}

    if operator:
        stripped = {
            k: strip_operator(o, operator)
            for k, o in names.items()
            if operator in o.lower()
        }
        names.update(
            {
                k + " strip operator": n
                for k, n in stripped.items()
                if any(c.isalpha() for c in n)
            }
        )

    if "addr:city" in osm_tags:
        city = osm_tags["addr:city"].lower()
        endings |= {city} | {f"{conn} {city}" for conn in _CITY_CONNECTIVES}

    result: defaultdict[str, list[tuple[str, str, Any]]] = defaultdict(list)
    cache: dict[tuple[str, str], tuple[str, str, Any] | None] = {}
    for w, source in wikidata_names.items():
        for osm_key, o in names.items():
            if (o, w) in cache:
                entry = cache[(o, w)]
                if not entry:
                    continue
            else:
                m = name_match(o, w, endings, place_names=place_names)
                if not m and operator and o.lower().startswith(operator):
                    m = name_match(
                        o[len(operator):].rstrip(), w, endings, place_names=place_names
                    )
                    if m and m.kind in (BOTH_TRIMMED, WIKIDATA_TRIMMED):
                        continue
                if not m:
                    cache[(o, w)] = None
                    continue
                # both-names-trimmed via the operator tag doesn't count
                if m.kind == BOTH_TRIMMED and osm_key == "operator":
                    continue
                entry = (m.kind, w, source)
            if entry[0] == INITIALS and _initials_matches_other_wd_name(
                w, wikidata_names
            ):
                continue
            result[osm_key].append(entry)
    if result:
        return dict(result)

    # fallback: OSM name is "<wd name 1> <wd name 2>" (match.py:1063-1077)
    for w, source in wikidata_names.items():
        for osm_key, o in names.items():
            left_over = prefix_name_match(o, w)
            if not left_over:
                continue
            for second_w, _second_source in wikidata_names.items():
                if second_w == w:
                    continue
                if name_match(left_over, second_w, place_names=place_names):
                    result[osm_key].append((PREFIX, w, source))
                    break
    return dict(result)


def get_all_matches(
    osm_tags: dict[str, str],
    wikidata_names: dict[str, Any],
    endings: set[str] | None = None,
) -> list[dict[str, Any]]:
    """Debug variant returning every name match with provenance
    (match.py:1080-1107)."""
    names = get_osm_names(osm_tags)
    matches = []
    for w, source in wikidata_names.items():
        for osm_key, o in names.items():
            m = name_match(o, w, endings)
            if m:
                matches.append(
                    {
                        "match_type": m.kind,
                        "debug": m.debug,
                        "wikidata_name": w,
                        "wikidata_source": source,
                        "osm_name": o,
                        "osm_key": osm_key,
                    }
                )
    return matches
