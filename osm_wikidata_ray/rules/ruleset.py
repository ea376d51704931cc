"""RuleSet — compiled static rule tables, built once per scorer actor.

The reference loads these as module globals / per-call queries
(matcher/matcher.py:50-63,112-116,486-488; matcher/embassy.py:894-913); the
engine compiles them once in each map_batches actor's __init__ and shares
them zero-copy across batches (SURVEY.md §2.3).
"""

from __future__ import annotations

import json
import re
from typing import Any

from . import tags as tag_rules
from .tags import DATA_DIR

# Static QID → ISO 3166 codes for countries used by the embassy veto.
# The reference resolves these via live SPARQL (wikidata.py:1394-1429); the
# engine ships a broadcastable table (public ISO 3166 data), extensible via
# the RuleSet constructor.
COUNTRY_ISO_CODES: dict[str, list[str]] = {
    "Q16": ["CA", "CAN"], "Q17": ["JP", "JPN"], "Q20": ["NO", "NOR"],
    "Q27": ["IE", "IRL"], "Q28": ["HU", "HUN"], "Q29": ["ES", "ESP"],
    "Q30": ["US", "USA"], "Q31": ["BE", "BEL"], "Q32": ["LU", "LUX"],
    "Q33": ["FI", "FIN"], "Q34": ["SE", "SWE"], "Q35": ["DK", "DNK"],
    "Q36": ["PL", "POL"], "Q37": ["LT", "LTU"], "Q38": ["IT", "ITA"],
    "Q39": ["CH", "CHE"], "Q40": ["AT", "AUT"], "Q41": ["GR", "GRC"],
    "Q43": ["TR", "TUR"], "Q45": ["PT", "PRT"], "Q55": ["NL", "NLD"],
    "Q77": ["UY", "URY"], "Q79": ["EG", "EGY"], "Q96": ["MX", "MEX"],
    "Q114": ["KE", "KEN"], "Q115": ["ET", "ETH"], "Q117": ["GH", "GHA"],
    "Q142": ["FR", "FRA"], "Q145": ["GB", "GBR"], "Q148": ["CN", "CHN"],
    "Q155": ["BR", "BRA"], "Q159": ["RU", "RUS"], "Q183": ["DE", "DEU"],
    "Q184": ["BY", "BLR"], "Q189": ["IS", "ISL"], "Q191": ["EE", "EST"],
    "Q211": ["LV", "LVA"], "Q212": ["UA", "UKR"], "Q213": ["CZ", "CZE"],
    "Q214": ["SK", "SVK"], "Q215": ["SI", "SVN"], "Q218": ["RO", "ROU"],
    "Q219": ["BG", "BGR"], "Q221": ["MK", "MKD"], "Q222": ["AL", "ALB"],
    "Q223": ["GL", "GRL"], "Q224": ["HR", "HRV"], "Q225": ["BA", "BIH"],
    "Q227": ["AZ", "AZE"], "Q228": ["AD", "AND"], "Q229": ["CY", "CYP"],
    "Q230": ["GE", "GEO"], "Q232": ["KZ", "KAZ"], "Q233": ["MT", "MLT"],
    "Q235": ["MC", "MCO"], "Q236": ["ME", "MNE"], "Q237": ["VA", "VAT"],
    "Q241": ["CU", "CUB"], "Q242": ["BZ", "BLZ"], "Q244": ["BB", "BRB"],
    "Q252": ["ID", "IDN"], "Q258": ["ZA", "ZAF"], "Q262": ["DZ", "DZA"],
    "Q265": ["UZ", "UZB"], "Q298": ["CL", "CHL"], "Q334": ["SG", "SGP"],
    "Q347": ["LI", "LIE"], "Q398": ["BH", "BHR"], "Q399": ["AM", "ARM"],
    "Q408": ["AU", "AUS"], "Q414": ["AR", "ARG"], "Q419": ["PE", "PER"],
    "Q423": ["KP", "PRK"], "Q424": ["KH", "KHM"], "Q574": ["TL", "TLS"],
    "Q657": ["TD", "TCD"], "Q664": ["NZ", "NZL"], "Q668": ["IN", "IND"],
    "Q672": ["TV", "TUV"], "Q678": ["TO", "TON"], "Q686": ["VU", "VUT"],
    "Q691": ["PG", "PNG"], "Q695": ["PW", "PLW"], "Q697": ["NR", "NRU"],
    "Q702": ["FM", "FSM"], "Q709": ["MH", "MHL"], "Q710": ["KI", "KIR"],
    "Q711": ["MN", "MNG"], "Q712": ["FJ", "FJI"], "Q717": ["VE", "VEN"],
    "Q730": ["SR", "SUR"], "Q733": ["PY", "PRY"], "Q734": ["GY", "GUY"],
    "Q736": ["EC", "ECU"], "Q739": ["CO", "COL"], "Q750": ["BO", "BOL"],
    "Q754": ["TT", "TTO"], "Q757": ["VC", "VCT"], "Q760": ["LC", "LCA"],
    "Q763": ["KN", "KNA"], "Q766": ["JM", "JAM"], "Q769": ["GD", "GRD"],
    "Q774": ["GT", "GTM"], "Q778": ["BS", "BHS"], "Q781": ["AG", "ATG"],
    "Q783": ["HN", "HND"], "Q786": ["DO", "DOM"], "Q790": ["HT", "HTI"],
    "Q792": ["SV", "SLV"], "Q794": ["IR", "IRN"], "Q796": ["IQ", "IRQ"],
    "Q800": ["CR", "CRI"], "Q801": ["IL", "ISR"], "Q804": ["PA", "PAN"],
    "Q805": ["YE", "YEM"], "Q810": ["JO", "JOR"], "Q811": ["NI", "NIC"],
    "Q813": ["KG", "KGZ"], "Q817": ["KW", "KWT"], "Q819": ["LA", "LAO"],
    "Q822": ["LB", "LBN"], "Q826": ["MV", "MDV"], "Q833": ["MY", "MYS"],
    "Q836": ["MM", "MMR"], "Q837": ["NP", "NPL"], "Q842": ["OM", "OMN"],
    "Q843": ["PK", "PAK"], "Q846": ["QA", "QAT"], "Q851": ["SA", "SAU"],
    "Q854": ["LK", "LKA"], "Q858": ["SY", "SYR"], "Q863": ["TJ", "TJK"],
    "Q865": ["TW", "TWN"], "Q869": ["TH", "THA"], "Q874": ["TM", "TKM"],
    "Q878": ["AE", "ARE"], "Q881": ["VN", "VNM"], "Q884": ["KR", "KOR"],
    "Q889": ["AF", "AFG"], "Q902": ["BD", "BGD"], "Q912": ["ML", "MLI"],
    "Q916": ["AO", "AGO"], "Q917": ["BT", "BTN"], "Q921": ["BN", "BRN"],
    "Q924": ["TZ", "TZA"], "Q928": ["PH", "PHL"], "Q929": ["CF", "CAF"],
    "Q945": ["TG", "TGO"], "Q948": ["TN", "TUN"], "Q953": ["ZM", "ZMB"],
    "Q954": ["ZW", "ZWE"], "Q958": ["SS", "SSD"], "Q962": ["BJ", "BEN"],
    "Q963": ["BW", "BWA"], "Q965": ["BF", "BFA"], "Q967": ["BI", "BDI"],
    "Q970": ["KM", "COM"], "Q971": ["CG", "COG"], "Q974": ["CD", "COD"],
    "Q977": ["DJ", "DJI"], "Q983": ["GQ", "GNQ"], "Q986": ["ER", "ERI"],
    "Q1000": ["GA", "GAB"], "Q1005": ["GM", "GMB"], "Q1006": ["GN", "GIN"],
    "Q1007": ["GW", "GNB"], "Q1008": ["CI", "CIV"], "Q1009": ["CM", "CMR"],
    "Q1011": ["CV", "CPV"], "Q1013": ["LS", "LSO"], "Q1014": ["LR", "LBR"],
    "Q1016": ["LY", "LBY"], "Q1019": ["MG", "MDG"], "Q1020": ["MW", "MWI"],
    "Q1025": ["MR", "MRT"], "Q1027": ["MU", "MUS"], "Q1028": ["MA", "MAR"],
    "Q1029": ["MZ", "MOZ"], "Q1030": ["NA", "NAM"], "Q1032": ["NE", "NER"],
    "Q1033": ["NG", "NGA"], "Q1036": ["UG", "UGA"], "Q1037": ["RW", "RWA"],
    "Q1039": ["ST", "STP"], "Q1041": ["SN", "SEN"], "Q1042": ["SC", "SYC"],
    "Q1044": ["SL", "SLE"], "Q1045": ["SO", "SOM"], "Q1049": ["SD", "SDN"],
    "Q1050": ["SZ", "SWZ"], "Q1183": ["PR", "PRI"], "Q159583": ["VA"],
}


class RuleSet:
    """Compiled rule tables shared by scorer actors.

    __init__ cost is paid once per actor (map_batches callable-class
    pattern); everything here is read-only afterwards.
    """

    def __init__(
        self,
        bad_match_filters: list[tuple[str, str]] | None = None,
        country_iso: dict[str, list[str]] | None = None,
        extract_name_good_enough: bool = True,
        match_address_nodes: bool = False,
        hunt_for_more_place_names: bool = False,
    ) -> None:
        self.type_rules = tag_rules.load_type_rules()
        self.extra_type_tags = tag_rules.load_extra_type_tags()
        # runtime-extensible (wikidata_tag, osm_tag) incompatibility rules
        # (reference BadMatchFilter DB table, model.py:1462-1497); defaults
        # ship in data/bad_match_filters.json, extra rows via the constructor
        defaults = json.load(open(DATA_DIR / "bad_match_filters.json"))["filters"]
        self.bad_match_filters = [(f["wikidata"], f["osm"]) for f in defaults]
        self.bad_match_filters += list(bad_match_filters or [])
        self.country_iso = dict(COUNTRY_ISO_CODES)
        if country_iso:
            self.country_iso.update(country_iso)
        self.extract_name_good_enough = extract_name_good_enough
        self.match_address_nodes = match_address_nodes
        # within-polygon place names (§2.4 #38, rules/within.py) — the
        # reference's HUNT_FOR_MORE_PLACE_NAMES config, default off
        # (matcher.py:658)
        self.hunt_for_more_place_names = hunt_for_more_place_names

        # embassy country-name → QID longest-first regex (embassy.py:894-913)
        embassy = json.load(open(DATA_DIR / "embassy_countries.json"))
        reverse: dict[str, str] = {}
        for qid, names in embassy.items():
            for name in names:
                reverse[name] = qid
                reverse[name.lower()] = qid
        self._embassy_reverse = reverse
        longest_first = sorted(reverse, key=len, reverse=True)
        self._re_embassy = re.compile(
            r"(?:\b|')(" + "|".join(re.escape(n) for n in longest_first) + r")s?\b",
            re.I,
        )

    def embassy_country_from_name(self, name: str) -> str | None:
        """Country QID mentioned in an embassy name (embassy.py:894-913)."""
        m = self._re_embassy.search(name)
        if not m:
            return None
        hit = m.group(1)
        return self._embassy_reverse.get(hit) or self._embassy_reverse.get(hit.lower())

    def bad_match_filter_hit(
        self, wikidata_tags: set[str], osm_tags: dict[str, str]
    ) -> bool:
        """Any BadMatchFilter rule fires (model.py:1477-1497)."""

        def check_osm(tag_or_key: str) -> bool:
            if "=" not in tag_or_key:
                return tag_or_key in osm_tags
            k, _, v = tag_or_key.partition("=")
            return k in osm_tags and v in osm_tags[k].split(";")

        def check_wikidata(tag_or_key: str) -> bool:
            if tag_or_key in wikidata_tags:
                return True
            if "=" in tag_or_key:
                return False
            return any(
                t[: t.find("=")] == tag_or_key for t in wikidata_tags if "=" in t
            )

        return any(
            check_wikidata(wd)
            and not check_wikidata(osm)
            and check_osm(osm)
            and not check_osm(wd)
            for wd, osm in self.bad_match_filters
        )

    def country_codes(self, qids: Any) -> set[str]:
        codes: set[str] = set()
        for qid in qids or []:
            codes.update(self.country_iso.get(qid, []))
        return codes
