"""Country-name → ISO2 cleaning (SURVEY.md §2.8 F8).

Reference behavior: ``entity.add("country", "France")`` stores ``"fr"``
(asserted in /root/reference/tests/test_util.py:23-27; registry-based
cleaning in /root/reference/investigraph/helpers/addresses.py:119-141,
backed by the ``rigour`` territory registry).

Spark translation: a literal lookup map compiled into the plan
(``element_at`` on a map literal — whole-stage codegen, no join, no
Python).  The table below is a public-knowledge subset (ISO 3166);
extend as needed — unknown names pass through lowercased 2-letter
codes or null.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# name (lowercased) → iso2; deliberately includes common English names
# and a few native spellings the reference's registry resolves
COUNTRY_TO_ISO2: dict[str, str] = {
    "afghanistan": "af", "albania": "al", "algeria": "dz", "argentina": "ar",
    "australia": "au", "austria": "at", "bangladesh": "bd", "belgium": "be",
    "brazil": "br", "bulgaria": "bg", "canada": "ca", "chile": "cl",
    "china": "cn", "colombia": "co", "croatia": "hr", "cyprus": "cy",
    "czech republic": "cz", "czechia": "cz", "denmark": "dk", "egypt": "eg",
    "estonia": "ee", "ethiopia": "et", "finland": "fi", "france": "fr",
    "germany": "de", "deutschland": "de", "ghana": "gh", "greece": "gr",
    "hungary": "hu", "iceland": "is", "india": "in", "indonesia": "id",
    "iran": "ir", "iraq": "iq", "ireland": "ie", "israel": "il",
    "italy": "it", "japan": "jp", "kenya": "ke", "latvia": "lv",
    "lithuania": "lt", "luxembourg": "lu", "malta": "mt", "mexico": "mx",
    "morocco": "ma", "netherlands": "nl", "the netherlands": "nl",
    "new zealand": "nz", "nigeria": "ng", "norway": "no", "pakistan": "pk",
    "peru": "pe", "philippines": "ph", "poland": "pl", "portugal": "pt",
    "romania": "ro", "russia": "ru", "russian federation": "ru",
    "saudi arabia": "sa", "serbia": "rs", "singapore": "sg", "slovakia": "sk",
    "slovenia": "si", "south africa": "za", "south korea": "kr",
    "spain": "es", "sweden": "se", "switzerland": "ch", "syria": "sy",
    "taiwan": "tw", "thailand": "th", "turkey": "tr", "türkiye": "tr",
    "uganda": "ug", "ukraine": "ua", "united arab emirates": "ae",
    "united kingdom": "gb", "uk": "gb", "great britain": "gb",
    "united states": "us", "usa": "us", "united states of america": "us",
    "venezuela": "ve", "vietnam": "vn", "yemen": "ye",
    # supranational pseudo-codes the reference's fixtures use
    "european union": "eu", "eu": "eu",
}

_ISO2 = sorted(set(COUNTRY_TO_ISO2.values()))


def clean_country(col: Column) -> Column:
    """Country name/code → ISO2 (lowercase); unknown → null.

    Mirrors the add-time cleaning semantics: 2-letter codes are
    case-folded and validated; names resolve through the registry.
    """
    norm = F.lower(F.regexp_replace(col.cast("string"), r"^\s+|\s+$", ""))
    pairs: list[Column] = []
    for name, code in COUNTRY_TO_ISO2.items():
        pairs += [F.lit(name), F.lit(code)]
    table = F.create_map(*pairs)
    mapped = F.element_at(table, norm)
    is_code = norm.isin(_ISO2)
    return F.coalesce(mapped, F.when(is_code, norm))
