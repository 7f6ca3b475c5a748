"""A tiny deterministic person-name parser.

Replaces the reference's `nameparser.HumanName` dependency
(character_unification.py:262-276, 306-315, 424-429) for the simple
western-name shapes the unification rules consult: leading title(s),
first, middle, last. Pure Python — runs inside Arrow-batched UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

from renard_spark.resources.gazetteers import PARSER_TITLES


@dataclass(frozen=True)
class ParsedName:
    title: str
    first: str
    middle: str
    last: str

    @property
    def without_title(self) -> str:
        """'{first} {middle} {last}' reformat, the reference's
        title-removal comparison string (character_unification.py:380-396)."""
        return " ".join(p for p in (self.first, self.middle, self.last) if p)


@lru_cache(maxsize=1 << 16)
def parse_name(name: str, lang: str = "eng") -> ParsedName:
    """Memoized per executor worker: corpora repeat the same surface
    forms millions of times (ParsedName is frozen, so sharing is safe)."""
    toks = name.split()
    titles = PARSER_TITLES.get(lang, PARSER_TITLES["eng"])
    title_parts: list[str] = []
    while toks and (
        toks[0].lower() in titles or toks[0].lower().rstrip(".") in titles
    ):
        title_parts.append(toks.pop(0))
    title = " ".join(title_parts)
    if not toks:
        return ParsedName(title, "", "", "")
    if len(toks) == 1:
        # nameparser semantics: a bare name is a first name, but a
        # single name following a title is a LAST name ("Mr Darcy" →
        # last=Darcy), which is what makes the shared-last-name rule
        # link titled forms (character_unification.py:261-269).
        if title:
            return ParsedName(title, "", "", toks[0])
        return ParsedName(title, toks[0], "", "")
    if len(toks) == 2:
        return ParsedName(title, toks[0], "", toks[1])
    return ParsedName(title, toks[0], " ".join(toks[1:-1]), toks[-1])
