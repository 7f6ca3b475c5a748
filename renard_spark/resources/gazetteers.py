"""Gazetteer dimension data: titles, pronouns, determiners, hypocorisms.

Small public word lists (broadcast dimension tables at runtime). The
semantics mirror the reference lookups
(/root/reference/renard/resources/{titles,pronouns,determiners,hypocorisms}),
the hypocorism list itself is a from-scratch compilation of well-known
English nickname conventions (the reference vendors the Apache-2.0
carltonnorthern nickname lookup; we ship our own compact list with the
same lookup semantics: symmetric name<->nickname relation, lowercased).
"""

from __future__ import annotations

from collections import defaultdict

MALE_TITLES = {
    "eng": {"mr.", "mr", "mister", "m.", "m", "sir", "lord"},
    "fra": {"monsieur", "mr", "mr.", "seigneur", "duc", "comte", "m", "m.", "sire"},
}

FEMALE_TITLES = {
    "eng": {"miss", "mrs.", "mrs", "lady"},
    "fra": {"madame", "mademoiselle", "dame", "mme", "mlle"},
}

ALL_TITLES = {k: MALE_TITLES[k] | FEMALE_TITLES[k] for k in MALE_TITLES}

# titles recognized by the name *parser* (stripped from names) — a
# superset of the gendered ones; gender inference only consults the
# gendered sets above.
PARSER_TITLES = {
    "eng": ALL_TITLES["eng"] | {"dr", "dr.", "ms", "ms.", "madam", "professor", "captain", "colonel", "reverend"},
    "fra": ALL_TITLES["fra"] | {"dr", "dr.", "professeur", "capitaine"},
}

MALE_PRONOUNS = {
    "eng": {"he", "him", "his", "himself"},
    "fra": {"il", "son", "lui-même"},
}
FEMALE_PRONOUNS = {
    "eng": {"she", "her", "hers", "herself"},
    "fra": {"elle", "sa", "elle-même"},
}

SINGULAR_DETERMINERS = {
    "eng": {"a", "some", "the", "his", "her", "my", "their", "this", "that",
            "its", "our", "your", "such"},
    "fra": {"le", "la", "les", "un", "une", "du", "de", "de la", "ce", "cette",
            "mon", "ma", "ton", "ta", "son", "sa", "notre", "votre", "leur",
            "au", "à", "l '"},
}

# name -> nicknames. Compact, covers common English names (and the
# synthetic corpus cast). Lookup is symmetric via are_related().
HYPOCORISMS: dict[str, list[str]] = {
    "abigail": ["abby", "gail"],
    "alexander": ["alex", "sasha", "xander"],
    "andrew": ["andy", "drew"],
    "anthony": ["tony"],
    "benjamin": ["ben", "benny"],
    "catherine": ["kate", "katie", "kitty", "cathy", "cat"],
    "charles": ["charlie", "chuck", "chas"],
    "charlotte": ["lottie", "charlie"],
    "christopher": ["chris", "kit"],
    "daniel": ["dan", "danny"],
    "david": ["dave", "davy"],
    "dorothy": ["dot", "dottie"],
    "edward": ["ed", "eddie", "ned", "ted", "teddy"],
    "eleanor": ["ellie", "nell", "nora"],
    "elizabeth": ["liz", "lizzy", "beth", "betsy", "eliza", "betty", "libby"],
    "frances": ["fanny", "fran"],
    "francis": ["frank", "fran"],
    "frederick": ["fred", "freddy"],
    "george": ["georgie"],
    "gerald": ["gerry", "jerry"],
    "henry": ["hank", "harry", "hal"],
    "james": ["jim", "jimmy", "jamie"],
    "jane": ["janie", "jenny"],
    "john": ["jack", "johnny"],
    "joseph": ["joe", "joey"],
    "josephine": ["jo", "josie"],
    "katherine": ["kate", "katie", "kitty", "kathy"],
    "lydia": ["liddy"],
    "margaret": ["peggy", "maggie", "meg", "madge"],
    "martha": ["mattie", "patsy"],
    "mary": ["molly", "polly", "mamie"],
    "michael": ["mike", "mick", "mickey"],
    "nicholas": ["nick", "nicky"],
    "patricia": ["pat", "patty", "trish"],
    "peter": ["pete"],
    "philip": ["phil", "pip"],
    "rebecca": ["becky", "becca"],
    "richard": ["rick", "dick", "richie"],
    "robert": ["rob", "bob", "bobby", "robin"],
    "samuel": ["sam", "sammy"],
    "sarah": ["sally", "sadie"],
    "stephen": ["steve", "stevie"],
    "susan": ["sue", "susie"],
    "theodore": ["ted", "teddy", "theo"],
    "thomas": ["tom", "tommy"],
    "victoria": ["vicky", "tori"],
    "william": ["will", "bill", "billy", "willy", "liam"],
}

_NICK_TO_NAMES: dict[str, set[str]] = defaultdict(set)
for _n, _nicks in HYPOCORISMS.items():
    for _k in _nicks:
        _NICK_TO_NAMES[_k].add(_n)


def nicknames_of(name: str) -> set[str]:
    return set(HYPOCORISMS.get(name.lower(), ()))


def names_of_nickname(nick: str) -> set[str]:
    return set(_NICK_TO_NAMES.get(nick.lower(), ()))


def hypocorism_related(name1: str, name2: str,
                       extra: dict[str, set[str]] | None = None) -> bool:
    """True iff equal (lowercased) or one is a known nickname of the other.

    Mirrors HypocorismGazetteer.are_related (hypocorisms.py:73-84):
    empty strings are never related.
    """
    if name1 == "" or name2 == "":
        return False
    n1, n2 = name1.lower(), name2.lower()
    if n1 == n2:
        return True
    if n2 in nicknames_of(n1) or n2 in names_of_nickname(n1):
        return True
    if extra:
        if n2 in extra.get(n1, ()) or n1 in extra.get(n2, ()):
            return True
    return False


def is_male_title(t: str, lang: str = "eng") -> bool:
    return t.lower() in MALE_TITLES[lang]


def is_female_title(t: str, lang: str = "eng") -> bool:
    return t.lower() in FEMALE_TITLES[lang]


def is_male_pronoun(w: str, lang: str = "eng") -> bool:
    return w.lower() in MALE_PRONOUNS[lang]


def is_female_pronoun(w: str, lang: str = "eng") -> bool:
    return w.lower() in FEMALE_PRONOUNS[lang]


def hypocorism_rows() -> list[tuple[str, str]]:
    """Flattened (name, nickname) rows — the broadcastable dim table."""
    return [(n, k) for n, nicks in HYPOCORISMS.items() for k in nicks]
