"""Scalar text functions with reference-exact semantics.

Reference parity (cited into /root/reference):
- accent folding + symbol strip: app/util_ocr.py:309-320 (only the seven
  listed accent groups fold; every other non ``[0-9a-zA-Z ]`` char becomes a
  space; result lowercased).
- one-pass double-space collapse: app/util_ocr.py:117 (``str.replace`` runs
  once, so a triple space collapses to a double space, not a single one).
- broken-paragraph re-join: app/util.py:204-224 with the abbreviation
  regex built from app/util.py:17-25.
"""

from __future__ import annotations

import re

# app/util_ocr.py:309-315 — the folding groups. The reference stores them in
# a *set* of compiled regexes; the patterns are disjoint so application order
# does not matter and a flat char map is equivalent.
_ACCENT_MAP = str.maketrans(
    {
        "á": "a", "â": "a", "à": "a", "ã": "a", "ä": "a",
        "é": "e", "è": "e", "ê": "e", "ë": "e",
        "í": "i", "ì": "i", "î": "i", "ï": "i",
        "ó": "o", "ò": "o", "ô": "o", "ö": "o", "õ": "o",
        "ú": "u", "ù": "u", "ü": "u", "û": "u",
        "ç": "c",
        "ñ": "n",
    }
)

_NON_ALNUM_RE = re.compile(r"[^0-9a-zA-Z ]")

# Spark SQL equivalents of the same map, used to keep the SQL-side
# normalization (entry queries / oracles) in lockstep with this kernel.
ACCENT_SRC = "áâàãäéèêëíìîïóòôöõúùüûçñ"
ACCENT_DST = "aaaaaeeeeiiiiooooouuuucn"


def fold_accents_symbols(text: str) -> str:
    """app/util_ocr.py:316-320 — fold accents, strip symbols to spaces, lower.

    Note: folding happens BEFORE the symbol strip, so only the seven mapped
    groups survive as letters; e.g. ``ý`` is stripped to a space.
    """
    folded = text.translate(_ACCENT_MAP)
    return _NON_ALNUM_RE.sub(" ", folded).lower()


def collapse_box_text(raw: str) -> str:
    """app/util_ocr.py:117 — strip then ONE pass of double-space collapse."""
    return raw.strip().replace("  ", " ")


# ---------------------------------------------------------------------------
# Broken-paragraph re-join (app/util.py:17-27, 204-224)
# ---------------------------------------------------------------------------

_ABBREVIATIONS = [
    "sra?s?", "exm[ao]s?", "ns?", "nos?", "doc", "ac", "publ", "ex", "lv",
    "vlr?", "vls?", r"exmo\(a\)", r"ilmo\(a\)", "av", "of", "min", "livr?",
    "co?ls?", "univ", "resp", "cli", "lb", "dra?s?", r"[a-z]+r\(as?\)", "ed",
    "pa?g", "cod", "prof", "op", "plan", "edf?", "func", "ch", "arts?",
    "artigs?", "artg", "pars?", "rel", "tel", "res", "[a-z]", "vls?", "gab",
    "bel", "ilm[oa]", "parc", "proc", "adv", "vols?", "cels?", "pp", "ex[ao]",
    "eg", "pl", "ref", "reg", "f[ilí]s?", "inc", "par", "alin", "fts",
    "publ?", "ex", "v. em", "v.rev", "des", r"des\(a\)", "desemb",
]

ABBREV_RE = re.compile(
    r"(?:\b{})\.\s*$".format(r"|\b".join(_ABBREVIATIONS)), re.IGNORECASE
)

_FINAL_PUNCT = {".", "?", "!"}


def _ends_in_final_punct(line: str) -> bool:
    stripped = line.strip()
    if not stripped:
        return False
    return stripped[-1] in _FINAL_PUNCT


def rejoin_broken_paragraphs(text) -> list:
    """app/util.py:204-224 — join a line onto the previous one unless the
    previous line ends in ``. ? !`` *not* preceded by a known abbreviation.

    Accepts a string (split on ``\\n``) or a list of lines; returns the list
    of re-joined lines. Replicates the reference exactly, including the
    ``res[-1].strip() + ' ' + linha`` join (trailing spaces of the merged
    prefix are stripped, the appended line keeps its own leading spaces).
    """
    lines = text if isinstance(text, list) else text.split("\n")
    out: list = []
    for i, line in enumerate(lines):
        if i == 0:
            out.append(line)
            continue
        prev = lines[i - 1]
        if (not _ends_in_final_punct(prev)) or (
            _ends_in_final_punct(prev) and ABBREV_RE.search(prev)
        ):
            if len(out) == 0:
                out = [""]
            out[len(out) - 1] = out[-1].strip() + " " + line
        else:
            out.append(line)
    return out
