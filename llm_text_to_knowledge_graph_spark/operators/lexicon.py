"""Deterministic orthography expansion for grounding dictionaries.

The reference grounds mentions with Gilda (grounding_genes.py:13-52),
whose terms table carries curated synonym/orthography variants per entry
(case twins, dash twins, Greek-letter spellings, species orthography).
This sandbox cannot ship Gilda's resource files, so this module derives
the MECHANICAL subset of those variants from the entry names themselves:
a pure function of the input rows — no model, no resources — which keeps
the expanded dictionary broadcast-able and engine-replayable at 100 TB
(the expansion runs once on the driver over the KB-sized alias table,
never per document).

Rules (all deterministic, all boundary-safe for the matcher's [\\w-]
word-boundary class):

* **Greek twins** — spelled Greek words inside an alias get the Greek
  character twin and vice versa ("TGF-beta" <-> "TGF-β"); symbol-like
  aliases with a trailing Greek-initial letter after a digit or a >=3
  letter stem get the suffix expansions biology prose actually prints
  ("HIF1A" -> "HIF-1alpha" / "HIF-1α", "TGFA" -> "TGF-alpha" /
  "TGF-α").
* **Dash twins** — single-token symbol aliases with digits get the
  hyphen-before-digit twin ("IRAK1" -> "IRAK-1"); hyphenated symbol
  aliases get the collapsed and spaced twins ("NF-kB" -> "NFkB",
  "NF kB").

Case twins and plural heads are intentionally NOT handled here — the
Selventa lexicon builder already generates them with its own
collision stoplist (real_gold_bel.selventa_lexicon), and blind case
folding of short acronyms ("NO" -> "No") is the classic
precision-killer this module must never introduce.
"""

from __future__ import annotations

GREEK_WORD_TO_CHAR = {
    "alpha": "α",
    "beta": "β",
    "gamma": "γ",
    "delta": "δ",
    "epsilon": "ε",
    "kappa": "κ",
    "sigma": "σ",
    "omega": "ω",
}
# trailing single-letter Greek initials on gene/protein symbols
# (HGNC-style "A/B/G/D/E" suffixes; K and S collide with too many
# non-Greek symbol tails to expand blindly)
_TRAILING_GREEK = {
    "A": "alpha",
    "B": "beta",
    "G": "gamma",
    "D": "delta",
    "E": "epsilon",
}


def _symbol_like(alias: str) -> bool:
    """Single-token, starts with a letter, no lowercase-word shape:
    all-caps or caps+digits (optionally hyphenated) — the shapes gene /
    protein / chemical symbols take."""
    if len(alias) < 4 or " " in alias:
        return False
    if not alias[0].isalpha():
        return False
    core = alias.replace("-", "")
    if not core.isalnum():
        return False
    # at least one uppercase char and no two consecutive lowercase chars
    # (rules out English words while keeping "FoxO1" / "IkB")
    if not any(c.isupper() for c in core):
        return False
    lowers = 0
    for c in core:
        lowers = lowers + 1 if c.islower() else 0
        if lowers >= 3:
            return False
    return True


def _greek_word_twins(alias: str) -> set[str]:
    """Spelled Greek word <-> Greek character, as a COMPLETE alpha token
    only: the word must not abut other letters ('Betaine' must never
    become 'βine'), and an alias that IS just the Greek word ('Gamma')
    never expands — its char twin would round-trip to a case-folded
    bare 'gamma', the blind-case-folding precision-killer this module
    forbids."""
    out: set[str] = set()
    low = alias.lower()
    for word, ch in GREEK_WORD_TO_CHAR.items():
        i = low.find(word)
        if i >= 0:
            before_ok = i == 0 or not alias[i - 1].isalpha()
            j = i + len(word)
            after_ok = j == len(alias) or not alias[j].isalpha()
            # at least 3 chars of non-Greek stem must remain
            if before_ok and after_ok and len(alias) - len(word) >= 3:
                out.add(alias[:i] + ch + alias[j:])
        if ch in alias and len(alias) - 1 >= 3:
            out.add(alias.replace(ch, word))
    return out


def _suffix_greek_twins(alias: str) -> set[str]:
    """Symbol with a trailing Greek-initial letter: 'HIF1A' ->
    hyphen/spelled/char suffix twins. Applies only when the letter
    follows a digit or a >=3-letter stem, so 'AKT' or 'ERK' never
    expand."""
    out: set[str] = set()
    if not _symbol_like(alias):
        return out
    last = alias[-1]
    word = _TRAILING_GREEK.get(last)
    if word is None:
        return out
    stem = alias[:-1].rstrip("-")
    if len(stem) < 3:
        return out
    prev = stem[-1]
    # the letter must terminate a symbol, not an English-ish tail:
    # require a digit immediately before it, or an all-caps stem
    if not (prev.isdigit() or stem.replace("-", "").isupper()):
        return out
    ch = GREEK_WORD_TO_CHAR[word]
    # hyphen placement follows the stem shape: digit-ending stems
    # hyphenate BEFORE the digit run ("HIF1" -> "HIF-1", so
    # "HIF-1alpha"), alpha-ending stems before the suffix itself
    # ("TGF" -> "TGF-alpha")
    stems = {stem}
    if prev.isdigit():
        k = len(stem)
        while k > 0 and stem[k - 1].isdigit():
            k -= 1
        if k > 0 and stem[k - 1].isalpha():
            stems.add(stem[:k] + "-" + stem[k:])
    for st in stems:
        for suffix in (word, ch):
            out.add(st + suffix)
            if not prev.isdigit():
                out.add(st + "-" + suffix)
        # the bare hyphen twin of the letter itself ("VEGFA" ->
        # "VEGF-A", "HIF1A" -> "HIF-1A")
        if st != stem:
            out.add(st + last)
        elif not prev.isdigit():
            out.add(st + "-" + last)
    return out


def _dash_twins(alias: str) -> set[str]:
    """Hyphen orthography: insert before the first digit run of an
    unhyphenated symbol; collapse / space an existing single hyphen."""
    out: set[str] = set()
    if not _symbol_like(alias):
        return out
    if "-" not in alias:
        k = next((i for i, c in enumerate(alias) if c.isdigit()), None)
        if k and alias[k - 1].isalpha():
            out.add(alias[:k] + "-" + alias[k:])
    elif alias.count("-") == 1:
        # collapse only — the spaced twin ("Akt-Ser473" -> "Akt Ser473")
        # measurably steals residue spans from the pmod patterns on the
        # dev shard, grounding the site-specific mention to the bare
        # entry and dropping the pmod
        collapsed = alias.replace("-", "")
        if len(collapsed) >= 4:
            out.add(collapsed)
    return out


def expand_orthography(
    rows: list[tuple[str, str, str, str, float]],
) -> list[tuple[str, str, str, str, float]]:
    """Append mechanical orthography variants to (alias, ns, id,
    entry_name, prior) rows. Pure, deterministic (input order wins on
    collisions), and idempotent: expanding an expanded list adds
    nothing new. Variants inherit their source row's grounding and
    prior."""
    seen = {r[0] for r in rows}
    out = list(rows)
    for alias, ns, id_, entry, prior in rows:
        # close the variant set under all three rules (sets are tiny —
        # a handful of strings per alias — so the fixpoint is cheap);
        # closure is what makes the pass idempotent
        variants: set[str] = {alias}
        while True:
            new = set()
            for v in variants:
                new |= _greek_word_twins(v)
                new |= _suffix_greek_twins(v)
                new |= _dash_twins(v)
            if new <= variants:
                break
            variants |= new
        variants.discard(alias)
        for v in sorted(variants):
            if len(v) < 3 or v == alias or v in seen:
                continue
            seen.add(v)
            out.append((v, ns, id_, entry, float(prior)))
    return out
