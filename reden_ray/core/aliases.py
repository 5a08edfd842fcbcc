"""Alias generation for the dictionary-build pipeline (M10-M12).

Behavioral parity with the reference author-alias rules
(/root/reference/src/fr/lip6/reden/ldextractor/per/AuthorBNF.java:93-192):
full name, family-name-only, "M"/"Mme" titles with and without a dot,
honorific particles (de, d', von, da), first-name initials with and
without dots, and the honorific x title x initials combinations.
Output order is canonicalized (sorted) — the reference emits a HashSet,
i.e. leaves order unspecified.

Also the normalized display name ("Last, First (birth-death)",
AuthorBNF.java:93-105) and rejected-form truncation at the first "("
(QueryAuthorBNF.java:175-181).
"""

from __future__ import annotations

HONORIFICS = ("de", "d'", "von", "da")


def _title(gender: str) -> str:
    return "Mme" if gender.lower() == "female" else "M"


def _initials(firstname: str) -> str:
    return " ".join(c for c in firstname if c.isupper())


def _honorific(firstname: str) -> str | None:
    for hon in HONORIFICS:
        if firstname.endswith(" " + hon):
            return hon
    return None


def normalized_name(
    firstname: str, lastname: str, birth: str | None = None, death: str | None = None
) -> str:
    """``"Last, First (b-d)"`` with ``'`` -> ``' `` and double-space collapse."""
    if firstname in ("-", ""):
        name = lastname
    else:
        name = f"{lastname}, {firstname}"
    name = name.replace("'", "' ")
    if birth is not None and death is not None:
        name = f"{name} ({birth}-{death})"
    return name.replace("  ", " ")


def truncate_rejected_form(form: str) -> str:
    """Cut an alternative label at the first ``(`` and strip."""
    idx = form.find("(")
    return (form[:idx] if idx >= 0 else form).strip()


def make_aliases(firstname: str, lastname: str, gender: str = "male") -> list[str]:
    """All alias surface forms for one (firstname, lastname, gender)."""
    aliases: set[str] = set()
    title = _title(gender)
    has_first = firstname not in ("-", "")

    if has_first:
        aliases.add(f"{firstname} {lastname}")
    aliases.add(lastname)

    aliases.add(f"{title} {lastname}")
    aliases.add(f"{title}. {lastname}")
    if has_first:
        aliases.add(f"{title} {firstname} {lastname}")
        aliases.add(f"{title}. {firstname} {lastname}")

    hon = _honorific(firstname)
    if hon is not None:
        aliases.add(f"{hon} {lastname}")
        aliases.add(f"{hon[0].upper()}{hon[1:]} {lastname}")

    initials = _initials(firstname)
    initials_dot = ""
    if initials:
        initials_dot = initials.replace(" ", ". ") + "."
        aliases.add(f"{initials} {lastname}")
        aliases.add(f"{initials_dot} {lastname}")

    if hon is not None:
        hs = hon + " "
        cap = hs[0].upper() + hs[1:]
        aliases.add(f"{title} {hs}{lastname}")
        aliases.add(f"{title}. {hs}{lastname}")
        aliases.add(f"{title} {cap}{lastname}")
        aliases.add(f"{title}. {cap}{lastname}")
        if initials:
            aliases.add(f"{initials} {hs}{lastname}")
            aliases.add(f"{initials} {cap}{lastname}")
            aliases.add(f"{initials_dot} {cap}{lastname}")
            aliases.add(f"{initials_dot} {hs}{lastname}")

    return sorted(aliases)
