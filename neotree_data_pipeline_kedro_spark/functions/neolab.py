"""Neolab organism canonicalization (SURVEY.md §2.8 string repair family).

Reference: ``neolab_cleanup`` (data_tyding/neolab_data_cleanup.py:7-122) —
a per-row loop of sequential (non-elif) substring tests over
``OtherOrg1.value`` that rewrite ``Org1.(label,value)`` when the stored
value is ``'Oth'``. Because the ``if``s are sequential, LATER rules
overwrite earlier matches — replicated here by building the ``when`` chain
in reverse order (first match in reverse == last match in source order).

Two reference bugs are replicated faithfully (they define observed output):
- the CONS test's third clause reads ``find("stapgylococcus")`` with no
  ``> -1`` (:18), so it is truthy for every string that doesn't START with
  that typo — CONS is effectively the default for any 'Oth' row no later
  rule claims;
- the non-lactose-fermenter rule re-tests "non-haemolytic strep" (:94,
  copy-paste), so NHS matches are always overwritten by NLFC.

Divergence: the reference str()-ifies NaN into 'nan' before matching; here
a NULL other-value still falls into the CONS default (same visible outcome
— 'nan' matches no rule and fails the startswith test), and NULL labels
stay NULL rather than becoming the string 'None'.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (contains-tokens, canonical label, canonical value) — SOURCE order;
# later entries overwrite earlier matches (sequential ifs, :14-110)
ORGANISM_RULES: tuple[tuple[tuple[str, ...], str, str], ...] = (
    (
        ("staphyloc", "coagulase negative"),  # + the not-startswith quirk below
        "Coagulase negative staphylococcus",
        "CONS",
    ),
    (("klesiella", "klebsiella", "kleb"), "Klebsiella sp.", "KLS"),
    (
        (
            "streptococcus pyogenes",
            "streptococcus pygenes",
            "streptococcus pyoges",
            "s payogenes",
            "strptococcus pyogenes",
            "b-haemolytic strep",
            "streptococcus agalactiae",
        ),
        "Streptococcus pyogenes (Group A Beta haemolytic Strep)",
        "StrepPy",
    ),
    (("streptococcus species",), "Streptococcus sp.", "StrepSp"),
    (("s.aureus",), "Staphylococcus aureus", "SA"),
    (("citrobacter", "citribacter"), "Citrobacter sp.", "Cit"),
    (("proteus", "ptoteus"), "Proteus sp.", "Prot"),
    (("yeasts excluding candida albicans", "yeasts"), "Yeasts (excluding candida)", "Yea"),
    (("enterobacter",), "Enterobacter sp.", "Ent"),
    (("group d",), "Group D Strep", "GDS"),
    (("non-haemolytic strep",), "Non haemolytic streptococcus", "NHS"),
    (("non-haemolytic strep",), "Non-lactose fermenting coliform", "NLFC"),  # ref :94 bug
    (("pseudomonas",), "Pseudomonas aeruginosa", "Pseud"),
    (("viridans",), "Viridans streptococcus", "VirSt"),
)

_CONS_TYPO = "stapgylococcus"


def canonicalize_organism(
    value: Column, label: Column, other: Column | None = None
) -> tuple[Column, Column]:
    """(fixed_value, fixed_label) replicating neolab_cleanup's Org1 repair:

    1. a label containing "coagulase negative staph" is canonicalized
       unconditionally (:12-13);
    2. value == 'Oth' (and an other-organism column exists): the rule chain
       above rewrites (label, value), last match winning;
    3. otherwise the label is whitespace-trimmed (:115-117).
    """
    label1 = F.when(
        F.lower(F.trim(label)).contains("coagulase negative staph"),
        F.lit("Coagulase negative staphylococcus"),
    ).otherwise(label)

    if other is None:
        return value, F.trim(label1)

    oth_l = F.coalesce(F.lower(other), F.lit("nan"))
    gate = value == "Oth"

    def rule_cond(i: int, tokens: tuple[str, ...]) -> Column:
        cond = F.lit(False)
        for t in tokens:
            cond = cond | oth_l.contains(t)
        if i == 0:  # the truthy-find quirk: fires unless other STARTS with the typo
            cond = cond | ~oth_l.startswith(_CONS_TYPO)
        return cond

    fixed_label: Column = label1
    fixed_value: Column = value
    # each wrap puts its rule OUTSIDE the previous chain, so after iterating
    # in source order the last rule is tested first — i.e. the highest-index
    # matching rule wins, exactly the sequential-overwrite outcome
    for i, (tokens, lab, val) in enumerate(ORGANISM_RULES):
        cond = gate & rule_cond(i, tokens)
        fixed_label = F.when(cond, F.lit(lab)).otherwise(fixed_label)
        fixed_value = F.when(cond, F.lit(val)).otherwise(fixed_value)

    # non-Oth rows: trim only (:115-117)
    fixed_label = F.when(gate, fixed_label).otherwise(F.trim(label1))
    return fixed_value, fixed_label
