"""Phonetic encodings for fuzzy blocking.

American Soundex — the classic phonetic blocking key for name linkage
(same family as the Jaro-Winkler linkage in functions/strsim.py, but as a
GROUPING key: candidate pairs come from an equi-join on the code, never a
pairwise scan). Spark ships `F.soundex` JVM-side; DuckDB has no soundex,
so `soundex_sql` generates a pure-SQL replay of the SAME standard
algorithm, validated against Spark's outputs on the classic vectors
(Robert/R163, Ashcraft/A261 — collapse THROUGH h/w, Pfister/P236 — first
letter collapses with its run, Tymczak/T522, Wright/W623, Hughes/H220)
and over the whole corpus vocabulary by the oracle harness.

Replay recipe (all portable scalar SQL):
  1. strip non-letters, uppercase;
  2. map every letter to a digit with h/w -> 9 and vowels+y -> 0:
     translate(u, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '01230129022455012623019202');
  3. delete the 9s FIRST, so runs of one code separated only by h/w merge
     in step 4 (the Ashcraft rule);
  4. collapse adjacent duplicate digits (list_reduce with a varchar
     accumulator — RE2 has no backreferences, so no regex trick);
  5. drop the leading collapsed digit unless the first letter is h/w
     (its code was already deleted in step 3 — the Wright rule);
  6. delete the 0s (vowels only BREAK adjacency), pad to 3 digits, and
     prefix the original first letter.
"""

from __future__ import annotations

_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_CODES = "01230129022455012623019202"


def soundex_sql(expr: str) -> str:
    """DuckDB SQL fragment equal to Spark's soundex(expr) for alphabetic
    input (empty/non-alpha input yields the padded first char, matching
    Spark on the corpus domain)."""
    u = f"upper(regexp_replace({expr}, '[^A-Za-z]', '', 'g'))"
    d = f"translate({u}, '{_ALPHA}', '{_CODES}')"
    no9 = f"replace({d}, '9', '')"
    chars = f"list_transform(range(1, length({no9}) + 1), i -> substr({no9}, i, 1))"
    collapsed = (
        f"CASE WHEN length({no9}) = 0 THEN '' ELSE "
        f"list_reduce({chars}, (acc, x) -> "
        f"CASE WHEN substr(acc, length(acc), 1) = x THEN acc ELSE acc || x END) END"
    )
    flcode = f"translate(substr({u}, 1, 1), '{_ALPHA}', '{_CODES}')"
    stripped = (
        f"CASE WHEN {flcode} = '9' THEN {collapsed} "
        f"ELSE substr({collapsed}, 2) END"
    )
    digits = f"replace({stripped}, '0', '')"
    return f"(substr({u}, 1, 1) || substr({digits} || '000', 1, 3))"
