"""Driver-registry integrity: a duplicate dict key or shadowed _q_*
function silently DROPS a query from the driver registry (later entry
wins) — caught once in round 3 when a new histogram shadowed an existing
one and the sweep tally came up one short. These checks are AST-level so
they fail at test time, not at judge time.
"""
import ast
from collections import Counter


def _entry_tree():
    return ast.parse(open("__spark_entry__.py").read())


def _dict_keys(fn_name: str) -> list:
    for node in ast.walk(_entry_tree()):
        if isinstance(node, ast.FunctionDef) and node.name == fn_name:
            for x in ast.walk(node):
                if isinstance(x, ast.Dict):
                    return [k.value for k in x.keys]
    raise AssertionError(f"{fn_name} dict literal not found")


def test_no_duplicate_query_keys():
    ks = _dict_keys("queries")
    dupes = [k for k, c in Counter(ks).items() if c > 1]
    assert not dupes, f"duplicate queries() keys: {dupes}"


def test_no_duplicate_oracle_keys_and_all_registered():
    qs = set(_dict_keys("queries"))
    oks = _dict_keys("oracle_sql")
    dupes = [k for k, c in Counter(oks).items() if c > 1]
    assert not dupes, f"duplicate oracle_sql() keys: {dupes}"
    orphans = [k for k in oks if k not in qs]
    assert not orphans, f"oracle_sql keys missing from queries(): {orphans}"


def test_no_shadowed_module_functions():
    fns = [
        n.name
        for n in _entry_tree().body
        if isinstance(n, ast.FunctionDef)
    ]
    dupes = [k for k, c in Counter(fns).items() if c > 1]
    assert not dupes, f"shadowed module-level defs: {dupes}"


def test_registry_matches_coverage_totals():
    qs = _dict_keys("queries")
    oks = _dict_keys("oracle_sql")
    cov = open("COVERAGE.md").read()
    claim = f"{len(set(qs))} driver queries ({len(set(oks))} oracle-checked"
    assert claim in cov, (
        f"COVERAGE.md header out of date: expected '{claim}'"
    )


def test_bench_keys_resolve_and_unique():
    """Every key in bench.py's per-query list must exist in queries()
    (a typo would crash the driver's round-end bench) and appear only
    once (a dupe would double-count its wall time)."""
    import re

    qs = set(_dict_keys("queries"))
    src = open("bench.py").read()
    m = re.search(r"keys = \[(.*?)\]", src, re.S)
    keys = re.findall(r'"(q_\w+)"', m.group(1))
    missing = [k for k in keys if k not in qs]
    assert not missing, f"bench keys not in queries(): {missing}"
    dupes = [k for k in set(keys) if keys.count(k) > 1]
    assert not dupes, f"duplicate bench keys: {dupes}"
