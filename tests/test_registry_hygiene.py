"""Registry hygiene: the 21k-line query module must never shadow a
top-level function or constant (a later duplicate silently rebinds the
earlier one — twice this repo's history a new query's constant/SQL
generator overwrote an older query's, shifting BOTH the engine and its
oracle together so sweeps stayed green while semantics changed)."""

import ast
import os
from collections import Counter

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_no_duplicate_toplevel_definitions():
    tree = ast.parse(open(os.path.join(ROOT, "__ray_entry__.py")).read())
    funcs = Counter()
    consts = Counter()
    for n in tree.body:
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef)):
            funcs[n.name] += 1
        elif isinstance(n, ast.Assign):
            for tg in n.targets:
                if isinstance(tg, ast.Name):
                    consts[tg.id] += 1
    dup_f = {k: v for k, v in funcs.items() if v > 1}
    dup_c = {k: v for k, v in consts.items() if v > 1 and k != "_pw"}
    assert not dup_f, f"shadowed functions: {dup_f}"
    assert not dup_c, f"shadowed constants: {dup_c}"


def test_every_query_has_unique_callable_and_oracle():
    import __ray_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(qs) == set(os_)
    # distinct callables: two names sharing one function usually means
    # a registration typo
    ids = Counter(id(f) for f in qs.values())
    shared = [n for n, f in qs.items() if ids[id(f)] > 1]
    assert not shared, f"queries sharing a callable: {shared}"
