"""No unreferenced public functions in operators/ (VERDICT r3 #6).

A public operator nobody calls is a trap: it drifts from the live
code path (metrics_table rotted exactly this way in round 2-3) and
readers can't tell the supported variant from the fossil. This is a
static grep, not an import graph — cheap, and enough to catch a
function whose name appears nowhere outside its own definition.
"""

from __future__ import annotations

import ast
import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parents[1]
OPERATORS = REPO / "gleaner_spark" / "operators"
# every place a legitimate reference may live
SEARCH_ROOTS = [REPO / "gleaner_spark", REPO / "tests", REPO / "tools",
                REPO / "__spark_entry__.py", REPO / "bench.py"]


def _public_defs(path: pathlib.Path) -> list[str]:
    tree = ast.parse(path.read_text())
    return [
        n.name
        for n in tree.body
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        and not n.name.startswith("_")
    ]


def _search_files():
    for root in SEARCH_ROOTS:
        if root.is_file():
            yield root
        else:
            yield from root.rglob("*.py")


def test_every_public_operator_function_is_referenced():
    corpus = {
        f: f.read_text() for f in _search_files() if f.name != "test_dead_code.py"
    }
    unreferenced = []
    for mod in sorted(OPERATORS.glob("*.py")):
        if mod.name.startswith("_"):
            continue
        for name in _public_defs(mod):
            # word-boundary match: lsh_bucket once hid inside every
            # lsh_bucket_keys occurrence under a plain substring count
            pat = re.compile(rf"\b{re.escape(name)}\b")
            # the subtraction must be word-bounded too, or "def foo"
            # also counts "def foo_bar" and drives the tally negative
            def_pat = re.compile(rf"\bdef {re.escape(name)}\b")
            n_refs = 0
            for f, text in corpus.items():
                hits = len(pat.findall(text))
                if f == mod:
                    hits -= len(def_pat.findall(text))
                n_refs += hits
            if n_refs == 0:
                unreferenced.append(f"{mod.name}:{name}")
    assert not unreferenced, (
        "public operator functions with zero references outside their "
        f"definition (dead code — delete or wire them): {unreferenced}"
    )
