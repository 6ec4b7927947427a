"""Static scale-shape lints — the round-5 audit lens as a regression gate.

``tree_combine`` funnels its whole partials stream into ONE final merge
task (``runtime/combine.py`` documents the enumerable-key contract), so
routing a corpus-scaled key (user_id, doc_id, vec_id, custkey, ...)
through it silently builds a stage that cannot scale: fine at sf0.01,
a single-task blowup at 100 TB. Round 5 found and fixed eight such
sites (SURVEY §19.3); this test keeps the class extinct by walking the
registry module's AST and asserting no ``tree_combine`` call takes a
merge built over an unbounded key domain.

The lint is syntactic and conservative: it only flags merges whose key
tuple/group_cols literally name a known corpus-scaled column, and only
when that merge expression (by variable name or inline call) reaches a
``tree_combine`` call. Enumerable keys (bins, hours, types, folds,
bands, nation keys...) never trip it.
"""

from __future__ import annotations

import ast
import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

# Corpus-scaled key columns: one row per user/doc/vector/customer/order
# grows linearly with the input. Entity/token vocab keys are NOT listed
# (the repo's documented SMALL_VOCAB / KG-analytics caps cover them).
UNBOUNDED_KEYS = {
    "user_id",
    "doc_id",
    "vec_id",
    "o_custkey",
    "c_custkey",
    "o_orderkey",
    "l_orderkey",
    "event_id",
    "conv_id",
}

MERGE_BUILDERS = {"group_sum_merge", "group_agg_merge"}


def _str_elts(node: ast.AST) -> list[str]:
    """String literals inside a tuple/list literal (else empty)."""
    if isinstance(node, (ast.Tuple, ast.List)):
        return [
            e.value
            for e in node.elts
            if isinstance(e, ast.Constant) and isinstance(e.value, str)
        ]
    return []


def _merge_keys(call: ast.Call) -> list[str]:
    """Key columns a merge-builder call groups by."""
    fn = call.func
    name = fn.id if isinstance(fn, ast.Name) else getattr(fn, "attr", "")
    if name in MERGE_BUILDERS and call.args:
        return _str_elts(call.args[0])
    if name == "topk_merge":
        for kw in call.keywords:
            if kw.arg == "group_cols":
                return _str_elts(kw.value)
    return []


def _unbounded_tree_combine_sites(path: pathlib.Path) -> list[str]:
    tree = ast.parse(path.read_text())
    findings: list[str] = []
    for fn in ast.walk(tree):
        if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        # merge variables bound to a builder call with unbounded keys
        tainted: set[str] = set()
        for node in ast.walk(fn):
            if isinstance(node, ast.Assign) and isinstance(
                node.value, ast.Call
            ):
                bad = set(_merge_keys(node.value)) & UNBOUNDED_KEYS
                if bad:
                    for tgt in node.targets:
                        if isinstance(tgt, ast.Name):
                            tainted.add(tgt.id)
        for node in ast.walk(fn):
            if not (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Name)
                and node.func.id == "tree_combine"
            ):
                continue
            for arg in node.args[1:]:
                if isinstance(arg, ast.Name) and arg.id in tainted:
                    findings.append(
                        f"{path.name}:{node.lineno} in {fn.name}: "
                        f"tree_combine merge '{arg.id}' groups by an "
                        f"unbounded key"
                    )
                if isinstance(arg, ast.Call):
                    bad = set(_merge_keys(arg)) & UNBOUNDED_KEYS
                    if bad:
                        findings.append(
                            f"{path.name}:{node.lineno} in {fn.name}: "
                            f"tree_combine merge groups by {sorted(bad)}"
                        )
    return findings


@pytest.mark.parametrize(
    "rel",
    [
        "neuroner_ray/pipelines/queries.py",
        "neuroner_ray/pipelines/curate.py",
        "__ray_entry__.py",
    ],
)
def test_no_unbounded_keys_through_tree_combine(rel: str) -> None:
    findings = _unbounded_tree_combine_sites(REPO / rel)
    assert not findings, (
        "corpus-scaled key domain routed through tree_combine's single "
        "final merge task — use a Ray groupby for the unbounded key and "
        "tree_combine only the bounded census/cut (SURVEY §19):\n"
        + "\n".join(findings)
    )


def test_lint_detects_the_violation_class() -> None:
    """The lint itself must catch the shape round 5 fixed (meta-test)."""
    import textwrap

    bad = textwrap.dedent(
        """
        def q(sf_dir):
            merge = group_sum_merge(("user_id",), ("m",))
            census = tree_combine(ds.map_batches(p), merge)
            top = tree_combine(
                census, topk_merge(10, "m", ["u"], group_cols=["doc_id"])
            )
        """
    )
    tmp = REPO / "tests" / "_lint_fixture_tmp.py"
    tmp.write_text(bad)
    try:
        findings = _unbounded_tree_combine_sites(tmp)
    finally:
        tmp.unlink()
    assert len(findings) == 2
