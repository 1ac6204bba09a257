"""Object-store contract tripwire (round-12 verdict item #6).

The manifest-txn protocol budgets ONE atomicity primitive —
conditional put of a small object — and ``sources/stores.py``'s
module docstring enumerates every local-FS primitive in the package
that must map onto a conditional write when the repo runs against an
object store (lease mkdir/nonce/heartbeat, pending-late marker
replace). This test finds those primitives MECHANICALLY (an AST scan
for the atomicity-bearing ``os`` calls) and asserts the set matches
the documented contract exactly — so a new local-FS primitive cannot
land silently: either it's added to the contract (docstring + this
list) or the suite fails loudly.
"""

from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent \
    / "formula1_data_pipeline_spark"

#: the os calls that BEAR atomicity semantics (creation-is-exclusive,
#: atomic swap, hard-link exclusivity, mtime heartbeat). Plain
#: makedirs/remove/stat/listdir are bookkeeping, not protocol.
_ATOMIC_OS_CALLS = {"mkdir", "rmdir", "replace", "link", "utime"}

#: the contract: every (module, function) allowed to use an atomic
#: local-FS primitive, mirroring sources/stores.py's documented
#: enumeration. Extending this set REQUIRES extending the docstring's
#: object-store mapping — that's the point.
CONTRACT = {
    # 1. manifest put-if-absent (the protocol's one primitive)
    ("sources/stores.py", "LocalLinkStore.put_if_absent"),
    # 2. compaction lease: mkdir+nonce acquire, mtime heartbeat,
    #    nonce-verified release — maps to a conditional-PUT lease
    #    object with generation-matched heartbeat/steal/release
    ("operators/retrieval.py", "acquire_compaction_lease"),
    ("operators/retrieval.py", "_start_lease_heartbeat.beat"),
    ("operators/retrieval.py", "release_compaction_lease"),
    # 3. pending-late marker: lease-serialized single-writer atomic
    #    replace — maps to a plain PUT of a small object on any
    #    strongly-consistent store
    ("operators/retrieval.py", "_write_pending_late"),
}


def _atomic_os_calls(path: pathlib.Path) -> set[tuple[str, str]]:
    """(relative module, dotted enclosing function) for every
    ``os.<atomic>`` call in ``path``."""
    tree = ast.parse(path.read_text())
    rel = str(path.relative_to(PKG)).replace("\\", "/")
    found: set[tuple[str, str]] = set()

    def walk(node: ast.AST, stack: tuple[str, ...]) -> None:
        for child in ast.iter_child_nodes(node):
            nstack = stack
            if isinstance(child, (ast.FunctionDef,
                                  ast.AsyncFunctionDef,
                                  ast.ClassDef)):
                nstack = stack + (child.name,)
            if (
                isinstance(child, ast.Call)
                and isinstance(child.func, ast.Attribute)
                and isinstance(child.func.value, ast.Name)
                and child.func.value.id == "os"
                and child.func.attr in _ATOMIC_OS_CALLS
            ):
                found.add((rel, ".".join(stack) or "<module>"))
            walk(child, nstack)

    walk(tree, ())
    return found


def test_atomic_fs_primitives_match_documented_contract():
    found: set[tuple[str, str]] = set()
    for path in sorted(PKG.rglob("*.py")):
        found |= _atomic_os_calls(path)
    assert found == CONTRACT, (
        "local-FS atomicity primitives drifted from the documented "
        "object-store contract (sources/stores.py docstring):\n"
        f"  undocumented new primitives: {sorted(found - CONTRACT)}\n"
        f"  documented but vanished:     {sorted(CONTRACT - found)}"
    )


def test_contract_names_are_documented_in_stores_docstring():
    """Every contract entry's function must be named in the
    sources/stores.py module docstring, so the mapping to a
    conditional write is written down where adapters are built."""
    import formula1_data_pipeline_spark.sources.stores as S

    doc = S.__doc__ or ""
    for _, func in CONTRACT:
        base = func.split(".")[-2] if "." in func else func
        assert base in doc or func.split(".")[0] in doc, (
            f"{func} uses an atomic FS primitive but is not named in "
            "sources/stores.py's object-store contract docstring"
        )
