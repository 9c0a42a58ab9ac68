"""Transitive rotation audit for the driver-correctness window.

The `_CHECK_FIRST` rotation policy (plans/analytics.py) queues every
registry entry whose code changed since its last driver witness. The r12
verdict found the gap: an edit to a SHARED HELPER (e.g.
functions/similarity.py) left its consuming entries un-queued because
only directly-edited entries jumped. This tool makes the rule transitive
over imports:

    python tools/rotation_audit.py <git-ref>

prints every registry entry that can REACH any engine module changed
since `<git-ref>` (`git diff --name-only <git-ref> -- extract_permits_spark`).

Reachability model (deliberately two-tier so one helper edit doesn't
flag all 216 entries):

- symbol level for the first hop: an entry that does
  `from plans._registry import _dec` reaches only what `_dec`'s own body
  reaches — not everything `_registry` imports at module scope;
- module level beyond that: helper modules (functions/, operators/,
  sources/, sinks/, streaming/) are cohesive, so their import closures
  propagate whole;
- chunk registry modules (plans/analytics*) are membership-only: an
  edit there flags the chunk's own entries and direct cross-chunk symbol
  importers, but never bleeds through as a closure.
"""

from __future__ import annotations

import ast
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "extract_permits_spark"


def engine_modules() -> dict[str, str]:
    out = {}
    for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                rel = os.path.relpath(p, REPO)[:-3].replace(os.sep, ".")
                if rel.endswith(".__init__"):
                    rel = rel[: -len(".__init__")]
                out[rel] = p
    return out


class ModInfo:
    """Per-module AST digest: alias maps + per-top-level-symbol name use."""

    def __init__(self, mod: str, path: str, all_mods: set[str]):
        self.mod = mod
        tree = ast.parse(open(path).read())
        self.alias_mod: dict[str, str] = {}      # local name -> module it IS
        self.fromname_mod: dict[str, str] = {}   # local name -> module it came FROM
        self.registered: dict[str, str] = {}     # registry entry -> function name
        self.symbol_names: dict[str, set[str]] = {}  # top-level def -> names used
        for node in ast.walk(tree):
            if isinstance(node, ast.Import):
                for a in node.names:
                    if a.name.startswith(PKG):
                        self.alias_mod[a.asname or a.name.split(".")[-1]] = a.name
            elif isinstance(node, ast.ImportFrom) and node.module and node.module.startswith(PKG):
                for a in node.names:
                    nm = a.asname or a.name
                    cand = f"{node.module}.{a.name}"
                    if cand in all_mods:
                        self.alias_mod[nm] = cand  # `from pkg import mod`
                    else:
                        self.fromname_mod[nm] = node.module
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                names: set[str] = set()
                for sub in ast.walk(node):
                    if isinstance(sub, ast.Name):
                        names.add(sub.id)
                    elif isinstance(sub, ast.Attribute):
                        names.add(sub.attr)
                self.symbol_names[node.name] = names
                for dec in node.decorator_list:
                    if (
                        isinstance(dec, ast.Call)
                        and getattr(dec.func, "id", getattr(dec.func, "attr", "")) == "register"
                        and dec.args
                        and isinstance(dec.args[0], ast.Constant)
                    ):
                        self.registered[dec.args[0].value] = node.name


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    ref = sys.argv[1]
    diff = subprocess.run(
        ["git", "diff", "--name-only", ref, "--", PKG],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    changed = {f[:-3].replace(os.sep, ".") for f in diff if f.endswith(".py")}
    if not changed:
        print(f"no engine modules changed since {ref}")
        return 0

    mods = engine_modules()
    allset = set(mods)
    info = {m: ModInfo(m, p, allset) for m, p in mods.items()}
    chunk = {m for m in mods if m.rsplit(".", 1)[-1].startswith("analytics")}

    # module-level import graph over expandable (non-chunk) modules only
    graph: dict[str, set[str]] = {}
    for m, mi in info.items():
        deps = set(mi.alias_mod.values()) | set(mi.fromname_mod.values())
        graph[m] = {d for d in deps if d in allset and d not in chunk}
    closure = {k: set(v) for k, v in graph.items()}
    moved = True
    while moved:
        moved = False
        for k, deps in closure.items():
            add = set().union(*(closure.get(d, set()) for d in deps)) - deps
            if add:
                deps |= add
                moved = True

    def expand(m: str) -> set[str]:
        return {m} | (closure.get(m, set()) if m not in chunk else set())

    def symbol_reach(mod: str, sym: str, depth: int = 0, seen: set | None = None) -> set[str]:
        """Modules reached by symbol `sym` of module `mod` — symbol-level
        for the first two from-import hops (so `from _registry import
        _dec` reaches only what `_dec` uses, not everything `_registry`
        imports at module scope), module-closure beyond."""
        if mod not in info:
            return {mod}
        mi = info[mod]
        if sym not in mi.symbol_names:
            return {mod}  # constant / class / unknown: membership only
        seen = seen or set()
        key = (mod, sym)
        if key in seen:
            return {mod}
        seen.add(key)
        reach = {mod}
        for n in mi.symbol_names[sym]:
            if n in mi.alias_mod:
                reach |= expand(mi.alias_mod[n])
            elif n in mi.fromname_mod:
                src = mi.fromname_mod[n]
                if depth < 2:
                    reach |= symbol_reach(src, n, depth + 1, seen)
                else:
                    reach |= expand(src)
            elif n in mi.symbol_names and n != sym:
                # same-module helper call: include its reach too
                if depth < 2:
                    reach |= symbol_reach(mod, n, depth + 1, seen)
        return reach

    affected: dict[str, list[str]] = {}
    for defmod, mi in info.items():
        for entry, fn in mi.registered.items():
            reach = symbol_reach(defmod, fn)
            hits = sorted(reach & changed)
            if hits:
                affected[entry] = hits

    print(f"# engine modules changed since {ref}: {len(changed)}")
    for m in sorted(changed):
        print(f"#   {m}")
    print(f"# affected registry entries: {len(affected)}")
    for e in sorted(affected):
        print(f"{e}\t<- {', '.join(affected[e])}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
