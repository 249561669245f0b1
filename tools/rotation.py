"""Derive the driver-slot rotation (_PRIORITY in __spark_entry__.py)
from VERIFICATION FRESHNESS, not just verdict age:

priority 1 — gates with NO driver verdict in any CORRECTNESS_r*.json;
priority 2 — gates EDITED since the round that last verified them
             (the gate function's own source/oracle changed, or a
             library module a symbol in its body resolves to changed);
priority 3 — everything else, oldest verdict first.

"Edited since" is computed against the round-boundary commit (the
driver's "round N: verdict/..." commit) of the gate's last green
round: the gate function body is AST-extracted from that commit's
gate_queries.py and compared textually, and `git diff --name-only`
supplies changed library modules, mapped to gates through the symbols
referenced in each gate's body (import-table lookup).

Usage: python tools/rotation.py          # print the ranked list
       python tools/rotation.py --check  # exit 1 if _PRIORITY's head
                                         # misses any p1/p2 gate
"""

from __future__ import annotations

import ast
import glob
import json
import re
import subprocess
import sys

sys.path.insert(0, ".")

GATE_PATH = "coronavirus_dashboard_pipeline_etl_spark/plans/gate_queries.py"
PKG = "coronavirus_dashboard_pipeline_etl_spark"


def sh(*args: str) -> str:
    return subprocess.run(
        args, capture_output=True, text=True, check=True
    ).stdout


def last_verified_round() -> dict[str, int]:
    """gate -> highest round with a green driver verdict."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        data = json.load(open(path))
        for gate, res in data.items():
            if isinstance(res, dict) and res.get("rows_match") and res.get(
                "hash_match", True
            ):
                out[gate] = max(out.get(gate, 0), rnd)
    return out


def round_commits() -> dict[int, str]:
    """round -> the driver's round-boundary commit sha."""
    log = sh("git", "log", "--format=%H %s")
    out: dict[int, str] = {}
    for line in log.splitlines():
        sha, _, msg = line.partition(" ")
        m = re.match(r"round (\d+):", msg)
        if m:
            out.setdefault(int(m.group(1)), sha)  # newest first wins
    return out


class GateInfo(ast.NodeVisitor):
    """Extract per-gate function source + referenced symbols, and the
    module each top-level imported symbol comes from."""

    def __init__(self, tree: ast.Module, src: str):
        self.src = src
        self.symbol_module: dict[str, str] = {}
        self.funcs: dict[str, ast.FunctionDef] = {}
        self.assigns: dict[str, str] = {}  # NAME = """oracle sql"""
        for node in tree.body:
            if isinstance(node, ast.ImportFrom) and node.module:
                mod = node.module.lstrip(".")
                for a in node.names:
                    self.symbol_module[a.asname or a.name] = mod
            elif isinstance(node, ast.FunctionDef):
                self.funcs[node.name] = node
            elif isinstance(node, ast.Assign) and len(node.targets) == 1:
                t = node.targets[0]
                if isinstance(t, ast.Name):
                    self.assigns[t.id] = ast.get_source_segment(
                        self.src, node
                    ) or ""

    def func_src(self, name: str) -> str:
        node = self.funcs.get(name)
        if node is None:
            return ""
        body = ast.get_source_segment(self.src, node) or ""
        # fold in the oracle constant conventionally named after the
        # gate (Q17_SQL etc.) — any referenced module-level string
        for n in ast.walk(node):
            pass
        refs = {
            n.id for n in ast.walk(node) if isinstance(n, ast.Name)
        }
        oracles = "".join(
            self.assigns.get(r, "") for r in sorted(refs) if r.endswith("_SQL")
        )
        return body + oracles

    def func_modules(self, name: str) -> set[str]:
        node = self.funcs.get(name)
        if node is None:
            return set()
        mods: set[str] = set()
        for n in ast.walk(node):
            if isinstance(n, ast.Name) and n.id in self.symbol_module:
                mods.add(self.symbol_module[n.id])
            if isinstance(n, ast.ImportFrom) and n.module:
                mods.add(n.module.lstrip("."))
        return mods


def gate_func_names(src: str) -> dict[str, str]:
    """registry key -> function name, from the LIVE registry (catches
    both QUERIES["k"] = f and dict-literal registration blocks)."""
    from coronavirus_dashboard_pipeline_etl_spark.plans.gate_queries import QUERIES

    return {k: fn.__name__ for k, fn in QUERIES.items()}


def main() -> None:
    verified = last_verified_round()
    commits = round_commits()
    head_src = open(GATE_PATH).read()
    head_info = GateInfo(ast.parse(head_src), head_src)
    keys = gate_func_names(head_src)

    # cache per-round parsed snapshots and changed-module sets
    snap: dict[int, GateInfo | None] = {}
    changed_mods: dict[int, set[str]] = {}
    for rnd, sha in commits.items():
        try:
            src = sh("git", "show", f"{sha}:{GATE_PATH}")
            snap[rnd] = GateInfo(ast.parse(src), src)
        except subprocess.CalledProcessError:
            snap[rnd] = None
        diff = sh("git", "diff", "--name-only", sha, "HEAD")
        changed_mods[rnd] = {
            p.removeprefix(PKG + "/").removesuffix(".py").replace("/", ".")
            for p in diff.splitlines()
            if p.startswith(PKG + "/") and p != GATE_PATH
        }

    p1, p2, p3 = [], [], []
    for key, fname in keys.items():
        rnd = verified.get(key)
        if rnd is None or rnd not in snap or snap[rnd] is None:
            p1.append(key)
            continue
        old = snap[rnd]
        edited = old.func_src(fname) != head_info.func_src(fname)
        if not edited:
            used = {
                m.split(".")[-1] for m in head_info.func_modules(fname)
            }
            hit = {
                m for m in changed_mods[rnd] if m.split(".")[-1] in used
            }
            edited = bool(hit)
        (p2 if edited else p3).append((rnd, key))
    p2.sort()
    p3.sort()
    ranked = p1 + [k for _, k in p2] + [k for _, k in p3]

    if "--check" in sys.argv:
        import __spark_entry__ as e

        head50 = set(e._ordered()[:50])
        # when p1+p2 exceed the 50 driver slots, require the RANKED
        # top-50 (p1 first, then p2 oldest-verdict-first) — a set
        # sample would be nondeterministic
        must_ranked = p1 + [k for _, k in p2]
        missing = sorted(set(must_ranked[:50]) - head50)
        if missing:
            print(f"ROTATION STALE — p1/p2 gates outside head-50: {missing}")
            sys.exit(1)
        print(f"rotation fresh: {len(p1)} never-verified, {len(p2)} edited, "
              f"{len(p3)} stable")
        return

    print(f"# p1 never driver-verified ({len(p1)}):")
    for k in p1:
        print(f"    {k!r},")
    print(f"# p2 edited since last verdict ({len(p2)}):")
    for rnd, k in p2:
        print(f"    {k!r},  # verified r{rnd}")
    print(f"# p3 stable ({len(p3)}), oldest verdict first:")
    for rnd, k in p3:
        print(f"    {k!r},  # verified r{rnd}")


if __name__ == "__main__":
    main()
