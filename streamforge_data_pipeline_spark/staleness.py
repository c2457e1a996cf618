"""Git-derived rotation staleness for the driver's capped
verification window.

Problem (VERDICT r3 "What's wrong" #1): the rotation used a
hand-maintained tuple of keys whose code changed after their last
green driver row. One forgotten edit silently leaves a changed
operator re-verified only by the local pytest sweep.

This module derives staleness mechanically, at FUNCTION granularity
(file-level granularity was tried first and floods: operators/text.py
hosts ~20 keys and changes most rounds, which would re-front every
text key after any one-line fix):

1. For each registry key, find the most recent round with a green
   driver CORRECTNESS row (``green_rounds``).
2. Map that round to the git commit that ADDED its
   ``CORRECTNESS_r{NN}.json`` (the driver commits results on top of
   the exact code it evaluated, so that commit's tree IS the verified
   code state).
3. Compute the key's implementation footprint: every top-level
   def/class/constant source segment its query function transitively
   references — found by walking real bytecode (LOAD_GLOBAL names
   resolved through each function's own globals; attribute loads are
   matched only against actually-referenced package modules, so
   ``spark.read.text`` does NOT alias the ``text`` operator module) —
   plus the key's own REGISTRY dict entry (which carries the oracle
   SQL).
4. A key is STALE iff any footprint segment's source hash differs
   between the last-green commit (``git show``) and the working tree,
   or an unresolvable module reference falls back to a whole-file
   diff hit. Each non-registry module's import statements form one
   extra pseudo-segment ("__imports__") so an import redirection in an
   operator module still trips its keys.

Once the driver lands a new green row, the key's last-green commit
advances and the derivation expires the staleness automatically — no
hand-maintained list to forget.

Fail-safe: if git is unavailable or any step errors, staleness
degrades to the empty set and the rotation falls back to
least-verified-first; the mandatory-green pytest oracle differential
(tests/test_oracle_differential.py) remains the compensating control.
Known residual blind spots (accepted, covered by that differential):
monkeypatching at import time, and import redirection inside
registry.py itself (registry imports churn every round, so its
"__imports__" would re-flood).
"""

from __future__ import annotations

import ast
import dis
import functools
import glob
import hashlib
import inspect
import json
import os
import re
import subprocess
import types
from typing import Callable, Iterable

PKG = "streamforge_data_pipeline_spark"
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_REGISTRY_REL = f"{PKG}/registry.py"


# --- driver-history parsing -------------------------------------------------

def green_rounds(repo_root: str = _REPO_ROOT) -> dict[str, int]:
    """key -> most recent round number with a green driver row."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for key, row in rows.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("rows_match") and row.get("schema_match") and row.get("hash_match")
            ) or row.get("err") == "no_oracle"
            if green:
                latest[key] = max(latest.get(key, 0), rnd)
    return latest


# --- git plumbing (every helper degrades to None on failure) ----------------

def _git(repo_root: str, *args: str) -> str | None:
    try:
        out = subprocess.run(
            ["git", *args], cwd=repo_root, capture_output=True, text=True, timeout=30
        )
        return out.stdout if out.returncode == 0 else None
    except Exception:
        return None


@functools.lru_cache(maxsize=None)
def _round_commit(repo_root: str, rnd: int) -> str | None:
    """Commit that first added CORRECTNESS_r{NN}.json."""
    out = _git(
        repo_root, "log", "--format=%H", "--diff-filter=A", "--", f"CORRECTNESS_r{rnd:02d}.json"
    )
    lines = (out or "").split()
    return lines[-1] if lines else None


@functools.lru_cache(maxsize=None)
def _changed_files_since(repo_root: str, commit: str) -> frozenset[str] | None:
    """Repo-relative paths changed between `commit` and the working
    tree (committed + uncommitted; untracked new files are invisible,
    but a new module only matters through a changed/new registry
    entry, which the entry hash catches)."""
    out = _git(repo_root, "diff", "--name-only", commit)
    if out is None:
        return None
    return frozenset(p.strip() for p in out.splitlines() if p.strip())


@functools.lru_cache(maxsize=None)
def _hashes_at(repo_root: str, commit: str, rel_file: str) -> dict[str, str] | None:
    src = _git(repo_root, "show", f"{commit}:{rel_file}")
    return None if src is None else segment_hashes(src)


@functools.lru_cache(maxsize=None)
def _hashes_now(repo_root: str, rel_file: str) -> dict[str, str] | None:
    try:
        with open(os.path.join(repo_root, rel_file)) as f:
            return segment_hashes(f.read())
    except OSError:
        return None


# --- source segment hashing -------------------------------------------------

def _strip_docstrings(node: ast.AST) -> ast.AST:
    """Remove docstring statements so cosmetic edits (docstrings,
    comments, formatting) don't mark a key stale — only structural
    change does."""
    for sub in ast.walk(node):
        if isinstance(
            sub, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef, ast.Module)
        ) and sub.body:
            first = sub.body[0]
            if (
                isinstance(first, ast.Expr)
                and isinstance(first.value, ast.Constant)
                and isinstance(first.value.value, str)
            ):
                sub.body = sub.body[1:] or [ast.Pass()]
    return node


def segment_hashes(source: str) -> dict[str, str]:
    """Top-level name -> sha1 of its def/assign AST (docstrings
    stripped, so only structural change counts).

    Extras: '__imports__' covers all import statements;
    'entry:<key>' covers each REGISTRY dict entry value (oracle SQL +
    doc + fn reference) when a REGISTRY dict literal is present."""
    hashes: dict[str, str] = {}
    try:
        tree = ast.parse(source)
    except SyntaxError:
        return hashes

    def put(name: str, node: ast.AST) -> None:
        dumped = ast.dump(_strip_docstrings(node), include_attributes=False)
        hashes[name] = hashlib.sha1(dumped.encode()).hexdigest()

    imports: list[str] = []
    for node in tree.body:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            imports.append(ast.dump(node, include_attributes=False))
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            put(node.name, node)
        elif isinstance(node, (ast.Assign, ast.AnnAssign)):
            targets = node.targets if isinstance(node, ast.Assign) else [node.target]
            for t in targets:
                if isinstance(t, ast.Name):
                    put(t.id, node)
                    if t.id == "REGISTRY" and isinstance(node.value, ast.Dict):
                        for k, v in zip(node.value.keys, node.value.values):
                            if isinstance(k, ast.Constant) and isinstance(k.value, str):
                                put(f"entry:{k.value}", v)
    hashes["__imports__"] = hashlib.sha1("\n".join(imports).encode()).hexdigest()
    return hashes


# --- bytecode reference walk ------------------------------------------------

def _module_file(mod_name: str) -> str | None:
    rel = mod_name.replace(".", "/")
    for cand in (f"{rel}.py", f"{rel}/__init__.py"):
        if os.path.exists(os.path.join(_REPO_ROOT, cand)):
            return cand
    return None


def _obj_file(obj) -> str | None:
    try:
        return os.path.relpath(inspect.getfile(obj), _REPO_ROOT)
    except TypeError:
        return None


def _load_names(code) -> tuple[set[str], set[str]]:
    """(global-load names, attribute-load names) for a code object and
    all nested code objects."""
    glob_names: set[str] = set()
    attr_names: set[str] = set()
    stack = [code]
    while stack:
        c = stack.pop()
        for ins in dis.get_instructions(c):
            if ins.opname in ("LOAD_GLOBAL", "LOAD_NAME", "LOAD_DEREF"):
                glob_names.add(ins.argval)
            elif ins.opname in ("LOAD_ATTR", "LOAD_METHOD"):
                attr_names.add(ins.argval)
        for const in c.co_consts:
            if isinstance(const, types.CodeType):
                stack.append(const)
    return glob_names, attr_names


def _top_name(obj) -> str:
    return getattr(obj, "__qualname__", getattr(obj, "__name__", "")).split(".")[0].split(
        "<locals>"
    )[0]


@functools.lru_cache(maxsize=None)
def footprint(fn: Callable) -> tuple[frozenset[tuple[str, str]], frozenset[str]]:
    """(segments, fallback_files) the query function transitively
    depends on. A segment is (repo-relative file, top-level name);
    fallback_files are modules referenced in ways too dynamic to
    resolve, checked at whole-file granularity."""
    segments: set[tuple[str, str]] = set()
    files_seen: set[str] = set()
    fallback: set[str] = set()
    seen: set[int] = set()
    stack: list = [fn]
    while stack:
        f = stack.pop()
        if id(f) in seen:
            continue
        seen.add(id(f))
        code = getattr(f, "__code__", None)
        g = getattr(f, "__globals__", None)
        if code is None or g is None:
            continue
        rel = _obj_file(f)
        if rel:
            files_seen.add(rel)
            segments.add((rel, _top_name(f)))
        glob_names, attr_names = _load_names(code)
        ref_modules: list = []
        for name in glob_names:
            v = g.get(name)
            if v is None:
                continue
            if inspect.isfunction(v) and getattr(v, "__module__", "").startswith(PKG):
                stack.append(v)
            elif inspect.ismodule(v) and getattr(v, "__name__", "").startswith(PKG):
                ref_modules.append(v)
            elif inspect.isclass(v) and getattr(v, "__module__", "").startswith(PKG):
                cf = _obj_file(v)
                if cf:
                    files_seen.add(cf)
                    segments.add((cf, _top_name(v)))
                    for m in vars(v).values():  # walk methods
                        if inspect.isfunction(m):
                            stack.append(m)
            elif not callable(v) and not inspect.ismodule(v):
                # plain constant resolved from this function's module
                # globals (covers both locally-defined and from-imported
                # constants: the segment is looked up wherever it is
                # top-level; if only defined here, it hashes here).
                if rel:
                    segments.add((rel, name))
        for mod in ref_modules:
            mf = _module_file(mod.__name__)
            if not mf:
                continue
            files_seen.add(mf)
            matched = False
            for attr in attr_names:
                v = getattr(mod, attr, None)
                if v is None:
                    continue
                if inspect.isfunction(v) and getattr(v, "__module__", "").startswith(PKG):
                    stack.append(v)
                    matched = True
                elif inspect.isclass(v) and getattr(v, "__module__", "").startswith(PKG):
                    cf = _obj_file(v)
                    if cf:
                        segments.add((cf, _top_name(v)))
                        for m in vars(v).values():
                            if inspect.isfunction(m):
                                stack.append(m)
                    matched = True
                elif not callable(v) and not inspect.ismodule(v):
                    segments.add((mf, attr))
                    matched = True
            if not matched:
                fallback.add(mf)  # module referenced, usage opaque
    # import redirection guard for operator modules (NOT registry.py —
    # its imports churn every round and would flood; see module doc)
    for fseen in files_seen:
        if fseen != _REGISTRY_REL:
            segments.add((fseen, "__imports__"))
    return frozenset(segments), frozenset(fallback)


# --- the derivation ---------------------------------------------------------

def _segment_changed(
    repo_root: str, commit: str, rel_file: str, name: str
) -> bool:
    now = _hashes_now(repo_root, rel_file)
    then = _hashes_at(repo_root, commit, rel_file)
    if now is None or then is None:
        return True  # can't prove unchanged -> conservative
    return now.get(name) != then.get(name)


def stale_keys(registry: dict | None = None, repo_root: str = _REPO_ROOT) -> frozenset[str]:
    """Keys whose implementation (or oracle) changed after their most
    recent green driver row. Empty set on any git failure."""
    if registry is None:
        from streamforge_data_pipeline_spark.registry import REGISTRY as registry  # type: ignore

    last_green = green_rounds(repo_root)
    stale: set[str] = set()
    for key, spec in registry.items():
        rnd = last_green.get(key)
        if rnd is None:
            continue  # never verified: tier 0 fronts it regardless
        commit = _round_commit(repo_root, rnd)
        if commit is None:
            continue
        changed = _changed_files_since(repo_root, commit)
        if changed is None:
            continue
        segments, fallback_files = footprint(spec.fn)
        if any(f in changed for f in fallback_files):
            stale.add(key)
            continue
        touched_files = {f for f, _ in segments} | {_REGISTRY_REL}
        if not (touched_files & changed):
            continue  # no involved file differs at all: fast path
        for rel_file, name in [*segments, (_REGISTRY_REL, f"entry:{key}")]:
            if rel_file not in changed:
                continue
            if _segment_changed(repo_root, commit, rel_file, name):
                stale.add(key)
                break
    return frozenset(stale)
