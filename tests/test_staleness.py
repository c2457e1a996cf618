"""Git-derived rotation staleness (staleness.py): footprint
precision, semantic (AST) hashing, and the stale derivation itself
with a synthetic file change. No Spark session needed."""

from __future__ import annotations

import pytest

from streamforge_data_pipeline_spark import registry, staleness as S

DEDUP = "streamforge_data_pipeline_spark/operators/dedup.py"
TEXT = "streamforge_data_pipeline_spark/operators/text.py"
REG = S._REGISTRY_REL


# --- footprint --------------------------------------------------------------

def test_footprint_includes_own_operator_module():
    segs, _ = S.footprint(registry.REGISTRY["exact_dedup"].fn)
    assert (DEDUP, "exact_dedup") in segs
    assert (REG, "q_exact_dedup") in segs


def test_footprint_excludes_unrelated_modules():
    """spark.read.text must NOT alias the text operator module (the
    attribute/global distinction): row_count reads a staged CSV and
    touches neither text.py nor minhash.py."""
    segs, fallback = S.footprint(registry.REGISTRY["row_count"].fn)
    files = {f for f, _ in segs} | set(fallback)
    assert TEXT not in files
    assert "streamforge_data_pipeline_spark/operators/minhash.py" not in files


def test_every_key_has_a_nonempty_footprint():
    for key, spec in registry.REGISTRY.items():
        segs, fallback = S.footprint(spec.fn)
        assert segs or fallback, key


# --- semantic hashing -------------------------------------------------------

BASE = '''
X = 1

def f(a):
    """doc v1"""
    return a + X

def g(a):
    return a * 2
'''

DOC_ONLY = BASE.replace("doc v1", "doc v2 — purely cosmetic")
STRUCTURAL = BASE.replace("return a + X", "return a - X")


def test_docstring_change_does_not_change_hash():
    a, b = S.segment_hashes(BASE), S.segment_hashes(DOC_ONLY)
    assert a["f"] == b["f"] and a["g"] == b["g"] and a["X"] == b["X"]


def test_structural_change_changes_only_that_segment():
    a, b = S.segment_hashes(BASE), S.segment_hashes(STRUCTURAL)
    assert a["f"] != b["f"]
    assert a["g"] == b["g"] and a["X"] == b["X"]


def test_registry_entry_hashes_cover_oracle_sql():
    src = open(REG).read()
    h = S.segment_hashes(src)
    assert "entry:row_count" in h and "entry:exact_dedup" in h
    edited = src.replace(
        "SELECT COUNT(*) AS data_rows FROM events",
        "SELECT COUNT(*) AS data_rows FROM events WHERE 1=1",
    )
    h2 = S.segment_hashes(edited)
    assert h["entry:row_count"] != h2["entry:row_count"]
    assert h["entry:exact_dedup"] == h2["entry:exact_dedup"]


# --- stale derivation (synthetic change, git monkeypatched) -----------------

@pytest.fixture
def synthetic_change(monkeypatch):
    """Simulate: every key was green in round 9, and since then the
    body of dedup.py's exact_dedup changed (only that segment)."""
    real_src = open(DEDUP).read()
    old_src = real_src.replace("sha2(", "md5(" if "sha2(" in real_src else "sha2(")
    assert old_src != real_src
    old_hashes = {DEDUP: S.segment_hashes(old_src), REG: S.segment_hashes(open(REG).read())}

    monkeypatch.setattr(S, "green_rounds", lambda repo_root=None: {k: 9 for k in registry.REGISTRY})
    monkeypatch.setattr(S, "_round_commit", lambda root, rnd: "fakecommit")
    monkeypatch.setattr(S, "_changed_files_since", lambda root, c: frozenset({DEDUP}))
    monkeypatch.setattr(S, "_hashes_at", lambda root, c, rel: old_hashes.get(rel))
    yield


def test_synthetic_file_change_fronts_affected_keys(synthetic_change, monkeypatch):
    stale = S.stale_keys(registry.REGISTRY)
    assert "exact_dedup" in stale
    assert "row_count" not in stale
    assert "pricing_summary" not in stale
    # and the rotation puts them in tier 1, right behind never-checked
    monkeypatch.setattr(registry, "_stale_keys", lambda: stale)
    monkeypatch.setattr(
        registry, "_verified_counts", lambda: {k: 1 for k in registry.REGISTRY}
    )
    ordered = registry._ordered_names()
    assert set(ordered[: len(stale)]) == set(stale)


def test_unchanged_tree_is_not_stale(monkeypatch):
    """With no diffs since the green commit, nothing is stale."""
    monkeypatch.setattr(S, "green_rounds", lambda repo_root=None: {k: 9 for k in registry.REGISTRY})
    monkeypatch.setattr(S, "_round_commit", lambda root, rnd: "fakecommit")
    monkeypatch.setattr(S, "_changed_files_since", lambda root, c: frozenset())
    assert S.stale_keys(registry.REGISTRY) == frozenset()


# --- live repo smoke --------------------------------------------------------

def test_stale_keys_runs_against_real_git():
    stale = S.stale_keys(registry.REGISTRY)
    assert stale <= set(registry.REGISTRY)


def test_green_rounds_parses_driver_history():
    gr = S.green_rounds()
    # every registry key EXCEPT keys newer than the last driver round
    # has a green row across r01-r03 (VERDICT r3); brand-new keys are
    # legitimately absent — the rotation's never-checked tier exists
    # exactly for them, so the invariant is: whatever is absent must
    # be fronted by the rotation, not silently skipped.
    missing = set(registry.REGISTRY) - set(gr)
    if missing:
        from streamforge_data_pipeline_spark.registry import _ordered_names

        fronted = _ordered_names()[: len(missing)]
        assert missing == set(fronted), (missing, fronted)
    assert all(r >= 1 for r in gr.values())
