"""Rotation logic for the driver's capped per-round verification
window: never-checked keys first, stale (changed-since-green) keys
second, everything else by check count then insertion order. No Spark
session needed."""

from __future__ import annotations

from streamforge_data_pipeline_spark import registry


def test_ordering_is_a_permutation_of_the_registry():
    names = registry._ordered_names()
    assert sorted(names) == sorted(registry.REGISTRY)
    assert len(set(names)) == len(names)


def test_contract_dicts_are_consistent():
    qs = registry.queries()
    osql = registry.oracle_sql()
    assert set(osql) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in osql.values())
    # rows-only keys are the documented iterative/approximate set
    rows_only = set(qs) - set(osql)
    assert all(
        registry.REGISTRY[k].oracle is None for k in rows_only
    )


def test_rows_only_declaration_names_hash_checked_twins():
    """r7 VERDICT #5: every key without an oracle is DECLARED via
    rows_only(), and its named twin is a real, oracle-backed registry
    key — so driver "no_oracle" rows are classifications, not gaps."""
    qs = registry.queries()
    osql = registry.oracle_sql()
    ro = registry.rows_only()
    # exactly the no-oracle keys, no more, no fewer
    assert set(ro) == set(qs) - set(osql)
    for key, twin in ro.items():
        assert twin in osql, f"{key}: twin {twin} is not oracle-backed"
        assert twin != key


def test_tiering_never_then_stale_then_verified(monkeypatch):
    names = list(registry.REGISTRY)
    # fake staleness (the real derivation is git-based, tested in
    # test_staleness.py) and fake history: everything green once
    # except two never-checked keys
    stale = tuple(n for n in names if n.startswith("near_"))[:2]
    assert stale
    monkeypatch.setattr(registry, "_stale_keys", lambda: frozenset(stale))
    fake_never = [n for n in names if n not in stale][:2]
    counts = {n: 1 for n in names}
    for n in fake_never:
        del counts[n]
    monkeypatch.setattr(registry, "_verified_counts", lambda: counts)
    ordered = registry._ordered_names()
    k = len(fake_never)
    assert set(ordered[:k]) == set(fake_never)
    stale_by_insertion = [n for n in names if n in set(stale)]
    assert ordered[k : k + len(stale)] == stale_by_insertion
    rest = ordered[k + len(stale) :]
    # remaining keys keep registry insertion order (equal counts)
    expected_rest = [n for n in names if n not in set(fake_never) | set(stale)]
    assert rest == expected_rest
