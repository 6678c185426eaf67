"""Round-5 additions: protocol canary literal pinning and the composed
multimodal dedup path (phash -> banded Hamming -> CC -> component rep).

The oracle sweep (tools/check_oracles.py) already checks both against
DuckDB; these tests pin the SEMANTICS locally so a drift shows up in the
2-minute pytest loop, not only in the oracle pass.
"""

from __future__ import annotations

import datetime

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_protocol_canary_exact_values(spark):
    """The canary's whole value is that its rows are FIXED literals: pin
    them byte-for-byte so any engine/protocol drift is caught here too.
    grp g over range(6): members {g, g+3} -> sum 2g+3, count 2."""
    rows = {
        r["grp"]: r
        for r in E.queries()["a_protocol_canary"](spark, SF).collect()
    }
    assert set(rows) == {0, 1, 2}
    for g in (0, 1, 2):
        r = rows[g]
        assert r["hugeint_sum"] == 2 * g + 3
        assert r["cnt"] == 2
        assert r["big_mul"] == g * 1000000007
        assert r["dbl_round"] == round(g / 7, 6)
        assert r["label"] == f"canary-{g}"
        assert r["flag"] is (g == 1)
        assert r["d"] == datetime.date(2025, 1, 1 + g)


def test_phash_dedup_reps_component_semantics(spark):
    """Payloads are keyed on doc_id % 300, so every exact-re-encode class
    must collapse to ONE representative (the class min), n_members must be
    the class size, and is_dup must mark exactly the non-rep members."""
    # sf0.01 (500 docs over 300 payload classes) so real duplicate classes
    # exist; sf0.001 has <300 docs and every class would be a singleton
    out = E.queries()["mm_phash_dedup_reps"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    by_class: dict[int, list] = {}
    for r in out:
        by_class.setdefault(r["media_id"] % 300, []).append(r)
    assert sum(len(v) for v in by_class.values()) == len(out)
    for cls, members in by_class.items():
        ids = sorted(r["media_id"] for r in members)
        reps = {r["rep_id"] for r in members}
        # identical payloads pair at hamming 0 -> one component per class
        assert reps == {ids[0]}, (cls, reps, ids)
        for r in members:
            assert r["n_members"] == len(members)
            assert r["is_dup"] == (0 if r["media_id"] == ids[0] else 1)
