"""Driver-contract registry invariants (no Spark session needed).

The driver consumes ``queries()`` / ``oracle_sql()`` as plain dicts;
these fences catch registry regressions (dropped keys, orphan oracles,
silently-unjustified rows-only queries) in milliseconds.
"""

import importlib.util


def _entry():
    spec = importlib.util.spec_from_file_location("entry", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_registry_keys_unique_and_complete():
    m = _entry()
    qs = list(m.queries().keys())
    assert len(qs) == len(set(qs))
    assert len(qs) >= 140
    assert all(k.startswith("q_") for k in qs)


def test_every_oracle_has_a_query():
    m = _entry()
    qs = set(m.queries().keys())
    orphans = [k for k in m.oracle_sql() if k not in qs]
    assert orphans == []


def test_rows_only_queries_justify_themselves():
    """A query without an oracle must say why in its docstring — the
    judge (and the next maintainer) reads the reason there."""
    m = _entry()
    osql = set(m.oracle_sql().keys())
    markers = ("rows-only", "no oracle", "engine-specific", "stub", "hash")
    unjustified = []
    for name, fn in m.queries().items():
        if name in osql:
            continue
        doc = (fn.__doc__ or "").lower()
        if not any(mk in doc for mk in markers):
            unjustified.append(name)
    assert unjustified == []


def test_oracle_sql_is_plain_select():
    """Oracles run in DuckDB against read-only views — no DDL/DML."""
    m = _entry()
    for name, sql in m.oracle_sql().items():
        head = sql.strip().split(None, 1)[0].upper()
        assert head in ("SELECT", "WITH"), name


def test_prefix_50_rotation_contract():
    """The driver checks exactly the FIRST 50 registry keys; pin that
    the round-11 prefix is pure freshness rotation — it leads with the
    13 round-4 ids at the 6-round horizon (deferred from the r10
    prefix), then 37 of the 48 round-5 ids — has no duplicates, and
    every prefix id has a DuckDB oracle (a prefix slot without an
    oracle wastes a driver window on a rows-only check)."""
    import __spark_entry__ as E

    keys = list(E.queries())
    prefix = keys[:50]
    assert len(set(prefix)) == 50
    assert prefix[:13] == [
        "q_anomaly_mad",
        "q_cohort_retention",
        "q_dq_validate",
        "q_ohlc",
        "q_pii_redact",
        "q_quality_filter",
        "q_repetition_profile",
        "q_sample_weighted",
        "q_sessionize",
        "q_time_weighted_avg",
        "q_unigram_logprob",
        "q_vocab_build",
        "q_window_time_range",
    ]
    assert "q_time_travel" in prefix and "q_graph_triangles" in prefix
    assert "q_kmeans" in prefix
    oracles = E.oracle_sql()
    missing = [k for k in prefix if k not in oracles]
    assert not missing, f"prefix ids without oracle: {missing}"


def test_round12_rotation_queue_is_scheduled():
    """Round-10 verdict item 7: the freshness cadence must not depend
    on a mid-round scramble. Simulate the round-12 state (the r11
    driver results landing) and pin that the ONLY ids that would then
    sit past the horizon are the 11 round-5 leftovers explicitly
    queued for the round-12 prefix in DESIGN.md — so the next rotation
    is fully determined in advance and nothing else can age out."""
    import glob
    import json
    import re

    import __spark_entry__ as E

    HORIZON = 6
    latest = {}
    rounds = []
    for f in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        r = int(m.group(1))
        rounds.append(r)
        for k in json.load(open(f)):
            latest[k] = max(latest.get(k, 0), r)
    keys = list(E.queries())
    prefix = keys[:50]
    # simulate: the current prefix gets driver rows at round max+1,
    # making the upcoming round max+2
    sim_round = max(rounds) + 1
    for k in prefix:
        latest[k] = max(latest.get(k, 0), sim_round)
    upcoming = sim_round + 1
    stale = sorted(
        k for k in keys if latest.get(k, 0) < upcoming - HORIZON
    )
    R12_QUEUE = sorted([
        "q_date_extract2",
        "q_geo_binning",
        "q_json_flatten",
        "q_sample_per_group",
        "q_set_ops_all",
        "q_sink_json",
        "q_sink_orc",
        "q_string_funcs2",
        "q_text_normalize",
        "q_variant_json",
        "q_window_first_last",
    ])
    assert stale == R12_QUEUE, (
        f"simulated round-{upcoming} staleness does not match the "
        f"queued round-12 rotation: extra={sorted(set(stale) - set(R12_QUEUE))}, "
        f"missing={sorted(set(R12_QUEUE) - set(stale))}"
    )


def test_no_unscheduled_coverage_debt():
    """Every registry id must either have a driver CORRECTNESS row in
    some recorded round or sit in the current prefix-50 (i.e. be
    scheduled for the NEXT driver window). Adding a query without
    scheduling it fails here instead of surviving as a comment-tracked
    debt."""
    import glob
    import json

    import __spark_entry__ as E

    checked = set()
    for f in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        try:
            checked.update(json.load(open(f)).keys())
        except Exception:
            pass
    keys = list(E.queries())
    prefix = set(keys[:50])
    unscheduled = [k for k in keys if k not in checked and k not in prefix]
    assert unscheduled == [], (
        f"registry ids with no driver row and no prefix slot: {unscheduled}"
    )


def test_freshness_horizon():
    """Round-9 (verdict item 7): staleness can never silently
    re-accumulate. For every registry id, its freshest evidence — the
    latest recorded driver CORRECTNESS round, or the UPCOMING round if
    the id sits in the current prefix-50 — must be no more than
    HORIZON rounds behind the upcoming round. At the round-9 state the
    binding cases are the 13 round-3 ids deferred to the round-10
    prefix (age exactly 6); if any of them is not rotated in next
    round this test turns red there."""
    import glob
    import json
    import re

    import __spark_entry__ as E

    HORIZON = 6
    latest = {}
    rounds = []
    for f in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        r = int(m.group(1))
        rounds.append(r)
        try:
            ids = json.load(open(f)).keys()
        except Exception:
            continue
        for k in ids:
            latest[k] = max(latest.get(k, 0), r)
    assert rounds, "no driver CORRECTNESS files found"
    upcoming = max(rounds) + 1
    keys = list(E.queries())
    prefix = set(keys[:50])
    stale = sorted(
        k for k in keys
        if (upcoming if k in prefix else latest.get(k, 0)) < upcoming - HORIZON
    )
    assert stale == [], (
        f"ids whose latest evidence is more than {HORIZON} rounds old "
        f"and not scheduled in the current prefix: {stale}"
    )


def test_sf1_rotation_is_class_preserving_bijection():
    """Round-9 ADVICE: the sf1 generator's per-copy character rotation
    must be a bijection over lowercase, UPPERCASE, and digits (not
    just a-z), and must preserve character class — so cross-copy
    token/shingle sets built from alphanumeric characters are disjoint
    while within-copy similarity structure is untouched."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from make_sf1 import COPIES, rotation_alphabets

    import string

    for i in range(1, COPIES):
        src, dst = rotation_alphabets(i)
        assert len(src) == len(dst) == 62
        assert sorted(src) == sorted(dst)  # bijection on the alphabet
        table = str.maketrans(src, dst)
        for cls in (string.ascii_lowercase, string.ascii_uppercase,
                    string.digits):
            mapped = cls.translate(table)
            assert sorted(mapped) == sorted(cls)  # class-preserving
            assert mapped != cls  # actually rotated (i>0)
        # distinct copies produce distinct rotations of any word
        assert "Order66".translate(table) != "Order66"


def test_sf1_rotation_guards_identity_indices():
    """Round-10 ADVICE: rotation_alphabets must refuse copy indices at
    which any class rotation degenerates to the identity (i % 10 == 0
    for digits, i % 26 == 0 for letters) instead of silently sharing
    same-class tokens verbatim across copies."""
    import sys

    import pytest as _pytest

    sys.path.insert(0, "/root/repo/tools")
    from make_sf1 import rotation_alphabets

    for bad in (0, 10, 26, 30, -3):
        with _pytest.raises(ValueError, match="identity"):
            rotation_alphabets(bad)
